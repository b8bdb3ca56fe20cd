class Raft_Large_Weights:
    DEFAULT = "DEFAULT"


def raft_large(weights=None, progress=False):
    raise RuntimeError("torchvision shim: pretrained RAFT unavailable (zero egress)")
