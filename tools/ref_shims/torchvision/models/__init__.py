"""torchvision.models stub. The decode oracle never constructs VGG16/RAFT;
these raise if actually called (zero egress: no pretrained weights)."""

from . import vgg  # noqa: F401
from . import optical_flow  # noqa: F401


def vgg16(weights=None):
    raise RuntimeError("torchvision shim: pretrained VGG16 unavailable (zero egress)")
