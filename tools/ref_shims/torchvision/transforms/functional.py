"""torchvision.transforms.functional.to_tensor reimplementation (PIL/ndarray
-> float CHW in [0, 1]), matching torchvision 0.20 semantics for the 8-bit
RGB PIL images the reference PNG reader feeds it."""

import numpy as np
import torch


def to_tensor(pic):
    if isinstance(pic, np.ndarray):
        arr = pic
    else:  # PIL image
        arr = np.array(pic, copy=True)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    t = torch.from_numpy(arr).permute(2, 0, 1).contiguous()
    if t.dtype == torch.uint8:
        return t.float().div(255.0)
    return t.float()
