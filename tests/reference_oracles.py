"""Torch-based oracle implementations used ONLY by the test suite.

These re-state the mathematical definitions of the reference ops using
plain torch (CPU) so our JAX ops can be parity-tested without importing
(or copying) the reference repo. Definitions follow the documented op
contracts in reference torch_utils/ops/*.py.
"""

import numpy as np
import torch
import torch.nn.functional as F


def upfirdn2d_torch(x, f, up=1, down=1, padding=(0, 0, 0, 0), flip_filter=False, gain=1):
    """Literal pad/up/FIR/down pipeline on a torch NCHW tensor."""
    if isinstance(up, int):
        up = (up, up)
    if isinstance(down, int):
        down = (down, down)
    upx, upy = up
    downx, downy = down
    if isinstance(padding, int):
        padding = (padding, padding, padding, padding)
    if len(padding) == 2:
        padding = (padding[0], padding[0], padding[1], padding[1])
    padx0, padx1, pady0, pady1 = padding

    b, c, h, w = x.shape
    # zero-insertion upsample
    x = x.reshape(b, c, h, 1, w, 1)
    x = F.pad(x, [0, upx - 1, 0, 0, 0, upy - 1])
    x = x.reshape(b, c, h * upy, w * upx)
    # pad / crop
    x = F.pad(x, [max(padx0, 0), max(padx1, 0), max(pady0, 0), max(pady1, 0)])
    x = x[:, :, max(-pady0, 0): x.shape[2] - max(-pady1, 0),
          max(-padx0, 0): x.shape[3] - max(-padx1, 0)]
    # filter
    if f is None:
        f = torch.ones(1, 1, dtype=torch.float32)
    f = f * (gain ** (f.ndim / 2))
    f = f.to(x.dtype)
    if not flip_filter:
        f = f.flip(list(range(f.ndim)))
    if f.ndim == 1:
        fx = f.reshape(1, 1, 1, -1).repeat(c, 1, 1, 1)
        fy = f.reshape(1, 1, -1, 1).repeat(c, 1, 1, 1)
        x = F.conv2d(x, fx, groups=c)
        x = F.conv2d(x, fy, groups=c)
    else:
        fk = f.reshape(1, 1, *f.shape).repeat(c, 1, 1, 1)
        x = F.conv2d(x, fk, groups=c)
    # downsample
    x = x[:, :, ::downy, ::downx]
    return x


def bias_act_torch(x, b=None, dim=1, act='linear', alpha=0.2, gain=1.0, clamp=-1.0):
    if b is not None:
        shape = [1] * x.ndim
        shape[dim] = -1
        x = x + b.reshape(shape)
    if act == 'linear':
        pass
    elif act == 'relu':
        x = F.relu(x)
    elif act == 'lrelu':
        x = F.leaky_relu(x, alpha)
    elif act == 'tanh':
        x = torch.tanh(x)
    elif act == 'sigmoid':
        x = torch.sigmoid(x)
    elif act == 'elu':
        x = F.elu(x)
    elif act == 'selu':
        x = F.selu(x)
    elif act == 'softplus':
        x = F.softplus(x)
    elif act == 'swish':
        x = torch.sigmoid(x) * x
    else:
        raise ValueError(act)
    if gain != 1.0:
        x = x * gain
    if clamp >= 0:
        x = torch.clamp(x, -clamp, clamp)
    return x


def conv2d_torch(x, w, stride=1, padding=0, groups=1, transpose=False, flip_weight=True):
    """Torch conv/conv_transpose with the reference flip convention."""
    kh, kw = w.shape[-2], w.shape[-1]
    if not flip_weight and (kw > 1 or kh > 1):
        w = w.flip([2, 3])
    if transpose:
        return F.conv_transpose2d(x, w, stride=stride, padding=padding, groups=groups)
    return F.conv2d(x, w, stride=stride, padding=padding, groups=groups)


def to_np(t):
    return t.detach().cpu().numpy().astype(np.float32)
