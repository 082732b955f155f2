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


def filtered_lrelu_torch(x, fu=None, fd=None, b=None, up=1, down=1,
                         padding=0, gain=float(np.sqrt(2.0)), slope=0.2,
                         clamp=None, flip_filter=False):
    """Restates the reference fallback _filtered_lrelu_ref
    (filtered_lrelu.py:121-155): bias -> upfirdn2d(fu, up, user padding,
    gain=up**2) -> lrelu(gain, clamp) -> upfirdn2d(fd, down, no padding)."""
    if isinstance(padding, int):
        padding = (padding, padding, padding, padding)
    if len(padding) == 2:
        padding = (padding[0], padding[0], padding[1], padding[1])
    x = bias_act_torch(x, b)
    x = upfirdn2d_torch(x, fu, up=up, padding=padding, gain=up ** 2,
                        flip_filter=flip_filter)
    x = bias_act_torch(x, act='lrelu', alpha=slope, gain=gain,
                       clamp=-1.0 if clamp is None else clamp)
    x = upfirdn2d_torch(x, fd, down=down, flip_filter=flip_filter)
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


# ===========================================================================
# Mini StyleGAN2 in torch — the end-to-end golden oracle.
#
# Restates the COMPOSED generator/discriminator semantics (modulated conv
# with demod eps placement, equalized-lr gains, FIR gains, flip_weight
# conventions, noise semantics, skip/resnet wiring, mbstd epilogue) from
# the documented contracts: reference conv2d_resample.py:46-141 (padding
# algebra + generic fallback path), the pickle-embedded
# training.networks_stylegan2 architecture described in SURVEY.md §1/§7,
# and our own networks.py docstrings. Used to close the loop that op-level
# oracles cannot: a wrong gain or flip convention composes silently.
# ===========================================================================


def _act_gain(act):
    return float(np.sqrt(2.0)) if act in ("relu", "lrelu", "swish") else 1.0


def conv2d_resample_torch(x, w, f=None, up=1, down=1, padding=0, groups=1,
                          flip_weight=True):
    """Reference conv2d_resample via the generic decomposition:
    pad+upsample-filter (gain up^2) -> plain conv -> filter+downsample."""
    fw = int(f.shape[-1]) if f is not None else 1
    fh = int(f.shape[0]) if f is not None else 1
    px0 = px1 = py0 = py1 = int(padding)
    if up > 1:
        px0 += (fw + up - 1) // 2
        px1 += (fw - up) // 2
        py0 += (fh + up - 1) // 2
        py1 += (fh - up) // 2
    if down > 1:
        px0 += (fw - down + 1) // 2
        px1 += (fw - down) // 2
        py0 += (fh - down + 1) // 2
        py1 += (fh - down) // 2
    x = upfirdn2d_torch(x, f if up > 1 else None, up=up,
                        padding=(px0, px1, py0, py1), gain=up ** 2)
    x = conv2d_torch(x, w, groups=groups, flip_weight=flip_weight)
    if down > 1:
        x = upfirdn2d_torch(x, f, down=down)
    return x


def upsample2d_torch(x, f, up=2):
    fw, fh = int(f.shape[-1]), int(f.shape[0])
    p = ((fw + up - 1) // 2, (fw - up) // 2,
         (fh + up - 1) // 2, (fh - up) // 2)
    return upfirdn2d_torch(x, f, up=up, padding=p, gain=up ** 2)


def modulated_conv2d_torch(x, weight, styles, noise=None, up=1, padding=0,
                           resample_filter=None, demodulate=True,
                           flip_weight=True):
    """Per-sample grouped-weight formulation (NVIDIA fused_modconv=True):
    deliberately the OTHER formulation than our input-scaling JAX op, so
    the parity test also proves the two are mathematically equivalent."""
    n, in_ch, h, w_in = x.shape
    out_ch, _, kh, kw = weight.shape
    w = weight.unsqueeze(0) * styles.reshape(n, 1, in_ch, 1, 1)
    if demodulate:
        d = (w.square().sum(dim=[2, 3, 4]) + 1e-8).rsqrt()
        w = w * d.reshape(n, out_ch, 1, 1, 1)
    x = x.reshape(1, n * in_ch, h, w_in)
    w = w.reshape(n * out_ch, in_ch, kh, kw)
    x = conv2d_resample_torch(x, w, f=resample_filter, up=up, padding=padding,
                              groups=n, flip_weight=flip_weight)
    x = x.reshape(n, out_ch, x.shape[-2], x.shape[-1])
    if noise is not None:
        x = x + noise
    return x


def make_filter_torch(taps=(1, 3, 3, 1)):
    f = torch.tensor(taps, dtype=torch.float32)
    f = f / f.sum()
    return torch.outer(f, f)


class FullyConnectedT(torch.nn.Module):
    def __init__(self, in_f, out_f, activation="linear", lr_multiplier=1.0,
                 bias_init=0.0):
        super().__init__()
        self.in_f, self.activation = in_f, activation
        self.lr_multiplier = lr_multiplier
        self.weight = torch.nn.Parameter(torch.randn(out_f, in_f))
        self.bias = torch.nn.Parameter(torch.full((out_f,), float(bias_init)))

    def forward(self, x):
        w = self.weight * (self.lr_multiplier / np.sqrt(self.in_f))
        b = self.bias * self.lr_multiplier
        return bias_act_torch(x @ w.t(), b, dim=x.ndim - 1,
                              act=self.activation,
                              gain=_act_gain(self.activation))


class Conv2dLayerT(torch.nn.Module):
    def __init__(self, in_ch, out_ch, k, activation="linear", down=1,
                 bias=True, conv_clamp=None):
        super().__init__()
        self.activation, self.down, self.conv_clamp = activation, down, conv_clamp
        self.weight_gain = 1.0 / np.sqrt(in_ch * k * k)
        self.padding = k // 2
        self.weight = torch.nn.Parameter(torch.randn(out_ch, in_ch, k, k))
        if bias:
            self.bias = torch.nn.Parameter(torch.zeros(out_ch))
        else:
            self.bias = None
        self.register_buffer("resample_filter", make_filter_torch())

    def forward(self, x, gain=1.0):
        w = self.weight * self.weight_gain
        x = conv2d_resample_torch(x, w, f=self.resample_filter,
                                  down=self.down, padding=self.padding,
                                  flip_weight=True)
        act_gain = _act_gain(self.activation) * gain
        clamp = self.conv_clamp * gain if self.conv_clamp is not None else -1.0
        return bias_act_torch(x, self.bias, act=self.activation,
                              gain=act_gain, clamp=clamp)


class SynthesisLayerT(torch.nn.Module):
    def __init__(self, in_ch, out_ch, w_dim, resolution, up=1, conv_clamp=None):
        super().__init__()
        self.up, self.conv_clamp = up, conv_clamp
        self.padding = 1
        self.affine = FullyConnectedT(w_dim, in_ch, bias_init=1.0)
        self.weight = torch.nn.Parameter(torch.randn(out_ch, in_ch, 3, 3))
        self.bias = torch.nn.Parameter(torch.zeros(out_ch))
        self.register_buffer("noise_const", torch.randn(resolution, resolution))
        self.noise_strength = torch.nn.Parameter(torch.zeros([]))
        self.register_buffer("resample_filter", make_filter_torch())

    def forward(self, x, w, noise_mode="const", gain=1.0):
        styles = self.affine(w)
        noise = None
        if noise_mode == "const":
            noise = self.noise_const * self.noise_strength
        x = modulated_conv2d_torch(
            x, self.weight, styles, noise=noise, up=self.up,
            padding=self.padding, resample_filter=self.resample_filter,
            flip_weight=(self.up == 1))
        act_gain = _act_gain("lrelu") * gain
        clamp = self.conv_clamp * gain if self.conv_clamp is not None else -1.0
        return bias_act_torch(x, self.bias, act="lrelu", gain=act_gain,
                              clamp=clamp)


class ToRGBLayerT(torch.nn.Module):
    def __init__(self, in_ch, out_ch, w_dim, conv_clamp=None):
        super().__init__()
        self.conv_clamp = conv_clamp
        self.weight_gain = 1.0 / np.sqrt(in_ch)
        self.affine = FullyConnectedT(w_dim, in_ch, bias_init=1.0)
        self.weight = torch.nn.Parameter(torch.randn(out_ch, in_ch, 1, 1))
        self.bias = torch.nn.Parameter(torch.zeros(out_ch))

    def forward(self, x, w):
        styles = self.affine(w) * self.weight_gain
        x = modulated_conv2d_torch(x, self.weight, styles, demodulate=False)
        return bias_act_torch(x, self.bias, clamp=self.conv_clamp
                              if self.conv_clamp is not None else -1.0)


class SynthesisBlockT(torch.nn.Module):
    def __init__(self, in_ch, out_ch, w_dim, resolution, img_channels,
                 conv_clamp=None):
        super().__init__()
        self.resolution = resolution
        self.register_buffer("resample_filter", make_filter_torch())
        if resolution == 4:
            self.const = torch.nn.Parameter(torch.randn(out_ch, 4, 4))
        else:
            self.conv0 = SynthesisLayerT(in_ch, out_ch, w_dim, resolution,
                                         up=2, conv_clamp=conv_clamp)
        self.conv1 = SynthesisLayerT(out_ch, out_ch, w_dim, resolution,
                                     conv_clamp=conv_clamp)
        self.torgb = ToRGBLayerT(out_ch, img_channels, w_dim,
                                 conv_clamp=conv_clamp)

    def forward(self, x, img, ws_block, noise_mode="const"):
        w_idx = 0
        if self.resolution == 4:
            x = self.const.unsqueeze(0).repeat(ws_block.shape[0], 1, 1, 1)
        else:
            x = self.conv0(x, ws_block[:, 0], noise_mode=noise_mode)
            w_idx = 1
        x = self.conv1(x, ws_block[:, w_idx], noise_mode=noise_mode)
        y = self.torgb(x, ws_block[:, w_idx + 1])
        if img is not None:
            img = upsample2d_torch(img, self.resample_filter)
        img = y if img is None else img + y
        return x, img


class MappingNetworkT(torch.nn.Module):
    def __init__(self, z_dim, w_dim, num_ws, num_layers=2, lr_multiplier=0.01,
                 c_dim=0, embed_features=None, with_w_avg=True):
        super().__init__()
        self.num_ws, self.num_layers = num_ws, num_layers
        self.z_dim, self.c_dim = z_dim, c_dim
        if embed_features is None:
            embed_features = w_dim if c_dim > 0 else 0
        in0 = z_dim + embed_features
        for i in range(num_layers):
            setattr(self, f"fc{i}",
                    FullyConnectedT(in0 if i == 0 else w_dim, w_dim,
                                    activation="lrelu",
                                    lr_multiplier=lr_multiplier))
        if c_dim > 0:
            self.embed = FullyConnectedT(c_dim, embed_features)
        if with_w_avg:
            self.register_buffer("w_avg", torch.zeros(w_dim))

    def forward(self, z, c=None, truncation_psi=1.0):
        def norm2(t):
            return t * (t.square().mean(dim=1, keepdim=True) + 1e-8).rsqrt()

        x = norm2(z) if self.z_dim > 0 else None
        if self.c_dim > 0:
            y = norm2(self.embed(c))
            x = y if x is None else torch.cat([x, y], dim=1)
        for i in range(self.num_layers):
            x = getattr(self, f"fc{i}")(x)
        if truncation_psi != 1.0:
            x = self.w_avg + truncation_psi * (x - self.w_avg)
        if self.num_ws is None:
            return x
        return x.unsqueeze(1).repeat(1, self.num_ws, 1)


class GeneratorT(torch.nn.Module):
    """Mini SG2 generator; instance attrs + _init_kwargs mirror the NVIDIA
    persistence state layout (persistence.py:119-126)."""

    def __init__(self, z_dim=64, c_dim=0, w_dim=64, img_resolution=32,
                 img_channels=2, mapping_kwargs=None, synthesis_kwargs=None):
        super().__init__()
        mapping_kwargs = mapping_kwargs or {}
        synthesis_kwargs = synthesis_kwargs or {}
        self.z_dim, self.c_dim, self.w_dim = z_dim, c_dim, w_dim
        self.img_resolution, self.img_channels = img_resolution, img_channels
        cb = synthesis_kwargs.get("channel_base", 1024)
        cm = synthesis_kwargs.get("channel_max", 64)
        clamp = synthesis_kwargs.get("conv_clamp", 256)
        self.block_resolutions = [
            2 ** i for i in range(2, int(np.log2(img_resolution)) + 1)]
        channels = {res: min(cb // res, cm) for res in self.block_resolutions}
        self.num_ws = sum(1 if r == 4 else 2
                          for r in self.block_resolutions) + 1
        self.mapping = MappingNetworkT(
            z_dim, w_dim, self.num_ws,
            num_layers=mapping_kwargs.get("num_layers", 2), c_dim=c_dim)
        self.synthesis = _SynthesisNetworkT(self.block_resolutions, channels,
                                            w_dim, img_channels, clamp)
        # What @persistent_class's Decorator.__init__ records:
        self._init_args = ()
        self._init_kwargs = dict(z_dim=z_dim, c_dim=c_dim, w_dim=w_dim,
                                 img_resolution=img_resolution,
                                 img_channels=img_channels,
                                 mapping_kwargs=dict(mapping_kwargs),
                                 synthesis_kwargs=dict(synthesis_kwargs))

    def forward(self, z, c=None, truncation_psi=1.0, noise_mode="const"):
        ws = self.mapping(z, c, truncation_psi=truncation_psi)
        return self.synthesis(ws, noise_mode=noise_mode)


class _SynthesisNetworkT(torch.nn.Module):
    def __init__(self, block_resolutions, channels, w_dim, img_channels,
                 conv_clamp):
        super().__init__()
        self.block_resolutions = block_resolutions
        for res in block_resolutions:
            in_ch = channels[res // 2] if res > 4 else 0
            setattr(self, f"b{res}",
                    SynthesisBlockT(in_ch, channels[res], w_dim, res,
                                    img_channels, conv_clamp=conv_clamp))

    def forward(self, ws, noise_mode="const"):
        x = img = None
        w_idx = 0
        for res in self.block_resolutions:
            block = getattr(self, f"b{res}")
            n_conv = 1 if res == 4 else 2
            x, img = block(x, img, ws[:, w_idx:w_idx + n_conv + 1],
                           noise_mode=noise_mode)
            w_idx += n_conv
        return img


def minibatch_stddev_torch(x, group_size, num_channels):
    n, c, h, w = x.shape
    g = min(group_size, n)
    f_ = num_channels
    y = x.reshape(g, n // g, f_, c // f_, h, w)
    y = y - y.mean(dim=0, keepdim=True)
    y = y.square().mean(dim=0)
    y = (y + 1e-8).sqrt()
    y = y.mean(dim=[2, 3, 4])
    y = y.reshape(n // g, f_, 1, 1).repeat(g, 1, h, w)
    return torch.cat([x, y], dim=1)


class DiscriminatorBlockT(torch.nn.Module):
    def __init__(self, in_ch, tmp_ch, out_ch, img_channels, first,
                 conv_clamp=None):
        super().__init__()
        self.first = first
        if first:
            self.fromrgb = Conv2dLayerT(img_channels, tmp_ch, 1,
                                        activation="lrelu",
                                        conv_clamp=conv_clamp)
        self.conv0 = Conv2dLayerT(tmp_ch, tmp_ch, 3, activation="lrelu",
                                  conv_clamp=conv_clamp)
        self.conv1 = Conv2dLayerT(tmp_ch, out_ch, 3, activation="lrelu",
                                  down=2, conv_clamp=conv_clamp)
        self.skip = Conv2dLayerT(tmp_ch, out_ch, 1, down=2, bias=False)

    def forward(self, x, img):
        if self.first:
            x = self.fromrgb(img)
        y = self.skip(x, gain=np.sqrt(0.5))
        x = self.conv0(x)
        x = self.conv1(x, gain=np.sqrt(0.5))
        return y + x


class DiscriminatorT(torch.nn.Module):
    def __init__(self, c_dim=0, img_resolution=32, img_channels=2,
                 channel_base=1024, channel_max=64, conv_clamp=256,
                 mbstd_group_size=4, mbstd_num_channels=1, block_kwargs=None,
                 epilogue_kwargs=None, mapping_kwargs=None):
        super().__init__()
        mapping_kwargs = mapping_kwargs or {}
        self.c_dim = c_dim
        self.img_resolution, self.img_channels = img_resolution, img_channels
        self.mbstd_group_size = mbstd_group_size
        self.mbstd_num_channels = mbstd_num_channels
        self.block_resolutions = [
            2 ** i for i in range(int(np.log2(img_resolution)), 2, -1)]
        channels = {res: min(channel_base // res, channel_max)
                    for res in self.block_resolutions + [4]}
        first = True
        for res in self.block_resolutions:
            setattr(self, f"b{res}",
                    DiscriminatorBlockT(0 if first else channels[res],
                                        channels[res], channels[res // 2],
                                        img_channels, first,
                                        conv_clamp=conv_clamp))
            first = False
        ch4 = channels[4]
        self.cmap_dim = ch4 if c_dim > 0 else 0
        self.b4 = torch.nn.Module()
        self.b4.conv = Conv2dLayerT(ch4 + mbstd_num_channels, ch4, 3,
                                    activation="lrelu", conv_clamp=conv_clamp)
        self.b4.fc = FullyConnectedT(ch4 * 16, ch4, activation="lrelu")
        self.b4.out = FullyConnectedT(
            ch4, 1 if self.cmap_dim == 0 else self.cmap_dim)
        if c_dim > 0:
            self.mapping = MappingNetworkT(
                0, self.cmap_dim, None,
                num_layers=mapping_kwargs.get("num_layers", 2), c_dim=c_dim,
                embed_features=self.cmap_dim, with_w_avg=False)
        self._init_args = ()
        self._init_kwargs = dict(c_dim=c_dim, img_resolution=img_resolution,
                                 img_channels=img_channels,
                                 channel_base=channel_base,
                                 channel_max=channel_max,
                                 conv_clamp=conv_clamp,
                                 mbstd_group_size=mbstd_group_size,
                                 mbstd_num_channels=mbstd_num_channels,
                                 mapping_kwargs=dict(mapping_kwargs))

    def forward(self, img, c=None):
        x = None
        for res in self.block_resolutions:
            x = getattr(self, f"b{res}")(x, img)
        x = minibatch_stddev_torch(x, self.mbstd_group_size,
                                   self.mbstd_num_channels)
        x = self.b4.conv(x)
        x = self.b4.fc(x.reshape(x.shape[0], -1))
        x = self.b4.out(x)
        if self.cmap_dim > 0:
            cmap = self.mapping(None, c)
            x = (x * cmap).sum(dim=1, keepdim=True) \
                * (1.0 / np.sqrt(self.cmap_dim))
        return x


# ---------------------------------------------------------------------------
# NVIDIA persistence wire-format emitter (the real pickle layout: meta dict
# with type/version/module_src/class_name and state = module __dict__, with
# nested persistent submodules — persistence.py:119-126, :179-203).

_FAKE_MODULE_SRC = "# source embedded by torch_utils.persistence (unused)\n"


def _install_fake_persistence_module():
    import sys
    import types

    if "torch_utils.persistence" in sys.modules:
        return sys.modules["torch_utils.persistence"]._reconstruct_persistent_obj

    def _reconstruct_persistent_obj(meta):  # pragma: no cover
        raise RuntimeError("test stub — the converter must intercept this")

    _reconstruct_persistent_obj.__module__ = "torch_utils.persistence"
    _reconstruct_persistent_obj.__qualname__ = "_reconstruct_persistent_obj"
    pm = types.ModuleType("torch_utils.persistence")
    pm._reconstruct_persistent_obj = _reconstruct_persistent_obj
    tu = types.ModuleType("torch_utils")
    tu.persistence = pm
    sys.modules["torch_utils"] = tu
    sys.modules["torch_utils.persistence"] = pm
    return _reconstruct_persistent_obj


def persistence_pickle_bytes(obj):
    """Pickle {'G_ema': module, 'D': module, ...} in the NVIDIA wire format:
    every nn.Module (recursively) becomes a _reconstruct_persistent_obj(meta)
    reduce with state = its full __dict__ (training flag,
    _non_persistent_buffers_set, version tags and all)."""
    import io as _io
    import pickle as _pickle

    reconstruct = _install_fake_persistence_module()

    class _P(_pickle.Pickler):
        def reducer_override(self, o):
            if isinstance(o, torch.nn.Module):
                meta = dict(type="class", version=6,
                            module_src=_FAKE_MODULE_SRC,
                            class_name=type(o).__name__,
                            state=dict(o.__dict__))
                return (reconstruct, (meta,))
            return NotImplemented

    buf = _io.BytesIO()
    _P(buf, protocol=4).dump(obj)
    return buf.getvalue()


# ----------------------------------------------------------------------------
# kornia-semantics oracles for GeometricAugment (reference
# augments/geometric_aug.py:101-131 builds K.RandomAffine /
# K.RandomElasticTransform; kornia is not installed here, so these
# restate kornia's documented math in plain torch).

def _normal_transform_pixel_torch(h, w):
    """kornia.geometry.normal_transform_pixel: (size-1)-denominator
    pixel -> [-1, 1] normalization."""
    return torch.tensor([[2.0 / (w - 1), 0.0, -1.0],
                         [0.0, 2.0 / (h - 1), -1.0],
                         [0.0, 0.0, 1.0]], dtype=torch.float32)


def kornia_affine_oracle(x, angle_deg, translate_px):
    """kornia RandomAffine.apply_transform on fixed parameters:
    get_rotation_matrix2d(center=(W-1)/2,(H-1)/2, angle=-angle, scale=1)
    with pixel translations added to the last column (get_affine_matrix2d),
    then warp_affine = normalize_homography -> inverse -> F.affine_grid /
    F.grid_sample with align_corners=False, reflection padding."""
    x = torch.as_tensor(np.asarray(x), dtype=torch.float32)
    angle = torch.as_tensor(np.asarray(angle_deg), dtype=torch.float32)
    trans = torch.as_tensor(np.asarray(translate_px), dtype=torch.float32)
    n, c, h, w = x.shape
    ang = -angle * np.pi / 180.0  # get_affine_matrix2d negates the angle
    cx, cy = (w - 1) / 2.0, (h - 1) / 2.0
    cos, sin = torch.cos(ang), torch.sin(ang)
    m = torch.zeros(n, 3, 3)
    m[:, 0, 0] = cos
    m[:, 0, 1] = sin
    m[:, 0, 2] = (1.0 - cos) * cx - sin * cy + trans[:, 0]
    m[:, 1, 0] = -sin
    m[:, 1, 1] = cos
    m[:, 1, 2] = sin * cx + (1.0 - cos) * cy + trans[:, 1]
    m[:, 2, 2] = 1.0
    norm = _normal_transform_pixel_torch(h, w)
    dst_norm_trans_src_norm = norm[None] @ m @ torch.linalg.inv(norm)[None]
    theta = torch.linalg.inv(dst_norm_trans_src_norm)[:, :2, :]
    grid = F.affine_grid(theta, (n, c, h, w), align_corners=False)
    return F.grid_sample(x, grid, mode="bilinear", padding_mode="reflection",
                         align_corners=False)


def kornia_elastic_oracle(x, noise, kernel_size=63, sigma=32.0, alpha=1.0):
    """kornia elastic_transform2d on a fixed noise field [N, 2, H, W]:
    filter2d(border_type='constant') with the normalized 2-D gaussian
    kernel, * alpha, added to create_meshgrid's linspace(-1, 1) grid,
    clamped to [-1, 1], then F.grid_sample(align_corners=False,
    padding_mode='reflection')."""
    x = torch.as_tensor(np.asarray(x), dtype=torch.float32)
    noise = torch.as_tensor(np.asarray(noise), dtype=torch.float32)
    n, c, h, w = x.shape
    ax = torch.arange(kernel_size, dtype=torch.float32) - (kernel_size - 1) / 2.0
    k1 = torch.exp(-0.5 * (ax / sigma) ** 2)
    k1 = k1 / k1.sum()
    k2d = torch.outer(k1, k1)  # normalized gaussian (outer of normalized 1-D)
    pad = kernel_size // 2
    disp = F.conv2d(noise.reshape(n * 2, 1, h, w), k2d[None, None],
                    padding=pad).reshape(n, 2, h, w) * alpha
    ys = torch.linspace(-1.0, 1.0, h)
    xs = torch.linspace(-1.0, 1.0, w)
    gy, gx = torch.meshgrid(ys, xs, indexing="ij")
    grid = torch.stack([gx, gy], dim=-1)[None] + disp.permute(0, 2, 3, 1)
    grid = grid.clamp(-1.0, 1.0)
    return F.grid_sample(x, grid, mode="bilinear", padding_mode="reflection",
                         align_corners=False)


# ----------------------------------------------------------------------------
# Full K-step latent-walk oracle (reference augments/utils/util_latent_aug.py:
# 207-310 forward loop, :315-433 losses, util_dataset.py:284-332 crops).
# Used by tests/test_walk_parity.py to pin the composed walk — loss
# composition/signs/normalizations, crop geometry, LPIPS input scale, Adam
# bias correction, soft/hard gate — against our jitted lax.scan walk.

_VGG_LPIPS_SHIFT = np.array([-0.030, -0.088, -0.188], dtype=np.float32)
_VGG_LPIPS_SCALE = np.array([0.458, 0.448, 0.450], dtype=np.float32)
_VGG16_PLAN = [
    ("conv1_1", 64), ("conv1_2", 64), "M",
    ("conv2_1", 128), ("conv2_2", 128), "M",
    ("conv3_1", 256), ("conv3_2", 256), ("conv3_3", 256), "M",
    ("conv4_1", 512), ("conv4_2", 512), ("conv4_3", 512), "M",
    ("conv5_1", 512), ("conv5_2", 512), ("conv5_3", 512), "M",
]
_VGG_LPIPS_TAPS = ["conv1_2", "conv2_2", "conv3_3", "conv4_3", "conv5_3"]


def vgg16_lpips_embed_torch(params, x):
    """The NVIDIA vgg16.pt `return_lpips=True` contract in plain torch:
    [0,255]-convention prescale to the richzhang normalization, 3x3
    conv/relu trunk with 2x2 maxpools, then per-tap unit-channel-normalized
    activations scaled by sqrt(lin/(H*W)) and concatenated — so squared L2
    between embeddings equals the LPIPS distance (the property
    util_latent_aug.py:387-409 relies on). `params` is a dict of numpy
    arrays as produced by latentaugment_tpu.models.vgg.init_vgg."""
    x = x / 127.5 - 1.0
    x = (x - torch.tensor(_VGG_LPIPS_SHIFT)[None, :, None, None]) \
        / torch.tensor(_VGG_LPIPS_SCALE)[None, :, None, None]
    feats = []
    n = x.shape[0]
    remaining = set(_VGG_LPIPS_TAPS)
    for item in _VGG16_PLAN:
        if not remaining:
            break
        if item == "M":
            x = F.max_pool2d(x, 2)
            continue
        name, _ = item
        w = torch.as_tensor(np.asarray(params[name]["weight"]))
        b = torch.as_tensor(np.asarray(params[name]["bias"]))
        x = F.relu(F.conv2d(x, w, b, padding=1))
        if name in remaining:
            remaining.discard(name)
            a = x * torch.rsqrt(torch.sum(x * x, dim=1, keepdim=True) + 1e-10)
            lin = params.get("lin", {}).get(name)
            if lin is not None:
                a = a * torch.sqrt(torch.clamp(
                    torch.as_tensor(np.asarray(lin)), min=0.0))[None, :, None, None]
            h, w_ = a.shape[2], a.shape[3]
            feats.append((a / np.sqrt(h * w_)).reshape(n, -1))
    return torch.cat(feats, dim=1)


def l2_loss_vectorized_torch(X, Y, compute_mean=True):
    """Reference l2_loss_vectorized (util_latent_aug.py:315-361): pairwise
    squared L2 between rows; mean over pairs / per-item feature size."""
    assert X.ndim == Y.ndim and X.ndim in (2, 3, 4)
    dims = tuple(range(1, X.ndim))
    YYt = torch.sum(Y * Y, dims)
    XXt = torch.sum(X * X, dims)
    YXt = Y.reshape(Y.shape[0], -1) @ X.reshape(X.shape[0], -1).T
    D = YYt.unsqueeze(-1) + XXt - 2.0 * YXt
    if compute_mean:
        D = torch.sum(D) / (Y.shape[0] * X.shape[0])
        feat = 1
        for d in Y.shape[1:]:
            feat *= d
        D = D / feat
    return D


def center_crop_torch(x, load_size):
    """transforms.CenterCrop(int(sqrt(load_size^2 / 2))) semantics
    (util_dataset.py:301-323): torchvision rounds the offset with
    int(round((h - size) / 2.0))."""
    size = int(np.sqrt((load_size * load_size) / 2))
    h, w = x.shape[-2], x.shape[-1]
    top = int(round((h - size) / 2.0))
    left = int(round((w - size) / 2.0))
    return x[..., top:top + size, left:left + size]


def reference_walk_oracle(G, D, vgg_params, w0, *, num_epochs, opt_lr,
                          w_pix, w_lpips, w_latent, w_disc,
                          W_manifold, X_manifold, fea_manifolds,
                          crop_pos, crop_size, res, n_modes,
                          soft_aug=False, alpha=1.0, disc_sign=1.0):
    """The reference LatentAug.forward walk (util_latent_aug.py:207-310):
    K torch.optim.Adam steps on w [B,1,w_dim] against
    loss = -latent - pix - lpips + disc, with the center_random_crop
    pipeline at fixed crop_pos (x, y). Returns (per-epoch loss dicts,
    w_aug [B,1,w_dim], ws_aug broadcast).

    Manifolds are raw arrays: W [M,num_ws,w_dim], X [M,n_modes,res,res]
    (same value convention as G's output), fea_manifolds list of [M,D]
    per modality."""
    num_ws = G.num_ws
    w_opt = torch.tensor(np.asarray(w0), dtype=torch.float32,
                         requires_grad=True)
    optimizer = torch.optim.Adam([w_opt], betas=(0.9, 0.999), lr=opt_lr)
    W = torch.as_tensor(np.asarray(W_manifold), dtype=torch.float32)
    X = torch.as_tensor(np.asarray(X_manifold), dtype=torch.float32)
    feas = [torch.as_tensor(np.asarray(f), dtype=torch.float32)
            for f in fea_manifolds]
    X_cc = center_crop_torch(X, res)
    px, py = crop_pos

    def transform_aug(img):
        cc = center_crop_torch(img, res)
        return cc[:, :, py:py + crop_size, px:px + crop_size]

    history = []
    for _epoch in range(num_epochs):
        ws = w_opt.repeat([1, num_ws, 1])
        x_tilde = G.synthesis(ws, noise_mode="const")

        rec = {}
        loss_latent = torch.tensor(0.0)
        if w_latent > 0.0:
            loss_latent = w_latent * l2_loss_vectorized_torch(ws, W)
            rec["loss_latent"] = float(loss_latent)

        loss_disc = torch.tensor(0.0)
        if w_disc > 0.0:
            logits = D(x_tilde, c=None)
            loss_disc = w_disc * F.softplus(-logits).mean()
            rec["loss_disc"] = float(loss_disc)

        loss_pix = torch.tensor(0.0)
        if w_pix > 0.0:
            x_cc = center_crop_torch(x_tilde, res)
            acc = 0.0
            for m in range(n_modes):
                acc = acc + w_pix * l2_loss_vectorized_torch(
                    x_cc[:, m:m + 1], X_cc[:, m:m + 1])
            loss_pix = acc / n_modes
            rec["loss_pix"] = float(loss_pix)

        loss_lpips = torch.tensor(0.0)
        if w_lpips > 0.0:
            x_crop = transform_aug(x_tilde)
            acc = 0.0
            for m in range(n_modes):
                xm = x_crop[:, m:m + 1].repeat([1, 3, 1, 1])
                # calc_loss_lpips_torchscript feeds the RAW synthesis-range
                # crop to the [0,255]-convention VGG (the reference's input
                # scale quirk, util_latent_aug.py:387-409).
                synth_features = vgg16_lpips_embed_torch(vgg_params, xm)
                dist = l2_loss_vectorized_torch(synth_features, feas[m],
                                                compute_mean=False)
                acc = acc + w_lpips * (dist.sum() / (synth_features.shape[0]
                                                     * feas[m].shape[0]))
            loss_lpips = acc / n_modes
            rec["loss_lpips"] = float(loss_lpips)

        # disc_sign exists only for perturbation-sensitivity tests (a wrong
        # composed sign must be detectable); the reference is always +.
        loss = -loss_latent - loss_pix - loss_lpips + disc_sign * loss_disc
        rec["loss"] = float(loss)
        history.append(rec)

        optimizer.zero_grad()
        loss.backward()
        optimizer.step()

    w0_t = torch.as_tensor(np.asarray(w0), dtype=torch.float32)
    w_aug = (alpha * w_opt + (1.0 - alpha) * w0_t) if soft_aug \
        else w_opt
    ws_aug = w_aug.repeat([1, num_ws, 1])
    return history, w_aug.detach(), ws_aug.detach()


# ----------------------------------------------------------------------------
# StyleGAN2(-ADA) training-phase objectives, restated in torch.
#
# The reference consumes checkpoints trained by NVIDIA's external
# stylegan2-ada trainer (reference README.md:55-59); these oracles restate
# the published phase losses (Karras et al. 2019 sec. 3/appendix B;
# 2020 ADA) so models/stylegan2/train.py can be value- AND grad-parity
# tested through the pickle converter. Parity regime: noise_mode='const',
# no style mixing, no augmentation (all randomness injected explicitly).

def sg2_g_main_torch(g, d, z):
    """Non-saturating logistic G loss. Returns the torch scalar (caller
    backprops/steps)."""
    img = g(z, noise_mode="const")
    logits = d(img)
    return F.softplus(-logits).mean()


def sg2_g_pl_torch(g, z, pl_noise, pl_mean, pl_weight=2.0, pl_decay=0.01,
                   g_reg_interval=4):
    """Path-length regularization: grad of <img, pl_noise> w.r.t. ws,
    EMA'd target, squared deviation (lazy interval folded in).
    Returns (loss, new_pl_mean, pl_lengths)."""
    ws = g.mapping(z)
    img = g.synthesis(ws, noise_mode="const")
    pl_noise = torch.as_tensor(np.asarray(pl_noise), dtype=torch.float32)
    (pl_grads,) = torch.autograd.grad(
        outputs=(img * pl_noise).sum(), inputs=ws, create_graph=True)
    pl_lengths = pl_grads.square().sum(2).mean(1).sqrt()
    new_pl_mean = pl_mean + pl_decay * (pl_lengths.mean() - pl_mean)
    pl_penalty = (pl_lengths - new_pl_mean.detach()).square()
    loss = pl_penalty.mean() * pl_weight * g_reg_interval
    return loss, new_pl_mean, pl_lengths


def sg2_d_main_torch(g, d, z, real):
    """D logistic loss on fake + real. Returns (loss, gen, real, rt)."""
    gen_logits = d(g(z, noise_mode="const"))
    real_logits = d(real)
    loss_gen = F.softplus(gen_logits).mean()
    loss_real = F.softplus(-real_logits).mean()
    rt = torch.sign(real_logits).mean()
    return loss_gen + loss_real, loss_gen, loss_real, rt


def sg2_d_r1_torch(d, real, r1_gamma, d_reg_interval=16):
    """R1 gradient penalty on reals (lazy interval + gamma/2 folded in).
    Returns (loss, penalty_mean)."""
    real = real.detach().requires_grad_(True)
    logits = d(real)
    (r1_grads,) = torch.autograd.grad(
        outputs=logits.sum(), inputs=real, create_graph=True)
    penalty = r1_grads.square().sum([1, 2, 3])
    loss = penalty.mean() * (r1_gamma / 2.0) * d_reg_interval
    return loss, penalty.mean()
