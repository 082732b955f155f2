"""LPIPS alex/squeeze backbones (VERDICT #9) — construction, embedding
property, converter mapping, and torch-trunk parity.

torchvision is not in this image, so the torch oracles restate the
torchvision alexnet/squeezenet1_1 `features` trunks from their documented
layer configs (reference criteria/lpips/networks.py:52-83 names the taps
and channel lists)."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from latentaugment_tpu.augments.criteria.lpips import LPIPS
from latentaugment_tpu.models import lpips_backbones as bb


# ---------------------------------------------------------------------------
# Torch oracles for the trunks


class _TorchAlexFeatures(torch.nn.Module):
    def __init__(self):
        super().__init__()
        self.features = torch.nn.Sequential(
            torch.nn.Conv2d(3, 64, 11, stride=4, padding=2), torch.nn.ReLU(),
            torch.nn.MaxPool2d(3, 2),
            torch.nn.Conv2d(64, 192, 5, padding=2), torch.nn.ReLU(),
            torch.nn.MaxPool2d(3, 2),
            torch.nn.Conv2d(192, 384, 3, padding=1), torch.nn.ReLU(),
            torch.nn.Conv2d(384, 256, 3, padding=1), torch.nn.ReLU(),
            torch.nn.Conv2d(256, 256, 3, padding=1), torch.nn.ReLU(),
            torch.nn.MaxPool2d(3, 2),
        )


class _TorchFire(torch.nn.Module):
    def __init__(self, c_in, sq, ex):
        super().__init__()
        self.squeeze = torch.nn.Conv2d(c_in, sq, 1)
        self.expand1x1 = torch.nn.Conv2d(sq, ex, 1)
        self.expand3x3 = torch.nn.Conv2d(sq, ex, 3, padding=1)

    def forward(self, x):
        s = torch.relu(self.squeeze(x))
        return torch.cat([torch.relu(self.expand1x1(s)),
                          torch.relu(self.expand3x3(s))], dim=1)


class _TorchSqueezeFeatures(torch.nn.Module):
    def __init__(self):
        super().__init__()
        self.features = torch.nn.Sequential(
            torch.nn.Conv2d(3, 64, 3, stride=2), torch.nn.ReLU(),
            torch.nn.MaxPool2d(3, 2, ceil_mode=True),
            _TorchFire(64, 16, 64), _TorchFire(128, 16, 64),
            torch.nn.MaxPool2d(3, 2, ceil_mode=True),
            _TorchFire(128, 32, 128), _TorchFire(256, 32, 128),
            torch.nn.MaxPool2d(3, 2, ceil_mode=True),
            _TorchFire(256, 48, 192), _TorchFire(384, 48, 192),
            _TorchFire(384, 64, 256), _TorchFire(512, 64, 256),
        )


def _taps_from_torch(mod, x, indices):
    out = []
    with torch.no_grad():
        h = x
        for i, layer in enumerate(mod.features, 1):
            h = layer(h)
            if i in indices:
                out.append(h.numpy())
    return out


def test_alexnet_trunk_parity_vs_torch():
    torch.manual_seed(0)
    mod = _TorchAlexFeatures().eval()
    params = bb.convert_torchvision_alexnet(mod.state_dict())
    x = np.random.RandomState(0).randn(2, 3, 64, 64).astype(np.float32)
    # z-score input on the torch side to isolate the trunk.
    xt = torch.from_numpy(np.asarray(
        bb._z_score(jnp.asarray(x))))
    taps_t = _taps_from_torch(mod, xt, [2, 5, 8, 10, 12])
    taps_j = bb.alexnet_taps(params, jnp.asarray(x))
    for name, want in zip(bb.ALEX_TAPS, taps_t):
        got = np.asarray(taps_j[name])
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_squeezenet_trunk_parity_vs_torch():
    torch.manual_seed(1)
    mod = _TorchSqueezeFeatures().eval()
    params = bb.convert_torchvision_squeezenet(mod.state_dict())
    x = np.random.RandomState(1).randn(2, 3, 65, 65).astype(np.float32)
    # 65x65: odd size exercises ceil_mode pooling.
    xt = torch.from_numpy(np.asarray(bb._z_score(jnp.asarray(x))))
    taps_t = _taps_from_torch(mod, xt, [2, 5, 8, 10, 11, 12, 13])
    taps_j = bb.squeezenet_taps(params, jnp.asarray(x))
    for name, want in zip(bb.SQUEEZE_TAPS, taps_t):
        got = np.asarray(taps_j[name])
        assert got.shape == want.shape, name
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_converters_reject_bad_keys_and_shapes():
    with pytest.raises(KeyError):
        bb.convert_torchvision_alexnet(
            {"features.99.weight": torch.zeros(1, 1, 1, 1)})
    with pytest.raises(ValueError, match="shape mismatch"):
        bb.convert_torchvision_alexnet(
            {"features.0.weight": torch.zeros(3, 64, 11, 11)})  # transposed
    with pytest.raises(KeyError):
        bb.convert_torchvision_squeezenet(
            {"features.2.squeeze.weight": torch.zeros(1, 1, 1, 1)})


@pytest.mark.parametrize("net_type,n_taps", [("alex", 5), ("squeeze", 7)])
def test_lpips_backbone_constructs_and_embedding_property(net_type, n_taps):
    """VERDICT #9 done-when: LPIPS(net_type='alex') constructs and the
    embedding property holds: ||emb(x)-emb(y)||^2 == forward(x, y)."""
    crit = LPIPS(net_type=net_type)
    assert len(crit.target_layers) == n_taps
    rs = np.random.RandomState(0)
    x = rs.rand(2, 3, 64, 64).astype(np.float32) * 2 - 1
    y = rs.rand(2, 3, 64, 64).astype(np.float32) * 2 - 1
    dist = np.asarray(crit.forward(x, y))
    ex, ey = np.asarray(crit.embedding(x)), np.asarray(crit.embedding(y))
    emb_dist = np.sum((ex - ey) ** 2, axis=1)
    assert dist.shape == (2,)
    assert (dist > 0).all()
    np.testing.assert_allclose(emb_dist, dist, rtol=1e-4)


def test_lpips_vgg_still_default():
    crit = LPIPS()
    assert crit.net_type == "vgg"
    assert crit.target_layers == ["conv3_3", "conv4_3", "conv5_3"]


def test_lpips_unknown_backbone_raises():
    with pytest.raises(NotImplementedError, match="alex, squeeze, vgg"):
        LPIPS(net_type="resnet")
