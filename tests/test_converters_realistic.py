"""Converter tests on realistically-shaped torch artifacts (VERDICT #4).

Covers the three real-weight ingestion paths the reference exercises:
  * NVIDIA TorchScript vgg16.pt (ref augments/utils/util_latent_aug.py:35-43)
    -> vgg.convert_torchscript, checked by FORWARD parity vs the script
    module (a transpose/ordering mistake changes activations).
  * torchvision inception_v3 state dict (ref metrics/metric_utils.py:45-61)
    -> inception.convert_torchvision_state, checked leaf-exhaustively with
    distinct sentinel values (a key-mapping mistake mislabels a leaf).
  * NVIDIA persistence pickles are covered in test_torch_parity.py.
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from latentaugment_tpu.models import inception, vgg


# ---------------------------------------------------------------------------
# TorchScript VGG16


class _TSVGG16(torch.nn.Module):
    """VGG16 trunk + LPIPS lin heads shaped like the NVIDIA vgg16.pt
    (13 convs in definition order + five 1x1 lin convs)."""

    def __init__(self):
        super().__init__()
        layers = []
        c_in = 3
        for item in vgg.VGG16_PLAN:
            if item == "M":
                layers.append(torch.nn.MaxPool2d(2))
                continue
            _, c_out = item
            layers.append(torch.nn.Conv2d(c_in, c_out, 3, padding=1))
            layers.append(torch.nn.ReLU())
            c_in = c_out
        self.layers = torch.nn.Sequential(*layers)
        for i, tap in enumerate(vgg.LPIPS_TAPS):
            setattr(self, f"lin{i}",
                    torch.nn.Conv2d(vgg.LPIPS_CHANNELS[tap], 1, 1, bias=False))

    def forward(self, x):
        return self.layers(x)


@pytest.fixture(scope="module")
def ts_vgg(tmp_path_factory):
    torch.manual_seed(0)
    mod = _TSVGG16().eval()
    path = tmp_path_factory.mktemp("ts") / "vgg16.pt"
    torch.jit.script(mod).save(str(path))
    return mod, str(path)


def test_convert_torchscript_forward_parity(ts_vgg):
    """Converted params must reproduce the script module's activations —
    catches conv ordering, weight transposes, and bias mix-ups."""
    mod, path = ts_vgg
    params = vgg.convert_torchscript(path)
    x = np.random.RandomState(0).randn(2, 3, 32, 32).astype(np.float32)

    # Torch-side: forward and record the LPIPS tap activations.
    taps_t = {}
    with torch.no_grad():
        h = torch.from_numpy(x)
        conv_i = 0
        plan_names = [it[0] for it in vgg.VGG16_PLAN if it != "M"]
        for layer in mod.layers:
            h = layer(h)
            if isinstance(layer, torch.nn.ReLU):
                name = plan_names[conv_i]
                if name in vgg.LPIPS_TAPS:
                    taps_t[name] = h.numpy()
                conv_i += 1

    acts = vgg.vgg_features(params, jnp.asarray(x), taps=vgg.LPIPS_TAPS,
                            input_range="unit")
    for tap in vgg.LPIPS_TAPS:
        np.testing.assert_allclose(np.asarray(acts[tap]), taps_t[tap],
                                   rtol=1e-4, atol=1e-5)


def test_convert_torchscript_lin_weights(ts_vgg):
    """lin heads map onto params['lin'][tap] in tap order, |.|-rectified."""
    mod, path = ts_vgg
    params = vgg.convert_torchscript(path)
    assert set(params["lin"]) == set(vgg.LPIPS_TAPS)
    for i, tap in enumerate(vgg.LPIPS_TAPS):
        want = np.abs(getattr(mod, f"lin{i}").weight.detach().numpy()
                      .reshape(-1))
        np.testing.assert_allclose(params["lin"][tap], want)
        assert params["lin"][tap].shape == (vgg.LPIPS_CHANNELS[tap],)


def test_lpips_embedding_matches_richzhang_formula(ts_vgg):
    """Our embedding property (||f(x)-f(y)||^2 == LPIPS) vs the richzhang
    definition computed in torch on the same converted weights: per tap,
    spatial mean of lin-weighted squared diff of unit-normalized acts."""
    mod, path = ts_vgg
    params = vgg.convert_torchscript(path)
    rs = np.random.RandomState(1)
    x = rs.randn(2, 3, 32, 32).astype(np.float32)
    y = rs.randn(2, 3, 32, 32).astype(np.float32)

    def torch_taps(a):
        out = {}
        with torch.no_grad():
            h = torch.from_numpy(a)
            conv_i = 0
            plan_names = [it[0] for it in vgg.VGG16_PLAN if it != "M"]
            for layer in mod.layers:
                h = layer(h)
                if isinstance(layer, torch.nn.ReLU):
                    name = plan_names[conv_i]
                    if name in vgg.LPIPS_TAPS:
                        out[name] = h.clone()
                    conv_i += 1
        return out

    tx, ty = torch_taps(x), torch_taps(y)
    dist_t = np.zeros(2, np.float32)
    for i, tap in enumerate(vgg.LPIPS_TAPS):
        na = tx[tap] / (tx[tap].square().sum(1, keepdim=True) + 1e-10).sqrt()
        nb = ty[tap] / (ty[tap].square().sum(1, keepdim=True) + 1e-10).sqrt()
        lin = torch.from_numpy(np.asarray(params["lin"][tap]))
        d = (lin.reshape(1, -1, 1, 1) * (na - nb).square()).sum(1)
        dist_t += d.mean(dim=(1, 2)).numpy()

    dist_j = np.asarray(vgg.lpips_distance(params, jnp.asarray(x),
                                           jnp.asarray(y),
                                           input_range="unit"))
    np.testing.assert_allclose(dist_j, dist_t, rtol=1e-4, atol=1e-6)


# ---------------------------------------------------------------------------
# torchvision inception_v3 state dict


def _leaf_paths(tree, prefix=()):
    for k, v in tree.items():
        if isinstance(v, dict):
            yield from _leaf_paths(v, prefix + (k,))
        else:
            yield prefix + (k,), v


def test_inception_state_exhaustive_sentinels():
    """Build a COMPLETE torchvision-named state dict with a distinct
    sentinel per leaf; after conversion every tree leaf must hold exactly
    its own sentinel — any key-mapping slip mislabels at least one."""
    ref = inception.init_inception(seed=0)
    state = {}
    sentinels = {}
    for i, (path, leaf) in enumerate(_leaf_paths(ref)):
        name = ".".join(path)
        val = np.full(np.shape(leaf), float(i + 1), np.float32)
        state[name] = torch.from_numpy(val)
        sentinels[path] = float(i + 1)
    # Plus the torchvision keys we must ignore.
    state["fc.weight"] = torch.zeros(1000, 2048)
    state["fc.bias"] = torch.zeros(1000)
    state["AuxLogits.fc.weight"] = torch.zeros(10, 768)
    state["Conv2d_1a_3x3.bn.num_batches_tracked"] = torch.tensor(7)

    out = inception.convert_torchvision_state(state, strict=True)
    for path, want in sentinels.items():
        node = out
        for k in path:
            node = node[k]
        got = np.asarray(node)
        assert np.all(got == want), f"leaf {'.'.join(path)} mislabeled"


def test_inception_state_strict_rejects_unknown_and_shape():
    ref = inception.init_inception(seed=0)
    with pytest.raises(KeyError):
        inception.convert_torchvision_state(
            {"Mixed_5b.branchNEW.conv.weight": torch.zeros(1, 1, 1, 1)},
            strict=True)
    w = ref["Conv2d_1a_3x3"]["conv"]["weight"]
    bad = torch.zeros(tuple(reversed(w.shape)))  # transposed layout
    with pytest.raises(ValueError, match="shape mismatch"):
        inception.convert_torchvision_state(
            {"Conv2d_1a_3x3.conv.weight": bad}, strict=True)


def test_checkpoint_2d_filters_factor_to_separable():
    """Converters factor the stored 2-D rank-1 resample filter to 1-D taps
    so the runtime FIR runs separably (half the shift-add work)."""
    from latentaugment_tpu.ops.upfirdn2d import separable_factor

    taps = np.array([1, 3, 3, 1], np.float64)
    taps = taps / taps.sum()
    f2d = np.outer(taps, taps)
    fac = separable_factor(f2d)
    assert fac is not None and fac.shape == (4,)
    np.testing.assert_allclose(np.outer(fac, fac), f2d, atol=1e-7)
    # Non-rank-1 filters pass through as None.
    assert separable_factor(np.eye(4)) is None
    # Asymmetric rank-1 (outer(a,b), a!=b) is rejected too: the separable
    # FIR path applies the same taps on both axes.
    assert separable_factor(np.outer([1, 2, 1], [1, 3, 1])) is None
