"""scripts/verify_real_weights.py: the one-command deploy-time verifier
runs end-to-end against realistic stand-ins (round-4 VERDICT next #8 —
the real NVIDIA bytes are environment-bound; this proves the command
works the day they exist).

Stand-ins: a TorchScript VGG16 shaped like NVIDIA's vgg16.pt
(tests/test_converters_realistic._TSVGG16), a TorchScript FID detector
with the NVIDIA call signature, and a REAL persistence-wire-format SG2
pickle (tests/reference_oracles)."""

import json
import os
import subprocess
import sys

import pytest
import torch

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args):
    code = (
        "import jax; jax.config.update('jax_platforms','cpu');"
        "import runpy, sys; sys.argv = ['verify_real_weights.py'] + "
        f"{args!r};"
        "runpy.run_path('scripts/verify_real_weights.py', run_name='__main__')"
    )
    res = subprocess.run([sys.executable, "-c", code], cwd=REPO,
                         capture_output=True, text=True, timeout=900)
    rows = [json.loads(l) for l in res.stdout.strip().splitlines()
            if l.startswith("{")]
    verdict = [r for r in rows if "verdict" in r]
    checks = [r for r in rows if "artifact" in r]
    return res.returncode, checks, (verdict[0] if verdict else None)


def _by(checks, artifact, check):
    got = [r for r in checks if r["artifact"] == artifact
           and r["check"] == check]
    assert got, (artifact, check, checks)
    return got[0]


@pytest.fixture(scope="module")
def standins(tmp_path_factory):
    root = tmp_path_factory.mktemp("real_weights")
    from test_converters_realistic import _TSVGG16

    torch.manual_seed(0)
    vgg_path = str(root / "vgg16.pt")
    torch.jit.script(_TSVGG16().eval()).save(vgg_path)

    class _TSDetector(torch.nn.Module):
        """NVIDIA-signature FID detector stand-in: uint8 NCHW in,
        [N, 2048] features out via return_features=True."""

        def __init__(self):
            super().__init__()
            self.proj = torch.nn.Linear(3, 2048)

        def forward(self, x, return_features: bool = False):
            h = x.float().mean(dim=(2, 3))  # [N, 3]
            return self.proj(h)

    det_path = str(root / "inception-2015-12-05.pkl")
    torch.jit.script(_TSDetector().eval()).save(det_path)

    import reference_oracles as oracle
    g = oracle.GeneratorT(
        z_dim=64, w_dim=64, img_resolution=32, img_channels=2,
        mapping_kwargs={"num_layers": 2},
        synthesis_kwargs={"channel_base": 1024, "channel_max": 64,
                          "conv_clamp": 256.0}).eval()
    d = oracle.DiscriminatorT(img_resolution=32, img_channels=2,
                              channel_base=1024, channel_max=64,
                              conv_clamp=256.0).eval()
    pkl_path = str(root / "network-snapshot.pkl")
    with open(pkl_path, "wb") as f:
        f.write(oracle.persistence_pickle_bytes({"G_ema": g, "D": d}))
    return {"vgg16": vgg_path, "inception": det_path,
            "network_pkl": pkl_path, "outdir": str(root / "converted")}


@pytest.mark.slow
def test_vgg_and_network_lanes_pass(standins):
    rc, checks, verdict = _run(
        ["--vgg16", standins["vgg16"],
         "--network_pkl", standins["network_pkl"],
         "--outdir", standins["outdir"], "--cpu"])
    assert rc == 0, checks
    assert verdict["verdict"] == "pass" and verdict["failed"] == 0
    assert _by(checks, "vgg16", "convert")["status"] == "pass"
    fp = _by(checks, "vgg16", "forward_parity")
    assert fp["status"] == "pass" and fp["max_rel_err"] < 1e-3
    assert _by(checks, "vgg16", "lpips_distance_parity")["status"] == "pass"
    ing = _by(checks, "network_pkl", "ingest_and_synthesize")
    assert ing["status"] == "pass" and ing["has_discriminator"]
    assert _by(checks, "network_pkl",
               "discriminator_forward")["status"] == "pass"
    # Executing the pickle's torch code is opt-in; skipped by default.
    assert _by(checks, "network_pkl", "torch_golden")["status"] == "skipped"
    # Converted LPIPS weights landed where the engine looks for them.
    assert os.path.isfile(os.path.join(standins["outdir"],
                                       "vgg16_lpips.pkl"))


@pytest.mark.slow
def test_oracle_only_detector_reports_info_not_fail(standins):
    """A TorchScript detector whose state dict is not torchvision-shaped
    is oracle-only: conversion is skipped, the FID-agreement runs with
    seeded-init JAX weights, and the disagreement reports as 'info'
    (expected without converted weights), never as a fake 'pass'."""
    rc, checks, verdict = _run(
        ["--inception", standins["inception"],
         "--outdir", standins["outdir"], "--cpu"])
    assert _by(checks, "inception", "convert")["status"] == "skipped"
    agree = _by(checks, "inception", "fid_agreement")
    assert agree["status"] in ("info", "pass")
    assert "fid_torch" in agree and "fid_jax" in agree
    assert verdict["verdict"] == "pass" and rc == 0


def test_no_artifacts_is_a_failure():
    rc, checks, verdict = _run(["--cpu"])
    assert rc == 1
    assert verdict["verdict"] == "fail"
    assert verdict["note"] == "no artifact paths were given"
