"""scripts/run_pipeline.py: the one-command project->augment->metrics->
UMAP->GIF demo runs end-to-end on synthetic data (chains the native
projector + backbone_latentaugment + sg2_metrics_analysis + umap_analysis
+ create_gif equivalents — the reference needs NVIDIA's external
projector.py for the first step, reference README.md:62-63)."""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_pipeline_end_to_end():
    env = dict(os.environ, LATAUG_PIPELINE_FORCE_CPU="1")
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "run_pipeline.py"),
         "--synthetic", "--n_imgs", "4",
         "--project", "--project_steps", "4", "--project_batch", "4"],
        capture_output=True, text=True, timeout=1500, env=env, cwd=REPO)
    assert res.returncode == 0, res.stdout[-3000:] + res.stderr[-3000:]
    out = res.stdout
    # Stage 0 inverted the synthetic split and the walk consumed ITS zip
    # (the policy would crash on a missing/odd projected zip: the
    # engine opens interim/<ds>/<dataset_w_name>.zip at startup).
    assert "[pipeline] projecting" in out
    assert "[project] done: 12 slices" in out
    assert "-projected.zip" in out
    assert "fid50k_full/MR_nonrigid_CT" in out
    assert "UMAP coverage plot" in out
    assert "trajectory GIFs" in out
    assert "DONE" in out
    outdir = out.split("DONE — outputs under ")[-1].strip()
    assert os.path.isfile(os.path.join(outdir, "pipeline_metrics.json"))
    assert os.path.isfile(os.path.join(outdir, "umap_coverage.png"))


@pytest.mark.slow
def test_pipeline_end_to_end_sg3():
    """--arch stylegan3: the one-command pipeline over an alias-free
    checkpoint — projector, walk, and metrics all dispatch on the saved
    arch tag (round-4 VERDICT weak #4: no test drove SG3 through
    run_pipeline)."""
    env = dict(os.environ, LATAUG_PIPELINE_FORCE_CPU="1")
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "run_pipeline.py"),
         "--synthetic", "--arch", "stylegan3", "--n_imgs", "4",
         "--project", "--project_steps", "4", "--project_batch", "4"],
        capture_output=True, text=True, timeout=1800, env=env, cwd=REPO)
    assert res.returncode == 0, res.stdout[-3000:] + res.stderr[-3000:]
    out = res.stdout
    assert "[pipeline] projecting" in out
    assert "-projected.zip" in out
    assert "fid50k_full/MR_nonrigid_CT" in out
    assert "DONE" in out


@pytest.mark.slow
def test_pipeline_with_native_training():
    """--train closes the loop the reference spreads across NVIDIA's
    external trainer + projector + four backbones (reference
    README.md:55-63): ONE command trains a StyleGAN2, snapshots it,
    re-inverts the dataset against the fresh generator, walks the
    policy from those latents, and scores FID/PR — every artifact
    produced and consumed natively (round-3 VERDICT #1)."""
    import glob
    import json

    env = dict(os.environ, LATAUG_PIPELINE_FORCE_CPU="1")
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "run_pipeline.py"),
         "--synthetic", "--n_imgs", "4", "--train", "--train_kimg", "0.02",
         "--project", "--project_steps", "4", "--project_batch", "4"],
        capture_output=True, text=True, timeout=1800, env=env, cwd=REPO)
    assert res.returncode == 0, res.stdout[-3000:] + res.stderr[-3000:]
    out = res.stdout
    # The artifact CHAIN: trainer snapshot -> projector consumed it ->
    # projected zip -> policy consumed it -> metrics on the walk output.
    assert "[pipeline] training StyleGAN2 on" in out
    snap_line = [ln for ln in out.splitlines()
                 if "trained snapshot:" in ln][0]
    snap = snap_line.split("trained snapshot: ")[-1].strip()
    assert os.path.isfile(snap) and "network-snapshot-" in snap
    assert "[pipeline] projecting" in out
    assert "-projected.zip" in out
    assert "fid50k_full/MR_nonrigid_CT" in out
    assert "DONE" in out
    outdir = out.split("DONE — outputs under ")[-1].strip()
    # Trainer left its run log; the metrics stage wrote real numbers.
    train_dir = os.path.join(outdir, "train")
    assert os.path.isfile(os.path.join(train_dir, "log.jsonl"))
    assert glob.glob(os.path.join(train_dir, "training-state-*.pkl"))
    with open(os.path.join(outdir, "pipeline_metrics.json")) as f:
        metrics = json.load(f)
    fids = [r["results"]["fid50k_full"] for r in metrics
            if r["metric"] == "fid50k_full"]
    assert len(fids) == 2 and all(np.isfinite(f) for f in fids)


def test_carry_vgg_env_survives_model_dir_overwrite(tmp_path, monkeypatch):
    """--train replaces opt.model_dir with a snapshot FILE; the LPIPS
    VGG must be resolved from the ORIGINAL layout first and pinned in
    the env (round-4 review: a file-path model_dir made resolve_vgg_path
    return None -> silent random-init VGG in projector AND walk)."""
    sys.path.insert(0, REPO)
    from scripts.run_pipeline import carry_vgg_env

    layout = tmp_path / "models"
    layout.mkdir()
    vgg = layout / "vgg16_lpips.pkl"
    vgg.write_bytes(b"x")
    monkeypatch.delenv("LATENTAUGMENT_VGG16", raising=False)
    got = carry_vgg_env(str(layout))
    assert got == str(vgg)
    assert os.environ["LATENTAUGMENT_VGG16"] == str(vgg)
    # An explicit env var always wins (never clobbered).
    monkeypatch.setenv("LATENTAUGMENT_VGG16", "/explicit.pkl")
    assert carry_vgg_env(str(layout)) == "/explicit.pkl"
    # No VGG in the layout -> None, env untouched.
    monkeypatch.delenv("LATENTAUGMENT_VGG16", raising=False)
    assert carry_vgg_env(str(tmp_path / "empty")) is None
    assert "LATENTAUGMENT_VGG16" not in os.environ
