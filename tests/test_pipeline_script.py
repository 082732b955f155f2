"""scripts/run_pipeline.py: the one-command project->augment->metrics->
UMAP->GIF demo runs end-to-end on synthetic data (chains the native
projector + backbone_latentaugment + sg2_metrics_analysis + umap_analysis
+ create_gif equivalents — the reference needs NVIDIA's external
projector.py for the first step, reference README.md:62-63)."""

import os
import subprocess
import sys
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
