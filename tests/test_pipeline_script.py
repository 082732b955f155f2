"""scripts/run_pipeline.py: the one-command augment->metrics->UMAP->GIF
demo runs end-to-end on synthetic data (chains backbone_latentaug +
sg2_metrics_analysis + umap_analysis + create_gif equivalents)."""

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
         "--synthetic", "--n_imgs", "4"],
        capture_output=True, text=True, timeout=1500, env=env, cwd=REPO)
    assert res.returncode == 0, res.stdout[-3000:] + res.stderr[-3000:]
    out = res.stdout
    assert "fid50k_full/MR_nonrigid_CT" in out
    assert "UMAP coverage plot" in out
    assert "trajectory GIFs" in out
    assert "DONE" in out
    outdir = out.split("DONE — outputs under ")[-1].strip()
    assert os.path.isfile(os.path.join(outdir, "pipeline_metrics.json"))
    assert os.path.isfile(os.path.join(outdir, "umap_coverage.png"))
