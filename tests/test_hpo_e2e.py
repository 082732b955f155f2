"""End-to-end HPO trial (BASELINE config #5): dump augmented images through
the full pipeline, score FID+PR, feed the study — on synthetic data."""

import os

import numpy as np
import pytest

from synthetic import build_workspace


@pytest.mark.slow
def test_hpo_single_trial(tmp_path_factory, tmp_path, monkeypatch):
    monkeypatch.setenv("LATENTAUGMENT_CACHE_DIR", str(tmp_path / "cache"))
    ws = build_workspace(tmp_path_factory.mktemp("ws_hpo"))

    from latentaugment_tpu.analysis import hpo, sg2_metrics_opt

    # Shrink the search space so the trial is deterministic and cheap.
    monkeypatch.setattr(sg2_metrics_opt, "PARAM_SPACE", {
        "w_lpips": [0.0], "w_pix": [0.1], "w_latent": [0.001],
        "w_disc": [0.01], "opt_num_epochs": [2], "opt_lr": [0.01],
    })

    study = hpo.SimpleStudy(seed=0)
    argv = [a for a in ws["argv"]]

    def objective(trial):
        return sg2_metrics_opt.objective_recall(
            trial, n_imgs=4, argv=argv, eval_split="train")

    study.optimize(objective, n_trials=1)
    assert len(study.trials) == 1
    value = study.trials[0]["value"]
    assert value is not None and 0.0 <= value <= 1.0

    # The dump dir was scored and then removed; the metric jsonl remains.
    ckpt_dir = ws["checkpoints_dir"]
    jsonls = [f for f in os.listdir(ckpt_dir) if f.startswith("metric-")]
    assert jsonls, os.listdir(ckpt_dir)
    # The experiment dir itself was deleted after scoring.
    exp_dirs = [d for d in os.listdir(ckpt_dir)
                if os.path.isdir(os.path.join(ckpt_dir, d)) and "n_imgs" in d]
    assert exp_dirs == []
