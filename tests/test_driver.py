"""End-to-end driver tests (tiny smoke configs over the reference manifests):
base fit, resume, and SCST chained from the XE checkpoint."""

import os

import numpy as np
import pytest

DATA = "/root/reference/data"

pytestmark = pytest.mark.skipif(not os.path.exists(DATA), reason="reference manifests not mounted")


def _smoke_config(tmp_path, **over):
    cfg = dict(
        data_dir=DATA,
        vocab_path=os.path.join(DATA, "vocab.json"),
        batch_size=4,
        max_len=52,
        model_type="grid_transformer",
        d_model=32,
        nhead=4,
        num_decoder_layers=1,
        num_encoder_layers=1,
        dim_feedforward=64,
        dropout=0.1,
        resnet_stages=(1, 1, 1, 1),
        pretrained_cnn=False,
        num_epochs=2,
        learning_rate=1e-3,
        grad_clip=1.0,
        checkpoint_dir=str(tmp_path / "ckpt"),
        use_tensorboard=False,
        save_every=1,
        seed=42,
    )
    cfg.update(over)
    return cfg


def test_fit_and_resume(tmp_path):
    from image_caption_tpu.train.driver import fit
    from image_caption_tpu.utils.checkpoint import load_checkpoint

    cfg = _smoke_config(tmp_path)
    fit(cfg, regime="base", smoke=2)
    ck_path = os.path.join(cfg["checkpoint_dir"], "checkpoint_epoch_2.ckpt")
    assert os.path.exists(ck_path)
    ck = load_checkpoint(ck_path)
    assert ck["epoch"] == 2 and ck["step"] == 4
    assert "opt_state" in ck and "raw_params" in ck and "config" in ck

    # resume for 1 more epoch; step counter continues from 4
    cfg2 = _smoke_config(tmp_path, num_epochs=3)
    fit(cfg2, regime="base", smoke=2, resume_from=ck_path)
    ck3 = load_checkpoint(os.path.join(cfg2["checkpoint_dir"], "checkpoint_epoch_3.ckpt"))
    assert ck3["epoch"] == 3 and ck3["step"] == 6


def test_scst_from_xe_checkpoint(tmp_path):
    from image_caption_tpu.train.driver import fit, fit_scst

    cfg = _smoke_config(tmp_path)
    fit(cfg, regime="base", smoke=2)
    best = os.path.join(cfg["checkpoint_dir"], "best_model.ckpt")
    assert os.path.exists(best)

    scfg = _smoke_config(
        tmp_path,
        num_epochs=1,
        pretrained_checkpoint=best,
        checkpoint_dir=str(tmp_path / "scst"),
        accumulation_steps=1,
        reward_type="cider",
        use_augmentation=False,
    )
    out = fit_scst(scfg, smoke=2)
    assert np.isfinite(out["best_cider"])


def test_rl_metrics_history_dashboard(tmp_path):
    """RLMetricsHistory reproduces the reference's 8-panel dashboard + summary
    (train_vit_transformer_scst_optimized.py:57-163): same add() surface,
    plot_and_save(save_path) writes the PNG, JSON dump keeps all curves."""
    from image_caption_tpu.utils.logging import RLMetricsHistory

    h = RLMetricsHistory()
    for ep in (1, 2, 3):
        h.add(ep, 0.5 + 0.1 * ep, 0.45 + 0.1 * ep, 0.05, 
              {"CIDEr": 1.0 + 0.1 * ep, "METEOR": 0.3, "ROUGE_L": 0.5}, lr=5e-6 / ep)
    png = tmp_path / "scst_optimized_training_metrics.png"
    h.plot_and_save(str(png))
    assert png.exists() and png.stat().st_size > 10_000
    h.save_json(str(tmp_path / "hist.json"))
    import json as J
    data = J.loads((tmp_path / "hist.json").read_text())
    assert len(data["CIDEr"]) == 3 and len(data["lr"]) == 3 and len(data["epoch"]) == 3
