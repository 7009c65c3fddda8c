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


@pytest.mark.slow
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

    # best_model.ckpt is slim (inference payload) and refuses resume fast;
    # the rolling resume_state.ckpt carries the full state
    best = load_checkpoint(os.path.join(cfg["checkpoint_dir"], "best_model.ckpt"))
    assert best.get("slim") and "opt_state" not in best
    rs = load_checkpoint(os.path.join(cfg["checkpoint_dir"], "resume_state.ckpt"))
    assert rs["epoch"] == 2 and "opt_state" in rs and "raw_params" in rs
    with pytest.raises(ValueError, match="slim"):
        fit(_smoke_config(tmp_path, num_epochs=3), regime="base", smoke=2,
            resume_from=os.path.join(cfg["checkpoint_dir"], "best_model.ckpt"))

    # resume for 1 more epoch; step counter continues from 4
    cfg2 = _smoke_config(tmp_path, num_epochs=3)
    fit(cfg2, regime="base", smoke=2, resume_from=ck_path)
    ck3 = load_checkpoint(os.path.join(cfg2["checkpoint_dir"], "checkpoint_epoch_3.ckpt"))
    assert ck3["epoch"] == 3 and ck3["step"] == 6


@pytest.mark.slow
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


def test_host_state_roundtrip():
    """ReduceLROnPlateau + EarlyStopping survive the checkpoint (round-2 gap:
    a resumed base run restarted at scale 1.0 and a resumed optimized run
    forgot its patience counter)."""
    import json

    from image_caption_tpu.train.driver import _host_state, _load_host_state
    from image_caption_tpu.train.optim import EarlyStopping
    from image_caption_tpu.train.schedules import ReduceLROnPlateau

    p = ReduceLROnPlateau(factor=0.5, patience=1)
    for m in (1.0, 0.9, 0.8):  # two bad epochs -> decay
        p.step(m)
    assert p.scale == 0.5
    e = EarlyStopping(patience=5)
    e.step(1.0)
    e.step(0.5)
    assert e.counter == 1

    blob = _host_state(p, e)
    json.loads(blob)  # must be valid JSON (inf/None round-trip)
    p2, e2 = ReduceLROnPlateau(factor=0.5, patience=1), EarlyStopping(patience=5)
    _load_host_state({"host_state": blob}, p2, e2)
    assert p2.state_dict() == p.state_dict()
    assert e2.state_dict() == e.state_dict()


@pytest.mark.slow
def test_resume_restores_plateau_and_saves_host_state(tmp_path):
    from image_caption_tpu.train.driver import fit
    from image_caption_tpu.utils.checkpoint import load_checkpoint

    cfg = _smoke_config(tmp_path)
    fit(cfg, regime="base", smoke=2)
    ck = load_checkpoint(os.path.join(cfg["checkpoint_dir"], "checkpoint_epoch_2.ckpt"))
    import json
    hs = json.loads(ck["host_state"])
    assert hs["plateau"] is not None and "scale" in hs["plateau"]


@pytest.mark.slow
def test_scst_resume(tmp_path):
    """fit_scst accepts resume_from (the reference SCST ckpt saves scheduler
    state, train_vit_transformer_scst_optimized.py:509-520); step counter and
    best CIDEr continue; the logged LR accounts for grad accumulation."""
    import json

    from image_caption_tpu.train.driver import fit, fit_scst
    from image_caption_tpu.train.schedules import warmup_cosine_schedule
    from image_caption_tpu.utils.checkpoint import load_checkpoint

    cfg = _smoke_config(tmp_path)
    fit(cfg, regime="base", smoke=2)
    best = os.path.join(cfg["checkpoint_dir"], "best_model.ckpt")

    scfg = _smoke_config(
        tmp_path,
        num_epochs=1,
        pretrained_checkpoint=best,
        checkpoint_dir=str(tmp_path / "scst"),
        accumulation_steps=2,
        learning_rate=5e-6,
        warmup_ratio=0.1,
        reward_type="cider",
        use_augmentation=False,
    )
    fit_scst(scfg, smoke=2)
    # best_model.ckpt is now the slim inference payload; the full resume state
    # rolls in resume_state.ckpt every epoch (round-3 weak #4: 1.8 GB best
    # writes sat on the epoch critical path).
    best_path = os.path.join(scfg["checkpoint_dir"], "best_model.ckpt")
    best = load_checkpoint(best_path)
    assert best.get("slim") and "opt_state" not in best and "raw_params" not in best
    sck_path = os.path.join(scfg["checkpoint_dir"], "resume_state.ckpt")
    assert os.path.exists(sck_path)
    sck = load_checkpoint(sck_path)
    assert sck["step"] == 2  # 2 micro-steps
    assert json.loads(sck["host_state"])["early"] is not None

    # logged LR = schedule at ACCUMULATED steps (micro-steps // accum)
    hist = json.loads(open(os.path.join(scfg["checkpoint_dir"], "metrics_history.json")).read())
    total = 1 * max(2 // 2, 1)
    sched = warmup_cosine_schedule(5e-6, int(total * 0.1), total)
    assert hist["lr"][-1] == pytest.approx(float(sched(min(2 // 2, total))), rel=1e-6)

    scfg2 = dict(scfg, num_epochs=2)
    out = fit_scst(scfg2, smoke=2, resume_from=sck_path)
    assert np.isfinite(out["best_cider"])
    sck2 = load_checkpoint(sck_path)
    assert sck2["step"] >= sck["step"]
