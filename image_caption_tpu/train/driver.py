"""Training drivers — the reference's six ``train_*`` scripts as one engine.

Regimes (SURVEY §2.6):
- ``fit(config, regime='base')``      = train_vit/grid_transformer.py:
  Adam (vit: β=(0.9,0.98) eps 1e-9), CE loss, clip 5.0, ReduceLROnPlateau(max,
  0.5, patience 3) on val CIDEr stepped per epoch, backbone unfreeze at
  ``unfreeze_epoch`` with a fresh optimizer and backbone-lr x factor, best-by-
  CIDEr + periodic checkpoints, metric plots, final test-set eval.
- ``fit(config, regime='optimized')`` = train_*_optimized.py:
  label smoothing, AdamW wd, per-step warmup-cosine, EMA per step with shadow
  applied around eval/ckpt, optional R-Drop, grad accumulation
  (optax.MultiSteps), strong augmentation, early stopping on CIDEr.
- ``fit_scst(config)``                = train_*_scst_optimized.py:
  loads the XE checkpoint, SCST with CIDEr reward and greedy baseline, AdamW
  lr 5e-6, accum 2, EMA 0.9999, warmup-cosine by ratio, early stop patience 8,
  generate-only validation.

``smoke`` caps steps/batches per phase so every driver runs end-to-end in
seconds on CPU (the repo's verification path); `None` = full run.
"""

from __future__ import annotations

import os
import time
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from image_caption_tpu.data.dataset import create_data_loaders
from image_caption_tpu.data.vocab import Vocab
from image_caption_tpu.decode import engine
from image_caption_tpu.eval.evaluator import COCOScoreEvaluator
from image_caption_tpu.models.captioner import GridCaptioningModel
from image_caption_tpu.models.runtime import build_module
from image_caption_tpu.train import steps as S
from image_caption_tpu.train.optim import (
    EMA,
    EarlyStopping,
    label_params_by_prefix,
    make_optimizer,
    set_learning_rate,
)
from image_caption_tpu.train.schedules import ReduceLROnPlateau, warmup_cosine_schedule
from image_caption_tpu.train.scst import get_reference_captions, make_reward
from image_caption_tpu.utils.checkpoint import load_checkpoint, restore_into, save_checkpoint
from image_caption_tpu.utils.logging import (
    AverageMeter,
    Logger,
    MetricsHistory,
    RLMetricsHistory,
    ThroughputMeter,
)


def _frozen_prefix(config) -> str:
    return "encoder/cnn" if config.get("model_type") == "grid_transformer" else "encoder/vit"


def _apply_rng_impl(config) -> None:
    """Select the PRNG implementation for this run (config key ``rng_impl``).

    Default ``rbg`` (XLA RngBitGenerator — the TPU's hardware RNG): threefry
    dropout-mask generation measured 31 ms of a 126 ms b=256 grid train step
    on the v5e (XLA recomputes the masks in the backward, doubling the 16 ms
    forward cost; scripts/bench_train_step.py --split / --rng-impl), and rbg
    removes it: 95.3 ms/step, MFU 0.31 -> 0.41.  ``threefry2x32`` restores
    the portable counter-based stream (`--set rng_impl=threefry2x32`); mask
    STREAMS differ between impls, so fixed-seed curves are not comparable
    across the switch (resume within a run is — the impl rides the config).
    """
    config.setdefault("rng_impl", "rbg")  # pin into the run config -> persisted in checkpoints
    jax.config.update("jax_default_prng_impl", config["rng_impl"])


def _pin_rng_impl_from_resume(config, resume_ck) -> None:
    """A checkpoint written before ``rng_impl`` existed was trained under the
    old threefry default — resuming it must NOT silently switch the dropout
    mask stream to rbg mid-run (mask streams differ between impls).  The
    caller's explicit ``rng_impl`` (if any) still wins."""
    if "rng_impl" not in config:
        config["rng_impl"] = resume_ck.get("config", {}).get("rng_impl", "threefry2x32")


def _build(config, vocab):
    _apply_rng_impl(config)
    module = build_module(len(vocab), config)
    rng = jax.random.PRNGKey(config.get("seed", 42))
    # jit the whole init: one compiled program instead of thousands of
    # individually-dispatched ops (a ~200s -> ~20s difference on a tunneled TPU)
    variables = jax.jit(module.init)(
        {"params": rng, "dropout": rng},
        jnp.zeros((1, 224, 224, 3)), jnp.zeros((1, 4), jnp.int32), jnp.array([4], jnp.int32),
    )
    if config.get("pretrained_vit", False) or config.get("pretrained_cnn", False):
        try:
            from image_caption_tpu.utils.port_torch import load_pretrained_backbone_into

            variables = load_pretrained_backbone_into(module, variables)
            print("loaded pretrained backbone weights")
        except Exception as e:
            print(f"note: pretrained backbone unavailable ({type(e).__name__}: {e}); random init")
    return module, variables


def _pad_batch(batch: Dict[str, np.ndarray], to: int, pad_id: int) -> Dict[str, np.ndarray]:
    """Pad a ragged batch to ``to`` rows: zero images, all-<pad> captions,
    length 1 (a valid length that keeps every mask construction in range)."""
    n = len(batch["length"])
    m = to - n
    return {
        "image": np.concatenate([batch["image"], np.zeros((m,) + batch["image"].shape[1:], batch["image"].dtype)]),
        "caption": np.concatenate([batch["caption"], np.full((m, batch["caption"].shape[1]), pad_id, batch["caption"].dtype)]),
        "length": np.concatenate([batch["length"], np.ones((m,), batch["length"].dtype)]),
    }


def validate(
    module,
    variables,
    loader,
    vocab: Vocab,
    eval_step,
    *,
    max_len: int = 52,
    max_batches: Optional[int] = None,
    include_loss: bool = True,
    evaluator: Optional[COCOScoreEvaluator] = None,
) -> Dict[str, float]:
    """Per-epoch validation: teacher-forced loss + greedy decode + COCO metrics
    (reference validate, train_vit_transformer.py:194-272)."""
    evaluator = evaluator or COCOScoreEvaluator()
    loss_meter = AverageMeter()
    gts: Dict[int, Any] = {}
    res: Dict[int, Any] = {}
    img_id = 0
    full_bsz = getattr(loader, "batch_size", None)
    for bi, batch in enumerate(loader):
        if max_batches is not None and bi >= max_batches:
            break
        n = len(batch["length"])
        if full_bsz is not None and n < full_bsz:
            # Pad the ragged final batch to the loader's batch size so eval
            # keeps ONE compiled shape per run (each new shape is a fresh jit
            # of eval_step + greedy_decode — 5-90 s through the TPU tunnel).
            # Padded rows are all-<pad> captions: they contribute zero tokens
            # to the pad-masked loss (exact, not approximate) and are sliced
            # out of gts/res below.
            batch = _pad_batch(batch, full_bsz, vocab.pad_id)
        jb = {k: jnp.asarray(v) for k, v in batch.items()}
        loss, memory = eval_step(variables, jb)
        if include_loss:
            loss_meter.update(float(loss), n=n)
        tokens = np.asarray(
            engine.greedy_decode(
                module, variables, memory,
                start_id=vocab.start_id, end_id=vocab.end_id, max_len=max_len,
            )
        )
        for row, ref_row in zip(tokens[:n], batch["caption"][:n]):
            res[img_id] = [vocab.decode_to_text(row)]
            gts[img_id] = [vocab.decode_to_text(ref_row)]
            img_id += 1
    scores = evaluator.evaluate(gts, res)
    if include_loss:
        scores["loss"] = loss_meter.avg
    return scores


def _variables_of(state: S.TrainState, ema: Optional[EMA]) -> Dict:
    params = state.params
    if ema is not None and state.ema is not None:
        params = ema.apply_shadow(state.ema, state.params)
    return {"params": params, "batch_stats": state.batch_stats}


def _host_state(plateau=None, early=None) -> str:
    """JSON-encoded host-side scheduler/stopper state (ReduceLROnPlateau +
    EarlyStopping), persisted like the reference SCST checkpoint's scheduler
    state (train_vit_transformer_scst_optimized.py:509-520).  JSON (not the
    msgpack pytree) because the fields include None/inf host scalars."""
    import json

    return json.dumps(
        {
            "plateau": plateau.state_dict() if plateau is not None else None,
            "early": early.state_dict() if early is not None else None,
        }
    )


def _load_host_state(ck: Dict[str, Any], plateau=None, early=None) -> None:
    import json

    hs = json.loads(ck["host_state"]) if ck.get("host_state") else {}
    if plateau is not None and hs.get("plateau"):
        plateau.load_state_dict(hs["plateau"])
    if early is not None and hs.get("early"):
        early.load_state_dict(hs["early"])


def _config_meta(config):
    return {k: v for k, v in config.items() if isinstance(v, (int, float, str, bool, list, tuple, type(None)))}


def _full_payload(state, ema, config, epoch, scores, best_cider, plateau=None, early=None):
    """Full resume payload: raw params + optimizer + EMA shadow + host state."""
    from flax import serialization as _ser

    payload = {
        "host_state": _host_state(plateau, early),
        "step": int(state.step),
        "epoch": epoch,
        "params": _variables_of(state, ema)["params"],  # EMA baked in, like the ref
        "raw_params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": _ser.to_state_dict(state.opt_state),
        "best_cider": float(best_cider),
        "scores": {k: float(v) for k, v in scores.items()},
        "config": _config_meta(config),
    }
    if state.ema is not None:
        payload["ema_shadow"] = state.ema.shadow
    return payload


def _slim_payload(state, ema, config, epoch, scores, best_cider):
    """Inference-only best payload (params + config + scores) — what
    scripts/inference.py needs to rebuild and run the model; ~4x smaller than
    the full resume state (no raw params / optimizer moments / EMA shadow).
    Resume uses the rolling ``resume_state.ckpt`` instead."""
    return {
        "slim": True,
        "epoch": epoch,
        "params": _variables_of(state, ema)["params"],
        "batch_stats": state.batch_stats,
        "best_cider": float(best_cider),
        "scores": {k: float(v) for k, v in scores.items()},
        "config": _config_meta(config),
    }


class _AsyncSaver:
    """Background checkpoint writer: msgpack encode + disk write (the bulk of
    the 1.8 GB/epoch critical-path cost flagged in round 3) overlap the next
    epoch's compute.  The device->host fetch happens synchronously in
    ``submit`` — it must: the train step donates the state buffers, so a
    background fetch of ``state`` races the next epoch's first step
    (use-after-donate; observed as a backend InvalidArgument crash on the
    tunneled TPU).  Fetching also snapshots host scalars, so later mutation of
    plateau/early/state cannot race the writer.  ``submit`` joins the previous
    write first: at most one write in flight, writes land in order."""

    def __init__(self):
        self._thread = None
        self.blocked_s = 0.0

    def submit(self, path: str, payload: Dict[str, Any]) -> None:
        import threading

        def fetch(v):
            return np.asarray(v) if isinstance(v, jax.Array) else v

        t0 = time.time()
        payload = {k: jax.tree_util.tree_map(fetch, v) for k, v in payload.items()}
        self.blocked_s += time.time() - t0
        self.wait()
        t = threading.Thread(target=save_checkpoint, args=(path, payload), daemon=True)
        t.start()
        self._thread = t

    def wait(self) -> None:
        if self._thread is not None:
            t0 = time.time()
            self._thread.join()
            self._thread = None
            self.blocked_s += time.time() - t0


def _save(path, state, ema, config, epoch, scores, best_cider, plateau=None, early=None):
    save_checkpoint(path, _full_payload(state, ema, config, epoch, scores, best_cider, plateau, early))


def _restore_state(state: S.TrainState, ck: Dict[str, Any], ema) -> S.TrainState:
    """Deterministic resume: params (RAW, not EMA-baked), opt state, EMA shadow,
    step counter."""
    from flax import serialization as _ser

    if ck.get("slim") or ("raw_params" not in ck and ck.get("opt_state") is None):
        raise ValueError(
            "checkpoint is a slim inference payload (no raw_params/opt_state); "
            "resume from the rolling resume_state.ckpt (written every epoch) or a "
            "periodic checkpoint_epoch_N.ckpt instead"
        )
    params = restore_into(state.params, ck.get("raw_params", ck["params"]))
    new = state.replace(
        step=jnp.asarray(ck.get("step", 0), dtype=jnp.int32),
        params=params,
    )
    if ck.get("batch_stats") and state.batch_stats:
        new = new.replace(batch_stats=restore_into(state.batch_stats, ck["batch_stats"]))
    if ck.get("opt_state") is not None:
        new = new.replace(opt_state=_ser.from_state_dict(state.opt_state, ck["opt_state"]))
    if ema is not None and state.ema is not None and ck.get("ema_shadow") is not None:
        new = new.replace(
            ema=state.ema.replace(shadow=restore_into(state.ema.shadow, ck["ema_shadow"]))
        )
    return new


def fit(
    config: Dict[str, Any],
    regime: str = "base",
    smoke: Optional[int] = None,
    resume_from: Optional[str] = None,
) -> Dict[str, float]:
    """XE training (base or optimized regime). Returns final test scores.

    ``resume_from``: checkpoint path for deterministic mid-run resume (step
    counter, optimizer state, EMA shadow and per-epoch shuffle seeds all
    restored — an upgrade over the reference, which could only start SCST from
    an XE checkpoint, SURVEY §5).
    """
    assert regime in ("base", "optimized")
    t_start = time.time()
    vocab = Vocab.load(config["vocab_path"])
    train_loader, val_loader, test_loader = create_data_loaders(
        data_dir=config.get("data_dir", "data"),
        vocab_path=config["vocab_path"],
        batch_size=config.get("batch_size", 32),
        max_len=config.get("max_len", 52) - 2,
        seed=config.get("seed", 42),
        drop_last_train=(regime == "optimized"),
    )
    start_epoch = 1
    resume_ck = None
    if resume_from:
        resume_ck = load_checkpoint(resume_from)
        _pin_rng_impl_from_resume(config, resume_ck)
        start_epoch = int(resume_ck.get("epoch", 0)) + 1
        print(f"resuming from {resume_from} at epoch {start_epoch} (step {resume_ck.get('step')})")
    module, variables = _build(config, vocab)
    frozen = _frozen_prefix(config)
    pad_id = vocab.pad_id
    num_epochs = config.get("num_epochs", 30)
    steps_per_epoch = smoke or len(train_loader)
    ckpt_dir = config.get("checkpoint_dir", "checkpoints")
    os.makedirs(ckpt_dir, exist_ok=True)
    logger = Logger(config.get("log_dir"), config.get("use_tensorboard", False))

    # -- optimizer ----------------------------------------------------------
    def make_tx(unfrozen: bool):
        labels = label_params_by_prefix(
            variables["params"], {frozen: ("encoder" if unfrozen else "frozen")}
        )
        factor_key = "cnn_lr_factor" if config.get("model_type") == "grid_transformer" else "encoder_lr_factor"
        if regime == "base":
            is_vit = config.get("model_type", "vit_transformer") == "vit_transformer"
            return make_optimizer(
                config.get("learning_rate", 1e-4),
                kind="adam",
                b1=0.9, b2=0.98 if is_vit else 0.999, eps=1e-9 if is_vit else 1e-8,
                clip_norm=config.get("grad_clip", 5.0),
                param_labels=labels,
                lr_factors={"encoder": config.get(factor_key, 0.1)},
                inject_lr=True,
            )
        total = num_epochs * max(steps_per_epoch // config.get("accumulation_steps", 1), 1)
        sched = warmup_cosine_schedule(
            config.get("learning_rate", 3e-4),
            config.get("warmup_steps", 2000),
            total,
            config.get("min_lr", 1e-6),
        )
        tx = make_optimizer(
            sched,
            kind="adamw",
            weight_decay=config.get("weight_decay", 0.01),
            clip_norm=config.get("grad_clip", 1.0),
            param_labels=labels,
            lr_factors={"encoder": config.get(factor_key, 0.1)},
        )
        accum = config.get("accumulation_steps", 1)
        if accum > 1:
            tx = optax.MultiSteps(tx, every_k_schedule=accum)
        return tx

    use_ema = regime == "optimized" and config.get("use_ema", True)
    ema = EMA(config.get("ema_decay", 0.999)) if use_ema else None
    # EMA registers only currently-trainable params (reference quirk,
    # optimizations.py:432-436): the frozen backbone never enters the shadow.
    ema_mask = None
    if ema is not None:
        ema_mask = jax.tree_util.tree_map(
            lambda lab: lab != "frozen",
            label_params_by_prefix(variables["params"], {frozen: "frozen"}),
        )

    unfreeze_epoch_cfg = config.get("unfreeze_epoch")
    start_unfrozen = bool(unfreeze_epoch_cfg and start_epoch > unfreeze_epoch_cfg)
    tx = make_tx(unfrozen=start_unfrozen)
    state = S.create_train_state(variables, tx, ema=ema, ema_mask=ema_mask)
    if resume_ck is not None:
        state = _restore_state(state, resume_ck, ema)

    loss_kind = "label_smoothing" if regime == "optimized" else "ce"
    augment = "strong" if (regime == "optimized" and config.get("use_augmentation", True)) else "baseline"
    step_fn = S.make_train_step(
        module, tx,
        loss_kind=loss_kind, smoothing=config.get("label_smoothing", 0.1), pad_id=pad_id,
        r_drop_alpha=config.get("r_drop_alpha", 0.0) if config.get("use_r_drop") else 0.0,
        augment=augment, train_backbone=False, ema=ema,
    )
    # Val/test loss uses the SAME criterion as training (the reference's
    # optimized validate scores with LabelSmoothing,
    # train_vit_transformer_optimized.py:305, :396-402; base uses CE).
    eval_step = S.make_eval_step(
        module, loss_kind=loss_kind, smoothing=config.get("label_smoothing", 0.1), pad_id=pad_id
    )

    plateau = ReduceLROnPlateau(factor=0.5, patience=3) if regime == "base" else None
    early = (
        EarlyStopping(config.get("early_stopping_patience", 7)) if regime == "optimized" else None
    )
    if resume_ck is not None:
        # a resumed base run keeps its decayed LR scale; a resumed optimized
        # run keeps its patience counter (round-2 gap: both restarted fresh)
        _load_host_state(resume_ck, plateau, early)
        if plateau is not None and plateau.scale != 1.0:
            set_learning_rate(state.opt_state, config.get("learning_rate", 1e-4) * plateau.scale)
    history = MetricsHistory()
    thru = ThroughputMeter()
    saver = _AsyncSaver()
    best_cider = float(resume_ck.get("best_cider", -1.0)) if resume_ck else -1.0
    unfreeze_epoch = config.get("unfreeze_epoch")
    max_len = config.get("max_len", 52)
    rng = jax.random.PRNGKey(config.get("seed", 42))
    eval_batches = (max(1, smoke // 2) if smoke else None)
    train_loader.epoch = start_epoch - 1  # align per-epoch shuffle seeds on resume

    # train step must match the restored phase: train_backbone=True lets
    # gradients flow into the unfrozen backbone (encoders cut the graph when
    # False) and, for grid, switches BN to training mode.
    if start_unfrozen:
        step_fn = S.make_train_step(
            module, tx,
            loss_kind=loss_kind, smoothing=config.get("label_smoothing", 0.1), pad_id=pad_id,
            r_drop_alpha=config.get("r_drop_alpha", 0.0) if config.get("use_r_drop") else 0.0,
            augment=augment, train_backbone=True, ema=ema,
        )

    for epoch in range(start_epoch, num_epochs + 1):
        # -- backbone unfreeze: fresh optimizer + BN-training step (reference
        #    rebuilds Adam with param groups, train_vit_transformer.py:353-369)
        if unfreeze_epoch and epoch == unfreeze_epoch:
            print(f"epoch {epoch}: unfreezing backbone ({frozen}), fresh optimizer")
            tx = make_tx(unfrozen=True)
            step_fn = S.make_train_step(
                module, tx,
                loss_kind=loss_kind, smoothing=config.get("label_smoothing", 0.1), pad_id=pad_id,
                r_drop_alpha=config.get("r_drop_alpha", 0.0) if config.get("use_r_drop") else 0.0,
                augment=augment, train_backbone=True, ema=ema,
            )
            state = state.replace(opt_state=tx.init(state.params))
            if plateau is not None:
                set_learning_rate(state.opt_state, config.get("learning_rate", 1e-4) * plateau.scale)

        train_meter = AverageMeter()
        # Keep per-step losses as device scalars and read them back once at
        # epoch end: no per-step host sync, so dispatch pipelines ahead of the
        # device and the loader thread overlaps TPU compute.
        device_losses = []
        gstep0 = int(state.step)
        for bi, batch in enumerate(train_loader):
            if bi >= steps_per_epoch:
                break
            rng, k = jax.random.split(rng)
            jb = {k2: jnp.asarray(v) for k2, v in batch.items()}
            state, metrics = step_fn(state, jb, k)
            device_losses.append((metrics["loss"], len(batch["length"])))
            thru.tick(len(batch["length"]))
        for i, (dl, n) in enumerate(device_losses):
            v = float(dl)
            train_meter.update(v, n=n)
            if (gstep0 + i + 1) % 50 == 0:
                logger.scalar("train/loss", v, gstep0 + i + 1)
        print(
            f"epoch {epoch}/{num_epochs} train loss {train_meter.avg:.4f} "
            f"({thru.samples_per_sec:.1f} samples/s, p50 step {thru.p50_step_ms:.0f}ms)"
        )

        val_vars = _variables_of(state, ema)  # EMA shadow applied around eval
        scores = validate(
            module, val_vars, val_loader, vocab, eval_step,
            max_len=max_len, max_batches=eval_batches,
        )
        print(f"  val: {scores}")
        history.append(train_loss=train_meter.avg, **{k: v for k, v in scores.items()})
        for k2, v in scores.items():
            logger.scalar(f"Val/{k2}", v, epoch)

        cider = scores.get("CIDEr", 0.0)
        if plateau is not None:
            scale = plateau.step(cider)
            set_learning_rate(state.opt_state, config.get("learning_rate", 1e-4) * scale)
        # step the stopper BEFORE saving so the persisted patience counter
        # includes this epoch (resume would otherwise forget it)
        stop = early is not None and early.step(cider)
        if cider > best_cider:
            best_cider = cider
            saver.submit(os.path.join(ckpt_dir, "best_model.ckpt"),
                         _slim_payload(state, ema, config, epoch, scores, best_cider))
            print(f"  new best CIDEr {best_cider:.4f} -> best_model.ckpt")
        # Rolling full resume state, once per epoch, off the critical path.
        saver.submit(os.path.join(ckpt_dir, "resume_state.ckpt"),
                     _full_payload(state, ema, config, epoch, scores, best_cider, plateau, early))
        if config.get("save_every") and epoch % config["save_every"] == 0:
            saver.submit(os.path.join(ckpt_dir, f"checkpoint_epoch_{epoch}.ckpt"),
                         _full_payload(state, ema, config, epoch, scores, best_cider, plateau, early))
        if stop:
            print(f"early stopping at epoch {epoch} (best CIDEr {early.best:.4f})")
            break

    saver.wait()
    print(f"checkpoint writes blocked the epoch loop {saver.blocked_s:.1f}s total (background writer)")
    history.plot_and_save(ckpt_dir)
    history.plot_combined(ckpt_dir)
    history.save_json(os.path.join(ckpt_dir, "metrics_history.json"))

    # -- final test eval from the best checkpoint (reference :457-477) -------
    best = load_checkpoint(os.path.join(ckpt_dir, "best_model.ckpt"))
    test_vars = {
        "params": restore_into(state.params, best["params"]),
        "batch_stats": restore_into(state.batch_stats, best["batch_stats"]) if best.get("batch_stats") else {},
    }
    test_scores = validate(
        module, test_vars, test_loader, vocab, eval_step,
        max_len=max_len, max_batches=eval_batches,
    )
    print(f"TEST: {test_scores} (total {time.time() - t_start:.0f}s)")
    logger.close()
    return test_scores


def fit_scst(
    config: Dict[str, Any],
    smoke: Optional[int] = None,
    resume_from: Optional[str] = None,
) -> Dict[str, float]:
    """SCST RL fine-tuning (train_*_scst_optimized.py).

    ``resume_from``: an SCST checkpoint for deterministic mid-run resume
    (distinct from ``pretrained_checkpoint``, the XE warm start the reference
    requires) — restores step/opt/EMA, best CIDEr, early-stop patience and
    shuffle seeds, like ``fit``.
    """
    t_start = time.time()
    vocab = Vocab.load(config["vocab_path"])
    train_loader, val_loader, test_loader = create_data_loaders(
        data_dir=config.get("data_dir", "data"),
        vocab_path=config["vocab_path"],
        batch_size=config.get("batch_size", 16),
        max_len=config.get("max_len", 52) - 2,
        seed=config.get("seed", 42),
    )
    resume_ck = None
    if resume_from:
        resume_ck = load_checkpoint(resume_from)
        _pin_rng_impl_from_resume(config, resume_ck)
    module, variables = _build(config, vocab)

    # -- REQUIRED pretrained XE checkpoint (reference :388-394) --------------
    pre = config.get("pretrained_checkpoint")
    if pre and os.path.exists(pre):
        try:
            if pre.endswith(".pth"):
                from image_caption_tpu.utils.port_torch import load_reference_checkpoint

                cap, _, _ = load_reference_checkpoint(pre)
                variables = cap.variables
                print(f"loaded reference torch checkpoint {pre}")
            else:
                ck = load_checkpoint(pre)
                variables = {
                    "params": restore_into(variables["params"], ck["params"]),
                    "batch_stats": restore_into(variables.get("batch_stats", {}), ck.get("batch_stats", {}))
                    if ck.get("batch_stats") else variables.get("batch_stats", {}),
                }
                print(f"loaded XE checkpoint {pre} (CIDEr {ck.get('best_cider')})")
        except (ValueError, KeyError) as e:
            if smoke is None:
                raise
            # A tiny --smoke model can't hold the configured full-size XE
            # checkpoint; smoke exercises plumbing, so continue from random init.
            print(f"smoke: pretrained checkpoint {pre} incompatible ({e}); random init")
    elif smoke is None:
        raise FileNotFoundError(
            f"SCST requires a pretrained XE checkpoint (got {pre!r}) — "
            "run the XE training script first (reference behavior :388-394)"
        )

    pad_id, start_id, end_id = vocab.pad_id, vocab.start_id, vocab.end_id
    num_epochs = config.get("num_epochs", 10)
    steps_per_epoch = smoke or len(train_loader)
    accum = config.get("accumulation_steps", 2)
    total_steps = num_epochs * max(steps_per_epoch // accum, 1)
    warmup = int(total_steps * config.get("warmup_ratio", 0.1))
    sched = warmup_cosine_schedule(config.get("learning_rate", 5e-6), warmup, total_steps)
    frozen = _frozen_prefix(config)
    labels = label_params_by_prefix(variables["params"], {frozen: "frozen"})
    tx = make_optimizer(
        sched, kind="adamw", weight_decay=config.get("weight_decay", 0.01),
        clip_norm=config.get("grad_clip", 1.0), param_labels=labels,
    )
    if accum > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accum)
    ema = EMA(config.get("ema_decay", 0.9999)) if config.get("use_ema", True) else None
    ema_mask = jax.tree_util.tree_map(lambda lab: lab != "frozen", labels) if ema else None
    state = S.create_train_state(variables, tx, ema=ema, ema_mask=ema_mask)

    reward_type = config.get("reward_type", "cider")
    max_len = config.get("max_len", 52)
    # Device reward: for the CIDEr reward (the reference default) the whole
    # SCST step fuses into one XLA program — rollouts, reward, REINFORCE
    # update — with zero per-step host syncs.  BLEU/combined (and vocabs too
    # large to pack n-grams into int32) keep the host reward path.
    device_cider = None
    if reward_type == "cider" and config.get("device_reward", True):
        try:
            from image_caption_tpu.eval.cider_device import CiderDevice

            device_cider = CiderDevice(pad_id, start_id, end_id, len(vocab), max_len)
        except ValueError as e:
            print(f"device CIDEr unavailable ({e}); host reward path")
    reward = make_reward(reward_type, pad_id, start_id, end_id)
    scst_step = S.make_scst_step(
        module, tx, reward, pad_id=pad_id, start_id=start_id, end_id=end_id,
        max_len=max_len, augment="baseline" if config.get("use_augmentation", True) else None,
        ema=ema, device_cider=device_cider,
    )
    eval_step = S.make_eval_step(module, pad_id=pad_id)
    early = EarlyStopping(config.get("early_stopping_patience", 8))
    ckpt_dir = config.get("checkpoint_dir", "checkpoints_scst")
    os.makedirs(ckpt_dir, exist_ok=True)
    logger = Logger(config.get("log_dir"), config.get("use_tensorboard", False))
    history = RLMetricsHistory()
    saver = _AsyncSaver()
    best_cider = -1.0
    start_epoch = 1
    if resume_ck is not None:
        state = _restore_state(state, resume_ck, ema)
        _load_host_state(resume_ck, early=early)
        best_cider = float(resume_ck.get("best_cider", -1.0))
        start_epoch = int(resume_ck.get("epoch", 0)) + 1
        train_loader.epoch = start_epoch - 1  # align per-epoch shuffle seeds
        print(f"resuming SCST from {resume_from} at epoch {start_epoch} (step {resume_ck.get('step')})")
    rng = jax.random.PRNGKey(config.get("seed", 42))
    eval_batches = (max(1, smoke // 2) if smoke else None)

    pysteps = 0
    for epoch in range(start_epoch, num_epochs + 1):
        meters = {k: AverageMeter() for k in ("loss", "sample_reward", "greedy_reward", "advantage")}
        if device_cider is not None:
            # Fused path: the loop body never blocks on the device — steps
            # dispatch asynchronously while the host packs the NEXT batch's
            # reference statistics; ONE metrics fetch per epoch.
            acc = S.init_scst_acc()
            for bi, batch in enumerate(train_loader):
                if bi >= steps_per_epoch:
                    break
                rng, k = jax.random.split(rng)
                refs = get_reference_captions(batch["caption"], pad_id, start_id, end_id)
                pack = device_cider.pack(refs)
                jb = {k2: jnp.asarray(v) for k2, v in batch.items()}
                state, acc = scst_step(state, jb, pack, k, acc)
                pysteps += 1
            vals = {k2: float(v) for k2, v in jax.device_get(acc).items()}
            n = max(vals.pop("samples"), 1.0)
            vals.pop("steps")
            vals.pop("grad_norm")
            for k2, m in meters.items():
                m.update(vals[k2] / n, n=int(n))
            for k2 in ("sample_reward", "greedy_reward", "advantage"):
                logger.scalar(f"train/{k2}", meters[k2].avg, pysteps)
        else:
            for bi, batch in enumerate(train_loader):
                if bi >= steps_per_epoch:
                    break
                rng, k = jax.random.split(rng)
                refs = get_reference_captions(batch["caption"], pad_id, start_id, end_id)
                jb = {k2: jnp.asarray(v) for k2, v in batch.items()}
                state, metrics = scst_step(state, jb, refs, k)
                for k2 in meters:
                    meters[k2].update(metrics[k2], n=len(batch["length"]))
                pysteps += 1
                if pysteps % 20 == 0:
                    for k2 in ("sample_reward", "greedy_reward", "advantage"):
                        logger.scalar(f"train/{k2}", metrics[k2], pysteps)
        print(
            f"epoch {epoch}/{num_epochs} "
            + " ".join(f"{k}={m.avg:.4f}" for k, m in meters.items())
        )
        # generate-only validation (reference :296-365)
        val_vars = _variables_of(state, ema)
        scores = validate(
            module, val_vars, val_loader, vocab, eval_step,
            max_len=max_len, max_batches=eval_batches, include_loss=False,
        )
        print(f"  val: {scores}")
        # state.step counts micro-steps; optax.MultiSteps advances the schedule
        # once per ACCUMULATED step, so divide by accum for the true LR.
        history.add(
            epoch, meters["sample_reward"].avg, meters["greedy_reward"].avg,
            meters["advantage"].avg, scores,
            lr=float(sched(min(int(state.step) // accum, total_steps))),
        )
        history.append(loss=meters["loss"].avg)
        cider = scores.get("CIDEr", 0.0)
        stop = early.step(cider)  # before save: persist this epoch's patience
        if cider > best_cider:
            best_cider = cider
            saver.submit(os.path.join(ckpt_dir, "best_model.ckpt"),
                         _slim_payload(state, ema, config, epoch, scores, best_cider))
        saver.submit(os.path.join(ckpt_dir, "resume_state.ckpt"),
                     _full_payload(state, ema, config, epoch, scores, best_cider, early=early))
        if stop:
            print(f"early stopping at epoch {epoch}")
            break

    saver.wait()
    # 8-panel RL dashboard + text summary, reference filename
    # (train_vit_transformer_scst_optimized.py:537-540)
    history.plot_and_save(os.path.join(ckpt_dir, "scst_optimized_training_metrics.png"))
    history.plot_combined(ckpt_dir)
    history.save_json(os.path.join(ckpt_dir, "metrics_history.json"))
    print(f"SCST done in {time.time() - t_start:.0f}s, best CIDEr {best_cider:.4f}")
    logger.close()
    return {"best_cider": best_cider}
