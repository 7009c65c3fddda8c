"""Jitted train/eval steps.

The entire reference per-batch loop (``.to(device)`` -> forward -> loss ->
backward -> clip -> step, train_vit_transformer.py:157-191) becomes ONE compiled
XLA program per step, including on-device augmentation from the uint8 canvas,
bf16 forward/backward, loss, optimizer update, and EMA.  Under a mesh the same
step runs SPMD: batch sharded on the 'data' axis, params replicated (or
TP-sharded per parallel/mesh.py rules); XLA inserts the gradient psum.

Variants cover the reference's three regimes:
- base XE (CrossEntropyLoss) — train_vit_transformer.py
- optimized XE (label smoothing / R-Drop / grad-accum via optax.MultiSteps /
  EMA-per-step) — train_vit_transformer_optimized.py
- SCST step: device rollouts + host id-space CIDEr reward + device REINFORCE
  grad (train/scst.py)
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from image_caption_tpu.data import transforms
from image_caption_tpu.train import losses as L
from image_caption_tpu.train.optim import EMA, EMAState
from image_caption_tpu.train.scst import scst_loss_fn, scst_rollouts

PyTree = Any


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: PyTree
    opt_state: optax.OptState
    batch_stats: PyTree = struct.field(default_factory=dict)
    ema: Optional[EMAState] = None


def create_train_state(variables, tx, ema: Optional[EMA] = None, ema_mask=None) -> TrainState:
    # Private copies: the train steps DONATE the state, which would otherwise
    # delete the caller's `variables` buffers out from under them (they alias).
    params = jax.tree_util.tree_map(jnp.array, variables["params"])
    batch_stats = jax.tree_util.tree_map(jnp.array, variables.get("batch_stats", {}))
    return TrainState(
        step=jnp.zeros((), dtype=jnp.int32),
        params=params,
        opt_state=jax.jit(tx.init)(params),
        batch_stats=batch_stats,
        ema=ema.init(params, ema_mask) if ema is not None else None,
    )


def _augment(kind: Optional[str], rng, images_u8):
    if kind == "baseline":
        return transforms.train_augment(rng, images_u8)
    if kind == "strong":
        return transforms.strong_augment(rng, images_u8)
    if kind in (None, "eval"):
        return transforms.eval_preprocess(images_u8)
    raise ValueError(f"unknown augment kind {kind!r}")


def make_train_step(
    module,
    tx: optax.GradientTransformation,
    *,
    loss_kind: str = "ce",  # 'ce' | 'label_smoothing' | 'focal'
    smoothing: float = 0.1,
    pad_id: int = 0,
    r_drop_alpha: float = 0.0,
    augment: Optional[str] = "baseline",
    train_backbone: bool = False,
    ema: Optional[EMA] = None,
) -> Callable[[TrainState, Dict[str, jnp.ndarray], jax.Array], Tuple[TrainState, Dict[str, jnp.ndarray]]]:
    """Build the jitted XE train step."""

    def loss_of(logits, targets):
        if loss_kind == "ce":
            return L.cross_entropy_loss(logits, targets, pad_id)
        if loss_kind == "label_smoothing":
            return L.label_smoothing_loss(logits, targets, pad_id, smoothing)
        if loss_kind == "focal":
            return L.focal_loss(logits, targets, pad_id)
        raise ValueError(loss_kind)

    # mutable=[] would still make flax return an (out, {}) tuple — use False.
    mutable = ["batch_stats"] if train_backbone else False

    # Donating the input state lets XLA update params/opt_state/EMA in place
    # (~1.6 GB for the full models) instead of double-buffering them in HBM.
    @functools.partial(jax.jit, donate_argnames=("state",))
    def step(state: TrainState, batch: Dict[str, jnp.ndarray], rng: jax.Array):
        rng_aug, rng_do1, rng_do2 = jax.random.split(rng, 3)
        images = _augment(augment, rng_aug, batch["image"])
        captions = batch["caption"]
        lengths = batch["length"]
        targets = captions[:, 1:]

        def forward(params, dropout_rng):
            variables = {"params": params, "batch_stats": state.batch_stats}
            out = module.apply(
                variables,
                images,
                captions,
                lengths,
                deterministic=False,
                train_backbone=train_backbone,
                rngs={"dropout": dropout_rng},
                mutable=mutable,
            )
            if mutable:
                logits, updates = out
                return logits, updates.get("batch_stats", state.batch_stats)
            return out, state.batch_stats

        def loss_fn(params):
            logits, new_bs = forward(params, rng_do1)
            loss = loss_of(logits, targets)
            aux = {"ce_loss": loss}
            if r_drop_alpha > 0.0:
                logits2, _ = forward(params, rng_do2)
                kl = L.r_drop_kl(logits, logits2, targets, pad_id)
                loss = 0.5 * (loss + loss_of(logits2, targets)) + r_drop_alpha * kl
                aux["r_drop_kl"] = kl
            aux["loss"] = loss
            return loss, (aux, new_bs)

        (loss, (aux, new_bs)), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_ema = ema.update(state.ema, new_params) if (ema is not None and state.ema is not None) else state.ema
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            opt_state=new_opt_state,
            batch_stats=new_bs,
            ema=new_ema,
        )
        aux["grad_norm"] = optax.global_norm(grads)
        return new_state, aux

    return step


def make_eval_step(module, *, loss_kind: str = "ce", smoothing: float = 0.1, pad_id: int = 0):
    """Deterministic teacher-forced loss + encoder memory (for greedy decode)."""

    def loss_of(logits, targets):
        if loss_kind == "label_smoothing":
            return L.label_smoothing_loss(logits, targets, pad_id, smoothing)
        return L.cross_entropy_loss(logits, targets, pad_id)

    @jax.jit
    def step(variables, batch):
        images = transforms.eval_preprocess(batch["image"])
        memory = module.apply(variables, images, method=module.encode)
        logits = module.apply(
            variables, batch["caption"], memory, batch["length"], method=module.decode_train
        )
        loss = loss_of(logits, batch["caption"][:, 1:])
        return loss, memory

    return step


SCST_ACC_KEYS = ("loss", "sample_reward", "greedy_reward", "advantage", "grad_norm", "steps", "samples")


def init_scst_acc() -> Dict[str, jnp.ndarray]:
    """Device-side metric accumulator for the fused SCST step (one host fetch
    per epoch instead of five blocking ``float()`` syncs per step)."""
    return {k: jnp.zeros((), jnp.float32) for k in SCST_ACC_KEYS}


def make_scst_step(
    module,
    tx: optax.GradientTransformation,
    reward_fn,
    *,
    pad_id: int,
    start_id: int,
    end_id: int,
    max_len: int = 52,
    augment: Optional[str] = "baseline",
    ema: Optional[EMA] = None,
    device_cider=None,
):
    """SCST step.  Two regimes:

    - ``device_cider`` given (an ``eval.cider_device.CiderDevice``): the WHOLE
      step — rollouts, CIDEr-D rewards for sample and greedy, advantage,
      REINFORCE grad, optimizer/EMA update, metric accumulation — is ONE jitted
      XLA program.  Signature ``step(state, batch, pack, rng, acc) ->
      (state, acc)`` where ``pack = device_cider.pack(refs)`` is host-built
      from loader data (no sync) and ``acc`` starts as ``init_scst_acc()``.
      Zero host round trips per step (the reference syncs twice per step for
      pycocoevalcap text rewards, scst_loss.py:179-180).

    - otherwise: device rollouts -> host reward (BLEU/combined or large-vocab
      CIDEr) -> device update.  Signature ``step(state, batch, refs, rng) ->
      (state, metrics)``; the boundary carries token ids and a [B] advantage.
    """
    import numpy as np

    from image_caption_tpu.decode.engine import sequence_lengths

    def _reinforce_update(state: TrainState, images, sampled, sample_lengths, advantage):
        def loss_fn(params):
            return scst_loss_fn(
                module, params, {"batch_stats": state.batch_stats},
                images, sampled, sample_lengths, advantage, pad_id,
            )

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_ema = ema.update(state.ema, new_params) if (ema is not None and state.ema is not None) else state.ema
        new_state = state.replace(
            step=state.step + 1, params=new_params, opt_state=new_opt_state, ema=new_ema
        )
        return new_state, loss, optax.global_norm(grads)

    if device_cider is not None:

        @functools.partial(jax.jit, donate_argnames=("state", "acc"))
        def fused_step(state: TrainState, batch, pack, rng, acc):
            rng_aug, rng_sample = jax.random.split(rng)
            images = _augment(augment, rng_aug, batch["image"])
            variables = {"params": state.params, "batch_stats": state.batch_stats}
            memory = module.apply(variables, images, method=module.encode)
            from image_caption_tpu.decode import engine as E

            sampled, _ = E.sample_decode(
                module, variables, memory, rng_sample,
                start_id=start_id, end_id=end_id, pad_id=pad_id, max_len=max_len,
            )
            greedy = E.greedy_decode(
                module, variables, memory, start_id=start_id, end_id=end_id, max_len=max_len
            )
            r_sample = device_cider.score(sampled, pack)
            r_greedy = device_cider.score(greedy, pack)
            advantage = r_sample - r_greedy
            sample_lengths = sequence_lengths(sampled, end_id)
            state, loss, grad_norm = _reinforce_update(
                state, images, sampled, sample_lengths, advantage
            )
            n = jnp.float32(sampled.shape[0])
            acc = {
                "loss": acc["loss"] + loss * n,
                "sample_reward": acc["sample_reward"] + jnp.sum(r_sample),
                "greedy_reward": acc["greedy_reward"] + jnp.sum(r_greedy),
                "advantage": acc["advantage"] + jnp.sum(advantage),
                "grad_norm": acc["grad_norm"] + grad_norm,
                "steps": acc["steps"] + 1.0,
                "samples": acc["samples"] + n,
            }
            return state, acc

        return fused_step

    @jax.jit
    def prepare(state: TrainState, batch, rng):
        rng_aug, rng_sample = jax.random.split(rng)
        images = _augment(augment, rng_aug, batch["image"])
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        sampled, greedy = scst_rollouts(
            module, variables, images, rng_sample,
            start_id=start_id, end_id=end_id, pad_id=pad_id, max_len=max_len,
        )
        return images, sampled, greedy

    update = jax.jit(_reinforce_update, donate_argnames=("state",))

    def step(state: TrainState, batch, refs, rng):
        images, sampled, greedy = prepare(state, batch, rng)
        sampled_np, greedy_np = np.asarray(sampled), np.asarray(greedy)
        sample_reward = reward_fn(sampled_np, refs)
        greedy_reward = reward_fn(greedy_np, refs)
        advantage = jnp.asarray(sample_reward - greedy_reward, dtype=jnp.float32)
        sample_lengths = sequence_lengths(sampled, end_id)
        state, loss, grad_norm = update(state, images, sampled, sample_lengths, advantage)
        metrics = {
            "loss": float(loss),
            "sample_reward": float(np.mean(sample_reward)),
            "greedy_reward": float(np.mean(greedy_reward)),
            "advantage": float(np.mean(sample_reward - greedy_reward)),
            "grad_norm": float(grad_norm),
        }
        return state, metrics

    return step
