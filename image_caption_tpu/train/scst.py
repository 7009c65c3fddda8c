"""SCST (Self-Critical Sequence Training) — REINFORCE with greedy baseline.

Reference: ``SCSTLoss`` (utils/scst_loss.py:117-200): sample a caption per image
(multinomial), greedy-decode a baseline, reward both with CIDEr, advantage =
sample_reward - greedy_reward, loss = -mean(advantage * sum log p(sampled)).

TPU-native redesign (vs the reference's per-step full-prefix re-decodes and
text-space pycocoevalcap calls, scst_loss.py:202-254, :179-180):

1. ONE encoder pass; sample + greedy rollouts both run through the KV-cached
   decode engine (O(L) per rollout).
2. Rewards are computed in **token-id space** with precomputed-reference
   ``CiderDFast`` — no detokenize -> PTB-retokenize round trip.  This is exact:
   the vocab maps ids<->words bijectively, and the refs are pre-stripped the same
   way the evaluator strips decoded text.
3. The differentiable term re-scores the sampled sequence with one parallel
   teacher-forced forward (MXU-batched) instead of keeping autodiff state alive
   across 49 sequential decoder calls.  log p from rollout == log p from
   re-scoring (same params, deterministic), but the grad comes from one big
   matmul-friendly pass.

Reward calculators mirror scst_loss.py:20-114: 'cider', 'bleu', and a weighted
combination.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from image_caption_tpu.decode import engine
from image_caption_tpu.eval.bleu import Bleu
from image_caption_tpu.eval.cider import CiderDFast


def strip_ids(row: Sequence[int], pad_id: int, start_id: int, end_id: int) -> List[int]:
    """Token ids -> content ids (drop pad/start, stop at first end)."""
    out = []
    for t in row:
        t = int(t)
        if t == end_id:
            break
        if t in (pad_id, start_id):
            continue
        out.append(t)
    return out


def get_reference_captions(
    captions: np.ndarray, pad_id: int, start_id: int, end_id: int
) -> List[List[List[int]]]:
    """[B, L] ref caption ids -> per-image list of stripped ref id lists
    (scst_loss.py:328-354 equivalent, staying in id space)."""
    return [[strip_ids(row, pad_id, start_id, end_id)] for row in np.asarray(captions)]


class CiderRewardCalculator:
    """Per-batch CIDEr-D reward; doc-freq statistics from the batch refs, like the
    reference's per-call pycocoevalcap Cider (scst_loss.py:20-54).  Uses the
    native C++ scorer (native/cider.cpp, ~8x the Python id-space scorer) when
    buildable, Python CiderDFast otherwise — both exact-equivalent."""

    def __init__(self, pad_id: int, start_id: int, end_id: int, corpus_refs=None):
        self.pad_id, self.start_id, self.end_id = pad_id, start_id, end_id
        from image_caption_tpu.eval.cider_native import make_fast_cider

        self._make_scorer = make_fast_cider
        # Optionally score against corpus-level doc freq for stabler idf.
        self.corpus_scorer = make_fast_cider(corpus_refs) if corpus_refs else None

    def __call__(self, hyp_tokens: np.ndarray, refs: List[List[List[int]]]) -> np.ndarray:
        hyps = [strip_ids(r, self.pad_id, self.start_id, self.end_id) for r in np.asarray(hyp_tokens)]
        try:
            scorer = self._make_scorer(refs)
            return scorer.score(hyps)
        except Exception:
            return np.zeros(len(hyps))  # reference degrades to 0.0 (:49-54)


class BleuRewardCalculator:
    """Per-image BLEU-4 reward (scst_loss.py:57-83)."""

    def __init__(self, pad_id: int, start_id: int, end_id: int):
        self.pad_id, self.start_id, self.end_id = pad_id, start_id, end_id

    def __call__(self, hyp_tokens: np.ndarray, refs: List[List[List[int]]]) -> np.ndarray:
        gts = {i: [" ".join(map(str, r)) for r in rr] for i, rr in enumerate(refs)}
        res = {
            i: [" ".join(map(str, strip_ids(row, self.pad_id, self.start_id, self.end_id)))]
            for i, row in enumerate(np.asarray(hyp_tokens))
        }
        try:
            _, per_image = Bleu(4).compute_score(gts, res)
            return per_image[3]
        except Exception:
            return np.zeros(len(res))


class CombinedRewardCalculator:
    """Weighted CIDEr + BLEU (scst_loss.py:86-114)."""

    def __init__(self, pad_id, start_id, end_id, cider_weight: float = 0.7, bleu_weight: float = 0.3):
        self.cider = CiderRewardCalculator(pad_id, start_id, end_id)
        self.bleu = BleuRewardCalculator(pad_id, start_id, end_id)
        self.cw, self.bw = cider_weight, bleu_weight

    def __call__(self, hyp_tokens, refs):
        return self.cw * self.cider(hyp_tokens, refs) + self.bw * self.bleu(hyp_tokens, refs)


def make_reward(reward_type: str, pad_id: int, start_id: int, end_id: int):
    if reward_type == "cider":
        return CiderRewardCalculator(pad_id, start_id, end_id)
    if reward_type == "bleu":
        return BleuRewardCalculator(pad_id, start_id, end_id)
    if reward_type == "combined":
        return CombinedRewardCalculator(pad_id, start_id, end_id)
    raise ValueError(f"unknown reward_type {reward_type!r}")


# ---------------------------------------------------------------------------
# Device-side pieces
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("model", "start_id", "end_id", "pad_id", "max_len"))
def scst_rollouts(
    model,
    variables,
    images: jnp.ndarray,
    rng: jax.Array,
    *,
    start_id: int,
    end_id: int,
    pad_id: int,
    max_len: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Encode once, then (sampled, greedy) rollouts — both [B, max_len] int32."""
    memory = model.apply(variables, images, method=model.encode)
    sampled, _ = engine.sample_decode(
        model, variables, memory, rng, start_id=start_id, end_id=end_id, pad_id=pad_id, max_len=max_len
    )
    greedy = engine.greedy_decode(
        model, variables, memory, start_id=start_id, end_id=end_id, max_len=max_len
    )
    return sampled, greedy


def scst_loss_fn(
    model,
    params,
    other_variables: Dict,
    images: jnp.ndarray,
    sampled: jnp.ndarray,  # [B, L] including <start>, pad after <end>
    sample_lengths: jnp.ndarray,  # [B] incl. start+end
    advantage: jnp.ndarray,  # [B] f32 (stop-gradient scalar rewards)
    pad_id: int = 0,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Differentiable REINFORCE loss: -mean(advantage * sum log p(sampled tokens)).

    One teacher-forced forward over the sampled sequence replaces the reference's
    autodiff through 49 sequential decoder calls.
    """
    variables = {"params": params, **other_variables}
    logits = model.apply(
        variables, images, sampled, sample_lengths
    )  # [B, L-1, V] f32
    targets = sampled[:, 1:]
    logp = jax.nn.log_softmax(logits, axis=-1)
    tok_logp = jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    # Valid positions: target positions 0..len-2 (the reference zeroes log-probs
    # after the finished mask, scst_loss.py:245-252).
    pos = jnp.arange(targets.shape[1])[None, :]
    valid = (pos < (sample_lengths - 1)[:, None]) & (targets != pad_id)
    seq_logp = jnp.sum(tok_logp * valid, axis=1)
    loss = -jnp.mean(jax.lax.stop_gradient(advantage) * seq_logp)
    return loss, {"seq_logp": seq_logp}


def mixed_loss_fn(model, params, other_variables, images, captions, lengths,
                  sampled, sample_lengths, advantage,
                  xe_weight: float = 0.5, scst_weight: float = 0.5, pad_id: int = 0):
    """Weighted XE + SCST (scst_loss.py:272-325 MixedLoss, unused by reference
    scripts but part of its surface)."""
    from image_caption_tpu.train.losses import cross_entropy_loss

    variables = {"params": params, **other_variables}
    logits = model.apply(variables, images, captions, lengths)
    xe = cross_entropy_loss(logits, captions[:, 1:], pad_id=pad_id)
    scst, aux = scst_loss_fn(
        model, params, other_variables, images, sampled, sample_lengths, advantage, pad_id
    )
    return xe_weight * xe + scst_weight * scst, {"xe": xe, "scst": scst, **aux}
