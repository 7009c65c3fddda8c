"""Device-side (jittable) CIDEr-D reward — the SCST step's missing half.

The reference computes SCST rewards by detokenizing rollouts to text and
calling pycocoevalcap on the host twice per training step
(utils/scst_loss.py:179-180), a device->host->device sync in the hot loop.
Round 1 already moved scoring to id space (eval/cider.py::CiderDFast), but the
reward still ran on host, forcing one sync per step.  This module moves the
HYPOTHESIS side of CIDEr-D onto the TPU so the whole SCST step (rollouts ->
reward -> REINFORCE update) compiles into ONE XLA program with zero per-step
host round trips.

How it stays exact (equivalence-tested against CiderDFast in
tests/test_metrics.py):

- N-grams are packed into int32 keys at ``bits`` bits per token
  (``bits = ceil(log2(vocab_size + 1))``; vocab 109 -> 7 bits, 4-grams -> 28
  bits).  Keys are collision-free and distinct across n-gram orders (higher
  orders always have higher leading bits), so one global df table serves all
  orders.
- Everything derived from the REFERENCES (document-frequency table, per-image
  ref n-gram keys, ref tf-idf norms, ref lengths) is precomputed on the host
  by ``CiderDevice.pack`` — refs come from the data loader's caption ids, so
  this costs no device sync and overlaps with the previous step's device work.
  Arrays are padded to fixed shapes; the jitted step never recompiles.
- On device, per-position multiplicity correction turns distinct-n-gram sums
  into position sums: sum_ng tf*idf^2 == sum_pos tf_pos*idf_pos^2 / 1 with
  tf_pos counted by intra-row key equality, and
  sum_ng min(wh,wr)*wr == sum_pos min(tf_h,tf_r)*tf_r*idf^2 / tf_h.
- Hypothesis idf lookups use a binary search (jnp.searchsorted) into the
  host-sorted distinct-key table; unmatched keys get df=0 -> idf=log(N)
  exactly like ``log(max(1, df)) = 0``.
"""

from __future__ import annotations

import math
from typing import List, NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np

_N = 4  # n-gram orders, fixed like pycocoevalcap
_PAD_KEY = np.int32(2**31 - 1)  # sorts last; never equals a real key


class CiderRefPack(NamedTuple):
    """Fixed-shape, host-precomputed reference statistics for one batch."""

    sorted_keys: np.ndarray  # [M]    int32 distinct ref n-gram keys, sorted, padded
    log_df: np.ndarray       # [M]    f32   log(df) aligned with sorted_keys
    ref_keys: np.ndarray     # [B, P] int32 per-image ref n-gram keys (0 = empty)
    ref_norm: np.ndarray     # [B, N] f32   per-order ref tf-idf norms
    ref_len: np.ndarray      # [B]    f32   ref content lengths
    log_n: np.ndarray        # []     f32   log(num images)


def _pack_key(tokens: Sequence[int], bits: int) -> int:
    h = 0
    for t in tokens:
        h = (h << bits) | (int(t) + 1)
    return h


class CiderDevice:
    """CIDEr-D with host-packed refs and a jittable device scorer.

    Supports the SCST reward setting: one hypothesis and one reference per
    image (the DeepFashion case), per-batch document frequency — the same
    statistics ``CiderDFast`` computes.  ``vocab_size`` must fit 4 packed
    tokens in an int32 (vocab_size <= 126 at 7 bits); larger vocabs fall back
    to the host reward path in train/steps.py.
    """

    def __init__(self, pad_id: int, start_id: int, end_id: int, vocab_size: int,
                 max_len: int, sigma: float = 6.0):
        self.pad_id, self.start_id, self.end_id = pad_id, start_id, end_id
        self.sigma = sigma
        self.max_len = max_len
        self.bits = max(1, int(vocab_size).bit_length())
        if _N * self.bits > 31:
            raise ValueError(
                f"vocab_size {vocab_size} needs {self.bits} bits/token; "
                f"{_N}-grams overflow int32 — use the host reward path"
            )
        # per-image ref key capacity: all n-gram positions of a max_len ref
        self.ref_cap = _N * max_len

    # -- host side ---------------------------------------------------------

    def pack(self, refs: List[List[Sequence[int]]]) -> CiderRefPack:
        """Batch refs (one ref per image, ids pre-stripped) -> fixed-shape pack."""
        b = len(refs)
        log_n = math.log(max(b, 1))
        per_image_keys: List[List[int]] = []
        df: dict = {}
        for image_refs in refs:
            assert len(image_refs) == 1, "device CIDEr supports 1 ref/image (use host path)"
            toks = list(image_refs[0])
            keys = [
                _pack_key(toks[i : i + k], self.bits)
                for k in range(1, _N + 1)
                for i in range(len(toks) - k + 1)
            ]
            per_image_keys.append(keys)
            for key in set(keys):
                df[key] = df.get(key, 0) + 1

        # Fixed table capacity (worst case: every ref n-gram distinct) so the
        # jitted scorer sees one shape per batch size — no recompiles.
        m = self.ref_cap * max(b, 1)
        assert len(df) <= m
        sorted_keys = np.full(m, _PAD_KEY, dtype=np.int32)
        log_df = np.zeros(m, dtype=np.float32)
        if df:
            items = sorted(df.items())
            sorted_keys[: len(items)] = [k for k, _ in items]
            log_df[: len(items)] = [math.log(v) for _, v in items]

        ref_keys = np.zeros((b, self.ref_cap), dtype=np.int32)
        ref_norm = np.zeros((b, _N), dtype=np.float32)
        ref_len = np.zeros(b, dtype=np.float32)
        for i, (image_refs, keys) in enumerate(zip(refs, per_image_keys)):
            ref_keys[i, : len(keys)] = keys
            ref_len[i] = len(image_refs[0])
            tf: dict = {}
            for key in keys:
                tf[key] = tf.get(key, 0) + 1
            for key, cnt in tf.items():
                order = self._order_of(key)
                idf = log_n - math.log(max(1.0, df[key]))
                ref_norm[i, order - 1] += (cnt * idf) ** 2
        ref_norm = np.sqrt(ref_norm)
        return CiderRefPack(
            sorted_keys=sorted_keys,
            log_df=log_df,
            ref_keys=ref_keys,
            ref_norm=ref_norm,
            ref_len=ref_len,
            log_n=np.float32(log_n),
        )

    def _order_of(self, key: int) -> int:
        return (int(key).bit_length() + self.bits - 1) // self.bits

    # -- device side (jittable) -------------------------------------------

    def score(self, tokens: jnp.ndarray, pack: CiderRefPack) -> jnp.ndarray:
        """[B, L] rollout token ids (with <start>, pad-filled) -> [B] f32 rewards.

        Pure jnp; call from inside the jitted SCST step.
        """
        bits, sigma = self.bits, self.sigma
        content = tokens[:, 1:]
        b, l = content.shape

        # strip: drop pad/start anywhere, stop at first <end> — semantics of
        # train/scst.py::strip_ids, via stable compaction of kept positions.
        pos = jnp.arange(l)[None, :]
        is_end = content == self.end_id
        first_end = jnp.where(jnp.any(is_end, axis=1), jnp.argmax(is_end, axis=1), l)
        keep = (pos < first_end[:, None]) & (content != self.pad_id) & (content != self.start_id)
        order_idx = jnp.argsort(~keep, axis=1, stable=True)
        compact = jnp.take_along_axis(jnp.where(keep, content, 0), order_idx, axis=1)
        clen = jnp.sum(keep, axis=1)  # [B] content length
        shifted = jnp.where(pos < clen[:, None], compact + 1, 0).astype(jnp.int32)

        sorted_keys = jnp.asarray(pack.sorted_keys)
        log_df = jnp.asarray(pack.log_df)
        ref_keys = jnp.asarray(pack.ref_keys)  # [B, P]
        ref_valid = ref_keys != 0
        log_n = jnp.asarray(pack.log_n)

        penalty = jnp.exp(
            -((clen.astype(jnp.float32) - jnp.asarray(pack.ref_len)) ** 2) / (2 * sigma**2)
        )
        per_order = []
        for k in range(1, _N + 1):
            # keys for every k-gram start position
            key = jnp.zeros((b, l), dtype=jnp.int32)
            for j in range(k):
                key = (key << bits) | jnp.roll(shifted, -j, axis=1)
            valid = pos < jnp.maximum(clen - (k - 1), 0)[:, None]  # [B, L]
            key = jnp.where(valid, key, -1)  # -1 never matches refs/table

            # tf within the hypothesis (per position)
            eq_self = (key[:, :, None] == key[:, None, :]) & valid[:, None, :]
            tf_h = jnp.sum(eq_self, axis=2).astype(jnp.float32)  # [B, L]

            # idf via binary search into the batch df table
            idx = jnp.searchsorted(sorted_keys, key)
            idx = jnp.clip(idx, 0, sorted_keys.shape[0] - 1)
            found = sorted_keys[idx] == key
            idf = log_n - jnp.where(found, log_df[idx], 0.0)  # [B, L]

            # tf within this image's reference
            eq_ref = (key[:, :, None] == ref_keys[:, None, :]) & ref_valid[:, None, :]
            tf_r = jnp.sum(eq_ref, axis=2).astype(jnp.float32)  # [B, L]

            v = valid.astype(jnp.float32)
            norm_h = jnp.sqrt(jnp.sum(v * tf_h * idf * idf, axis=1))  # [B]
            dot = jnp.sum(
                v * jnp.minimum(tf_h, tf_r) * tf_r * idf * idf / jnp.maximum(tf_h, 1.0),
                axis=1,
            )
            norm_r = jnp.asarray(pack.ref_norm)[:, k - 1]
            denom = norm_h * norm_r
            per_order.append(jnp.where(denom > 0, dot / jnp.maximum(denom, 1e-20), 0.0))

        return 10.0 * jnp.mean(jnp.stack(per_order), axis=0) * penalty
