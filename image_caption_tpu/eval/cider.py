"""CIDEr-D scorer — first-party, pycocoevalcap-compatible semantics.

Algorithm (matching pycocoevalcap's CiderScorer, the scorer the reference invokes
for both validation metrics, utils/eval_metrics.py:105-138, and the SCST reward,
utils/scst_loss.py:20-54): n-grams up to 4; document frequency counted once per
image over its reference set; tf-idf vectors with idf = log(N) - log(max(1, df));
similarity = clipped (CIDEr-D) dot product / norms, gaussian length penalty
(sigma 6); score = 10 * mean over n of avg over refs.

Two implementations:
- ``CiderD`` — dict-based, string sentences, drop-in for the evaluator.
- ``CiderDFast`` — id-space, precomputed-ref variant for the SCST hot loop: refs
  are tokenized once at init; per-step scoring of sampled id sequences is pure
  numpy with hashed n-grams, no text round-trip (the reference instead re-ran
  pycocoevalcap per training step, scst_loss.py:179-180).
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict
from typing import Dict, List, Sequence, Tuple

import numpy as np


def _ngram_counts(tokens: Sequence, n: int = 4) -> Counter:
    c: Counter = Counter()
    for k in range(1, n + 1):
        for i in range(len(tokens) - k + 1):
            c[tuple(tokens[i : i + k])] += 1
    return c


class CiderD:
    """gts/res: {img_id: [sentence strings]} with sentences pre-tokenized
    (space-joined tokens, PTB output format)."""

    def __init__(self, n: int = 4, sigma: float = 6.0):
        self.n = n
        self.sigma = sigma

    def compute_score(self, gts: Dict, res: Dict) -> Tuple[float, np.ndarray]:
        img_ids = list(sorted(gts.keys()))
        assert set(img_ids) == set(res.keys())
        crefs = [[_ngram_counts(r.split(), self.n) for r in gts[i]] for i in img_ids]
        ctest = [_ngram_counts(res[i][0].split(), self.n) for i in img_ids]

        # Document frequency: each n-gram counted once per image over its refs.
        doc_freq: Counter = Counter()
        for refs in crefs:
            for ng in set(ng for ref in refs for ng in ref.keys()):
                doc_freq[ng] += 1
        log_n = math.log(max(len(crefs), 1))

        def counts2vec(cnts: Counter):
            vec = [defaultdict(float) for _ in range(self.n)]
            norm = [0.0] * self.n
            length = 0
            for ng, tf in cnts.items():
                df = math.log(max(1.0, doc_freq[ng]))
                k = len(ng) - 1
                vec[k][ng] = float(tf) * (log_n - df)
                norm[k] += vec[k][ng] ** 2
                if k == 0:
                    length += tf
            return vec, [math.sqrt(x) for x in norm], length

        def sim(vh, nh, lh, vr, nr, lr) -> np.ndarray:
            delta = float(lh - lr)
            val = np.zeros(self.n)
            for k in range(self.n):
                for ng, w in vh[k].items():
                    # CIDEr-D clipping: min(hyp, ref) * ref
                    val[k] += min(w, vr[k][ng]) * vr[k][ng]
                if nh[k] != 0 and nr[k] != 0:
                    val[k] /= nh[k] * nr[k]
                val[k] *= math.exp(-(delta ** 2) / (2 * self.sigma ** 2))
            return val

        scores = []
        for test, refs in zip(ctest, crefs):
            vh, nh, lh = counts2vec(test)
            acc = np.zeros(self.n)
            for ref in refs:
                vr, nr, lr = counts2vec(ref)
                acc += sim(vh, nh, lh, vr, nr, lr)
            score_avg = np.mean(acc) / len(refs) * 10.0
            scores.append(score_avg)
        scores = np.array(scores)
        return float(np.mean(scores)), scores


class CiderDFast:
    """Vectorized id-space CIDEr-D for SCST rewards.

    ``refs``: list over images of list-of-ref-token-id-sequences (specials already
    stripped).  Doc freq / idf / ref vectors are precomputed once.  ``score(hyps)``
    scores one hypothesis per image.  N-grams are hashed into int64 keys (token
    ids are < 2**16, n <= 4 -> collision-free packing at 16 bits/token).
    """

    def __init__(self, refs: List[List[Sequence[int]]], n: int = 4, sigma: float = 6.0):
        self.n = n
        self.sigma = sigma
        self.num_images = len(refs)
        self.log_n = math.log(max(self.num_images, 1))

        doc_freq = [Counter() for _ in range(n)]  # one table per n-gram order
        ref_counts: List[List[List[Counter]]] = []
        for image_refs in refs:
            per_image = []
            seen = [set() for _ in range(n)]
            for ref in image_refs:
                cs = self._count(ref)
                per_image.append(cs)
                for k in range(n):
                    seen[k].update(cs[k].keys())
            for k in range(n):
                for ng in seen[k]:
                    doc_freq[k][ng] += 1
            ref_counts.append(per_image)
        self.doc_freq = doc_freq
        # Precompute ref tf-idf vectors / norms / lengths.
        self.ref_vecs = []
        for image_refs, per_image in zip(refs, ref_counts):
            vecs = []
            for ref, cs in zip(image_refs, per_image):
                vec, norm = self._tfidf(cs)
                vecs.append((vec, norm, len(ref)))
            self.ref_vecs.append(vecs)

    def _count(self, tokens: Sequence[int]) -> List[Counter]:
        """Per-order hashed n-gram counts; ids pack at 16 bits each (vocab < 2^16)."""
        cs = [Counter() for _ in range(self.n)]
        for k in range(1, self.n + 1):
            ck = cs[k - 1]
            for i in range(len(tokens) - k + 1):
                h = 0
                for t in tokens[i : i + k]:
                    h = (h << 16) | (int(t) & 0xFFFF)
                ck[h] += 1
        return cs

    def _tfidf(self, cs: List[Counter]):
        vec_n = [dict() for _ in range(self.n)]
        norm = [0.0] * self.n
        for k in range(self.n):
            dfk = self.doc_freq[k]
            for ng, tf in cs[k].items():
                idf = self.log_n - math.log(max(1.0, dfk[ng]))
                w = float(tf) * idf
                vec_n[k][ng] = w
                norm[k] += w * w
        return vec_n, [math.sqrt(x) for x in norm]

    def score(self, hyps: List[Sequence[int]]) -> np.ndarray:
        """One hypothesis (token-id sequence, specials stripped) per image."""
        assert len(hyps) == self.num_images
        out = np.zeros(self.num_images)
        for i, hyp in enumerate(hyps):
            vh, nh = self._tfidf(self._count(hyp))
            lh = len(hyp)
            acc = np.zeros(self.n)
            for vr, nr, lr in self.ref_vecs[i]:
                delta = float(lh - lr)
                val = np.zeros(self.n)
                for k in range(self.n):
                    vrk = vr[k]
                    s = 0.0
                    for ng, w in vh[k].items():
                        rw = vrk.get(ng)
                        if rw is not None:
                            s += min(w, rw) * rw
                    if nh[k] != 0 and nr[k] != 0:
                        s /= nh[k] * nr[k]
                    val[k] = s * math.exp(-(delta ** 2) / (2 * self.sigma ** 2))
                acc += val
            out[i] = np.mean(acc) / len(self.ref_vecs[i]) * 10.0
        return out
