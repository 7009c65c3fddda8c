"""BLEU scorer (1-4 gram) — pycocoevalcap-compatible semantics.

Used by the reference for the SCST BLEU reward (utils/scst_loss.py:57-83) and
listed in README's metric set.  Matches pycocoevalcap's BleuScorer behavior:
- clipped n-gram precision with tiny/small smoothing
  (correct + tiny) / (guess + small), tiny=1e-15, small=1e-9
- brevity penalty exp(1 - ref_len/hyp_len) for hyp_len < ref_len
- corpus score aggregates counts over images with 'closest' ref-length; per-image
  scores use the same formula on single-sentence counts (with the corpus-level
  ratio adjustment omitted, as in pycocoevalcap's per-instance list).
"""

from __future__ import annotations

import math
from collections import Counter
from typing import Dict, List, Tuple

import numpy as np

_SMALL = 1e-9
_TINY = 1e-15


def _ngrams(tokens: List[str], n: int) -> Counter:
    return Counter(tuple(tokens[i : i + n]) for i in range(len(tokens) - n + 1))


class Bleu:
    def __init__(self, n: int = 4):
        self.n = n

    def _stats(self, hyp: List[str], refs: List[List[str]]):
        """Per-image stats: (hyp_len, closest_ref_len, [correct_k], [guess_k])."""
        hyp_len = len(hyp)
        ref_lens = [len(r) for r in refs]
        closest = min(ref_lens, key=lambda rl: (abs(rl - hyp_len), rl))
        correct, guess = [], []
        for k in range(1, self.n + 1):
            h = _ngrams(hyp, k)
            max_ref: Counter = Counter()
            for r in refs:
                for ng, c in _ngrams(r, k).items():
                    max_ref[ng] = max(max_ref[ng], c)
            correct.append(sum(min(c, max_ref[ng]) for ng, c in h.items()))
            guess.append(max(hyp_len - k + 1, 0))
        return hyp_len, closest, correct, guess

    def compute_score(self, gts: Dict, res: Dict) -> Tuple[List[float], List[np.ndarray]]:
        """Returns ([bleu1..bleuN] corpus, [per-image arrays per n])."""
        img_ids = sorted(gts.keys())
        tot_hyp = tot_ref = 0
        tot_correct = [0] * self.n
        tot_guess = [0] * self.n
        per_image = [[] for _ in range(self.n)]
        for i in img_ids:
            hyp = res[i][0].split()
            refs = [r.split() for r in gts[i]]
            hyp_len, ref_len, correct, guess = self._stats(hyp, refs)
            tot_hyp += hyp_len
            tot_ref += ref_len
            p = 1.0
            bp = 1.0 if hyp_len >= ref_len else math.exp(1 - ref_len / hyp_len) if hyp_len > 0 else 0.0
            for k in range(self.n):
                tot_correct[k] += correct[k]
                tot_guess[k] += guess[k]
                p *= (correct[k] + _TINY) / (guess[k] + _SMALL)
                per_image[k].append(p ** (1.0 / (k + 1)) * bp)
        corpus = []
        p = 1.0
        bp = 1.0 if tot_hyp >= tot_ref else math.exp(1 - tot_ref / max(tot_hyp, 1))
        for k in range(self.n):
            p *= (tot_correct[k] + _TINY) / (tot_guess[k] + _SMALL)
            corpus.append(p ** (1.0 / (k + 1)) * bp)
        return corpus, [np.array(x) for x in per_image]
