"""METEOR scorer — pure-Python, Java-free.

The reference runs the METEOR 1.5 **Java jar** as a subprocess with a stdio
protocol and a thread lock (utils/eval_metrics.py:10-46 ``FixedMeteor`` patches
the jar's launch arguments).  This implementation removes the process boundary:
exact-match unigram alignment (maximal matching, minimal chunks), harmonic-mean
F with METEOR 1.5's English parameters (alpha=0.85, beta=0.2, gamma=0.6 — the
defaults the reference's meteor-1.5.jar ships with).

Note: the jar additionally matches stems/synonyms via WordNet; on the closed
DeepFashion vocabulary (105 words, no inflection pairs) exact matching is the
dominant term, so scores are compatible but not bit-identical to the jar
(documented divergence — removing the Java subprocess is the point).
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np


def _align(hyp: List[str], ref: List[str]) -> Tuple[int, int]:
    """Greedy exact alignment -> (num_matches, num_chunks).

    Each hyp token matches at most one identical ref token; ties resolved to the
    closest unused ref position (minimizing crossings, which minimizes chunks in
    practice for short captions).  Chunks = runs of hyp-adjacent matches whose ref
    positions are also adjacent and increasing.
    """
    ref_positions: Dict[str, List[int]] = {}
    for j, w in enumerate(ref):
        ref_positions.setdefault(w, []).append(j)
    used = set()
    match_pairs = []  # (hyp_idx, ref_idx)
    for i, w in enumerate(hyp):
        cands = [j for j in ref_positions.get(w, ()) if j not in used]
        if not cands:
            continue
        j = min(cands, key=lambda j: abs(j - i))
        used.add(j)
        match_pairs.append((i, j))
    m = len(match_pairs)
    if m == 0:
        return 0, 0
    chunks = 1
    for (i0, j0), (i1, j1) in zip(match_pairs, match_pairs[1:]):
        if not (i1 == i0 + 1 and j1 == j0 + 1):
            chunks += 1
    return m, chunks


class Meteor:
    def __init__(self, alpha: float = 0.85, beta: float = 0.2, gamma: float = 0.6):
        self.alpha = alpha
        self.beta = beta
        self.gamma = gamma

    def _score_one(self, hyp: List[str], refs: List[List[str]]) -> float:
        best = 0.0
        for ref in refs:
            m, chunks = _align(hyp, ref)
            if m == 0:
                continue
            p = m / len(hyp)
            r = m / len(ref)
            f_mean = p * r / (self.alpha * p + (1 - self.alpha) * r)
            frag = chunks / m
            penalty = self.gamma * (frag ** self.beta)
            best = max(best, f_mean * (1 - penalty))
        return best

    def compute_score(self, gts: Dict, res: Dict) -> Tuple[float, np.ndarray]:
        img_ids = sorted(gts.keys())
        scores = np.array(
            [self._score_one(res[i][0].split(), [r.split() for r in gts[i]]) for i in img_ids]
        )
        return float(np.mean(scores)), scores
