"""ROUGE-L scorer — pycocoevalcap-compatible.

F-measure of the longest common subsequence with beta=1.2 (pycocoevalcap's Rouge);
per image: max over references.  Reference usage: utils/eval_metrics.py:105-138.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np


def _lcs_len(a: List[str], b: List[str]) -> int:
    """O(len(a)*len(b)) DP with a rolling row (captions are short)."""
    if not a or not b:
        return 0
    prev = [0] * (len(b) + 1)
    for x in a:
        cur = [0] * (len(b) + 1)
        for j, y in enumerate(b, 1):
            cur[j] = prev[j - 1] + 1 if x == y else max(prev[j], cur[j - 1])
        prev = cur
    return prev[-1]


class RougeL:
    def __init__(self, beta: float = 1.2):
        self.beta = beta

    def _score_one(self, hyp: List[str], refs: List[List[str]]) -> float:
        best = 0.0
        for ref in refs:
            lcs = _lcs_len(hyp, ref)
            prec = lcs / len(hyp) if hyp else 0.0
            rec = lcs / len(ref) if ref else 0.0
            if prec != 0 and rec != 0:
                f = ((1 + self.beta ** 2) * prec * rec) / (rec + self.beta ** 2 * prec)
            else:
                f = 0.0
            best = max(best, f)
        return best

    def compute_score(self, gts: Dict, res: Dict) -> Tuple[float, np.ndarray]:
        img_ids = sorted(gts.keys())
        scores = np.array(
            [self._score_one(res[i][0].split(), [r.split() for r in gts[i]]) for i in img_ids]
        )
        return float(np.mean(scores)), scores
