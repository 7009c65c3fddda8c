"""METEOR scorer — pure-Python, Java-free.

The reference runs the METEOR 1.5 **Java jar** as a subprocess with a stdio
protocol and a thread lock (utils/eval_metrics.py:10-46 ``FixedMeteor`` patches
the jar's launch arguments).  This implementation removes the process boundary
and reproduces the jar's English configuration:

- matcher modules: ``exact`` (weight 1.0) and ``stem`` (weight 0.6, Porter
  stemmer — eval/stem.py), applied stage-wise like the jar's aligner
- content/function word weighting: content words weigh delta = 0.75, function
  words 1 - delta = 0.25 (the jar ships a function.words list; ours is the
  standard English closed-class set)
- parameters: alpha = 0.85, beta = 0.2, gamma = 0.6 (METEOR 1.5 en task=rank)
- score = (1 - gamma * (chunks / matches)^beta) * P*R / (alpha*P + (1-alpha)*R)

Not implemented: the WordNet ``synonym`` and paraphrase-table modules (their
data files are external resources); on the closed DeepFashion vocabulary
(105 content words, no synonym pairs in-vocab) exact+stem matching is the
dominant term, so scores are compatible but not bit-identical to the jar
(documented divergence — removing the Java subprocess is the point).
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np

from image_caption_tpu.eval.stem import porter_stem

# Standard English closed-class (function) words — stand-in for the jar's
# function.words resource.  Everything else counts as a content word.
FUNCTION_WORDS = frozenset(
    """a an the this that these those it its his her their my your our
    i you he she we they them him me us
    is are was were be been being am has have had do does did will would
    shall should may might can could must
    and or but nor so yet if then than as because while although though
    of in on at by for with from to into onto over under above below
    between among through during before after behind beside near
    there here not no nor only just also too very
    's n't 't""".split()
)

_DELTA = 0.75  # default content-word weight; function words weigh 1 - delta
_MODULE_WEIGHTS = (1.0, 0.6)  # default (exact, stem) module weights


def _stage_keys(tokens: Sequence[str]) -> Tuple[List[str], List[str]]:
    return list(tokens), [porter_stem(w) for w in tokens]


def _align(hyp: Sequence[str], ref: Sequence[str]) -> Tuple[list, int]:
    """Stage-wise maximal matching -> (match list, num_chunks).

    Stage 0 matches exact surface forms, stage 1 matches Porter stems among the
    leftovers — mirroring the jar's module precedence.  Within a stage each hyp
    token takes the closest unused identical ref position (minimizing crossings,
    which minimizes chunks for short captions).  Returns matches as
    ``(hyp_idx, ref_idx, module)`` sorted by hyp index, plus the chunk count
    (runs of matches adjacent and increasing in both sentences).
    """
    hyp_stages = _stage_keys(hyp)
    ref_stages = _stage_keys(ref)
    used_h = set()
    used_r = set()
    matches: List[Tuple[int, int, int]] = []
    for module, (hkeys, rkeys) in enumerate(zip(hyp_stages, ref_stages)):
        ref_positions: Dict[str, List[int]] = {}
        for j, w in enumerate(rkeys):
            if j not in used_r:
                ref_positions.setdefault(w, []).append(j)
        for i, w in enumerate(hkeys):
            if i in used_h:
                continue
            cands = [j for j in ref_positions.get(w, ()) if j not in used_r]
            if not cands:
                continue
            j = min(cands, key=lambda j: abs(j - i))
            used_h.add(i)
            used_r.add(j)
            matches.append((i, j, module))
    matches.sort()
    if not matches:
        return [], 0
    chunks = 1
    for (i0, j0, _), (i1, j1, _) in zip(matches, matches[1:]):
        if not (i1 == i0 + 1 and j1 == j0 + 1):
            chunks += 1
    return matches, chunks


class Meteor:
    """METEOR-1.5-compatible scorer (see module docstring for divergences).

    alpha/beta/gamma are the METEOR 1.5 en task=rank parameters; delta is the
    content-word weight (function words weigh 1 - delta) and module_weights
    are the (exact, stem) matcher weights — all exposed so the scorer can be
    re-tuned against a jar configuration if bit-parity on general English
    matters (our FUNCTION_WORDS list is a standard stand-in for the jar's
    function.words resource, a documented divergence — see PARITY.md).
    """

    def __init__(
        self,
        alpha: float = 0.85,
        beta: float = 0.2,
        gamma: float = 0.6,
        delta: float = _DELTA,
        module_weights: Tuple[float, float] = _MODULE_WEIGHTS,
    ):
        self.alpha = alpha
        self.beta = beta
        self.gamma = gamma
        self.delta = delta
        self.module_weights = tuple(module_weights)

    def _word_weight(self, w: str) -> float:
        return self.delta if w not in FUNCTION_WORDS else 1.0 - self.delta

    def _score_one(self, hyp: List[str], refs: List[List[str]]) -> float:
        if not hyp:
            return 0.0
        best = 0.0
        hyp_total = sum(self._word_weight(w) for w in hyp)
        for ref in refs:
            if not ref:
                continue
            matches, chunks = _align(hyp, ref)
            if not matches:
                continue
            ref_total = sum(self._word_weight(w) for w in ref)
            w_hyp = sum(self.module_weights[mod] * self._word_weight(hyp[i]) for i, _, mod in matches)
            w_ref = sum(self.module_weights[mod] * self._word_weight(ref[j]) for _, j, mod in matches)
            p = w_hyp / hyp_total
            r = w_ref / ref_total
            if p + r == 0.0:
                continue
            f_mean = p * r / (self.alpha * p + (1 - self.alpha) * r)
            frag = chunks / len(matches)
            penalty = self.gamma * (frag ** self.beta)
            best = max(best, f_mean * (1 - penalty))
        return best

    def compute_score(self, gts: Dict, res: Dict) -> Tuple[float, np.ndarray]:
        img_ids = sorted(gts.keys())
        scores = np.array(
            [self._score_one(res[i][0].split(), [r.split() for r in gts[i]]) for i in img_ids]
        )
        return float(np.mean(scores)), scores
