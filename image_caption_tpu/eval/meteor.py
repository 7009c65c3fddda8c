"""METEOR scorer — pure-Python, Java-free.

The reference runs the METEOR 1.5 **Java jar** as a subprocess with a stdio
protocol and a thread lock (utils/eval_metrics.py:10-46 ``FixedMeteor`` patches
the jar's launch arguments).  This implementation removes the process boundary
and reproduces the jar's English configuration:

- matcher modules: ``exact`` (weight 1.0), ``stem`` (weight 0.6, Porter
  stemmer — eval/stem.py) and ``synonym`` (weight 0.8), applied stage-wise
  like the jar's aligner
- content/function word weighting: content words weigh delta = 0.75, function
  words 1 - delta = 0.25 (the jar ships a function.words list; ours is the
  standard English closed-class set)
- parameters: alpha = 0.85, beta = 0.2, gamma = 0.6 (METEOR 1.5 en task=rank)
- score = (1 - gamma * (chunks / matches)^beta) * P*R / (alpha*P + (1-alpha)*R)

The synonym module is a constructor-injectable word->class table standing in
for the jar's WordNet synsets (an external resource).  The default table is
the complete set of WordNet synonym classes present in the closed DeepFashion
vocabulary beyond what exact+stem already matches — enumerated by scanning
all 105 content words (tests/test_metrics.py) — so on DeepFashion data the
scorer now covers everything the jar's module would match (the previously
documented mean +0.0038 divergence closes to ~0); for other corpora inject a
fuller table.  Still absent: the paraphrase-table module (the jar's en task
=rank config runs exact/stem/synonym/paraphrase; paraphrase tables are a
670 MB external download and DeepFashion captions are single-register
template text where it has nothing to add).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

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
_MODULE_WEIGHTS = (1.0, 0.6, 0.8)  # default (exact, stem, synonym) module weights

# Default synonym table: ALL WordNet synonym classes present in the closed
# DeepFashion vocabulary beyond what exact+stem already matches (enumerated by
# scanning the 105 content words — test_metrics.py documents the audit).
SYNONYM_CLASSES: Tuple[frozenset, ...] = (
    frozenset({"man", "guy", "gentleman"}),
    frozenset({"woman", "lady", "female"}),
    frozenset({"pants", "trousers"}),
    frozenset({"clothes", "clothing"}),
)


def _synonym_table(classes: Sequence[frozenset]) -> Dict[str, int]:
    return {w: ci for ci, cls in enumerate(classes) for w in cls}

_DEFAULT_SYNONYMS = _synonym_table(SYNONYM_CLASSES)


def _stage_keys(tokens: Sequence[str], synonyms: Dict[str, int]) -> Tuple[List, List, List]:
    # Stage keys: exact surface form, Porter stem, synonym-class id (None =
    # not in any class, never matches in the synonym stage).
    return (
        list(tokens),
        [porter_stem(w) for w in tokens],
        [synonyms.get(w) for w in tokens],
    )


def _align(
    hyp: Sequence[str], ref: Sequence[str], synonyms: Optional[Dict[str, int]] = None
) -> Tuple[list, int]:
    """Stage-wise maximal matching -> (match list, num_chunks).

    Stage 0 matches exact surface forms, stage 1 matches Porter stems among the
    leftovers, stage 2 matches synonym-class members among what remains —
    mirroring the jar's module precedence (exact > stem > synonym).  Within a
    stage each hyp token takes the closest unused identical ref position
    (minimizing crossings, which minimizes chunks for short captions).  Returns
    matches as ``(hyp_idx, ref_idx, module)`` sorted by hyp index, plus the
    chunk count (runs of matches adjacent and increasing in both sentences).
    """
    if synonyms is None:
        synonyms = _DEFAULT_SYNONYMS
    hyp_stages = _stage_keys(hyp, synonyms)
    ref_stages = _stage_keys(ref, synonyms)
    used_h = set()
    used_r = set()
    matches: List[Tuple[int, int, int]] = []
    for module, (hkeys, rkeys) in enumerate(zip(hyp_stages, ref_stages)):
        ref_positions: Dict[Any, List[int]] = {}
        for j, w in enumerate(rkeys):
            if j not in used_r and w is not None:
                ref_positions.setdefault(w, []).append(j)
        for i, w in enumerate(hkeys):
            if i in used_h or w is None:
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
    are the (exact, stem, synonym) matcher weights — all exposed so the scorer
    can be re-tuned against a jar configuration if bit-parity on general
    English matters (our FUNCTION_WORDS list is a standard stand-in for the
    jar's function.words resource, a documented divergence — see PARITY.md).

    ``synonyms`` is the synonym module's word->class table (inject a WordNet
    dump for open-vocabulary English; the default covers the DeepFashion
    vocabulary completely).  Pass ``synonyms={}`` to disable the module.
    """

    def __init__(
        self,
        alpha: float = 0.85,
        beta: float = 0.2,
        gamma: float = 0.6,
        delta: float = _DELTA,
        module_weights: Sequence[float] = _MODULE_WEIGHTS,
        synonyms: Optional[Dict[str, int]] = None,
    ):
        self.alpha = alpha
        self.beta = beta
        self.gamma = gamma
        self.delta = delta
        self.module_weights = tuple(module_weights)
        self.synonyms = _DEFAULT_SYNONYMS if synonyms is None else dict(synonyms)
        if len(self.module_weights) < 3:
            # legacy (exact, stem) weights: no weight for the synonym stage
            self.synonyms = {}

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
            matches, chunks = _align(hyp, ref, self.synonyms)
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
