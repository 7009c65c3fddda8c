"""COCO-style caption evaluator.

Same public surface as the reference's ``COCOScoreEvaluator``
(utils/eval_metrics.py:48-156): ``evaluate(gts, res) -> {"CIDEr", "METEOR",
"ROUGE_L"}`` over ``{img_id: [caption strings]}`` dicts — but with zero
subprocesses, zero temp files, and zero Java: PTB tokenization and all scorers
are first-party Python/NumPy (eval/tokenizer.py, cider.py, meteor.py, rouge.py).
Per-scorer failures degrade to 0.0 like the reference (:123-137).
"""

from __future__ import annotations

from typing import Dict, List, Optional

from image_caption_tpu.eval.bleu import Bleu
from image_caption_tpu.eval.cider import CiderD
from image_caption_tpu.eval.meteor import Meteor
from image_caption_tpu.eval.rouge import RougeL
from image_caption_tpu.eval.tokenizer import ptb_tokenize_corpus


class COCOScoreEvaluator:
    """Drop-in replacement for the reference evaluator (no Java subprocesses)."""

    def __init__(self, include_bleu: bool = False, tokenize: bool = True):
        self.include_bleu = include_bleu
        self.tokenize = tokenize
        self.scorers = [
            (CiderD(), "CIDEr"),
            (Meteor(), "METEOR"),
            (RougeL(), "ROUGE_L"),
        ]

    def evaluate(
        self, gts: Dict[object, List[str]], res: Dict[object, List[str]]
    ) -> Dict[str, float]:
        """gts: {img_id: [ref captions]}, res: {img_id: [1 generated caption]}."""
        if self.tokenize:
            gts = ptb_tokenize_corpus(gts)
            res = ptb_tokenize_corpus(res)
        results: Dict[str, float] = {}
        for scorer, name in self.scorers:
            try:
                score, _ = scorer.compute_score(gts, res)
                results[name] = float(score)
            except Exception as e:  # degrade like the reference (:123-137)
                print(f"warning: {name} scorer failed ({e}); recording 0.0")
                results[name] = 0.0
        if self.include_bleu:
            try:
                corpus, _ = Bleu(4).compute_score(gts, res)
                for k, v in enumerate(corpus, 1):
                    results[f"BLEU-{k}"] = float(v)
            except Exception as e:
                print(f"warning: BLEU scorer failed ({e})")
                for k in range(1, 5):
                    results[f"BLEU-{k}"] = 0.0
        return results
