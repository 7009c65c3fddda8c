"""PTB-style tokenizer — pure Python replacement for the Stanford PTBTokenizer
Java jar that pycocoevalcap shells out to (reference utils/eval_metrics.py:94-102
spawns ``java ... PTBTokenizer`` per evaluation).

Behavior matched to the COCO-caption usage: lowercase, treebank-style token
splitting, then REMOVE punctuation tokens (the jar is invoked with
``-preserveLines -lowerCase`` and pycocoevalcap strips PUNCTUATIONS afterwards).
For the DeepFashion caption domain (plain lowercase sentences with ``.``/``,``)
this is exact; for general text it covers the standard treebank rules
(contractions, punctuation splitting).
"""

from __future__ import annotations

import re
from typing import Dict, List

PUNCTUATIONS = {
    "''", "'", "``", "`", "-LRB-", "-RRB-", "-LCB-", "-RCB-",
    ".", "?", "!", ",", ":", "-", "--", "...", ";",
}

_CONTRACTIONS = re.compile(r"\b(can)(not)\b|\b(d)('ye)\b|\b(gim)(me)\b|\b(gon)(na)\b|\b(got)(ta)\b|\b(lem)(me)\b|\b(wan)(na)\b", re.IGNORECASE)


def _treebank_split(text: str) -> List[str]:
    t = " " + text + " "
    # separate standard punctuation
    t = re.sub(r"([;@#$%&.,:!?\(\)\[\]{}\"])", r" \1 ", t)
    # ellipsis / double dash
    t = t.replace("...", " ... ").replace("--", " -- ")
    # possessives and contractions: don't -> do n't, it's -> it 's
    t = re.sub(r"([^' ])('s|'S|'m|'M|'d|'D|'ll|'LL|'re|'RE|'ve|'VE|n't|N'T) ", r"\1 \2 ", t)
    t = _CONTRACTIONS.sub(lambda m: " ".join(g for g in m.groups() if g), t)
    return t.split()


def ptb_tokenize(caption: str) -> List[str]:
    """One caption -> lowercase tokens with punctuation removed."""
    toks = _treebank_split(caption.lower())
    return [w for w in toks if w not in PUNCTUATIONS]


def ptb_tokenize_corpus(captions: Dict[object, List[str]]) -> Dict[object, List[str]]:
    """{img_id: [caption strings]} -> {img_id: ['tok tok ...']} (joined, the
    pycocoevalcap tokenizer output format)."""
    return {
        img_id: [" ".join(ptb_tokenize(c)) for c in caps] for img_id, caps in captions.items()
    }
