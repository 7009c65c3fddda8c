"""Vocabulary and tokenization.

Matches the reference semantics exactly (utils/prepare_data.py:46,64-69):
tokenize = lowercase, pad ``.`` and ``,`` with a leading space, split on whitespace;
vocab ids are 1..N for words with count >= min_word_count in insertion order, then
``<pad>``=0 and ``<unk>``/``<start>``/``<end>`` appended (DeepFashion vocab: 109
entries, pad=0, words 1-105, unk=106, start=107, end=108).
"""

from __future__ import annotations

import json
from collections import Counter
from typing import Dict, Iterable, List, Sequence

import numpy as np

PAD_TOKEN = "<pad>"
UNK_TOKEN = "<unk>"
START_TOKEN = "<start>"
END_TOKEN = "<end>"


def tokenize_caption(text: str) -> List[str]:
    """Reference tokenization: lowercase, space-pad '.' and ',', whitespace split."""
    return text.lower().replace(".", " .").replace(",", " ,").split()


class Vocab:
    """Bidirectional word<->id mapping with the reference's special-token layout."""

    def __init__(self, word_to_id: Dict[str, int]):
        self.word_to_id = dict(word_to_id)
        self.id_to_word = {i: w for w, i in self.word_to_id.items()}
        self.pad_id = self.word_to_id[PAD_TOKEN]
        self.unk_id = self.word_to_id[UNK_TOKEN]
        self.start_id = self.word_to_id[START_TOKEN]
        self.end_id = self.word_to_id[END_TOKEN]

    # -- construction ------------------------------------------------------

    @classmethod
    def build(cls, token_lists: Iterable[Sequence[str]], min_word_count: int = 5) -> "Vocab":
        """Build from tokenized captions with reference id-assignment order."""
        counts: Counter = Counter()
        for toks in token_lists:
            counts.update(toks)
        words = [w for w in counts.keys() if counts[w] >= min_word_count]
        mapping = {w: i + 1 for i, w in enumerate(words)}
        mapping[PAD_TOKEN] = 0
        mapping[UNK_TOKEN] = len(mapping)
        mapping[START_TOKEN] = len(mapping)
        mapping[END_TOKEN] = len(mapping)
        return cls(mapping)

    @classmethod
    def load(cls, path: str) -> "Vocab":
        with open(path, "r", encoding="utf-8") as f:
            return cls(json.load(f))

    def save(self, path: str) -> None:
        with open(path, "w", encoding="utf-8") as f:
            json.dump(self.word_to_id, f, ensure_ascii=False, indent=2)

    # -- encode / decode ---------------------------------------------------

    def __len__(self) -> int:
        return len(self.word_to_id)

    def encode(self, text_or_tokens) -> List[int]:
        """``[<start>] + ids + [<end>]`` (prepare_data.py:107-109)."""
        toks = tokenize_caption(text_or_tokens) if isinstance(text_or_tokens, str) else list(text_or_tokens)
        return [self.start_id] + [self.word_to_id.get(t, self.unk_id) for t in toks] + [self.end_id]

    def decode(self, ids: Sequence[int], stop_at_end: bool = True) -> List[str]:
        """Ids -> words, stripping specials; stops at the first ``<end>``."""
        words: List[str] = []
        for i in ids:
            i = int(i)
            if i == self.end_id and stop_at_end:
                break
            if i in (self.pad_id, self.start_id, self.end_id):
                continue
            words.append(self.id_to_word.get(i, UNK_TOKEN))
        return words

    def decode_to_text(self, ids: Sequence[int]) -> str:
        return " ".join(self.decode(ids))

    def decode_batch(self, ids: np.ndarray) -> List[str]:
        """[B, L] id matrix -> list of caption strings."""
        return [self.decode_to_text(row) for row in np.asarray(ids)]

    def pad_to(self, ids: Sequence[int], length: int) -> List[int]:
        ids = list(ids)[:length]
        return ids + [self.pad_id] * (length - len(ids))
