"""Vocab / tokenization semantics vs the reference's prepare_data pipeline."""

import json
import os

import numpy as np
import pytest

from image_caption_tpu.data.vocab import Vocab, tokenize_caption

REF_VOCAB = "/root/reference/data/vocab.json"


def test_tokenize_matches_reference_rule():
    # lowercase, space-pad . and , then whitespace split (prepare_data.py:46)
    assert tokenize_caption("The Shirt, is red.") == ["the", "shirt", ",", "is", "red", "."]
    assert tokenize_caption("a  b") == ["a", "b"]


def test_build_vocab_layout():
    caps = [["red", "shirt"], ["red", "hat"], ["red", "shirt"], ["red", "shirt"], ["red", "shirt"], ["red", "shirt"]]
    v = Vocab.build(caps, min_word_count=5)
    # words with count >= 5: only 'red'(6) and 'shirt'(5); ids 1..N in first-seen order
    assert v.word_to_id["red"] == 1
    assert v.word_to_id["shirt"] == 2
    assert v.pad_id == 0
    assert v.unk_id == 3 and v.start_id == 4 and v.end_id == 5


@pytest.mark.skipif(not os.path.exists(REF_VOCAB), reason="reference vocab not mounted")
def test_reference_vocab_special_ids():
    v = Vocab.load(REF_VOCAB)
    assert len(v) == 109
    assert (v.pad_id, v.unk_id, v.start_id, v.end_id) == (0, 106, 107, 108)


def test_encode_decode_roundtrip():
    v = Vocab.build([["red", "shirt"]] * 5, min_word_count=5)
    ids = v.encode("red shirt")
    assert ids[0] == v.start_id and ids[-1] == v.end_id
    assert v.decode(ids) == ["red", "shirt"]
    # unknown word -> unk
    ids2 = v.encode("red banana")
    assert ids2[2] == v.unk_id
    # decode stops at first end
    assert v.decode([v.start_id, 1, v.end_id, 2]) == ["red"]


def test_pad_to():
    v = Vocab.build([["red"]] * 5, min_word_count=5)
    assert v.pad_to([5, 6], 4) == [5, 6, 0, 0]
    assert v.pad_to([5, 6, 7], 2) == [5, 6]


@pytest.mark.skipif(not os.path.exists(REF_VOCAB), reason="reference data not mounted")
def test_reference_manifest_decodes_cleanly():
    v = Vocab.load(REF_VOCAB)
    data = json.load(open("/root/reference/data/val_data.json"))
    row = data["CAPTIONS"][0]
    words = v.decode(row)
    assert len(words) > 3
    assert all(isinstance(w, str) for w in words)
