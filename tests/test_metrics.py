"""Metric scorers: known values, invariants, dict-vs-fast CIDEr equivalence."""

import numpy as np
import pytest

from image_caption_tpu.eval.bleu import Bleu
from image_caption_tpu.eval.cider import CiderD, CiderDFast
from image_caption_tpu.eval.evaluator import COCOScoreEvaluator
from image_caption_tpu.eval.meteor import Meteor, _align
from image_caption_tpu.eval.rouge import RougeL, _lcs_len
from image_caption_tpu.eval.tokenizer import ptb_tokenize


# ---------------------------------------------------------------- tokenizer

def test_ptb_tokenize_drops_punctuation():
    assert ptb_tokenize("The shirt is red .") == ["the", "shirt", "is", "red"]
    assert ptb_tokenize("a red, long dress.") == ["a", "red", "long", "dress"]


def test_ptb_tokenize_contractions():
    assert ptb_tokenize("it's red") == ["it", "'s", "red"]
    assert ptb_tokenize("don't run") == ["do", "n't", "run"]


# ---------------------------------------------------------------- CIDEr

def _toy_corpus():
    gts = {
        0: ["the shirt has long sleeves"],
        1: ["the dress is red"],
        2: ["a man wearing a blue jacket"],
    }
    res_perfect = {k: [v[0]] for k, v in gts.items()}
    res_bad = {0: ["green hat"], 1: ["green hat"], 2: ["green hat"]}
    return gts, res_perfect, res_bad


def test_cider_perfect_beats_bad():
    gts, perfect, bad = _toy_corpus()
    c = CiderD()
    s_perfect, per = c.compute_score(gts, perfect)
    s_bad, _ = c.compute_score(gts, bad)
    assert s_perfect > s_bad
    assert s_perfect > 5.0  # perfect match with distinct refs scores high (max 10)
    assert len(per) == 3


def test_cider_fast_matches_dict_implementation():
    gts, perfect, bad = _toy_corpus()
    # map words to ids
    words = sorted({w for caps in gts.values() for w in caps[0].split()} | {"green", "hat"})
    wid = {w: i + 1 for i, w in enumerate(words)}

    def ids(s):
        return [wid[w] for w in s.split()]

    refs = [[ids(gts[i][0])] for i in range(3)]
    fast = CiderDFast(refs)
    for res in (perfect, bad):
        hyps = [ids(res[i][0]) for i in range(3)]
        s_dict, per_dict = CiderD().compute_score(
            {i: gts[i] for i in range(3)}, {i: res[i] for i in range(3)}
        )
        per_fast = fast.score(hyps)
        np.testing.assert_allclose(per_fast, per_dict, rtol=1e-9)


def test_cider_length_penalty():
    gts = {0: ["a b c d e"], 1: ["f g h i j"]}
    short = {0: ["a b"], 1: ["f g"]}
    full = {0: ["a b c d e"], 1: ["f g h i j"]}
    c = CiderD()
    assert c.compute_score(gts, full)[0] > c.compute_score(gts, short)[0]


# ---------------------------------------------------------------- BLEU

def test_bleu_perfect_is_one():
    gts, perfect, _ = _toy_corpus()
    corpus, per = Bleu(4).compute_score(gts, perfect)
    assert all(abs(b - 1.0) < 1e-6 for b in corpus)


def test_bleu_orders_quality():
    gts = {0: ["the red shirt has long sleeves and a collar"]}
    good = {0: ["the red shirt has long sleeves"]}
    bad = {0: ["blue pants"]}
    g, _ = Bleu(4).compute_score(gts, good)
    b, _ = Bleu(4).compute_score(gts, bad)
    assert g[3] > b[3]


# ---------------------------------------------------------------- ROUGE-L

def test_lcs():
    assert _lcs_len("abcde", "ace") == 3
    assert _lcs_len([], ["a"]) == 0
    assert _lcs_len(list("abc"), list("abc")) == 3


def test_rouge_perfect_is_one():
    gts, perfect, _ = _toy_corpus()
    s, per = RougeL().compute_score(gts, perfect)
    assert abs(s - 1.0) < 1e-9
    assert all(abs(x - 1.0) < 1e-9 for x in per)


def test_rouge_known_value():
    # hyp 'a b c', ref 'a c d': lcs=2, P=2/3, R=2/3, F=2/3 for any beta
    s, _ = RougeL().compute_score({0: ["a c d"]}, {0: ["a b c"]})
    assert abs(s - 2 / 3) < 1e-9


# ---------------------------------------------------------------- METEOR

def test_meteor_align():
    m, ch = _align(["a", "b", "c"], ["a", "b", "c"])
    assert (len(m), ch) == (3, 1)
    m, ch = _align(["a", "x", "c"], ["a", "b", "c"])
    assert len(m) == 2 and ch == 2
    m, ch = _align(["x"], ["y"])
    assert (m, ch) == ([], 0)


def test_meteor_stem_module_matches_inflections():
    # "striped" vs "stripe" and "patterns" vs "pattern" only match via the stem
    # module (Porter), with module weight 0.6 — the jar's behavior.
    matches, _ = _align(["striped", "patterns"], ["stripe", "pattern"])
    assert [(i, j) for i, j, _ in matches] == [(0, 0), (1, 1)]
    assert all(mod == 1 for _, _, mod in matches)
    # stem matches must score between no-match and exact-match
    gts = {0: ["the shirt has plaid patterns"]}
    exact = Meteor().compute_score(gts, {0: ["the shirt has plaid patterns"]})[0]
    stem = Meteor().compute_score(gts, {0: ["the shirt has plaid pattern"]})[0]
    miss = Meteor().compute_score(gts, {0: ["the shirt has plaid colors"]})[0]
    assert exact > stem > miss


def test_porter_stem_vocab_pairs():
    from image_caption_tpu.eval.stem import porter_stem

    assert porter_stem("patterns") == porter_stem("pattern")
    assert porter_stem("striped") == porter_stem("stripe")
    assert porter_stem("wearing") == porter_stem("wears") == "wear"
    assert porter_stem("sleeves") == porter_stem("sleeve")
    # classic Porter fixtures
    assert porter_stem("caresses") == "caress"
    assert porter_stem("ponies") == "poni"
    assert porter_stem("relational") == "relat"
    assert porter_stem("hopping") == "hop"
    assert porter_stem("knitting") == "knit"


def test_meteor_perfect_close_to_one():
    # identical sentence: F=1, penalty = 0.6*(1/m)^0.2
    s, _ = Meteor().compute_score({0: ["the red shirt has long sleeves"]},
                                  {0: ["the red shirt has long sleeves"]})
    m = 6
    expect = 1.0 * (1 - 0.6 * (1 / m) ** 0.2)
    assert abs(s - expect) < 1e-9


def test_meteor_orders_quality():
    gts = {0: ["the red shirt has long sleeves"]}
    good = {0: ["the red shirt has short sleeves"]}
    bad = {0: ["blue pants today"]}
    g, _ = Meteor().compute_score(gts, good)
    b, _ = Meteor().compute_score(gts, bad)
    assert g > b


# ---------------------------------------------------------------- evaluator

def test_evaluator_end_to_end():
    gts = {
        "img1": ["the shirt is red ."],
        "img2": ["the dress has long sleeves ."],
        "img3": ["a man wearing a hat ."],
    }
    res = {
        "img1": ["the shirt is red ."],
        "img2": ["the dress has short sleeves ."],
        "img3": ["a man wearing a hat ."],
    }
    scores = COCOScoreEvaluator().evaluate(gts, res)
    assert set(scores) == {"CIDEr", "METEOR", "ROUGE_L"}
    assert 0 < scores["ROUGE_L"] <= 1.0
    assert 0 < scores["CIDEr"] <= 10.0
    assert 0 < scores["METEOR"] <= 1.0
    with_bleu = COCOScoreEvaluator(include_bleu=True).evaluate(gts, res)
    assert "BLEU-4" in with_bleu
