"""Native C++ CIDEr-D scorer vs the Python implementations (exact equivalence)."""

import numpy as np
import pytest

from image_caption_tpu.eval.cider import CiderD, CiderDFast
from image_caption_tpu.eval.cider_native import make_fast_cider, native_available

pytestmark = pytest.mark.skipif(not native_available(), reason="libcider.so not buildable")


def _random_corpus(rng, n_images=50, vocab=100, max_len=30):
    refs, hyps = [], []
    for _ in range(n_images):
        rl = rng.integers(4, max_len)
        refs.append([list(rng.integers(1, vocab, size=rl))])
        hl = rng.integers(2, max_len)
        # half the time derive the hyp from the ref (partial overlap)
        if rng.random() < 0.5:
            hyp = list(refs[-1][0][:hl])
        else:
            hyp = list(rng.integers(1, vocab, size=hl))
        hyps.append(hyp)
    return refs, hyps


def test_native_matches_python_fast():
    rng = np.random.default_rng(0)
    refs, hyps = _random_corpus(rng)
    native = make_fast_cider(refs)
    assert type(native).__name__ == "CiderDNative"
    py = CiderDFast(refs)
    np.testing.assert_allclose(native.score(hyps), py.score(hyps), rtol=1e-12)


def test_native_matches_dict_scorer():
    rng = np.random.default_rng(1)
    refs, hyps = _random_corpus(rng, n_images=20)
    gts = {i: [" ".join(map(str, r)) for r in rr] for i, rr in enumerate(refs)}
    res = {i: [" ".join(map(str, h))] for i, h in enumerate(hyps)}
    _, per_dict = CiderD().compute_score(gts, res)
    native = make_fast_cider(refs)
    np.testing.assert_allclose(native.score(hyps), per_dict, rtol=1e-9)


def test_native_multi_ref():
    refs = [
        [[1, 2, 3, 4], [1, 2, 5, 6]],
        [[7, 8, 9], [7, 8, 9, 10]],
    ]
    hyps = [[1, 2, 3, 4], [9, 9, 9]]
    native = make_fast_cider(refs)
    py = CiderDFast(refs)
    np.testing.assert_allclose(native.score(hyps), py.score(hyps), rtol=1e-12)


def test_native_speedup():
    import time

    rng = np.random.default_rng(2)
    refs, hyps = _random_corpus(rng, n_images=256, max_len=50)
    native = make_fast_cider(refs)
    py = CiderDFast(refs)

    t0 = time.perf_counter()
    for _ in range(5):
        native.score(hyps)
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(5):
        py.score(hyps)
    t_py = time.perf_counter() - t0
    print(f"native {t_native*200:.2f}ms/call vs python {t_py*200:.2f}ms/call")
    assert t_native < t_py  # must actually be faster, else it has no reason to exist
