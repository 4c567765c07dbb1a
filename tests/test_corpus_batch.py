"""The vectorized corpus renderer (corpus.page_htmls_batch / page_rows_batch)
must be byte-identical to the scalar reference implementation (page_html /
page_row).  Hashes below were computed from the scalar code BEFORE the batch
path existed (round-6 optimization), so batch == scalar == r5 corpus."""

import hashlib

import numpy as np

from sparkcrawl import corpus

# md5 over the concatenated page_html bytes of the sample id set, computed
# from the scalar implementation at round-5 state
_PINNED = {
    (120000, 20): "5e1b35da40f3ae13e2203223d2c2ac9f",
    (20000, 20): "fe5422941306abe1f1fb7100c8a850ee",
    (600000, 150): "cd65308dcbd8746927c784d2907c9e96",
    (600, 0): "2788774ffaaffcd3d7ba15e7a02d41b8",
}


def _sample_ids(n):
    return (list(range(300)) + [i * 601 % n for i in range(300)]
            + [n - 1 - i for i in range(50)])


def test_batch_matches_pinned_scalar_hashes():
    for (n, fat), want in _PINNED.items():
        ids = _sample_ids(n)
        h = hashlib.md5()
        for raw in corpus.page_htmls_batch(ids, n, fat):
            h.update(raw)
        assert h.hexdigest() == want, (n, fat)


def test_batch_matches_scalar_rows():
    # full-row equality (url, warc_ts, html, text, lang) incl. the
    # malformed (%17) and bad-encoding (%23) subsets
    n, fat = 4000, 5
    ids = list(range(0, n, 7)) + [17 * 23, 17 * 23 * 2]
    rows_b = corpus.page_rows_batch(ids, n, fat)
    for i, row in zip(ids, rows_b):
        assert row == corpus.page_row(i, n, fat), i


def test_mix_vec_matches_scalar():
    rng = np.random.RandomState(7)
    a = rng.randint(0, 2**63, 200, dtype=np.int64).astype(np.uint64)
    b = rng.randint(0, 2**63, 200, dtype=np.int64).astype(np.uint64)
    got = corpus._mix_vec(a, b, np.uint64(6))
    for x, y, g in zip(a.tolist(), b.tolist(), got.tolist()):
        assert corpus._mix(x, y, 6) == g
