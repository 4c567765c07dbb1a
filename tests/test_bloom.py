"""A4/A5 Bloom filter: no false negatives ever; fpp near nominal; merge."""

import numpy as np
import pytest

from sparkcrawl import bloom


def test_no_false_negatives():
    rng = np.random.RandomState(42)
    keys = rng.randint(-(2**62), 2**62, size=5000, dtype=np.int64)
    blob = bloom.add_many(bloom.create(5000, 0.01), keys)
    assert bloom.contains_many(blob, keys).all()


def test_fpp_near_nominal():
    rng = np.random.RandomState(7)
    keys = rng.randint(-(2**62), 2**62, size=10000, dtype=np.int64)
    others = rng.randint(-(2**62), 2**62, size=20000, dtype=np.int64)
    others = np.setdiff1d(others, keys)
    blob = bloom.add_many(bloom.create(10000, 0.01), keys)
    fp = bloom.contains_many(blob, others).mean()
    assert fp < 0.03, fp


def test_merge_is_union():
    a_keys = np.arange(0, 1000, dtype=np.int64)
    b_keys = np.arange(500, 1500, dtype=np.int64)
    base = bloom.create(4000, 0.01)
    a = bloom.add_many(base, a_keys)
    b = bloom.add_many(base, b_keys)
    m = bloom.merge(a, b)
    assert bloom.contains_many(m, a_keys).all()
    assert bloom.contains_many(m, b_keys).all()
    assert bloom.n_items(m) == 2000


def test_merge_incompatible_raises():
    with pytest.raises(ValueError):
        bloom.merge(bloom.create(100), bloom.create(100000))


def test_none_blob_means_unseen():
    assert not bloom.contains_many(None, np.array([1, 2, 3])).any()


def test_empty_hashes():
    blob = bloom.create(10)
    assert bloom.add_many(blob, np.array([], dtype=np.int64)) == blob
    assert bloom.contains_many(blob, []).size == 0
