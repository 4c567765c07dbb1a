"""A4-alt cuckoo filter: no false negatives, low fpp, delete, merge,
interface parity with bloom."""

import numpy as np
import pytest

from sparkcrawl import bloom, cuckoo


def test_no_false_negatives():
    rng = np.random.RandomState(42)
    keys = rng.randint(-(2**62), 2**62, size=5000, dtype=np.int64)
    blob = cuckoo.add_many(cuckoo.create(8000), keys)
    assert cuckoo.contains_many(blob, keys).all()


def test_fpp_small():
    rng = np.random.RandomState(7)
    keys = rng.randint(-(2**62), 2**62, size=8000, dtype=np.int64)
    others = np.setdiff1d(
        rng.randint(-(2**62), 2**62, size=20000, dtype=np.int64), keys)
    blob = cuckoo.add_many(cuckoo.create(12000), keys)
    assert cuckoo.contains_many(blob, others).mean() < 0.01


def test_delete():
    keys = np.arange(1000, dtype=np.int64)
    blob = cuckoo.add_many(cuckoo.create(2000), keys)
    blob = cuckoo.delete_many(blob, keys[:500])
    assert cuckoo.contains_many(blob, keys[500:]).all()
    # deleted keys mostly gone (residual hits only via fp collisions)
    assert cuckoo.contains_many(blob, keys[:500]).mean() < 0.02
    assert cuckoo.n_items(blob) == 500


def test_merge_is_union():
    a_keys = np.arange(0, 1500, dtype=np.int64)
    b_keys = np.arange(1500, 3000, dtype=np.int64)
    base = cuckoo.create(6000)
    m = cuckoo.merge(cuckoo.add_many(base, a_keys),
                     cuckoo.add_many(base, b_keys))
    assert cuckoo.contains_many(m, a_keys).all()
    assert cuckoo.contains_many(m, b_keys).all()


def test_over_capacity_raises():
    keys = np.arange(10000, dtype=np.int64)
    with pytest.raises(OverflowError):
        cuckoo.add_many(cuckoo.create(16), keys)


def test_interface_parity_with_bloom():
    for mod in (bloom, cuckoo):
        blob = mod.create(1000, 0.01)
        blob = mod.add_many(blob, np.arange(100, dtype=np.int64))
        assert mod.contains_many(blob, np.arange(100, dtype=np.int64)).all()
        assert mod.n_items(blob) == 100
        assert isinstance(mod.params(blob), dict)
        assert not mod.contains_many(None, np.array([1], dtype=np.int64)).any()
