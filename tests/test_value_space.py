"""Value spaces beyond the reference sorted array's 65,535 cap
(ref RadixKMerStore.java:38-88 supports ~512k) must build and look up."""

import numpy as np
import jax.numpy as jnp

from genestrip_tpu.store.table import MAX_VALUES, TableBuilder
from genestrip_tpu.store.hash import build_hash, lookup_hash


def test_max_values_above_u16():
    assert MAX_VALUES > 65535


def test_table_builder_many_values():
    b = TableBuilder(31)
    rng = np.random.default_rng(0)
    keys = np.unique(rng.integers(0, 1 << 62, 200_100, dtype=np.uint64))[:200_000]
    # 100k distinct values, 2 k-mers each
    vidx = np.repeat(np.arange(100_000), 2).astype(np.int64)
    for v in range(100_000):
        b.get_add_value_index(str(v))
    b.add_pairs(keys, vidx)
    t = b.build()
    assert t.n_values == 100_000
    assert t.value_idx.dtype == np.int32
    assert int(t.value_idx.max()) == 99_999


def test_hash_lookup_wide_vidx():
    rng = np.random.default_rng(1)
    keys = np.unique(rng.integers(0, 1 << 62, 50_100, dtype=np.uint64))[:50_000]
    vidx = rng.integers(0, 500_000, len(keys)).astype(np.int64)
    ht = build_hash(keys, vidx)
    assert (1 << (ht.nb_bits - 1)) - 1 > 500_000
    q_hi = (keys[:4096] >> np.uint64(32)).astype(np.uint32)
    q_lo = (keys[:4096] & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    slot, found, v = lookup_hash(jnp.asarray(ht.rows), jnp.asarray(q_hi),
                                 jnp.asarray(q_lo), nb_bits=ht.nb_bits)
    assert np.asarray(found).all()
    np.testing.assert_array_equal(np.asarray(v), vidx[:4096])
