"""KmerTable tests — the shared store contract of the reference
(core store/AbstractKMerStoreTest.java: put/get/optimize/update/visit over
random k-mers), adapted to the build-then-lookup table design.
"""

import numpy as np
import jax.numpy as jnp

from genestrip_tpu.ops.kmer import split_u64, merge_u64
from genestrip_tpu.store.table import KmerTable, TableBuilder, lookup_positions


def random_table(rng, n, n_values=5, k=31):
    kmers = rng.choice(2**62, size=n, replace=False).astype(np.uint64)
    b = TableBuilder(k)
    for vi in range(n_values):
        sel = kmers[vi::n_values]
        b.add(sel, str(1000 + vi))
    return b.build(), kmers


def test_build_dedup_first_wins():
    b = TableBuilder(31)
    b.add(np.array([5, 7, 9], dtype=np.uint64), "100")
    b.add(np.array([7, 11], dtype=np.uint64), "200")  # 7 is a dup: first wins
    t = b.build()
    np.testing.assert_array_equal(t.keys, [5, 7, 9, 11])
    vi, pos = t.get_np(np.array([5, 7, 9, 11, 6], dtype=np.uint64))
    assert t.values[vi[0]] == "100"
    assert t.values[vi[1]] == "100"  # first insertion won
    assert t.values[vi[3]] == "200"
    assert vi[4] == -1 and pos[4] == -1
    np.testing.assert_array_equal(pos[:4], [0, 1, 2, 3])


def test_add_pairs_unsorted_duplicate_free_alignment():
    # Regression (round-4 advisor, high): a duplicate-free UNSORTED
    # add_pairs chunk must keep values aligned to their k-mers through
    # build()'s sort. Previously keys were sorted without the values.
    b = TableBuilder(31)
    for v in ("a", "b", "c"):
        b.get_add_value_index(v)
    b.add_pairs(np.array([30, 10, 20], np.uint64), np.array([0, 1, 2], np.int32))
    t = b.build()
    np.testing.assert_array_equal(t.keys, [10, 20, 30])
    np.testing.assert_array_equal(t.value_idx, [1, 2, 0])


def test_add_pairs_duplicates_first_wins_unsorted():
    b = TableBuilder(31)
    for v in ("a", "b", "c"):
        b.get_add_value_index(v)
    # duplicate key 20: the FIRST pair (20 -> 2) wins
    b.add_pairs(np.array([30, 20, 10, 20], np.uint64),
                np.array([0, 2, 1, 0], np.int32))
    t = b.build()
    np.testing.assert_array_equal(t.keys, [10, 20, 30])
    np.testing.assert_array_equal(t.value_idx, [1, 2, 0])


def test_host_lookup_random():
    rng = np.random.default_rng(1)
    t, kmers = random_table(rng, 1000)
    vi, pos = t.get_np(kmers)
    assert (vi >= 0).all()
    np.testing.assert_array_equal(t.keys[pos], kmers)
    missing = rng.choice(2**62, size=500).astype(np.uint64)
    mask = ~np.isin(missing, t.keys)
    vi2, _ = t.get_np(missing)
    assert (vi2[mask] == -1).all()


def test_device_lookup_matches_host():
    rng = np.random.default_rng(2)
    t, kmers = random_table(rng, 777)
    queries = np.concatenate([kmers[:300], rng.choice(2**62, size=300).astype(np.uint64)])
    rng.shuffle(queries)
    want_vi, want_pos = t.get_np(queries)
    d = t.device_arrays()
    q_hi, q_lo = split_u64(queries)
    pos, found = lookup_positions(d["hi"], d["lo"], jnp.asarray(q_hi), jnp.asarray(q_lo), d["n"])
    pos, found = np.asarray(pos), np.asarray(found)
    np.testing.assert_array_equal(found, want_pos >= 0)
    np.testing.assert_array_equal(pos[found], want_pos[found])


def test_device_lookup_empty_table():
    t = TableBuilder(31).build()
    d = t.device_arrays()
    pos, found = lookup_positions(d["hi"], d["lo"], jnp.zeros(4, jnp.uint32), jnp.zeros(4, jnp.uint32), d["n"])
    assert not np.asarray(found).any()


def test_update_values():
    rng = np.random.default_rng(3)
    t, kmers = random_table(rng, 100)
    # Move all k-mers of value "1000" to a new value "1" (like an LCA rewrite).
    new_idx = t.get_add_value_index("1")
    sel = t.value_idx == t.get_index_for_value("1000")
    t.set_value_idx_at(np.where(sel)[0], np.full(sel.sum(), new_idx))
    counts = t.n_kmers_per_value()
    assert counts[t.get_index_for_value("1000")] == 0
    assert counts[new_idx] == sel.sum()
    assert counts.sum() == t.entries


def test_save_load_roundtrip(tmp_path):
    rng = np.random.default_rng(4)
    t, _ = random_table(rng, 50)
    p = tmp_path / "table.npz"
    t.save_npz(p)
    t2 = KmerTable.load_npz(p)
    assert t2.k == t.k
    np.testing.assert_array_equal(t2.keys, t.keys)
    np.testing.assert_array_equal(t2.value_idx, t.value_idx)
    assert t2.values == t.values
