"""Quotient-hash layout: build + device-lookup parity against the sorted
table, including exactness on misses (zero false positives)."""

import numpy as np
import jax.numpy as jnp

from genestrip_tpu.ops.kmer import split_u64
from genestrip_tpu.store.hash import (
    BUCKET, build_hash, lookup_hash, lookup_join, max_values_for,
)


def _world(n, seed=0, kbits=62, vmax=60000):
    rng = np.random.default_rng(seed)
    keys = np.unique(rng.integers(0, 1 << kbits, n + 64, dtype=np.uint64))[:n]
    vidx = rng.integers(0, min(vmax, max_values_for(len(keys))),
                        len(keys)).astype(np.int64)
    return keys, vidx


def _lookup(ht, q):
    q_hi, q_lo = split_u64(q)
    slot, found, vidx = lookup_hash(
        jnp.asarray(ht.rows), jnp.asarray(q_hi), jnp.asarray(q_lo),
        nb_bits=ht.nb_bits)
    return np.asarray(slot), np.asarray(found), np.asarray(vidx)


def test_build_places_all_keys():
    keys, vidx = _world(50_000)
    ht = build_hash(keys, vidx)
    assert ht.rows.shape[1] == 8
    np.testing.assert_array_equal(ht.vidx_of_slot[ht.slot_of_entry], vidx)
    # slots are unique and in range
    assert len(np.unique(ht.slot_of_entry)) == len(keys)
    assert int(ht.slot_of_entry.max()) < ht.n_slots


def test_lookup_parity_hits_and_misses():
    keys, vidx = _world(80_000, seed=3)
    ht = build_hash(keys, vidx)
    rng = np.random.default_rng(7)
    q_hit = keys[rng.integers(0, len(keys), 5000)]
    q_miss = rng.integers(0, 1 << 62, 5000, dtype=np.uint64)
    q_miss = q_miss[~np.isin(q_miss, keys)]
    q = np.concatenate([q_hit, q_miss])
    slot, found, v = _lookup(ht, q)
    nh = len(q_hit)
    assert found[:nh].all()
    assert not found[nh:].any()
    assert (slot[nh:] == ht.n_slots).all()
    assert (v[nh:] == -1).all()
    pos = np.searchsorted(keys, q_hit)
    np.testing.assert_array_equal(slot[:nh], ht.slot_of_entry[pos])
    np.testing.assert_array_equal(v[:nh], vidx[pos])


def test_exactness_adversarial_bucket_collisions():
    """Queries engineered to share buckets with stored keys must not
    false-positive: sweep a dense key range so many bucket collisions and
    near-collisions occur."""
    keys = np.arange(1_000_000, 1_200_000, dtype=np.uint64)
    vidx = (keys % 1000).astype(np.int64)
    ht = build_hash(keys, vidx)
    q = np.arange(900_000, 1_500_000, 7, dtype=np.uint64)
    slot, found, v = _lookup(ht, q)
    expect = (q >= 1_000_000) & (q < 1_200_000)
    np.testing.assert_array_equal(found, expect)
    np.testing.assert_array_equal(v[expect], (q[expect] % 1000).astype(np.int64))


def test_lookup_2d_shapes_and_small_k():
    # k=15 keys (30-bit): hi plane is all zeros; empties must not collide
    keys, vidx = _world(10_000, seed=5, kbits=30)
    ht = build_hash(keys, vidx)
    q = np.concatenate([keys[:512],
                        np.arange(1 << 30, (1 << 30) + 512, dtype=np.uint64)])
    miss_mask = ~np.isin(q[512:], keys)
    slot, found, v = _lookup(
        ht, q.reshape(32, 32))
    found = found.reshape(-1)
    assert found[:512].all()
    assert not found[512:][miss_mask].any()


def test_empty_and_tiny_tables():
    ht = build_hash(np.zeros(0, np.uint64), np.zeros(0, np.int64))
    q = np.arange(0, 64, dtype=np.uint64)
    slot, found, v = _lookup(ht, q)
    assert not found.any()
    ht2 = build_hash(np.array([5, 77], np.uint64), np.array([1, 0], np.int64))
    slot, found, v = _lookup(ht2, q)
    assert found.sum() == 1 and v[5] == 1          # only key 5 is in range
    s5, f5, v5 = _lookup(ht2, np.array([5, 77, 6], np.uint64))
    assert list(f5) == [True, True, False]
    assert list(v5[:2]) == [1, 0]


def test_value_capacity_scales_with_table():
    assert max_values_for(100) == (1 << 16) - 1
    assert max_values_for(40_000_000) > 1 << 20


# ---------------------------------------------------------------------------
# scatter-join lookup (the fast path): parity against the two-gather lookup
# ---------------------------------------------------------------------------

def _lookup_join(ht, q, **kw):
    q_hi, q_lo = split_u64(q)
    slot, found, vidx = lookup_join(
        jnp.asarray(ht.rows), jnp.asarray(q_hi), jnp.asarray(q_lo),
        nb_bits=ht.nb_bits, **kw)
    return np.asarray(slot), np.asarray(found), np.asarray(vidx)


def _assert_join_matches_gather(ht, q, **kw):
    s1, f1, v1 = _lookup(ht, q)
    s2, f2, v2 = _lookup_join(ht, q, **kw)
    np.testing.assert_array_equal(f2, f1)
    np.testing.assert_array_equal(v2, v1)
    np.testing.assert_array_equal(s2, s1)


def test_join_parity_random():
    keys, vidx = _world(200_000, seed=11)
    ht = build_hash(keys, vidx)
    rng = np.random.default_rng(13)
    q = np.concatenate([
        keys[rng.integers(0, len(keys), 120_000)],
        rng.integers(0, 1 << 62, 80_000, dtype=np.uint64),
    ])
    rng.shuffle(q)
    _assert_join_matches_gather(ht, q)


def test_join_parity_adversarial_dense_and_duplicates():
    keys = np.arange(5_000_000, 5_200_000, dtype=np.uint64)
    vidx = (keys % 997).astype(np.int64)
    ht = build_hash(keys, vidx)
    # heavy duplication (every query appears ~8x) + dense near-collisions
    q = np.tile(np.arange(4_990_000, 5_010_000, dtype=np.uint64), 8)
    _assert_join_matches_gather(ht, q)


def test_join_fallback_paths():
    keys, vidx = _world(100_000, seed=17)
    ht = build_hash(keys, vidx)
    rng = np.random.default_rng(19)
    q = np.concatenate([
        keys[rng.integers(0, len(keys), 50_000)],
        rng.integers(0, 1 << 62, 50_000, dtype=np.uint64),
    ])
    # r_lanes=1 forces mass rank-overflow -> exercises the compacted
    # fallback; fallback_cap tiny on top forces the full-gather cond branch
    _assert_join_matches_gather(ht, q, r_lanes=1)
    _assert_join_matches_gather(ht, q, r_lanes=1, fallback_cap=64)


def test_join_2d_shape_and_tiny_table():
    ht = build_hash(np.array([5, 77], np.uint64), np.array([1, 0], np.int64))
    q = np.arange(0, 4096, dtype=np.uint64).reshape(64, 64)
    s, f, v = _lookup_join(ht, q)
    assert f.shape == (64, 64)
    assert f.sum() == 2
    assert v[0, 5] == 1 and v[1, 13] == 0


def test_hash_persistence_roundtrip(tmp_path):
    """The hash persisted in the db zip (store/database.py save include_hash)
    must reload bit-identically, and a loaded db must expose it."""
    from genestrip_tpu.store.database import Database
    from genestrip_tpu.store.hash import vidx_of_slot_from_rows
    from genestrip_tpu.store.table import KmerTable
    from genestrip_tpu.tax.small import SmallTaxTree

    keys, vidx = _world(20_000, seed=5, vmax=50)
    values = [str(1000 + i) for i in range(int(vidx.max()) + 1)]
    table = KmerTable(31, keys, vidx.astype(np.int32), values)
    taxids = ["1"] + values
    parent = np.full(len(taxids), 0, np.int32)
    parent[0] = -1
    tree = SmallTaxTree(taxids, taxids, [-1] * len(taxids), parent,
                        np.zeros(len(taxids), bool))
    db = Database(table, tree, {})
    p = tmp_path / "db.zip"
    db.save(p, include_hash=True)

    loaded = Database.load(p)
    assert loaded.prebuilt_hash is not None
    want = build_hash(keys, table.value_idx)
    got = loaded.prebuilt_hash
    assert got.nb_bits == want.nb_bits
    np.testing.assert_array_equal(got.rows, want.rows)
    np.testing.assert_array_equal(got.slot_of_entry, want.slot_of_entry)
    np.testing.assert_array_equal(got.vidx_of_slot, want.vidx_of_slot)
    # derivation helper agrees with the builder's direct vidx_of_slot
    np.testing.assert_array_equal(
        vidx_of_slot_from_rows(want.rows, want.nb_bits), want.vidx_of_slot)
    # MD5 identity is unaffected by the hash entry
    db2 = Database(table, tree, {})
    p2 = tmp_path / "db2.zip"
    db2.save(p2, include_hash=False)
    assert Database.load(p2).md5 == loaded.md5
    assert Database.load(p2).prebuilt_hash is None


def test_hash_persistence_stale_stamp_ignored(tmp_path):
    """A persisted hash whose db_md5 stamp mismatches the zip's table is
    ignored at load (derived-data safety)."""
    import io as _io
    import zipfile
    from genestrip_tpu.store.database import Database, HASH_FILE
    from genestrip_tpu.store.table import KmerTable
    from genestrip_tpu.tax.small import SmallTaxTree

    keys, vidx = _world(5_000, seed=9, vmax=10)
    values = [str(1000 + i) for i in range(int(vidx.max()) + 1)]
    table = KmerTable(31, keys, vidx.astype(np.int32), values)
    taxids = ["1"] + values
    parent = np.full(len(taxids), 0, np.int32)
    parent[0] = -1
    tree = SmallTaxTree(taxids, taxids, [-1] * len(taxids), parent,
                        np.zeros(len(taxids), bool))
    p = tmp_path / "db.zip"
    Database(table, tree, {}).save(p, include_hash=True)
    # corrupt the stamp
    with zipfile.ZipFile(p) as z:
        names = {n: z.read(n) for n in z.namelist()}
    with np.load(_io.BytesIO(names[HASH_FILE])) as h:
        arrs = {k: h[k] for k in h.files}
    arrs["db_md5"] = np.array("deadbeef")
    buf = _io.BytesIO()
    np.savez(buf, **arrs)
    names[HASH_FILE] = buf.getvalue()
    with zipfile.ZipFile(p, "w") as z:
        for n, b in names.items():
            z.writestr(n, b)
    assert Database.load(p).prebuilt_hash is None
