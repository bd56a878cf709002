"""Hash-table layout: build + device-lookup parity against the sorted table."""

import numpy as np
import jax.numpy as jnp

from genestrip_tpu.ops.kmer import split_u64
from genestrip_tpu.store.hash import BUCKET, build_hash, lookup_hash


def _world(n, seed=0, kbits=62):
    rng = np.random.default_rng(seed)
    keys = np.unique(rng.integers(0, 1 << kbits, n + 64, dtype=np.uint64))[:n]
    aux = np.stack([rng.integers(0, 30000, len(keys)).astype(np.int32),
                    rng.integers(0, 40, len(keys)).astype(np.int32)], axis=1)
    vidx = rng.integers(0, 60000, len(keys)).astype(np.uint16)
    return keys, aux, vidx


def test_build_places_all_keys():
    keys, aux, vidx = _world(50_000)
    ht = build_hash(keys, aux, vidx)
    assert ht.rows.shape[1] == 16 + 2 * 8
    # every key's slot holds its own hi/lo
    b, l = ht.slot_of_entry // BUCKET, ht.slot_of_entry % BUCKET
    hi, lo = split_u64(keys)
    np.testing.assert_array_equal(ht.rows[b, l].view(np.uint32), hi)
    np.testing.assert_array_equal(ht.rows[b, 8 + l].view(np.uint32), lo)
    np.testing.assert_array_equal(ht.vidx_of_slot[ht.slot_of_entry], vidx)
    # slots are unique
    assert len(np.unique(ht.slot_of_entry)) == len(keys)


def test_lookup_parity_hits_and_misses():
    keys, aux, vidx = _world(80_000, seed=3)
    ht = build_hash(keys, aux, vidx)
    rng = np.random.default_rng(7)
    q_hit = keys[rng.integers(0, len(keys), 5000)]
    q_miss = rng.integers(0, 1 << 62, 5000, dtype=np.uint64)
    q_miss = q_miss[~np.isin(q_miss, keys)]
    q = np.concatenate([q_hit, q_miss])
    q_hi, q_lo = split_u64(q)
    slot, found, aux_out = lookup_hash(
        jnp.asarray(ht.rows), jnp.asarray(q_hi), jnp.asarray(q_lo),
        nb=ht.nb, n_aux=2)
    slot, found, aux_out = np.asarray(slot), np.asarray(found), np.asarray(aux_out)
    nh = len(q_hit)
    assert found[:nh].all()
    assert not found[nh:].any()
    assert (slot[nh:] == ht.nb * BUCKET).all()
    # slot + aux parity for hits
    pos = np.searchsorted(keys, q_hit)
    np.testing.assert_array_equal(slot[:nh], ht.slot_of_entry[pos])
    np.testing.assert_array_equal(aux_out[:nh], aux[pos])


def test_lookup_2d_shapes_and_small_k():
    # k=15 keys (30-bit): hi plane is all zeros; empties must not collide
    keys, aux, vidx = _world(10_000, seed=5, kbits=30)
    ht = build_hash(keys, aux, vidx)
    q = np.concatenate([keys[:512], np.arange(1 << 30, (1 << 30) + 512, dtype=np.uint64)])
    q_hi, q_lo = split_u64(q)
    slot, found, aux_out = lookup_hash(
        jnp.asarray(ht.rows), jnp.asarray(q_hi.reshape(32, 32)),
        jnp.asarray(q_lo.reshape(32, 32)), nb=ht.nb, n_aux=2)
    found = np.asarray(found).reshape(-1)
    assert found[:512].all()
    assert not found[512:].any()
