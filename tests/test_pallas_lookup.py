"""Pallas dense-pass kernel (ops/pallas_lookup.py) must be bit-identical to
the XLA lowering, and lookup_join(use_pallas=True) must reproduce
lookup_join's exact results. Runs in interpreter mode on the CPU backend."""

import numpy as np
import pytest

import jax.numpy as jnp

from genestrip_tpu.ops.pallas_lookup import dense_pass_pallas, dense_pass_xla
from genestrip_tpu.store.hash import build_hash, lookup_join


def test_dense_pass_parity():
    rng = np.random.default_rng(0)
    NB, R, vb = 4096, 4, 16
    rows = rng.integers(-2**31, 2**31, (NB, 8), dtype=np.int64).astype(np.int32)
    # make some scratch lanes real matches
    sh = rng.integers(-2**31, 2**31, (NB, R), dtype=np.int64).astype(np.int32)
    sw = rng.integers(0, 2**15, (NB, R), dtype=np.int64).astype(np.int32)
    hit = rng.random((NB, R)) < 0.4
    j = rng.integers(0, 4, (NB, R))
    for b in range(0, NB, 7):        # plant exact matches on a subset
        for r in range(R):
            if hit[b, r]:
                jj = int(j[b, r])
                sh[b, r] = rows[b, jj]
                sw[b, r] = int((int(rows[b, 4 + jj]) & 0xFFFFFFFF) >> vb)
    a = np.asarray(dense_pass_pallas(jnp.asarray(rows), jnp.asarray(sh),
                                     jnp.asarray(sw), vb=vb, tile=512,
                                     interpret=True))
    b_ = np.asarray(dense_pass_xla(jnp.asarray(rows), jnp.asarray(sh),
                                   jnp.asarray(sw), vb=vb))
    np.testing.assert_array_equal(a, b_)


def test_lookup_join_pallas_matches(monkeypatch):
    # interpret mode on CPU: patch the kernel entry to force interpret=True
    import genestrip_tpu.ops.pallas_lookup as pm
    orig = pm.dense_pass_pallas

    def interp(rows, sh, sw, *, vb, tile=2048, interpret=False):
        return orig(rows, sh, sw, vb=vb, tile=tile, interpret=True)

    monkeypatch.setattr(pm, "dense_pass_pallas", interp)

    rng = np.random.default_rng(1)
    n = 40_000
    keys = np.unique(rng.integers(0, 2**62, int(2.5 * n), dtype=np.uint64))[:n]
    vidx = rng.integers(0, 500, n).astype(np.int64)
    ht = build_hash(keys, vidx)
    q = np.concatenate([keys[rng.integers(0, n, 30_000)],
                        rng.integers(0, 2**62, 30_000, dtype=np.uint64)])
    rng.shuffle(q)
    q_hi = jnp.asarray((q >> np.uint64(32)).astype(np.uint32).view(np.int32))
    q_lo = jnp.asarray((q & np.uint64(0xFFFFFFFF)).astype(np.uint32).view(np.int32))
    rows = jnp.asarray(ht.rows)
    s0, f0, v0 = lookup_join(rows, q_hi, q_lo, nb_bits=ht.nb_bits)
    s1, f1, v1 = lookup_join(rows, q_hi, q_lo, nb_bits=ht.nb_bits,
                             use_pallas=True)
    np.testing.assert_array_equal(np.asarray(f0), np.asarray(f1))
    np.testing.assert_array_equal(np.asarray(v0), np.asarray(v1))
    np.testing.assert_array_equal(np.asarray(s0), np.asarray(s1))
