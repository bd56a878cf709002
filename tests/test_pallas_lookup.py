"""Pallas dense-pass kernel (ops/pallas_lookup.py) must be bit-identical to
the XLA lowering. Decision note: the production lookup_join uses the XLA
lowering unconditionally (store/hash.py dense pass) — measured 9.75 G
lookups/s on v5e, while the Pallas tile exceeds the scoped-VMEM limit at the
16M-key scale; the kernel is kept as the documented alternative. Runs in
interpreter mode on the CPU backend."""


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
