"""Measure the scatter-join lookup with the Pallas dense-pass kernel vs the
XLA lowering at bench shapes (16M-key table, 1M queries). Both paths are
bit-identical (tests/test_pallas_lookup.py); this decides the default."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

from genestrip_tpu.store.hash import build_hash, lookup_join

N = 16_000_000
Q = 1 << 20
rng = np.random.default_rng(0)
keys = np.unique(rng.integers(0, 2**62, int(2.2 * N), dtype=np.uint64))[:N]
vidx = rng.integers(0, 256, N).astype(np.int64)
t0 = time.time()
ht = build_hash(keys, vidx)
print(f"build_hash {time.time()-t0:.1f}s nb_bits={ht.nb_bits}", flush=True)
rows = jnp.asarray(ht.rows)
q = np.concatenate([keys[rng.integers(0, N, Q // 2)],
                    rng.integers(0, 2**62, Q - Q // 2, dtype=np.uint64)])
rng.shuffle(q)
qh = jnp.asarray((q >> np.uint64(32)).astype(np.uint32).view(np.int32))
ql = jnp.asarray((q & np.uint64(0xFFFFFFFF)).astype(np.uint32).view(np.int32))


def bench(name, use_pallas):
    f = jax.jit(lambda r, a, b: lookup_join(
        r, a, b, nb_bits=ht.nb_bits, use_pallas=use_pallas)[1].sum())
    t0 = time.time()
    n0 = jax.block_until_ready(f(rows, qh, ql))
    c = time.time() - t0
    t0 = time.time()
    reps = 20
    for _ in range(reps):
        jax.block_until_ready(f(rows, qh, ql))
    per = (time.time() - t0) / reps
    print(f"{name:16s}: {per*1e3:7.3f} ms/1M ({Q/per/1e9:6.2f} G lookups/s) "
          f"compile {c:6.1f}s found={int(n0)}", flush=True)


bench("xla dense", False)
bench("pallas dense", True)
bench("xla dense", False)
