"""What this established: the XLA dense-pass lowering beats the Pallas
kernel — 9.75 G lookups/s through lookup_join on v5e, while the Pallas tile
exceeds the scoped-VMEM stack limit at the 16M-key shape. The production
path (store/hash.py) therefore uses the XLA lowering unconditionally; the
use_pallas flag was removed (VERDICT r4 item 4). Kernel comparison below
now drives ops/pallas_lookup.dense_pass_* directly."""
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
    # NOTE: lookup_join no longer takes use_pallas; compare the kernels
    # directly instead
    from genestrip_tpu.ops.pallas_lookup import dense_pass_pallas, dense_pass_xla
    R = 4
    sh = jnp.zeros((1 << ht.nb_bits, R), jnp.int32)
    sw = jnp.zeros((1 << ht.nb_bits, R), jnp.int32)
    dp = dense_pass_pallas if use_pallas else dense_pass_xla
    f = jax.jit(lambda r, a, b: dp(r, sh, sw, vb=ht.nb_bits - 1).sum())
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
