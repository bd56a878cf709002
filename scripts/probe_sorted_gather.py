"""Probe: XLA HBM gather with sorted vs random indices; row gathers; and the
sort(1M queries)+gather+scatter-back roundtrip that a sort-locality lookup
would use."""
import time
import numpy as np
import jax
import jax.numpy as jnp


def bench(name, fn, *args, reps=10):
    out = jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / reps
    print(f"{name}: {dt*1e3:8.3f} ms", flush=True)
    return out


rng = np.random.default_rng(0)
N = 16_000_000
Q = 1 << 20
tab = jnp.asarray(rng.integers(0, 1 << 31, N, dtype=np.int64).astype(np.int32))
tab_rows = jnp.asarray(rng.integers(0, 1 << 31, (N, 8), dtype=np.int64).astype(np.int32))
idx_rand = rng.integers(0, N, Q).astype(np.int32)
idx_sort = np.sort(idx_rand).astype(np.int32)
j_rand = jnp.asarray(idx_rand)
j_sort = jnp.asarray(idx_sort)

g1 = jax.jit(lambda t, i: t[i])
bench("gather 1M random   from 16M i32", g1, tab, j_rand)
bench("gather 1M sorted   from 16M i32", g1, tab, j_sort)

g8 = jax.jit(lambda t, i: t[i])
bench("row-gather 1M random from [16M,8]", g8, tab_rows, j_rand)
bench("row-gather 1M sorted from [16M,8]", g8, tab_rows, j_sort)

# sort + gather + unsort roundtrip
q_hi = jnp.asarray(rng.integers(0, 1 << 31, Q, dtype=np.int64).astype(np.int32))


@jax.jit
def sort_gather_unsort(tab, q):
    ids = jnp.arange(Q, dtype=jnp.int32)
    sq, sid = jax.lax.sort((q, ids), num_keys=1)
    # fake "lookup result" = gather at scaled position (sorted -> sorted idx)
    pos = (sq.astype(jnp.uint32) >> jnp.uint32(7)).astype(jnp.int32) % N
    val = tab[pos]
    # scatter back to original order
    return jnp.zeros(Q, jnp.int32).at[sid].set(val)


bench("sort+monotone-gather+unscatter 1M", sort_gather_unsort, tab, q_hi)

# 3-key 1M sort (hi, lo, payload) — what the real pipeline needs
q_lo = jnp.asarray(rng.integers(0, 1 << 31, Q, dtype=np.int64).astype(np.int32))
s3 = jax.jit(lambda a, b: jax.lax.sort((a, b, jnp.arange(Q, dtype=jnp.int32)), num_keys=2))
bench("sort 1M 2key+payload", s3, q_hi, q_lo)

# batched row sorts: [16, 1M] independent sorts (for >1M query batches)
big = jnp.asarray(rng.integers(0, 1 << 31, (16, Q), dtype=np.int64).astype(np.int32))
sb = jax.jit(lambda a: jax.lax.sort((a, jnp.broadcast_to(jnp.arange(Q, dtype=jnp.int32), (16, Q))), dimension=1, num_keys=1))
bench("sort [16,1M] rows independently", sb, big)
print("done")
