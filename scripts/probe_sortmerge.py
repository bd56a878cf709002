"""Probe 3: sort-merge lookup building blocks at N=16M, Q=1M.

lookup(q) = rank/found/value of q in sorted table via:
  sort(concat(keys, queries)) -> scan(propagate last table entry) -> scatter back
"""
import time
import numpy as np
import jax
import jax.numpy as jnp


def bench(name, fn, *args, reps=5):
    out = jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name}: {(time.time() - t0) / reps * 1e3:8.3f} ms")
    return out


rng = np.random.default_rng(1)
N, Q = 16_000_000, 1_048_576
keys = np.unique(rng.integers(0, 1 << 62, N + 64, dtype=np.uint64))[:N]
queries = np.concatenate([
    keys[rng.integers(0, N, Q // 2)],
    rng.integers(0, 1 << 62, Q - Q // 2, dtype=np.uint64),
])
vidx = rng.integers(0, 60000, N, dtype=np.int64).astype(np.int32)

k_hi = jnp.asarray((keys >> 32).astype(np.int64).astype(np.uint32).view(np.int32))
k_lo = jnp.asarray((keys & 0xFFFFFFFF).astype(np.int64).astype(np.uint32).view(np.int32))
q_hi = jnp.asarray((queries >> 32).astype(np.int64).astype(np.uint32).view(np.int32))
q_lo = jnp.asarray((queries & 0xFFFFFFFF).astype(np.int64).astype(np.uint32).view(np.int32))
v = jnp.asarray(vidx)

# correctness of 2-key sort on u32-as-i32 with bias
BIAS = jnp.int32(-(1 << 31))


@jax.jit
def sortmerge(k_hi, k_lo, v, q_hi, q_lo):
    n, q = k_hi.shape[0], q_hi.shape[0]
    # bias so signed order == unsigned order
    a_hi = jnp.concatenate([k_hi, q_hi]) ^ BIAS
    a_lo = jnp.concatenate([k_lo, q_lo]) ^ BIAS
    # tag: table entries first on ties (tag 0 < 1)
    tag = jnp.concatenate([jnp.zeros(n, jnp.int32), jnp.ones(q, jnp.int32)])
    # payload: table rank or query id
    pay = jnp.concatenate([jnp.arange(n, dtype=jnp.int32),
                           jnp.arange(q, dtype=jnp.int32)])
    val = jnp.concatenate([v, jnp.zeros(q, jnp.int32)])
    s_hi, s_lo, s_tag, s_pay, s_val = jax.lax.sort(
        (a_hi, a_lo, tag, pay, val), num_keys=3)
    # propagate the most recent table entry (tag==0) to each position
    is_t = s_tag == 0
    rank = jnp.cumsum(is_t.astype(jnp.int32)) - 1          # last table idx so far
    # propagate hi/lo/val of last table entry via associative max-scan over
    # (rank-tagged composite): values only change at table entries, so a
    # "last value" scan == gather at rank -> needs gather. Instead scan tuples:
    def combine(x, y):
        pick = y[0] >= 0
        return tuple(jnp.where(pick, yy, xx) for xx, yy in zip(x, y))
    init = (jnp.where(is_t, rank, -1),
            jnp.where(is_t, s_hi, 0), jnp.where(is_t, s_lo, 0),
            jnp.where(is_t, s_val, 0))
    p_rank, p_hi, p_lo, p_val = jax.lax.associative_scan(combine, init)
    found = (p_hi == s_hi) & (p_lo == s_lo) & (p_rank >= 0)
    # scatter back to query order
    out_pos = jnp.zeros(q, jnp.int32).at[s_pay].set(
        p_rank, mode="drop", unique_indices=False) * 0  # placeholder
    tgt = jnp.where(is_t, q, s_pay)  # drop table rows via OOB index
    pos_q = jnp.zeros(q + 1, jnp.int32).at[tgt].set(p_rank)[:q]
    found_q = jnp.zeros(q + 1, bool).at[tgt].set(found)[:q]
    val_q = jnp.zeros(q + 1, jnp.int32).at[tgt].set(jnp.where(found, p_val, -1))[:q]
    return pos_q, found_q, val_q


pos_q, found_q, val_q = bench("sortmerge 16M+1M e2e", sortmerge, k_hi, k_lo, v, q_hi, q_lo)

# golden
lb = np.searchsorted(keys, queries, side="right") - 1
fnd = (lb >= 0) & (keys[np.maximum(lb, 0)] == queries)
print("found parity:", np.array_equal(np.asarray(found_q), fnd))
print("pos parity:", np.array_equal(np.asarray(pos_q)[fnd], lb[fnd]))
print("val parity:", np.array_equal(np.asarray(val_q)[fnd], vidx[lb[fnd]]))

# individual pieces
@jax.jit
def just_sort(k_hi, k_lo, v, q_hi, q_lo):
    a_hi = jnp.concatenate([k_hi, q_hi]) ^ BIAS
    a_lo = jnp.concatenate([k_lo, q_lo]) ^ BIAS
    pay = jnp.arange(a_hi.shape[0], dtype=jnp.int32)
    return jax.lax.sort((a_hi, a_lo, pay), num_keys=2)


bench("sort 17M 2key+payload", just_sort, k_hi, k_lo, v, q_hi, q_lo)

M = N + Q
x = jnp.asarray(rng.integers(0, 1 << 30, M, dtype=np.int64).astype(np.int32))


@jax.jit
def just_scan(x):
    return jax.lax.associative_scan(jnp.maximum, x)


bench("assoc scan 17M 1xi32", just_scan, x)

sidx = jnp.asarray(rng.permutation(M).astype(np.int32))


@jax.jit
def just_scatter(x, sidx):
    return jnp.zeros(M, jnp.int32).at[sidx].set(x)


bench("scatter 17M i32", just_scatter, x, sidx)


@jax.jit
def just_cumsum(x):
    return jnp.cumsum(x)


bench("cumsum 17M i32", just_cumsum, x)
