"""Trustworthy device microbenchmarks for the axon-tunneled TPU.

jax.block_until_ready does NOT reliably block on this backend and the
host<->device link is ~12 MB/s, so every measurement here:
  * chains iterations with data dependencies inside ONE jit (so the device
    must actually execute them sequentially), and
  * materializes only a scalar reduction to the host for the sync.

Timing = (t_chain(iters) - t_chain(1)) / (iters - 1) cancels the dispatch +
scalar-copy constant.
"""
import time
import numpy as np
import jax
import jax.numpy as jnp
from functools import partial


def run_chain(make_fn, state, iters):
    """make_fn(n) -> jitted fn running n dependent iterations over state."""
    f1 = make_fn(1)
    fN = make_fn(iters)
    # warm both compiles
    float(np.asarray(f1(*state)))
    float(np.asarray(fN(*state)))
    t0 = time.time()
    r1 = float(np.asarray(f1(*state)))
    t1 = time.time()
    rN = float(np.asarray(fN(*state)))
    t2 = time.time()
    per = ((t2 - t1) - (t1 - t0)) / (iters - 1)
    return per, r1


def report(name, per, work, unit):
    print(f"{name:44s}: {per*1e3:9.3f} ms/iter  {work/per/1e9:10.2f} G{unit}/s", flush=True)


rng = np.random.default_rng(0)

# ---- 0. matmul calibration --------------------------------------------------
n = 4096
A = jnp.asarray(rng.standard_normal((n, n), dtype=np.float32))


def mk_mm(iters):
    @jax.jit
    def f(a):
        x = a
        for _ in range(iters):
            x = x @ a * jnp.float32(1e-4)
        return jnp.sum(x[0, :8])
    return f


per, _ = run_chain(mk_mm, (A,), 16)
report("matmul f32 4096^3", per, 2 * n**3, "FLOP")

Ab = A.astype(jnp.bfloat16)


def mk_mmb(iters):
    @jax.jit
    def f(a):
        x = a
        for _ in range(iters):
            x = (x @ a * jnp.bfloat16(1e-4)).astype(jnp.bfloat16)
        return jnp.sum(x[0, :8].astype(jnp.float32))
    return f


per, _ = run_chain(mk_mmb, (Ab,), 16)
report("matmul bf16 4096^3", per, 2 * n**3, "FLOP")

# ---- 1. HBM stream bandwidth ------------------------------------------------
M = 1 << 26  # 64M f32 = 256MB
big = jnp.asarray(rng.standard_normal(M, dtype=np.float32))


def mk_stream(iters):
    @jax.jit
    def f(x):
        for _ in range(iters):
            x = x * jnp.float32(1.0000001) + jnp.float32(1e-9)
        return x[0]
    return f


per, _ = run_chain(mk_stream, (big,), 8)
report("elementwise stream 256MB (r+w)", per, 2 * M * 4, "B")

# ---- 2. sort 1M (2key + payload) ---------------------------------------------
Q = 1 << 20
x = jnp.asarray(rng.integers(0, 1 << 31, Q, dtype=np.int64).astype(np.int32))
y = jnp.asarray(rng.integers(0, 1 << 31, Q, dtype=np.int64).astype(np.int32))


def mk_sort(iters):
    @jax.jit
    def f(a, b):
        p = jnp.arange(Q, dtype=jnp.int32)
        for _ in range(iters):
            a, b, p = jax.lax.sort((a, b, p), num_keys=2)
            a, b = b, a  # re-disorder so next sort does real work
        return (a[0] + b[0] + p[0]).astype(jnp.float32)
    return f


per, _ = run_chain(mk_sort, (x, y), 8)
report("sort 1M 2key+payload", per, Q, "elem")

# ---- 3. gathers ----------------------------------------------------------------
N = 16_000_000
tab = jnp.asarray(rng.integers(0, 1 << 31, N, dtype=np.int64).astype(np.int32))
tabr = jnp.asarray(rng.integers(0, 1 << 31, (N, 5), dtype=np.int64).astype(np.int32))
idx = jnp.asarray(rng.integers(0, N, Q).astype(np.int32))


def mk_gather(iters):
    @jax.jit
    def f(t, i):
        for _ in range(iters):
            v = t[i]
            i = jnp.abs(v * 1103515245 + i) % N
        return i[0].astype(jnp.float32)
    return f


per, _ = run_chain(mk_gather, (tab, idx), 8)
report("gather 1M x i32 from 16M", per, Q, "elem")


def mk_gather_row(iters):
    @jax.jit
    def f(t, i):
        for _ in range(iters):
            v = t[i]                       # [Q, 5]
            i = jnp.abs(v[:, 0] * 1103515245 + i) % N
        return i[0].astype(jnp.float32)
    return f


per, _ = run_chain(mk_gather_row, (tabr, idx), 8)
report("row-gather 1M x [5]i32 from 16M", per, Q, "row")

srt = jnp.sort(idx)


def mk_gather_sorted(iters):
    @jax.jit
    def f(t, i):
        for _ in range(iters):
            v = t[i]
            i = jnp.minimum(i + (v[:, 0] & 1), N - 1)   # stays sorted-ish
        return i[0].astype(jnp.float32)
    return f


per, _ = run_chain(mk_gather_sorted, (tabr, srt), 8)
report("row-gather 1M sorted from 16M", per, Q, "row")

# small table variant: does table size matter?
tabs = jnp.asarray(rng.integers(0, 1 << 31, (1 << 16, 5), dtype=np.int64).astype(np.int32))
idxs = jnp.asarray(rng.integers(0, 1 << 16, Q).astype(np.int32))


def mk_gather_small(iters):
    @jax.jit
    def f(t, i):
        for _ in range(iters):
            v = t[i]
            i = jnp.abs(v[:, 0] * 1103515245 + i) % (1 << 16)
        return i[0].astype(jnp.float32)
    return f


per, _ = run_chain(mk_gather_small, (tabs, idxs), 8)
report("row-gather 1M x [5]i32 from 64K", per, Q, "row")

# ---- 4. scatter ---------------------------------------------------------------
def mk_scatter(iters):
    @jax.jit
    def f(t, i):
        acc = jnp.zeros(N, jnp.int32)
        for _ in range(iters):
            acc = acc.at[i].add(1)
            i = jnp.abs(i * 1103515245 + acc[i]) % N
        return acc[0].astype(jnp.float32)
    return f


per, _ = run_chain(mk_scatter, (tab, idx), 8)
report("scatter-add 1M into 16M", per, Q, "elem")

T = 1024
idxT = jnp.asarray(rng.integers(0, T, Q).astype(np.int32))


def mk_scatter_small(iters):
    @jax.jit
    def f(i):
        acc = jnp.zeros(T + 1, jnp.int32)
        for _ in range(iters):
            acc = acc.at[i].add(1)
            i = (i + acc[jnp.minimum(i, T)]) % T
        return acc[0].astype(jnp.float32)
    return f


per, _ = run_chain(mk_scatter_small, (idxT,), 8)
report("scatter-add 1M into 1K (per-node stats)", per, Q, "elem")


def mk_scatter_u8max(iters):
    @jax.jit
    def f(t, i):
        acc = jnp.zeros(N + 1, jnp.uint8)
        for _ in range(iters):
            acc = acc.at[i].max(jnp.uint8(1))
            i = jnp.abs(i * 1103515245 + acc[i].astype(jnp.int32)) % N
        return acc[0].astype(jnp.float32)
    return f


per, _ = run_chain(mk_scatter_u8max, (tab, idx), 8)
report("scatter-max-u8 1M into 16M (seen)", per, Q, "elem")

# ---- 5. associative scan / cumsum ----------------------------------------------
def mk_scan(iters):
    @jax.jit
    def f(a, b):
        x = a
        for _ in range(iters):
            x = jax.lax.associative_scan(jnp.maximum, x) ^ b
        return x[0].astype(jnp.float32)
    return f


per, _ = run_chain(mk_scan, (x, y), 8)
report("assoc-scan max 1M", per, Q, "elem")


def mk_cumsum(iters):
    @jax.jit
    def f(a, b):
        x = a
        for _ in range(iters):
            x = (jnp.cumsum(x) & 1023) ^ b
        return x[0].astype(jnp.float32)
    return f


per, _ = run_chain(mk_cumsum, (x, y), 8)
report("cumsum 1M i32", per, Q, "elem")

# 2D variants on [8192, 128]
B, W = 8192, 128
x2 = jnp.asarray(rng.integers(0, 1 << 20, (B, W), dtype=np.int64).astype(np.int32))


def mk_cumsum2(iters):
    @jax.jit
    def f(a):
        x = a
        for _ in range(iters):
            x = (jnp.cumsum(x, axis=1) & 1023)
        return x[0, 0].astype(jnp.float32)
    return f


per, _ = run_chain(mk_cumsum2, (x2,), 8)
report("cumsum [8192,128] axis=1", per, B * W, "elem")


def mk_sort2(iters):
    @jax.jit
    def f(a):
        x = a
        for _ in range(iters):
            x = jax.lax.sort(x, dimension=1) ^ 1
        return x[0, 0].astype(jnp.float32)
    return f


per, _ = run_chain(mk_sort2, (x2,), 8)
report("rowsort [8192,128] axis=1", per, B * W, "elem")
print("done")

# ---- 6. scatter variants --------------------------------------------------
def mk_scatter_unique(iters):
    @jax.jit
    def f(v, p):
        x = v
        for _ in range(iters):
            x = jnp.zeros(Q, jnp.int32).at[p].set(x, unique_indices=True)
            p = jnp.abs(p + x) % Q
        return x[0].astype(jnp.float32)
    return f


perm = jnp.asarray(rng.permutation(1 << 20).astype(np.int32))
per, _ = run_chain(mk_scatter_unique, (x, perm), 8)
report("scatter-set 1M perm unique_indices", per, Q, "elem")

Tm = 1024
small_i = jnp.asarray(rng.integers(0, Tm, Tm).astype(np.int32))


def mk_scatter_tiny(iters):
    @jax.jit
    def f(i):
        acc = jnp.zeros(Tm + 1, jnp.int32)
        for _ in range(iters):
            acc = acc.at[i].add(1)
            i = (i + acc[jnp.minimum(i, Tm)]) % Tm
        return acc[0].astype(jnp.float32)
    return f


per, _ = run_chain(mk_scatter_tiny, (small_i,), 8)
report("scatter-add 1K into 1K (tiny)", per, Tm, "elem")


def mk_sortseg(iters):
    # sort-based segment-sum replacement for per-node scatters:
    # sort 1M (node,val) by node, cumsum, boundary diff
    @jax.jit
    def f(nodes, vals):
        s = jnp.float32(0)
        for _ in range(iters):
            n2, v2 = jax.lax.sort((nodes, vals), num_keys=1)
            cs = jnp.cumsum(v2)
            s = s + cs[-1].astype(jnp.float32)
            nodes = (nodes + v2) % Tm
        return s
    return f


nodesQ = jnp.asarray(rng.integers(0, Tm, Q).astype(np.int32))
valsQ = jnp.asarray(rng.integers(0, 3, Q).astype(np.int32))
per, _ = run_chain(mk_sortseg, (nodesQ, valsQ), 8)
report("sort+cumsum segment-sum 1M", per, Q, "elem")
