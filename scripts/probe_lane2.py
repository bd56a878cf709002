"""Probe 3: trustworthy (chained + scalar-materialized) timings for
lane gathers in Pallas, lax.sort, and scatter — block_until_ready does not
block on the axon backend, so every bench here returns a scalar to host and
uses the f(N)-f(1) chain trick."""
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

key = jax.random.PRNGKey(0)


def run_chain(make_fn, state, iters=8):
    try:
        f1 = make_fn(1)
        fN = make_fn(iters)
        float(np.asarray(f1(*state)))
        float(np.asarray(fN(*state)))
    except Exception as e:
        print(f"  FAIL {type(e).__name__}: {str(e)[:160]}", flush=True)
        return None
    t0 = time.time()
    float(np.asarray(f1(*state)))
    t1 = time.time()
    float(np.asarray(fN(*state)))
    t2 = time.time()
    return ((t2 - t1) - (t1 - t0)) / (iters - 1)


def report(name, per, work):
    if per is None:
        return
    print(f"{name:46s}: {per*1e3:9.3f} ms/iter  {work/per/1e6:9.1f} M/s",
          flush=True)


# ---- lane gather inside pallas, chained -------------------------------------
def mk_lane(S, L, inner, iters):
    def kern(tab_ref, idx_ref, out_ref):
        t = tab_ref[:]
        ix = idx_ref[:]
        for _ in range(inner):
            v = jnp.take_along_axis(t, ix, axis=1)
            ix = jnp.abs(v * 1103515245 + ix) % L
        out_ref[:] = ix

    pc = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((S, L), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )

    def mk(reps):
        @jax.jit
        def f(tab, idx):
            for _ in range(reps):
                idx = pc(tab, idx)
            return jnp.sum(idx[0, :8]).astype(jnp.float32)
        return f
    return mk


for S, L, inner in [(256, 128, 64), (1024, 128, 64), (8192, 128, 64),
                    (65536, 128, 16)]:
    tab = jax.random.randint(key, (S, L), 0, L, jnp.int32)
    idx = jax.random.randint(key, (S, L), 0, L, jnp.int32)
    per = run_chain(mk_lane(S, L, inner, 8), (tab, idx))
    if per is not None:
        report(f"pallas lane-gather [{S},{L}] x{inner}", per, S * L * inner)

# ---- sorts, chained -----------------------------------------------------------
for Q in (1 << 20, 1 << 22):
    a0 = jax.random.randint(key, (Q,), 0, 1 << 30, jnp.int32)
    b0 = jax.random.randint(key, (Q,), 0, 1 << 30, jnp.int32)

    def mk_sort(iters, Q=Q):
        @jax.jit
        def f(a, b):
            p = jnp.arange(Q, dtype=jnp.int32)
            for _ in range(iters):
                a, b, p = jax.lax.sort((a, b, p), num_keys=2)
                a, b = b, a
            return (a[0] + b[0] + p[0]).astype(jnp.float32)
        return f

    per = run_chain(mk_sort, (a0, b0))
    report(f"sort {Q>>20}M 2key+payload", per, Q)

    def mk_sort1(iters, Q=Q):
        @jax.jit
        def f(a):
            for _ in range(iters):
                a = jax.lax.sort(a) ^ 1
            return a[0].astype(jnp.float32)
        return f

    per = run_chain(mk_sort1, (a0,))
    report(f"sort {Q>>20}M 1key", per, Q)

# 17-bit key sort (partition for 128K buckets) with 2 payloads
Q = 1 << 20
small0 = jax.random.randint(key, (Q,), 0, 1 << 17, jnp.int32)
pay0 = jax.random.randint(key, (Q,), 0, 1 << 30, jnp.int32)


def mk_part(iters):
    @jax.jit
    def f(a, b):
        p = jnp.arange(Q, dtype=jnp.int32)
        for _ in range(iters):
            a, b, p = jax.lax.sort((a, b, p), num_keys=1)
            a = (a + b) & ((1 << 17) - 1)
        return (a[0] + b[0] + p[0]).astype(jnp.float32)
    return f


per = run_chain(mk_part, (small0, pay0))
report("sort 1M 17-bit key + 2 payloads", per, Q)

# unsort scatter
perm0 = jax.random.permutation(key, Q).astype(jnp.int32)


def mk_unsort(iters):
    @jax.jit
    def f(p, v):
        for _ in range(iters):
            v = jnp.zeros(Q, jnp.int32).at[p].set(v, unique_indices=True)
            p = jnp.abs(p + v) % Q
        return (v[0] + p[0]).astype(jnp.float32)
    return f


per = run_chain(mk_unsort, (perm0, pay0))
report("unsort scatter-set 1M unique", per, Q)

# take-along-axis on XLA side (outside pallas) for comparison
B, W = 8192, 128
t2 = jax.random.randint(key, (B, W), 0, W, jnp.int32)
i2 = jax.random.randint(key, (B, W), 0, W, jnp.int32)


def mk_taa(iters):
    @jax.jit
    def f(t, i):
        for _ in range(iters):
            v = jnp.take_along_axis(t, i, axis=1)
            i = jnp.abs(v + i) % W
        return i[0, 0].astype(jnp.float32)
    return f


per = run_chain(mk_taa, (t2, i2))
report("XLA take_along_axis [8192,128]", per, B * W)
print("done", flush=True)
