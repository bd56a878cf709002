"""Trustworthy chained timings for the remaining hot-path primitives:
sorts (flat 1M), scatter variants for the unique counter, and the hash
gather at different table sizes — the numbers that decide whether a
sort-partition streaming lookup can beat the 2-gather hash."""
import time
import numpy as np
import jax
import jax.numpy as jnp

key = jax.random.PRNGKey(0)
Q = 1 << 20


def run_chain(make_fn, state, iters=6):
    f1 = make_fn(1)
    fN = make_fn(iters)
    float(np.asarray(f1(*state)))
    float(np.asarray(fN(*state)))
    t0 = time.time(); float(np.asarray(f1(*state))); t1 = time.time()
    float(np.asarray(fN(*state))); t2 = time.time()
    return ((t2 - t1) - (t1 - t0)) / (iters - 1)


def report(name, per, work=Q):
    print(f"{name:44s}: {per*1e3:9.3f} ms/iter  {work/per/1e6:9.1f} M/s",
          flush=True)


a0 = jax.random.randint(key, (Q,), 0, 1 << 30, jnp.int32)
b0 = jax.random.randint(key, (Q,), 0, 1 << 30, jnp.int32)


def mk_sort1(iters):
    @jax.jit
    def f(a):
        acc = jnp.float32(0)
        for i in range(iters):
            s = jax.lax.sort(a)
            acc += (s[0] + s[Q // 2] + s[-1]).astype(jnp.float32)
            a = s ^ (i + 1)          # re-disorder
        return acc
    return f


report("sort 1M 1key i32", run_chain(mk_sort1, (a0,)))


def mk_sort3(iters):
    @jax.jit
    def f(a, b):
        acc = jnp.float32(0)
        p = jnp.arange(Q, dtype=jnp.int32)
        for i in range(iters):
            a, b, p = jax.lax.sort((a, b, p), num_keys=2)
            acc += (a[0] + b[Q // 2] + p[-1]).astype(jnp.float32)
            a = b ^ (i + 1)
        return acc
    return f


report("sort 1M 2key + payload", run_chain(mk_sort3, (a0, b0)))

# 17-bit partition key + 2 payloads (the partition cost of a streamed lookup)
s0 = jax.random.randint(key, (Q,), 0, 1 << 17, jnp.int32)


def mk_part(iters):
    @jax.jit
    def f(a, b):
        acc = jnp.float32(0)
        p = jnp.arange(Q, dtype=jnp.int32)
        for i in range(iters):
            a, b, p = jax.lax.sort((a, b, p), num_keys=1)
            acc += (a[0] + b[Q // 2] + p[-1]).astype(jnp.float32)
            a = (a + b) & ((1 << 17) - 1)
        return acc
    return f


report("sort 1M 17bit-key + 2 payloads", run_chain(mk_part, (s0, b0)))

# ---- scatter variants for the unique counter --------------------------------
NS = 32_000_000
idx0 = jax.random.randint(key, (Q,), 0, NS, jnp.int32)


def mk_max(iters):
    @jax.jit
    def f(i):
        seen = jnp.zeros(NS + 1, jnp.uint8)
        for _ in range(iters):
            seen = seen.at[i].max(jnp.uint8(1))
            i = (i + seen[NS].astype(jnp.int32) + 1) % NS
        return (seen[0] + i[0]).astype(jnp.float32)
    return f


report("scatter-max u8 1M -> 32M", run_chain(mk_max, (idx0,)))


def mk_set(iters):
    @jax.jit
    def f(i):
        seen = jnp.zeros(NS + 1, jnp.uint8)
        for _ in range(iters):
            seen = seen.at[i].set(jnp.uint8(1))
            i = (i + seen[NS].astype(jnp.int32) + 1) % NS
        return (seen[0] + i[0]).astype(jnp.float32)
    return f


report("scatter-set u8 1M -> 32M", run_chain(mk_set, (idx0,)))


def mk_set32(iters):
    @jax.jit
    def f(i):
        seen = jnp.zeros(NS + 1, jnp.int32)
        for _ in range(iters):
            seen = seen.at[i].set(1)
            i = (i + seen[NS] + 1) % NS
        return (seen[0] + i[0]).astype(jnp.float32)
    return f


report("scatter-set i32 1M -> 32M", run_chain(mk_set32, (idx0,)))

# ---- scatter-adds into small T (contig stats) --------------------------------
T = 1024
tn0 = jax.random.randint(key, (Q,), 0, T, jnp.int32)


def mk_small(iters):
    @jax.jit
    def f(i):
        acc = jnp.zeros(T + 1, jnp.int32)
        for _ in range(iters):
            acc = acc.at[i].add(1)
            i = (i + acc[jnp.minimum(i, T)] + 1) % T
        return acc[0].astype(jnp.float32)
    return f


report("scatter-add 1M -> 1K", run_chain(mk_small, (tn0,)))

# ---- the hash row-gather at smaller NB (table-size scaling) -------------------
for NB in (1 << 23, 1 << 21, 1 << 19):
    rows = jax.random.randint(key, (NB, 8), 0, 1 << 30, jnp.int32)
    q0 = jax.random.randint(key, (Q,), 0, NB, jnp.int32)

    def mk_g(iters, rows=rows, NB=NB):
        @jax.jit
        def f(i):
            acc = jnp.float32(0)
            for _ in range(iters):
                r = rows[i]
                acc += jnp.sum(r[:, 0] & 1).astype(jnp.float32)
                i = jnp.abs(r[:, 1] * 1103515245 + i) % NB
            return acc
        return f

    report(f"row-gather [8]i32 from {NB >> 20}M rows", run_chain(mk_g, (q0,)))
print("done", flush=True)
