"""Round-3/4 probe: cost of 1M-element sorts / scans / permutes on the chip.

Decides the lookup redesign: can we afford to order the ~1M batch k-mers by
key (or by top-bits partition) each batch? All data generated on device.
"""
import time
import numpy as np
import jax
import jax.numpy as jnp

key = jax.random.PRNGKey(0)
print("device:", jax.devices()[0], flush=True)
Q = 1 << 20


def run_chain(make_fn, state, iters=6):
    try:
        f1 = make_fn(1)
        fN = make_fn(iters)
        jax.block_until_ready(f1(*state))
        jax.block_until_ready(fN(*state))
    except Exception as e:
        print(f"    FAIL {type(e).__name__}: {str(e)[:200]}", flush=True)
        return None
    t0 = time.time(); jax.block_until_ready(f1(*state)); t1 = time.time()
    jax.block_until_ready(fN(*state)); t2 = time.time()
    return ((t2 - t1) - (t1 - t0)) / (iters - 1)


def report(name, per, work=Q):
    if per is None:
        return
    print(f"{name:56s}: {per*1e3:9.3f} ms  ({per/work*1e9:6.2f} ns/el)",
          flush=True)


x = jax.random.randint(key, (Q,), 0, 1 << 30, dtype=jnp.int32)
y = jax.random.randint(jax.random.fold_in(key, 1), (Q,), 0, 1 << 30, jnp.int32)
z = jax.random.randint(jax.random.fold_in(key, 2), (Q,), 0, 1 << 30, jnp.int32)
w = jax.random.randint(jax.random.fold_in(key, 3), (Q,), 0, 1 << 30, jnp.int32)
small = jax.random.randint(jax.random.fold_in(key, 4), (Q,), 0, 1024, jnp.int32)

# ---- 1. plain sorts ---------------------------------------------------------
def mk_sort1(iters):
    @jax.jit
    def f(x):
        for _ in range(iters):
            x = jax.lax.sort(x) + 1
        return x
    return f
report("sort 1M 1xi32", run_chain(mk_sort1, (x,)))

def mk_sort_kv(iters):
    @jax.jit
    def f(x, y):
        for _ in range(iters):
            x, y = jax.lax.sort((x, y), num_keys=1)
            x = x + 1
        return x, y
    return f
report("sort 1M i32 key + 1 payload", run_chain(mk_sort_kv, (x, y)))

def mk_sort4(iters):
    @jax.jit
    def f(x, y, z, w):
        for _ in range(iters):
            x, y, z, w = jax.lax.sort((x, y, z, w), num_keys=2)
            x = x + 1
        return x, y, z, w
    return f
report("sort 1M 2 keys + 2 payloads", run_chain(mk_sort4, (x, y, z, w)))

# ---- 2. short-key sort (10-bit partition id) --------------------------------
def mk_sortp(iters):
    @jax.jit
    def f(small, y):
        for _ in range(iters):
            s, y = jax.lax.sort((small, y), num_keys=1)
            small = s + 0
        return small, y
    return f
report("sort 1M 10-bit key + 1 payload", run_chain(mk_sortp, (small, y)))

# packed: partition(10b) << 20 | idx(20b), single operand
packed = (small << 20) | jax.lax.broadcasted_iota(jnp.int32, (Q, 1), 0).reshape(-1)
def mk_sortpk(iters):
    @jax.jit
    def f(p):
        for _ in range(iters):
            p = jax.lax.sort(p) + 0
        return p
    return f
report("sort 1M packed(10b part | 20b idx) 1xi32", run_chain(mk_sortpk, (packed,)))

# ---- 3. row-sorted variant: [4096, 256] rowwise sort ------------------------
xm = x.reshape(4096, 256)
def mk_rowsort(iters):
    @jax.jit
    def f(xm):
        for _ in range(iters):
            xm = jax.lax.sort(xm, dimension=1) + 1
        return xm
    return f
report("rowwise sort [4096,256] i32", run_chain(mk_rowsort, (xm,)))

xm2 = x.reshape(1024, 1024)
def mk_rowsort2(iters):
    @jax.jit
    def f(xm):
        for _ in range(iters):
            xm = jax.lax.sort(xm, dimension=1) + 1
        return xm
    return f
report("rowwise sort [1024,1024] i32", run_chain(mk_rowsort2, (xm2,)))

xm3 = x.reshape(128, 8192)
def mk_rowsort3(iters):
    @jax.jit
    def f(xm):
        for _ in range(iters):
            xm = jax.lax.sort(xm, dimension=1) + 1
        return xm
    return f
report("rowwise sort [128,8192] i32", run_chain(mk_rowsort3, (xm3,)))

# ---- 4. scans ----------------------------------------------------------------
def mk_scan(iters):
    @jax.jit
    def f(x):
        for _ in range(iters):
            x = jax.lax.associative_scan(jnp.maximum, x) + 1
        return x
    return f
report("assoc scan (max) 1M i32", run_chain(mk_scan, (x,)))

def mk_cumsum2d(iters):
    @jax.jit
    def f(xm):
        for _ in range(iters):
            xm = jnp.cumsum(xm, axis=0) % 7
        return xm
    return f
xc = x.reshape(1024, 1024)
report("cumsum axis0 [1024,1024] i32", run_chain(mk_cumsum2d, (xc,)))

# ---- 5. permutation apply -----------------------------------------------------
perm = jax.random.permutation(jax.random.fold_in(key, 5), Q).astype(jnp.int32)
rows8 = jax.random.randint(jax.random.fold_in(key, 6), (Q, 8), 0, 1 << 30, jnp.int32)
def mk_permgather(iters):
    @jax.jit
    def f(rows8, perm):
        for _ in range(iters):
            rows8 = rows8[perm]
        return rows8
    return f
report("permute [1M,8] rows by gather", run_chain(mk_permgather, (rows8, perm)))

def mk_permflat(iters):
    @jax.jit
    def f(x, perm):
        for _ in range(iters):
            x = x[perm] + 1
        return x
    return f
report("permute [1M] flat by gather", run_chain(mk_permflat, (x, perm)))

def mk_scatter1m(iters):
    @jax.jit
    def f(x, perm):
        for _ in range(iters):
            x = jnp.zeros(Q, jnp.int32).at[perm].set(x) + 1
        return x
    return f
report("scatter-set [1M] i32 -> [1M]", run_chain(mk_scatter1m, (x, perm)))

# ---- 6. one-hot matmul histogram 1M -> 1024 -----------------------------------
vals = jax.random.randint(jax.random.fold_in(key, 7), (Q,), 0, 100, jnp.int32)
def mk_hist(iters):
    @jax.jit
    def f(small, vals):
        acc = jnp.zeros((1024,), jnp.float32)
        for _ in range(iters):
            oh = (small[:, None] == jax.lax.broadcasted_iota(
                jnp.int32, (Q, 1024), 1)).astype(jnp.float32)
            acc = acc + vals.astype(jnp.float32) @ oh
            small = small + 1
        return acc
    return f
report("one-hot matmul hist 1M -> [1024]", run_chain(mk_hist, (small, vals)))

def mk_hist_chunk(iters):
    @jax.jit
    def f(small, vals):
        acc = jnp.zeros((1024,), jnp.float32)
        sm = small.reshape(64, -1)
        vm = vals.reshape(64, -1).astype(jnp.float32)
        for _ in range(iters):
            def body(c, sv):
                s, v = sv
                oh = (s[:, None] == jax.lax.broadcasted_iota(
                    jnp.int32, (s.shape[0], 1024), 1)).astype(jnp.float32)
                return c + v @ oh, 0
            acc, _ = jax.lax.scan(body, acc, (sm, vm))
            sm = sm + 1
        return acc
    return f
report("one-hot matmul hist scan-chunked 1M -> [1024]", run_chain(mk_hist_chunk, (small, vals)))

# ---- 7. masked-sum reduction 1M -> [512] (chunked loop) ------------------------
def mk_masked(iters):
    T = 512
    @jax.jit
    def f(small, vals):
        acc = jnp.zeros((T,), jnp.int32)
        sm = small.reshape(-1, 8192)
        vm = vals.reshape(-1, 8192)
        for _ in range(iters):
            def body(c, sv):
                s, v = sv
                m = (s[None, :] == jax.lax.broadcasted_iota(
                    jnp.int32, (T, s.shape[0]), 0))
                return c + jnp.sum(jnp.where(m, v[None, :], 0), axis=1), 0
            acc, _ = jax.lax.scan(body, acc, (sm, vm))
            sm = sm + 1
        return acc
    return f
report("masked-sum scan 1M -> [512] i32", run_chain(mk_masked, (small % 512, vals)))

print("done", flush=True)
