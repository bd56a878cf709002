"""Round-3 design probes, each printed immediately (partial output useful):

  1. pallas smoke: trivial kernel compile+run time on this backend
  2. mosaic lane-gather (take_along_axis axis=-1) in pallas at several widths
  3. XLA scatter-max u8 with/without unique_indices
  4. lax.sort costs at 1M/4M, 1 and 2 operands
  5. one-hot matmul histogram [1M labels] -> [T] vs scatter-add
  6. single wide-row gather (width 64 i32) at 2^21 rows
"""
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

key = jax.random.PRNGKey(0)
print("device:", jax.devices()[0], flush=True)


def run_chain(make_fn, state, iters=6):
    try:
        f1 = make_fn(1)
        fN = make_fn(iters)
        t0 = time.time()
        float(np.asarray(f1(*state)))
        print(f"    [first call {time.time()-t0:.1f}s]", flush=True)
        float(np.asarray(fN(*state)))
    except Exception as e:
        print(f"    FAIL {type(e).__name__}: {str(e)[:200]}", flush=True)
        return None
    t0 = time.time(); float(np.asarray(f1(*state))); t1 = time.time()
    float(np.asarray(fN(*state))); t2 = time.time()
    return ((t2 - t1) - (t1 - t0)) / (iters - 1)


def report(name, per, work):
    if per is None:
        return
    print(f"{name:52s}: {per*1e3:9.3f} ms  {work/per/1e6:9.1f} M/s", flush=True)


Q = 1 << 20

# ---- 1. pallas smoke ---------------------------------------------------------
def smoke_kernel(x_ref, o_ref):
    o_ref[:] = x_ref[:] * 2

x = jnp.ones((8, 128), jnp.int32)
t0 = time.time()
try:
    out = pl.pallas_call(
        smoke_kernel, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x)
    print(f"1. pallas smoke OK in {time.time()-t0:.1f}s sum={int(jnp.sum(out))}",
          flush=True)
except Exception as e:
    print(f"1. pallas smoke FAIL: {type(e).__name__}: {str(e)[:300]}", flush=True)

# ---- 2. lane gathers in pallas -------------------------------------------------
def mk_lane(S, L, inner):
    def kern(tab_ref, idx_ref, out_ref):
        t = tab_ref[:]
        ix = idx_ref[:]
        for _ in range(inner):
            v = jnp.take_along_axis(t, ix, axis=1)
            ix = jnp.abs(v + ix) % L
        out_ref[:] = ix

    pc = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((S, 512), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))

    def mk(reps):
        @jax.jit
        def f(tab, idx):
            for _ in range(reps):
                idx = pc(tab, idx)
            return jnp.sum(idx[:, :8]).astype(jnp.float32)
        return f
    return mk


for S, L, inner in [(256, 128, 8), (8, 8192, 8), (8, 131072, 8)]:
    tab = jax.random.randint(key, (S, L), 0, L, jnp.int32)
    idx = jax.random.randint(key, (S, 512), 0, L, jnp.int32)
    per = run_chain(mk_lane(S, L, inner), (tab, idx), iters=4)
    report(f"2. pallas lane-gather tab[{S},{L}] idx[{S},512]x{inner}", per,
           S * 512 * inner)

# ---- 3. scatter-max unique_indices --------------------------------------------
NSEEN = 1 << 24
pos0 = jax.random.randint(key, (Q,), 0, NSEEN, jnp.int32)

def mk_scatter(unique):
    def mk(iters):
        @jax.jit
        def f(pos):
            seen = jnp.zeros(NSEEN + 1, jnp.uint8)
            for i in range(iters):
                seen = seen.at[(pos + i) & (NSEEN - 1)].max(
                    jnp.uint8(1), unique_indices=unique)
            return jnp.sum(seen[::4096].astype(jnp.int32))
        return f
    return mk

report("3. scatter-max 1M->16M u8 unique=False", run_chain(mk_scatter(False), (pos0,)), Q)
report("3. scatter-max 1M->16M u8 unique=True", run_chain(mk_scatter(True), (pos0,)), Q)

# u32 bit-OR variant (word = pos>>5, bit = pos&31)
def mk_scatter_or(iters):
    @jax.jit
    def f(pos):
        seen = jnp.zeros(NSEEN // 32 + 1, jnp.uint32)
        for i in range(iters):
            p = (pos + i) & (NSEEN - 1)
            seen = seen.at[p >> 5].max(jnp.uint32(1) << (p & 31).astype(jnp.uint32))
        return jnp.sum(seen[::4096].astype(jnp.int32))
    return f

# (max of single bits is wrong semantically; cost probe only)
report("3. scatter-max-u32-bit (cost probe)", run_chain(mk_scatter_or, (pos0,)), Q)

# ---- 4. sorts -------------------------------------------------------------------
for QQ in (1 << 20, 1 << 22):
    a0 = jax.random.randint(key, (QQ,), 0, 1 << 30, jnp.int32)
    b0 = jax.random.randint(key, (QQ,), 0, 1 << 30, jnp.int32)

    def mk_sort1(iters, QQ=QQ):
        @jax.jit
        def f(a):
            for _ in range(iters):
                a = jax.lax.sort(a) ^ 1
            return a[0].astype(jnp.float32)
        return f
    report(f"4. sort {QQ>>20}M 1-op", run_chain(mk_sort1, (a0,), iters=4), QQ)

    def mk_sort2(iters, QQ=QQ):
        @jax.jit
        def f(a, b):
            for _ in range(iters):
                a, b = jax.lax.sort((a, b), num_keys=1)
                a = a ^ 1
            return (a[0] + b[0]).astype(jnp.float32)
        return f
    report(f"4. sort {QQ>>20}M 1key+payload", run_chain(mk_sort2, (a0, b0), iters=4), QQ)

# ---- 5. one-hot matmul histogram ------------------------------------------------
T = 512
lab0 = jax.random.randint(key, (Q,), 0, T, jnp.int32)
val0 = jax.random.randint(key, (Q,), 0, 100, jnp.int32)

def mk_hist_mm(dtype):
    def mk(iters):
        @jax.jit
        def f(lab, val):
            acc = jnp.zeros((3, T), jnp.float32)
            iota_t = jax.lax.broadcasted_iota(jnp.int32, (1, T), 1)
            for i in range(iters):
                l2 = ((lab + i) % T).reshape(-1, 1)
                oh = (l2 == iota_t).astype(dtype)           # [Q, T]
                vals = jnp.stack([jnp.ones_like(val), val, val * val]
                                 ).astype(dtype)            # [3, Q]
                acc += jnp.dot(vals, oh, preferred_element_type=jnp.float32)
            return jnp.sum(acc[:, ::64])
        return f
    return mk

report("5. histogram 1M->[512] one-hot matmul bf16 x3vals",
       run_chain(mk_hist_mm(jnp.bfloat16), (lab0, val0), iters=4), Q)
report("5. histogram 1M->[512] one-hot matmul f32 x3vals",
       run_chain(mk_hist_mm(jnp.float32), (lab0, val0), iters=4), Q)

def mk_hist_scatter(iters):
    @jax.jit
    def f(lab, val):
        acc = jnp.zeros((T,), jnp.int32)
        for i in range(iters):
            acc = acc.at[(lab + i) % T].add(val)
        return jnp.sum(acc[::64]).astype(jnp.float32)
    return f

report("5. histogram 1M->[512] scatter-add x1val",
       run_chain(mk_hist_scatter, (lab0, val0)), Q)

# ---- 6. wide-row single gather ----------------------------------------------------
NR = 1 << 21
rows64 = jnp.zeros((NR, 64), jnp.int32)
idxr = jax.random.randint(key, (Q,), 0, NR, jnp.int32)

def mk_wide(iters):
    @jax.jit
    def f(idx):
        acc = jnp.int32(0)
        for i in range(iters):
            r = rows64[(idx + i) & (NR - 1)]
            acc += r[:, 0].sum() + r[:, 63].sum()
        return acc
    return f

report("6. single width-64 row gather 1M from 2^21", run_chain(mk_wide, (idxr,)), Q)
print("done", flush=True)
