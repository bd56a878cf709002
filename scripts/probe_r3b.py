"""Round-3 probes, part 2:
  1. row-gather cost vs table size (16B and 32B rows)
  2. flat element gather vs table size
  3. int8 / bf16 MXU matmul throughput at lookup-kernel shapes
  4. pallas lane-gather error detail (full traceback, one case)
  5. take_along_axis [B, P] from [B, W] (XLA, lane gather) cost
  6. masked-reduce min-composite to [T] (max-contig replacement)
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
        float(np.asarray(f1(*state)))
        float(np.asarray(fN(*state)))
    except Exception as e:
        print(f"    FAIL {type(e).__name__}: {str(e)[:160]}", flush=True)
        return None
    t0 = time.time(); float(np.asarray(f1(*state))); t1 = time.time()
    float(np.asarray(fN(*state))); t2 = time.time()
    return ((t2 - t1) - (t1 - t0)) / (iters - 1)


def report(name, per, work):
    if per is None:
        return
    print(f"{name:56s}: {per*1e3:9.3f} ms  {work/per/1e6:9.1f} M/s "
          f"({per/work*1e9:6.2f} ns/el)", flush=True)


# ---- 1+2. gather cost vs table size -----------------------------------------
for log_rows, width in [(8, 4), (12, 4), (16, 4), (20, 4), (22, 4),
                        (12, 8), (16, 8), (20, 8), (23, 8)]:
    NR = 1 << log_rows
    tab = jnp.zeros((NR, width), jnp.int32)
    idx0 = jax.random.randint(key, (Q,), 0, NR, jnp.int32)

    def mk(iters, tab=tab, NR=NR):
        @jax.jit
        def f(idx):
            acc = jnp.int32(0)
            for i in range(iters):
                r = tab[(idx + i) & (NR - 1)]
                acc += r[:, 0].sum() + r[:, -1].sum()
            return acc
        return f
    per = run_chain(mk, (idx0,))
    report(f"1. row-gather [Q,{width}] from 2^{log_rows} rows "
           f"({NR*width*4>>10} KB)", per, Q)

for log_n in (12, 16, 20, 22, 24):
    N = 1 << log_n
    tab = jnp.zeros((N,), jnp.int32)
    idx0 = jax.random.randint(key, (Q,), 0, N, jnp.int32)

    def mk(iters, tab=tab, N=N):
        @jax.jit
        def f(idx):
            acc = jnp.int32(0)
            for i in range(iters):
                acc += tab[(idx + i) & (N - 1)].sum()
            return acc
        return f
    per = run_chain(mk, (idx0,))
    report(f"2. flat gather [Q] from 2^{log_n} ({N*4>>10} KB)", per, Q)

# ---- 3. MXU throughput at lookup shapes --------------------------------------
for M, K_, N_, dt in [(512, 128, 512, jnp.bfloat16), (512, 128, 512, jnp.int8),
                      (4096, 128, 2048, jnp.bfloat16), (4096, 128, 2048, jnp.int8)]:
    a0 = jnp.ones((M, K_), dt)
    b0 = jnp.ones((K_, N_), dt)
    pt = jnp.float32 if dt == jnp.bfloat16 else jnp.int32

    def mk(iters, a0=a0, b0=b0, pt=pt):
        @jax.jit
        def f(a, b):
            acc = None
            for i in range(iters):
                o = jax.lax.dot(a, b, preferred_element_type=pt)
                acc = o if acc is None else acc + o
                a = a + a[0, 0]
            return jnp.sum(acc[::64, ::64].astype(jnp.float32))
        return f
    per = run_chain(mk, (a0, b0))
    if per:
        print(f"3. matmul [{M},{K_}]@[{K_},{N_}] {dt.__name__}: "
              f"{per*1e3:7.3f} ms  {2*M*K_*N_/per/1e12:6.2f} TOP/s", flush=True)

# ---- 4. pallas lane-gather full error ----------------------------------------
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

S, L = 8, 8192
tab = jax.random.randint(key, (S, L), 0, L, jnp.int32)
idx = jax.random.randint(key, (S, 512), 0, L, jnp.int32)

def kern(tab_ref, idx_ref, out_ref):
    out_ref[:] = jnp.take_along_axis(tab_ref[:], idx_ref[:], axis=1)

try:
    out = pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct((S, 512), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(tab, idx)
    ok = np.array_equal(np.asarray(out),
                        np.take_along_axis(np.asarray(tab), np.asarray(idx), 1))
    print("4. pallas lane-gather [8,8192]->[8,512]: OK parity", ok, flush=True)
except Exception as e:
    import traceback
    print("4. pallas lane-gather FAIL:", flush=True)
    traceback.print_exc(limit=3)

# same-width case (idx width == tab width)
idx2 = jax.random.randint(key, (S, L), 0, L, jnp.int32)
try:
    out = pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct((S, L), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(tab, idx2)
    ok = np.array_equal(np.asarray(out),
                        np.take_along_axis(np.asarray(tab), np.asarray(idx2), 1))
    print("4b. pallas lane-gather [8,8192] same-width: OK parity", ok, flush=True)
except Exception as e:
    print(f"4b. pallas lane-gather same-width FAIL {type(e).__name__}: {str(e)[:200]}",
          flush=True)

# ---- 5. XLA take_along_axis [B,P] from [B,W] ---------------------------------
B, W, P = 8192, 128, 16
tabw = jax.random.randint(key, (B, W), 0, 100, jnp.int32)
idxp = jax.random.randint(key, (B, P), 0, W, jnp.int32)

def mk_taa(iters):
    @jax.jit
    def f(tab, idx):
        acc = jnp.int32(0)
        for i in range(iters):
            acc += jnp.take_along_axis(tab, (idx + i) % W, axis=1).sum()
        return acc
    return f
report("5. XLA take_along_axis [8192,16] from [8192,128]",
       run_chain(mk_taa, (tabw, idxp)), B * P)

# ---- 6. masked min-composite reduce to [T] ------------------------------------
T = 512
lab0 = jax.random.randint(key, (Q,), 0, T, jnp.int32)
comp0 = jax.random.randint(key, (Q,), 0, 1 << 28, jnp.int32)
CH = 1 << 14

def mk_maskmin(iters):
    @jax.jit
    def f(lab, comp):
        acc = jnp.full((T,), jnp.iinfo(jnp.int32).max, jnp.int32)
        iota_t = jax.lax.broadcasted_iota(jnp.int32, (1, T), 1)
        for i in range(iters):
            l2 = ((lab + i) % T).reshape(-1, CH)  # [Q/CH, CH] chunk rows? no:
            # chunked loop over Q in CH pieces
            def body(c, acc):
                ls = jax.lax.dynamic_slice(lab, (c * CH,), (CH,))
                cs = jax.lax.dynamic_slice(comp, (c * CH,), (CH,))
                m = jnp.where((ls[:, None] + i) % T == iota_t, cs[:, None],
                              jnp.iinfo(jnp.int32).max)
                return jnp.minimum(acc, jnp.min(m, axis=0))
            acc = jax.lax.fori_loop(0, Q // CH, body, acc)
        return jnp.sum(acc[::64])
    return f
report("6. masked min-composite 1M->[512] (chunked)",
       run_chain(mk_maskmin, (lab0, comp0), iters=3), Q)
print("done", flush=True)
