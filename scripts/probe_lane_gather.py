"""Probe 2: shapes/speeds of the Mosaic lane gather (take_along_axis axis=-1
inside a Pallas TPU kernel), VMEM capacity limits, and lax.sort costs — the
numbers that decide the lookup-kernel design."""
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

key = jax.random.PRNGKey(0)


def bench(name, fn, *args, reps=20, n=None):
    try:
        out = jax.block_until_ready(fn(*args))
    except Exception as e:  # noqa
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:160]}", flush=True)
        return None
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / reps
    n = n or int(np.prod(args[-1].shape))
    print(f"{name}: {dt*1e3:8.3f} ms  ({n/dt/1e6:.0f} M/s)", flush=True)
    return out


# ---- lane gather shape support + speed -------------------------------------
def mk_lane(S, L, IDXL, iters=8):
    def k(tab_ref, idx_ref, out_ref):
        t = tab_ref[:]
        ix = idx_ref[:]
        for _ in range(iters):
            v = jnp.take_along_axis(t, ix, axis=1)
            ix = jnp.abs(v * 1103515245 + ix) % L
        out_ref[:] = ix

    @jax.jit
    def f(tab, idx):
        return pl.pallas_call(
            k,
            out_shape=jax.ShapeDtypeStruct((S, IDXL), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(tab, idx)
    return f


for S, L, IDXL in [(256, 128, 128), (8, 8192, 8192), (64, 8192, 8192),
                   (8, 65536, 8192), (8, 131072, 8192), (1, 524288, 8192),
                   (8, 8192, 512), (256, 8192, 512)]:
    tab = jax.random.randint(key, (S, L), 0, L, jnp.int32)
    idx = jax.random.randint(key, (S, IDXL), 0, L, jnp.int32)
    f = mk_lane(S, L, IDXL)
    bench(f"lane-gather tab[{S},{L}] idx[{S},{IDXL}] x8", f, tab, idx,
          n=S * IDXL * 8)

# ---- VMEM capacity: how big can a resident table be? ------------------------
for MB in (16, 32, 64, 96, 120):
    L = MB * 1024 * 1024 // (8 * 4)
    tab = jax.random.randint(key, (8, L), 0, L, jnp.int32)
    idx = jax.random.randint(key, (8, 8192), 0, L, jnp.int32)
    f = mk_lane(8, L, 8192)
    bench(f"lane-gather {MB}MB VMEM tab[8,{L}]", f, tab, idx, n=8 * 8192 * 8)

# ---- sorts -------------------------------------------------------------------
for Q in (1 << 18, 1 << 20, 1 << 22):
    a = jax.random.randint(key, (Q,), 0, 1 << 30, jnp.int32)
    b = jax.random.randint(key, (Q,), 0, 1 << 30, jnp.int32)

    @jax.jit
    def fs(a, b):
        return jax.lax.sort((a, b, jnp.arange(Q, dtype=jnp.int32)), num_keys=2)

    bench(f"lax.sort {Q>>20 or Q>>10}{'M' if Q>=1<<20 else 'K'} 2key+payload",
          fs, a, b, n=Q)

    @jax.jit
    def f1(a):
        return jax.lax.sort(a)

    bench(f"lax.sort {Q} 1key", f1, a, n=Q)

# partition-style: 8-bit key sort (radix partition to 256 groups)
Q = 1 << 20
small = jax.random.randint(key, (Q,), 0, 256, jnp.int32)
pay = jax.random.randint(key, (Q,), 0, 1 << 30, jnp.int32)


@jax.jit
def fp(a, b):
    return jax.lax.sort((a, b, jnp.arange(Q, dtype=jnp.int32)), num_keys=1)


bench("lax.sort 1M 8-bit key + 2 payloads", fp, small, pay, n=Q)

# unsort scatter
perm = jax.random.permutation(key, Q).astype(jnp.int32)
vals = pay


@jax.jit
def fu(p, v):
    return jnp.zeros(Q, jnp.int32).at[p].set(v, unique_indices=True)


bench("unsort scatter-set 1M (unique)", fu, perm, vals, n=Q)
print("done", flush=True)
