"""Probe 2: sort speed, axis-0 take_along_axis, scalar-prefetch index_map,
output-block revisit accumulation."""
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def bench(name, fn, *args, reps=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name}: {(time.time() - t0) / reps * 1e3:8.3f} ms")
    return out


rng = np.random.default_rng(0)
Q = 1 << 20
q_hi = jnp.asarray(rng.integers(0, 1 << 31, Q, dtype=np.int64).astype(np.int32))
q_lo = jnp.asarray(rng.integers(0, 1 << 31, Q, dtype=np.int64).astype(np.int32))
idx = jnp.arange(Q, dtype=jnp.int32)

sort2 = jax.jit(lambda a, b, i: jax.lax.sort((a, b, i), num_keys=2))
sort1 = jax.jit(lambda a, i: jax.lax.sort((a, i), num_keys=1))
bench("lax.sort 1M num_keys=2", sort2, q_hi, q_lo, idx)
bench("lax.sort 1M num_keys=1", sort1, q_hi, idx)
argsorted = jax.jit(lambda a: jnp.argsort(a))
bench("argsort 1M int32", argsorted, q_hi)

# axis-0 take_along_axis (sublane gather)
t = jnp.asarray(rng.integers(0, 100, (128, 128), dtype=np.int64).astype(np.int32))
ix0 = jnp.asarray(rng.integers(0, 128, (128, 128), dtype=np.int64).astype(np.int32))


def k_tga0(t_ref, i_ref, o_ref):
    o_ref[:] = jnp.take_along_axis(t_ref[:], i_ref[:], axis=0)


def run_tga0():
    return pl.pallas_call(
        k_tga0,
        out_shape=jax.ShapeDtypeStruct((128, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(t, ix0)


try:
    out = run_tga0()
    ok = np.array_equal(np.asarray(out), np.take_along_axis(np.asarray(t), np.asarray(ix0), 0))
    print("OK   tga axis0 [128,128]", ok)
except Exception as e:
    print("FAIL tga axis0:", str(e).split("\n")[0][:140])

# take_along_axis axis=1 on [128,128], timing inside a loop kernel
ix1 = jnp.asarray(rng.integers(0, 128, (128, 128), dtype=np.int64).astype(np.int32))


def k_tga1_loop(t_ref, i_ref, o_ref):
    def body(_, acc):
        return acc + jnp.take_along_axis(t_ref[:], i_ref[:], axis=1)
    o_ref[:] = jax.lax.fori_loop(0, 100, body, jnp.zeros((128, 128), jnp.int32))


def run_tga1_loop():
    return pl.pallas_call(
        k_tga1_loop,
        out_shape=jax.ShapeDtypeStruct((128, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(t, ix1)


try:
    bench("100x tga axis1 [128,128]", run_tga1_loop)
except Exception as e:
    print("FAIL tga1 loop:", str(e).split("\n")[0][:140])


# scalar-prefetch index_map + output revisit accumulation:
# steps = [0,0,1,1] over input windows [0,1,2,3]; output block per step = step//2,
# accumulate two windows into each output block.
win = jnp.asarray(np.arange(4 * 8 * 128, dtype=np.int32).reshape(4, 8, 128))
qb_of_step = jnp.array([0, 0, 1, 1], jnp.int32)
win_of_step = jnp.array([0, 1, 2, 3], jnp.int32)
first_of_step = jnp.array([1, 0, 1, 0], jnp.int32)


def k_acc(qb_ref, win_ref, first_ref, w_ref, o_ref):
    s = pl.program_id(0)

    @pl.when(first_ref[s] == 1)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    o_ref[:] += w_ref[0]


def run_acc():
    return pl.pallas_call(
        k_acc,
        out_shape=jax.ShapeDtypeStruct((2, 8, 128), jnp.int32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(4,),
            in_specs=[pl.BlockSpec((1, 8, 128),
                                   lambda s, qb, wn, fs: (wn[s], 0, 0))],
            out_specs=pl.BlockSpec((1, 8, 128),
                                   lambda s, qb, wn, fs: (qb[s], 0, 0)),
        ),
    )(qb_of_step, win_of_step, first_of_step, win)


try:
    out = np.asarray(run_acc())
    exp = np.asarray(win).reshape(2, 2, 8, 128).sum(1)
    print("OK   prefetch+revisit accumulate:", np.array_equal(out, exp))
except Exception as e:
    print("FAIL prefetch acc:", str(e).split("\n")[0][:140])
