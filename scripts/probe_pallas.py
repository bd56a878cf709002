"""Probe: which dynamic-indexing primitives does Mosaic/TPU pallas support?

1. vector gather from a VMEM table (t[idx] with vector idx)
2. jnp.take along axis within VMEM
3. dynamic-start DMA chunk from HBM via scalar prefetch
"""
import functools
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def probe(name, fn):
    try:
        out = fn()
        print(f"OK   {name}: {np.asarray(out).ravel()[:4]}")
    except Exception as e:  # noqa
        msg = str(e).split("\n")[0][:160]
        print(f"FAIL {name}: {type(e).__name__}: {msg}")


N = 2048
table = jnp.arange(N, dtype=jnp.int32) * 7
idx = jnp.asarray(np.random.default_rng(0).integers(0, N, size=(8, 128)), jnp.int32)


def k_gather(t_ref, i_ref, o_ref):
    o_ref[:] = t_ref[0, i_ref[:]]


probe("vmem gather t[0, idx2d]", lambda: pl.pallas_call(
    k_gather,
    out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
              pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
)(table.reshape(1, N), idx))


def k_take(t_ref, i_ref, o_ref):
    o_ref[:] = jnp.take(t_ref[:].reshape(-1), i_ref[:], axis=0)


probe("vmem jnp.take", lambda: pl.pallas_call(
    k_take,
    out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
              pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
)(table.reshape(1, N), idx))


# gather along lanes only: table rows [8, 128], idx [8, 128] per-row lane shuffle
def k_tga(t_ref, i_ref, o_ref):
    o_ref[:] = jnp.take_along_axis(t_ref[:], i_ref[:], axis=1)


probe("vmem take_along_axis lanes", lambda: pl.pallas_call(
    k_tga,
    out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
              pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
)(table[:1024].reshape(8, 128), idx % 128))


# dynamic-start DMA from HBM
def k_dma(s_ref, t_hbm, o_ref):
    def inner(scr, sem):
        dma = pltpu.make_async_copy(t_hbm.at[pl.ds(s_ref[0], 256)], scr, sem)
        dma.start()
        dma.wait()
        o_ref[:] = scr[:].reshape(2, 128)
    pl.run_scoped(inner, pltpu.VMEM((256,), jnp.int32), pltpu.SemaphoreType.DMA(()))


probe("dynamic-start HBM DMA", lambda: pl.pallas_call(
    k_dma,
    out_shape=jax.ShapeDtypeStruct((2, 128), jnp.int32),
    grid_spec=pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    ),
)(jnp.array([37], jnp.int32), table))


# dynamic trip-count fori_loop
def k_loop(n_ref, o_ref):
    def body(i, acc):
        return acc + i
    o_ref[0, 0] = jax.lax.fori_loop(0, n_ref[0], body, jnp.int32(0))


probe("dynamic fori_loop", lambda: pl.pallas_call(
    k_loop,
    out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
    grid_spec=pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(1,), in_specs=[],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    ),
)(jnp.array([10], jnp.int32)))

# expected gather result check
exp = np.asarray(table)[np.asarray(idx)]
print("expected gather head:", exp.ravel()[:4])
