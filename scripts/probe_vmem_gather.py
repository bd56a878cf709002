"""Probe: which dynamic-gather shapes does Mosaic lower inside a Pallas TPU
kernel, and how fast are they? The match hot path needs ~300M random
lookups/s; XLA HBM gathers measured ~60M/s, so the design depends on
VMEM-resident gathers inside a kernel.

Variants:
  A. lane gather:      out[s,l] = tab[s, idx[s,l]]    (take_along_axis axis=1)
  B. flat VMEM gather: out[i]   = tab1d[idx[i]]       (jnp.take axis=0)
  C. row gather:       out[i,:] = tab2d[idx[i], :]    (jnp.take axis=0 rows)
"""
import time
import functools
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def bench(name, fn, *args, reps=20):
    try:
        out = jax.block_until_ready(fn(*args))
    except Exception as e:  # noqa
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:200]}")
        return None
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / reps
    n = np.prod(args[-1].shape)
    print(f"{name}: {dt*1e3:8.3f} ms  ({n/dt/1e6:.0f} M idx/s)")
    return out


rng = np.random.default_rng(0)

# ---- A: lane gather via take_along_axis ------------------------------------
S, L = 256, 128
tabA = jnp.asarray(rng.integers(0, 1 << 30, (S, L), dtype=np.int64).astype(np.int32))
idxA = jnp.asarray(rng.integers(0, L, (S, L), dtype=np.int64).astype(np.int32))


def kA(tab_ref, idx_ref, out_ref):
    out_ref[:] = jnp.take_along_axis(tab_ref[:], idx_ref[:], axis=1)


@jax.jit
def fA(tab, idx):
    return pl.pallas_call(
        kA,
        out_shape=jax.ShapeDtypeStruct((S, L), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(tab, idx)


outA = bench("A lane-gather [256,128] within rows", fA, tabA, idxA)
if outA is not None:
    ok = np.array_equal(np.asarray(outA), np.take_along_axis(np.asarray(tabA), np.asarray(idxA), 1))
    print("  parity:", ok)

# ---- B: flat gather over 2048-entry VMEM table ------------------------------
N1 = 2048
Q = 256 * 128
tabB = jnp.asarray(rng.integers(0, 1 << 30, N1, dtype=np.int64).astype(np.int32))
idxB = jnp.asarray(rng.integers(0, N1, (256, 128), dtype=np.int64).astype(np.int32))


def kB(tab_ref, idx_ref, out_ref):
    out_ref[:] = jnp.take(tab_ref[:], idx_ref[:], axis=0)


@jax.jit
def fB(tab, idx):
    return pl.pallas_call(
        kB,
        out_shape=jax.ShapeDtypeStruct((256, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(tab, idx)


outB = bench("B flat-gather [2048] -> 32K idx", fB, tabB, idxB)
if outB is not None:
    print("  parity:", np.array_equal(np.asarray(outB), np.asarray(tabB)[np.asarray(idxB)]))

# ---- C: row gather from [2048, 128] ------------------------------------------
tabC = jnp.asarray(rng.integers(0, 1 << 30, (N1, 128), dtype=np.int64).astype(np.int32))
idxC = jnp.asarray(rng.integers(0, N1, (256,), dtype=np.int64).astype(np.int32))


def kC(tab_ref, idx_ref, out_ref):
    out_ref[:] = jnp.take(tab_ref[:], idx_ref[:], axis=0)


@jax.jit
def fC(tab, idx):
    return pl.pallas_call(
        kC,
        out_shape=jax.ShapeDtypeStruct((256, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(tab, idx)


outC = bench("C row-gather [2048,128] by 256 rows", fC, tabC, idxC)
if outC is not None:
    print("  parity:", np.array_equal(np.asarray(outC), np.asarray(tabC)[np.asarray(idxC)]))

# ---- D: big flat gather: idx 1M over 64K-entry VMEM table --------------------
N2 = 1 << 16
QD = 1 << 20
tabD = jnp.asarray(rng.integers(0, 1 << 30, N2, dtype=np.int64).astype(np.int32))
idxD = jnp.asarray(rng.integers(0, N2, (QD // 128, 128), dtype=np.int64).astype(np.int32))


def kD(tab_ref, idx_ref, out_ref):
    out_ref[:] = jnp.take(tab_ref[:], idx_ref[:], axis=0)


@jax.jit
def fD(tab, idx):
    return pl.pallas_call(
        kD,
        out_shape=jax.ShapeDtypeStruct((QD // 128, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(tab, idx)


outD = bench("D flat-gather [64K] -> 1M idx", fD, tabD, idxD)
if outD is not None:
    print("  parity:", np.array_equal(np.asarray(outD), np.asarray(tabD)[np.asarray(idxD)]))
print("done")
