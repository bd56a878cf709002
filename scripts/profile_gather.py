"""Measure row-gather (embedding-style) vs scalar gather on the device."""

import time

import jax
import jax.numpy as jnp
import numpy as np

rng = np.random.default_rng(0)
Q = 1 << 20


def bench(name, fn, *args, n=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / n
    print(f"{name:44s} {dt*1000:9.2f} ms   ({Q/dt/1e6:8.1f} Mquery/s)")


for R, BW in ((21, 32), (19, 32), (16, 32)):
    tbl = jnp.asarray(rng.integers(0, 2**31, size=(1 << R, 3 * BW)).astype(np.int32))
    idx = jnp.asarray(rng.integers(0, 1 << R, size=Q).astype(np.int32))
    bench(f"row gather [{Q>>20}M] x ({BW}x3 i32) from 2^{R}",
          jax.jit(lambda t, i: jnp.sum(t[i], axis=-1)), tbl, idx)

# same but smaller rows
for BW in (8, 16):
    tbl = jnp.asarray(rng.integers(0, 2**31, size=(1 << 21, 3 * BW)).astype(np.int32))
    idx = jnp.asarray(rng.integers(0, 1 << 21, size=Q).astype(np.int32))
    bench(f"row gather ({BW}x3 i32) from 2^21",
          jax.jit(lambda t, i: jnp.sum(t[i], axis=-1)), tbl, idx)

# scalar gather baseline
tbl1 = jnp.asarray(rng.integers(0, 2**31, size=(1 << 24,)).astype(np.int32))
idx1 = jnp.asarray(rng.integers(0, 1 << 24, size=Q).astype(np.int32))
bench("scalar gather [1M] from 16M i32",
      jax.jit(lambda t, i: t[i]), tbl1, idx1)

# flat sort of 1M
x = jnp.asarray(rng.integers(0, 2**60, size=Q).astype(np.int64))
bench("flat sort 1M i64", jax.jit(jnp.sort), x)
x32 = jnp.asarray(rng.integers(0, 2**30, size=Q).astype(np.int32))
bench("flat sort 1M i32", jax.jit(jnp.sort), x32)

# take_along_axis style 2D row gather [B, W] -> rows
tbl2 = jnp.asarray(rng.integers(0, 2**31, size=(1 << 21, 24)).astype(np.int32))
idx2 = jnp.asarray(rng.integers(0, 1 << 21, size=(8192, 128)).astype(np.int32))
bench("row gather [8192,128] x (24 i32)",
      jax.jit(lambda t, i: jnp.sum(t[i], axis=-1)), tbl2, idx2)
