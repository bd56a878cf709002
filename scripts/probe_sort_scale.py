"""Isolate sort/scan/scatter scaling on the TPU: 1M, 4M, 17M."""
import sys
import time
import numpy as np
import jax
import jax.numpy as jnp


def bench(name, fn, *args, reps=3):
    t0 = time.time()
    out = jax.block_until_ready(fn(*args))
    print(f"{name}: first {(time.time() - t0) * 1e3:9.1f} ms", flush=True)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name}: steady {(time.time() - t0) / reps * 1e3:9.1f} ms", flush=True)
    return out


rng = np.random.default_rng(1)
sizes = [1 << 20, 1 << 22, 17 << 20]
for M in sizes:
    x = jnp.asarray(rng.integers(0, 1 << 31, M, dtype=np.int64).astype(np.int32))
    y = jnp.asarray(rng.integers(0, 1 << 31, M, dtype=np.int64).astype(np.int32))
    i = jnp.arange(M, dtype=jnp.int32)

    sort3 = jax.jit(lambda a, b, c: jax.lax.sort((a, b, c), num_keys=2))
    out = bench(f"sort {M>>20}M 2key+1payload", sort3, x, y, i)
    # correctness spot-check
    a = np.asarray(out[0])
    assert np.all(a[1:] >= a[:-1]), "sort order broken"

    scan = jax.jit(lambda a: jax.lax.associative_scan(jnp.maximum, a))
    bench(f"scan {M>>20}M", scan, x)

    perm = jnp.asarray(rng.permutation(M).astype(np.int32))
    scat = jax.jit(lambda a, p: jnp.zeros(M, jnp.int32).at[p].set(a))
    bench(f"scatter {M>>20}M", scat, x, perm)

    gath = jax.jit(lambda a, p: a[p])
    bench(f"gather {M>>20}M", gath, x, perm)
print("done")
