"""Does XLA row-gather cost scale with row WIDTH or row COUNT?

Finding (TPU v5e): per-row cost grows ~linearly up to width 32, then drops
off a cliff at width 64 (256 B rows: ~10.7 ns/row, 24 GB/s — cheaper than a
width-8 gather). XLA switches to a row-DMA lowering at 256 bytes. This probe
maps the cliff; the single-gather bucket layout in store/hash.py is sized
off these numbers.
"""
import time
import numpy as np
import jax
import jax.numpy as jnp

Q = 1 << 20


def run_chain(make_fn, state, iters=6):
    f1 = make_fn(1)
    fN = make_fn(iters)
    float(np.asarray(f1(*state)))
    float(np.asarray(fN(*state)))
    t0 = time.time(); float(np.asarray(f1(*state))); t1 = time.time()
    float(np.asarray(fN(*state))); t2 = time.time()
    return ((t2 - t1) - (t1 - t0)) / (iters - 1)


key = jax.random.PRNGKey(0)

for n_rows_log in (22,):
    N_ROWS = 1 << n_rows_log
    idx0 = jax.random.randint(key, (Q,), 0, N_ROWS, jnp.int32)
    for width in (8, 48, 64, 96, 128, 256, 512):
        rows = jnp.zeros((N_ROWS, width), jnp.int32)

        def mk(iters, rows=rows, N_ROWS=N_ROWS):
            @jax.jit
            def f(idx):
                acc = jnp.int32(0)
                for i in range(iters):
                    r = rows[(idx + i) & (N_ROWS - 1)]
                    acc += r[:, 0].sum() + r[:, -1].sum()
                return acc
            return f

        per = run_chain(mk, (idx0,))
        print(f"[rows=2^{n_rows_log}] width={width:4d} i32: {per*1e3:8.2f} ms "
              f"({per/Q*1e9:6.2f} ns/row, {Q*width*4/per/1e9:7.1f} GB/s)",
              flush=True)
