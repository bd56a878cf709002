"""Re-measure 1M sort cost with data-dependent perturbation per iteration."""
import time
import numpy as np
import jax
import jax.numpy as jnp

key = jax.random.PRNGKey(0)
print("device:", jax.devices()[0], flush=True)
Q = 1 << 20

x = jax.random.randint(key, (Q,), 0, 1 << 30, dtype=jnp.int32)
y = jax.random.randint(jax.random.fold_in(key, 1), (Q,), 0, 1 << 30, jnp.int32)


def timeit(name, f, *args, reps=20):
    out = jax.block_until_ready(f(*args))
    t0 = time.time()
    for _ in range(reps):
        out = jax.block_until_ready(f(*args))
    dt = (time.time() - t0) / reps
    print(f"{name:56s}: {dt*1e3:9.3f} ms  ({dt/Q*1e9:6.2f} ns/el)", flush=True)
    return out


@jax.jit
def noop(x):
    return x + 1
timeit("dispatch floor (x+1)", noop, x)

@jax.jit
def sort1(x):
    return jax.lax.sort(x)
timeit("sort 1M 1xi32", sort1, x)

@jax.jit
def sort2(x, y):
    return jax.lax.sort((x, y), num_keys=1)
timeit("sort 1M i32 + payload", sort2, x, y)

@jax.jit
def sort4(x, y):
    return jax.lax.sort((x, y, y, x), num_keys=2)
timeit("sort 1M 2keys+2payloads", sort4, x, y)

# chained: 8 dependent sorts in one dispatch
@jax.jit
def sort_chain8(x):
    for i in range(8):
        x = jax.lax.sort(x ^ jnp.int32(0x9E3779B))
    return x
timeit("8x dependent sort 1M 1xi32 (one dispatch)", sort_chain8, x, reps=5)

@jax.jit
def sort_chain8_kv(x, y):
    for i in range(8):
        x, y = jax.lax.sort((x ^ jnp.int32(0x9E3779B), y), num_keys=1)
    return x, y
timeit("8x dependent sort 1M kv (one dispatch)", sort_chain8_kv, x, y, reps=5)

Q4 = Q * 4
x4 = jax.random.randint(jax.random.fold_in(key, 2), (Q4,), 0, 1 << 30, jnp.int32)
@jax.jit
def sort_4m(x):
    return jax.lax.sort(x)
out = jax.block_until_ready(sort_4m(x4))
t0 = time.time()
for _ in range(5):
    out = jax.block_until_ready(sort_4m(x4))
dt = (time.time() - t0) / 5
print(f"{'sort 4M 1xi32':56s}: {dt*1e3:9.3f} ms  ({dt/Q4*1e9:6.2f} ns/el)", flush=True)

# parity check: lax.sort result actually sorted?
xs = np.asarray(jax.block_until_ready(sort1(x)))
print("sorted ok:", bool(np.all(np.diff(xs) >= 0)), flush=True)
print("done", flush=True)
