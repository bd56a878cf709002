"""Round-3 probes, part 3: the gather cliff + scatter variants.
  1. row-gather at 67/134/268 MB table sizes (the cliff location)
  2. realistic 2-gather lookup chain at NB=2^22 x 8 words (134MB)
  3. scatter-set vs scatter-max vs scatter-add u8 (seen update)
  4. scatter with PRE-SORTED indices (locality effect on scatter)
  5. gather with PRE-SORTED indices from 268MB (locality past the cliff)
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


def report(name, per, work=Q):
    if per is None:
        return
    print(f"{name:56s}: {per*1e3:9.3f} ms  ({per/work*1e9:6.2f} ns/el)",
          flush=True)


# ---- 1. the cliff -------------------------------------------------------------
for log_rows, width in [(21, 8), (22, 8), (21, 16), (22, 16), (23, 8), (23, 16)]:
    NR = 1 << log_rows
    mb = NR * width * 4 >> 20
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
    report(f"1. row-gather [Q,{width}] 2^{log_rows} rows ({mb} MB)",
           run_chain(mk, (idx0,)))

# ---- 2. realistic 2-gather lookup at 134MB ------------------------------------
NB = 1 << 22
rows = jnp.zeros((NB, 8), jnp.int32)
q0 = jax.random.randint(key, (Q,), 0, 1 << 30, jnp.uint32)

def mk_lookup2(iters):
    @jax.jit
    def f(q):
        acc = jnp.int32(0)
        for i in range(iters):
            h = (q + jnp.uint32(i)) * jnp.uint32(0x9E3779B1)
            b1 = (h & jnp.uint32(NB - 1)).astype(jnp.int32)
            b2 = b1 ^ ((h >> jnp.uint32(22)) | jnp.uint32(1)).astype(jnp.int32) & (NB - 1)
            r1 = rows[b1]
            r2 = rows[b2]
            acc += r1[:, 0].sum() + r2[:, 7].sum()
        return acc
    return f
report("2. two-row-gather lookup chain (134 MB)", run_chain(mk_lookup2, (q0,)))

# ---- 3. scatter variants -------------------------------------------------------
NSEEN = 1 << 25
pos0 = jax.random.randint(key, (Q,), 0, NSEEN, jnp.int32)

def mk_sc(kind, sort=False):
    def mk(iters):
        @jax.jit
        def f(pos):
            seen = jnp.zeros(NSEEN + 1, jnp.uint8)
            for i in range(iters):
                p = (pos + i) & (NSEEN - 1)
                if sort:
                    p = jax.lax.sort(p)
                if kind == "max":
                    seen = seen.at[p].max(jnp.uint8(1))
                elif kind == "set":
                    seen = seen.at[p].set(jnp.uint8(1))
                elif kind == "add":
                    seen = seen.at[p].add(jnp.uint8(1))
            return jnp.sum(seen[::4096].astype(jnp.int32))
        return f
    return mk

report("3. scatter-max u8 1M->32M", run_chain(mk_sc("max"), (pos0,)))
report("3. scatter-set u8 1M->32M", run_chain(mk_sc("set"), (pos0,)))
report("3. scatter-add u8 1M->32M", run_chain(mk_sc("add"), (pos0,)))
report("4. scatter-max u8 SORTED idx", run_chain(mk_sc("max", sort=True), (pos0,)))
report("4. scatter-set u8 SORTED idx", run_chain(mk_sc("set", sort=True), (pos0,)))

# ---- 5. gather sorted idx from 268MB -------------------------------------------
NR = 1 << 23
tab8 = jnp.zeros((NR, 8), jnp.int32)
idx8 = jax.random.randint(key, (Q,), 0, NR, jnp.int32)

def mk_g(sort):
    def mk(iters):
        @jax.jit
        def f(idx):
            acc = jnp.int32(0)
            for i in range(iters):
                p = (idx + i) & (NR - 1)
                if sort:
                    p = jax.lax.sort(p)
                r = tab8[p]
                acc += r[:, 0].sum() + r[:, 7].sum()
            return acc
        return f
    return mk

report("5. row-gather 268MB random idx", run_chain(mk_g(False), (idx8,)))
report("5. row-gather 268MB SORTED idx", run_chain(mk_g(True), (idx8,)))
print("done", flush=True)
