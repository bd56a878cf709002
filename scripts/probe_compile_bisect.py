"""Round-4 probe: which sub-graph makes the axon remote compile slow?

Compiles successively larger pieces of the production match graph at bench
shapes, timing .lower() and .compile() separately. Run with the persistent
cache DISABLED so timings are真 — or enabled to seed the cache.
"""
import os
import sys
import time

if "--no-cache" in sys.argv:
    os.environ["GENESTRIP_TPU_COMPILE_CACHE"] = ""

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
import genestrip_tpu  # noqa: F401  (cache config)

print("device:", jax.devices()[0], flush=True)

Q = 983_040                  # 8192 reads x 120 windows
NB_BITS = 23
NB = 1 << NB_BITS


def timeit_compile(name, fn, *args):
    t0 = time.time()
    lowered = jax.jit(fn).lower(*args)
    t1 = time.time()
    compiled = lowered.compile()
    t2 = time.time()
    print(f"{name:50s}: lower {t1-t0:6.1f}s  compile {t2-t1:7.1f}s", flush=True)
    return compiled


rng = np.random.default_rng(0)
qh = jnp.asarray(rng.integers(0, 1 << 32, Q, dtype=np.uint32))
ql = jnp.asarray(rng.integers(0, 1 << 32, Q, dtype=np.uint32))
rows = jnp.asarray(rng.integers(-(1 << 31), 1 << 31, (NB, 8), dtype=np.int64).astype(np.int32))

# 1. sort of 2Q x 4
def f_sort(qh, ql):
    e = jnp.concatenate([qh, ql]).astype(jnp.int32)
    a, b, c, d = jax.lax.sort((e, e ^ 1, e ^ 2, e ^ 3), num_keys=3)
    return a[0] + b[0] + c[0] + d[0]
timeit_compile("sort 2Qx4 i32", f_sort, qh, ql)

# 2. scans + cumsum over 2Q
def f_scan(qh, ql):
    e = jnp.concatenate([qh, ql]).astype(jnp.int32)
    c = jnp.cumsum(e)
    m = jax.lax.associative_scan(jnp.maximum, e)
    return c[-1] + m[-1]
timeit_compile("cumsum + assoc_scan 2Q", f_scan, qh, ql)

# 3. big scatter into NB*R
def f_scatter(qh, ql):
    e = jnp.concatenate([qh, ql]).astype(jnp.int32)
    tgt = (e & (NB * 4 - 1))
    s = jnp.zeros(NB * 4 + 1, jnp.int32).at[tgt].set(e)
    return s[0]
timeit_compile("scatter 2Q into NB*4", f_scatter, qh, ql)

# 4. two-level scans (ops/scan.py)
from genestrip_tpu.ops.scan import assoc_scan_1d, cumsum_1d, running_max_1d

def f_scan2(qh, ql):
    e = jnp.concatenate([qh, ql]).astype(jnp.int32)
    c = cumsum_1d(e)
    m = running_max_1d(e)
    def comb(a, b):
        keep = b[0] >= 0
        return (jnp.where(keep, b[0], a[0]), jnp.where(keep, b[1], a[1]))
    s2 = assoc_scan_1d(comb, (e, c), (jnp.int32(-1), jnp.int32(0)))[1]
    return c[-1] + m[-1] + s2[-1]
timeit_compile("two-level cumsum+max+segcopy 2Q", f_scan2, qh, ql)

# 4b. row-sort [8192, 128] x4 (the pipeline's per-read sorts)
def f_rowsort(qh):
    a = qh[: 8192 * 128].reshape(8192, 128).astype(jnp.int32)
    w, x, y, z = jax.lax.sort((a, a ^ 1, a ^ 2, a ^ 3), dimension=1, num_keys=2)
    return w[0, 0] + x[0, 0] + y[0, 0] + z[0, 0]
timeit_compile("row-sort [8192,128] 2keys+2payloads", f_rowsort, qh)

# 5. full lookup_join
from genestrip_tpu.store.hash import lookup_join, lookup_hash

def f_join(rows, qh, ql):
    s, f, v = lookup_join(rows, qh, ql, nb_bits=NB_BITS)
    return jnp.sum(f.astype(jnp.int32)) + s[0] + v[0]
timeit_compile("full lookup_join Q~1M", f_join, rows, qh, ql)

# 6. lookup_hash (two-gather) alone
def f_gather(rows, qh, ql):
    s, f, v = lookup_hash(rows, qh, ql, nb_bits=NB_BITS)
    return jnp.sum(f.astype(jnp.int32)) + s[0] + v[0]
timeit_compile("two-gather lookup_hash Q~1M", f_gather, rows, qh, ql)

# 7. full match_step at bench shapes
from genestrip_tpu.match.pipeline import (
    MatchConfig, TableSpec, error_bounds, match_step,
)
B, L = 8192, 160
T = 321
cfg = MatchConfig(k=31)
spec = TableSpec(NB * 4, NB_BITS)
codes = jnp.asarray(rng.integers(0, 4, (B, L), dtype=np.int64).astype(np.uint8))
lengths = jnp.full((B,), 150, jnp.int32)
bounds = jnp.asarray(error_bounds(np.full(B, 150, np.int32), 31, cfg))
vaux = jnp.asarray(rng.integers(0, T, (258, 4), dtype=np.int64).astype(np.int32))
anc = jnp.asarray(rng.integers(0, T, (T, 12), dtype=np.int64).astype(np.int32))
seen = jnp.zeros(spec.n + 1, jnp.uint8)
counts = jnp.zeros(1, jnp.int32)

def f_match(rows, vaux, anc, codes, lengths, bounds, seen, counts):
    out = match_step(cfg, spec, T, rows, vaux, anc, codes, lengths, bounds,
                     seen, counts)
    return out["class_node"], out["kmers"], out["seen"]
timeit_compile("full match_step [8192,160]", f_match,
               rows, vaux, anc, codes, lengths, bounds, seen, counts)
print("done", flush=True)
