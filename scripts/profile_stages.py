"""Stage-by-stage timing of the match pipeline on the current device."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from genestrip_tpu.ops.kmer import window_kmers, split_u64
from genestrip_tpu.store.table import lookup_positions

B, L, K = 8192, 150, 31
W = L - K + 1
N = 16_000_000
T = 321

rng = np.random.default_rng(0)
codes = jnp.asarray(rng.integers(0, 4, size=(B, L)).astype(np.uint8))
lengths = jnp.full((B,), L, jnp.int32)
keys = np.sort(rng.choice(2**62, size=N, replace=False).astype(np.uint64))
khi, klo = split_u64(keys)
khi, klo = jnp.asarray(khi), jnp.asarray(klo)
vidx = jnp.asarray(rng.integers(0, T, size=N).astype(np.int32))


def bench(name, fn, *args, n=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / n
    print(f"{name:28s} {dt*1000:8.2f} ms  ({B/dt/1e6:7.2f} Mreads/s)")
    return out


wk = jax.jit(lambda c, l: window_kmers(c, l, K))
hi, lo, clean, exists = bench("window_kmers", wk, codes, lengths)

lk = jax.jit(lambda h, l: lookup_positions(khi, klo, h, l, N))
pos, found = bench("lookup(binsearch)", lk, hi, lo)

# one gather iteration in isolation
g1 = jax.jit(lambda m: (khi[m], klo[m]))
mid = jnp.asarray(rng.integers(0, N, size=(B, W)).astype(np.int32))
bench("2 gathers [B,W] from 16M", g1, mid)

# sort of the composite
comp = jnp.asarray(rng.integers(0, 2**40, size=(B, W)).astype(np.int64))
bench("sort i64 [B,W]", jax.jit(lambda c: jnp.sort(c, axis=1)), comp)
comp32 = jnp.asarray(rng.integers(0, 2**30, size=(B, W)).astype(np.int32))
bench("sort i32 [B,W]", jax.jit(lambda c: jnp.sort(c, axis=1)), comp32)

# scatter-add to T bins
lab = jnp.asarray(rng.integers(0, T, size=(B, W)).astype(np.int32))
val = jnp.asarray(rng.integers(0, 5, size=(B, W)).astype(np.int32))
bench("scatter-add [B*W]->T i32",
      jax.jit(lambda l, v: jnp.zeros(T + 1, jnp.int32).at[l.reshape(-1)].add(v.reshape(-1))),
      lab, val)
bench("scatter-add f64",
      jax.jit(lambda l, v: jnp.zeros(T + 1, jnp.float64).at[l.reshape(-1)].add(v.astype(jnp.float64).reshape(-1))),
      lab, val)

# scatter-max into big seen vector
seen0 = jnp.zeros(N + 1, jnp.uint8)
posq = jnp.asarray(rng.integers(0, N, size=(B, W)).astype(np.int32))
bench("scatter-max seen[16M]",
      jax.jit(lambda s, p: s.at[p.reshape(-1)].max(jnp.uint8(1))),
      seen0, posq)

# associative scan
bench("assoc_scan max [B,W]",
      jax.jit(lambda x: jax.lax.associative_scan(jnp.maximum, x, axis=1)), lab)

# [B,P,W] contraction
P_ = 10
cand = jnp.asarray(rng.integers(0, T, size=(B, P_)).astype(np.int32))
tout = jnp.asarray(np.sort(rng.integers(1, T, size=T)).astype(np.int32))


def sums_fn(label, cand):
    lab_e = label[:, None, :]
    tout_lab = tout[jnp.maximum(label, 0)][:, None, :]
    c_e = cand[:, :, None]
    contrib = (lab_e >= 0) & (c_e >= 0) & (lab_e <= c_e) & (c_e < tout_lab)
    return jnp.sum(contrib.astype(jnp.int32), axis=2)


bench("[B,P,W] path sums", jax.jit(sums_fn), lab, cand)


# --- round 2 measurements ---
# gather [B,W] from tiny array (T=321)
tarr = jnp.asarray(rng.integers(0, 10**6, size=T).astype(np.int32))
bench("gather [B,W] from T=321", jax.jit(lambda l: tarr[l]), lab)

# gather [B,W] interleaved row [N,4]
aux = jnp.asarray(rng.integers(0, 2**30, size=(N, 4)).astype(np.int32))
bench("gather [B,W] rows [16M,4]", jax.jit(lambda m: aux[m]), mid)

# scatter-add i64
bench("scatter-add i64", jax.jit(
    lambda l, v: jnp.zeros(T + 1, jnp.int64).at[l.reshape(-1)].add(v.astype(jnp.int64).reshape(-1))), lab, val)

# seen scatter-max without donation bug
seenq = jnp.zeros(N + 1, jnp.uint8)
f = jax.jit(lambda s, p: s.at[p.reshape(-1)].max(jnp.uint8(1)))
bench("scatter-max seen[16M] u8", f, seenq, posq)

# scatter-min i32 (argmax_enc pattern)
bench("scatter-min i32", jax.jit(
    lambda l, v: jnp.full(T + 1, 2**31 - 1, jnp.int32).at[l.reshape(-1)].min(v.reshape(-1))), lab, val)

# lax.sort multi-operand [B,W]
bench("lax.sort 2op [B,W]", jax.jit(
    lambda c, t: jax.lax.sort((c, t), dimension=1, num_keys=1)), comp, lab)

# radix-16 + interleaved binary search (variant D shape)
r_bits = 20
kk = np.asarray(keys)
shift = 62 - r_bits
radix = (kk >> np.uint64(shift)).astype(np.int64)
bs = np.searchsorted(radix, np.arange((1 << r_bits) + 1)).astype(np.int32)
max_bucket = int(np.max(bs[1:] - bs[:-1]))
iters_b = max(int(np.ceil(np.log2(max_bucket + 1))), 1)
inter = jnp.asarray(np.stack([np.asarray(khi), np.asarray(klo)], axis=1))
bsj = jnp.asarray(bs)
print(f"# radix r={r_bits} max_bucket={max_bucket} iters={iters_b}")


def lt(a_hi, a_lo, b_hi, b_lo):
    return (a_hi < b_hi) | ((a_hi == b_hi) & (a_lo < b_lo))


@jax.jit
def variant_d(q_hi, q_lo):
    if shift >= 32:
        rx = (q_hi >> (shift - 32)).astype(jnp.int32)
    else:
        rx = ((q_hi << (32 - shift)) | (q_lo >> shift)).astype(jnp.int32)
    lo0 = bsj[rx]
    hi0 = bsj[rx + 1]

    def body(_, st):
        lo_, hi_ = st
        m = (lo_ + hi_) >> 1
        kkm = inter[m]
        go = lt(kkm[..., 0], kkm[..., 1], q_hi, q_lo)
        return jnp.where(go, m + 1, lo_), jnp.where(go, hi_, m)
    lo_, hi_ = jax.lax.fori_loop(0, iters_b, body, (lo0, hi0))
    p = jnp.minimum(lo_, N - 1)
    kkp = inter[p]
    fnd = (kkp[..., 0] == q_hi) & (kkp[..., 1] == q_lo) & (lo_ < hi0)
    return p, fnd


bench("lookup radix20/inter [B,W]", variant_d, hi, lo)


# row scatter-add [B*W] -> [T+1, 3]
val3 = jnp.asarray(rng.integers(0, 5, size=(B * W, 3)).astype(np.int32))
bench("scatter-add rows [T+1,3]", jax.jit(
    lambda l, v: jnp.zeros((T + 1, 3), jnp.int32).at[l.reshape(-1)].add(v)),
    lab, val3)

# composite scatter-min i32
encb = 20
compv = jnp.asarray(rng.integers(0, 2**27, size=B * W).astype(np.int32))
bench("scatter-min composite i32", jax.jit(
    lambda l, v: jnp.full(T + 1, 2**31 - 1, jnp.int32).at[l.reshape(-1)].min(v)),
    lab, compv)
