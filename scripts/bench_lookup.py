"""Microbenchmark of k-mer table lookup variants on the real device.

Variants:
  A  full binary search, separate hi/lo gathers (current lookup_positions)
  B  full binary search, interleaved [N,2] single-gather per probe
  C  radix-bucketed search: direct-indexed bucket bounds from the top r key
     bits + short binary search within the bucket (ref: the role of
     store/RadixKMerStore.java's radix bits, redesigned for lock-step lanes)
  D  C with interleaved gathers

Usage: python scripts/bench_lookup.py [--n 16000000] [--q 1048576] [--r 16]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=16_000_000)
    ap.add_argument("--q", type=int, default=1_048_576)
    ap.add_argument("--r", type=int, default=16)
    ap.add_argument("--k", type=int, default=31)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from genestrip_tpu.ops.kmer import split_u64

    rng = np.random.default_rng(1)
    k2 = 2 * args.k
    keys = rng.integers(0, 1 << k2, size=int(args.n * 1.05) + 64, dtype=np.uint64)
    keys = np.unique(keys)[: args.n]
    args.n = len(keys)
    # queries: half hits, half misses
    qi = rng.integers(0, args.n, size=args.q // 2)
    q_hit = keys[qi]
    q_miss = rng.integers(0, 1 << k2, size=args.q - len(q_hit), dtype=np.uint64)
    queries = np.concatenate([q_hit, q_miss])
    rng.shuffle(queries)

    hi, lo = split_u64(keys)
    q_hi, q_lo = split_u64(queries)
    inter = np.stack([hi, lo], axis=1)           # [N, 2]

    # radix buckets over the top r bits of the 2k-bit key space
    shift = k2 - args.r
    radix = (keys >> np.uint64(shift)).astype(np.int64)
    bucket_start = np.searchsorted(radix, np.arange((1 << args.r) + 1)).astype(np.int32)
    max_bucket = int(np.max(bucket_start[1:] - bucket_start[:-1]))
    iters_full = int(np.ceil(np.log2(args.n + 1)))
    iters_bucket = max(int(np.ceil(np.log2(max_bucket + 1))), 1)
    print(f"# n={args.n} q={args.q} r={args.r} max_bucket={max_bucket} "
          f"iters full={iters_full} bucket={iters_bucket}")

    d = dict(hi=jnp.asarray(hi), lo=jnp.asarray(lo), inter=jnp.asarray(inter),
             q_hi=jnp.asarray(q_hi), q_lo=jnp.asarray(q_lo),
             bs=jnp.asarray(bucket_start))

    def lt(a_hi, a_lo, b_hi, b_lo):
        return (a_hi < b_hi) | ((a_hi == b_hi) & (a_lo < b_lo))

    def search(keys_hi, keys_lo, q_hi, q_lo, lo0, hi0, iters):
        def body(_, st):
            lo_, hi_ = st
            mid = (lo_ + hi_) >> 1
            go = lt(keys_hi[mid], keys_lo[mid], q_hi, q_lo)
            return jnp.where(go, mid + 1, lo_), jnp.where(go, hi_, mid)
        lo_, hi_ = jax.lax.fori_loop(0, iters, body, (lo0, hi0))
        pos = jnp.minimum(lo_, args.n - 1)
        found = (keys_hi[pos] == q_hi) & (keys_lo[pos] == q_lo) & (lo_ < hi0)
        return pos, found

    def search_inter(inter_keys, q_hi, q_lo, lo0, hi0, iters, hi_limit):
        def body(_, st):
            lo_, hi_ = st
            mid = (lo_ + hi_) >> 1
            kk = inter_keys[mid]                     # [Q, 2] single gather
            go = lt(kk[..., 0], kk[..., 1], q_hi, q_lo)
            return jnp.where(go, mid + 1, lo_), jnp.where(go, hi_, mid)
        lo_, hi_ = jax.lax.fori_loop(0, iters, body, (lo0, hi0))
        pos = jnp.minimum(lo_, args.n - 1)
        kk = inter_keys[pos]
        found = (kk[..., 0] == q_hi) & (kk[..., 1] == q_lo) & (lo_ < hi_limit)
        return pos, found

    def radix_of(q_hi, q_lo):
        if shift >= 32:
            return (q_hi >> (shift - 32)).astype(jnp.int32)
        return ((q_hi << (32 - shift)) | (q_lo >> shift)).astype(jnp.int32)

    @jax.jit
    def variant_a(q_hi, q_lo):
        z = jnp.zeros(q_hi.shape, jnp.int32)
        return search(d["hi"], d["lo"], q_hi, q_lo, z, z + args.n, iters_full)

    @jax.jit
    def variant_b(q_hi, q_lo):
        z = jnp.zeros(q_hi.shape, jnp.int32)
        return search_inter(d["inter"], q_hi, q_lo, z, z + args.n, iters_full,
                            z + args.n)

    @jax.jit
    def variant_c(q_hi, q_lo):
        rx = radix_of(q_hi, q_lo)
        lo0 = d["bs"][rx]
        hi0 = d["bs"][rx + 1]
        return search(d["hi"], d["lo"], q_hi, q_lo, lo0, hi0, iters_bucket)

    @jax.jit
    def variant_d(q_hi, q_lo):
        rx = radix_of(q_hi, q_lo)
        lo0 = d["bs"][rx]
        hi0 = d["bs"][rx + 1]
        return search_inter(d["inter"], q_hi, q_lo, lo0, hi0, iters_bucket, hi0)

    # golden
    pos_np = np.searchsorted(keys, queries)
    pos_c = np.minimum(pos_np, args.n - 1)
    found_np = keys[pos_c] == queries

    for name, fn in [("A full/split", variant_a), ("B full/inter", variant_b),
                     ("C radix/split", variant_c), ("D radix/inter", variant_d)]:
        pos, found = fn(d["q_hi"], d["q_lo"])
        jax.block_until_ready(pos)
        np.testing.assert_array_equal(np.asarray(found), found_np)
        np.testing.assert_array_equal(np.asarray(pos)[found_np], pos_c[found_np])
        reps = 20
        t0 = time.time()
        for _ in range(reps):
            pos, found = fn(d["q_hi"], d["q_lo"])
        jax.block_until_ready(pos)
        dt = (time.time() - t0) / reps
        print(f"{name}: {dt * 1e3:8.3f} ms  {args.q / dt / 1e6:8.1f} Mlookups/s")


if __name__ == "__main__":
    main()


def bench_oct():
    """Variant E: 2-gather oct lookup — bounds row (start + 2 fences) then
    one 8-slot oct row; no binary search at all."""
    import time
    import numpy as np
    import jax
    import jax.numpy as jnp
    from genestrip_tpu.ops.kmer import split_u64

    rng = np.random.default_rng(1)
    n, q, k = 16_000_000, 1 << 20, 31
    k2 = 2 * k
    keys = np.unique(rng.integers(0, 1 << k2, size=int(n * 1.05) + 64,
                                  dtype=np.uint64))[:n]
    n = len(keys)
    qi = rng.integers(0, n, size=q // 2)
    queries = np.concatenate([keys[qi], rng.integers(0, 1 << k2, size=q - q // 2,
                                                     dtype=np.uint64)])
    rng.shuffle(queries)

    r = int(np.ceil(np.log2(n))) - 1
    shift = k2 - r
    radix = (keys >> np.uint64(shift)).astype(np.int64)
    bstart = np.searchsorted(radix, np.arange((1 << r) + 1)).astype(np.int64)
    maxb = int(np.max(bstart[1:] - bstart[:-1]))
    print(f"# oct r={r} max_bucket={maxb}")
    assert maxb <= 16
    hi, lo = split_u64(keys)
    n_oct = (n + 7) // 8
    pad = n_oct * 8 - n
    hi8 = np.concatenate([hi, np.full(pad, 0xFFFFFFFF, np.uint32)]).reshape(n_oct, 8)
    lo8 = np.concatenate([lo, np.full(pad, 0xFFFFFFFF, np.uint32)]).reshape(n_oct, 8)
    vid8 = np.concatenate([np.arange(n, dtype=np.int32) % 60000,
                           np.zeros(pad, np.int32)]).reshape(n_oct, 8)
    octs = np.concatenate([hi8.view(np.int32), lo8.view(np.int32), vid8],
                          axis=1)  # [n_oct, 24]
    # bounds rows: start_pos + fences (first keys of oct o0+1, o0+2)
    s = bstart[:-1]
    o0 = (s >> 3).astype(np.int64)
    f1i = np.minimum((o0 + 1) * 8, n - 1)
    f2i = np.minimum((o0 + 2) * 8, n - 1)
    inf = np.uint32(0xFFFFFFFF)
    f1_hi = np.where((o0 + 1) * 8 < n, hi[f1i], inf)
    f1_lo = np.where((o0 + 1) * 8 < n, lo[f1i], inf)
    f2_hi = np.where((o0 + 2) * 8 < n, hi[f2i], inf)
    f2_lo = np.where((o0 + 2) * 8 < n, lo[f2i], inf)
    bounds = np.stack([s.astype(np.int32),
                       f1_hi.view(np.int32), f1_lo.view(np.int32),
                       f2_hi.view(np.int32), f2_lo.view(np.int32),
                       np.zeros_like(s, np.int32), np.zeros_like(s, np.int32),
                       np.zeros_like(s, np.int32)], axis=1)  # [2^r, 8]

    q_hi, q_lo = split_u64(queries)
    d_b = jnp.asarray(bounds)
    d_o = jnp.asarray(octs)
    jq_hi, jq_lo = jnp.asarray(q_hi), jnp.asarray(q_lo)

    def u32(x):
        return jax.lax.bitcast_convert_type(x, jnp.uint32)

    def ge(a_hi, a_lo, b_hi, b_lo):
        return (a_hi > b_hi) | ((a_hi == b_hi) & (a_lo >= b_lo))

    @jax.jit
    def variant_e(q_hi, q_lo):
        rx = ((q_hi << (32 - shift)) | (q_lo >> shift)).astype(jnp.int32) \
            if shift < 32 else (q_hi >> (shift - 32)).astype(jnp.int32)
        b = d_b[rx]
        o0 = b[..., 0] >> 3
        oct_idx = (o0
                   + ge(q_hi, q_lo, u32(b[..., 1]), u32(b[..., 2])).astype(jnp.int32)
                   + ge(q_hi, q_lo, u32(b[..., 3]), u32(b[..., 4])).astype(jnp.int32))
        row = d_o[jnp.minimum(oct_idx, n_oct - 1)]
        eq = (u32(row[..., 0:8]) == q_hi[..., None]) & \
             (u32(row[..., 8:16]) == q_lo[..., None])
        found = jnp.any(eq, axis=-1)
        slot = jnp.argmax(eq, axis=-1)
        pos = oct_idx * 8 + slot.astype(jnp.int32)
        vid = jnp.sum(jnp.where(eq, row[..., 16:24], 0), axis=-1)
        return pos, found, vid

    pos, found, vid = variant_e(jq_hi, jq_lo)
    jax.block_until_ready(pos)
    # golden
    p_np = np.searchsorted(keys, queries)
    pc = np.minimum(p_np, n - 1)
    f_np = keys[pc] == queries
    np.testing.assert_array_equal(np.asarray(found), f_np)
    np.testing.assert_array_equal(np.asarray(pos)[f_np], pc[f_np])
    np.testing.assert_array_equal(np.asarray(vid)[f_np],
                                  (pc[f_np] % 60000).astype(np.int32))
    reps = 20
    t0 = time.time()
    for _ in range(reps):
        pos, found, vid = variant_e(jq_hi, jq_lo)
    jax.block_until_ready(pos)
    dt = (time.time() - t0) / reps
    print(f"E oct 2-gather: {dt*1e3:8.3f} ms  {q/dt/1e6:8.1f} Mlookups/s")


if __name__ == "__main__" and "--oct" in sys.argv:
    bench_oct()
