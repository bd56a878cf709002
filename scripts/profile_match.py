"""Ablation profile of match_step stages on the real device.

Each stage is timed with the chained-dependency trick (f(N) vs f(1), scalar
materialized to host) since block_until_ready does not block on axon.
Stages mirror genestrip_tpu/match/pipeline.py; numbers tell where the batch
time goes.
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import functools
import numpy as np
import jax
import jax.numpy as jnp

from genestrip_tpu.ops.kmer import window_kmers, split_u64
from genestrip_tpu.store.table import KmerTable, lookup_radix

B, L, K = 8192, 150, 31
W = L - K + 1
N = 16_000_000
T = 512
D = 24
P = 10

rng = np.random.default_rng(0)
codes = jnp.asarray(rng.integers(0, 4, size=(B, L)).astype(np.uint8))
lengths = jnp.full((B,), L, jnp.int32)

keys = np.sort(np.unique(rng.integers(0, 2**62, 2 * N, dtype=np.uint64))[:N])
vidx = rng.integers(0, T, size=N).astype(np.uint16)
tabobj = KmerTable(K, keys, vidx, [str(i) for i in range(T)])
aux3 = rng.integers(0, T, (N, 3)).astype(np.int32)
sa = tabobj.search_arrays(aux3)
inter, bstart = sa["inter"], sa["bucket_start"]
anc = jnp.asarray(rng.integers(0, T, (T, D)).astype(np.int32))


def run_chain(make_fn, state, iters=6):
    f1 = make_fn(1)
    fN = make_fn(iters)
    float(np.asarray(f1(*state)))
    float(np.asarray(fN(*state)))
    t0 = time.time(); float(np.asarray(f1(*state))); t1 = time.time()
    float(np.asarray(fN(*state))); t2 = time.time()
    return ((t2 - t1) - (t1 - t0)) / (iters - 1)


def report(name, per):
    print(f"{name:44s}: {per*1e3:9.2f} ms/batch  ({B/per/1e3:8.1f} kreads/s)",
          flush=True)


# ---- A: window_kmers ---------------------------------------------------------
def mk_wk(iters):
    @jax.jit
    def f(c, l):
        acc = jnp.uint32(0)
        for i in range(iters):
            hi, lo, clean, exists = window_kmers(c ^ jnp.uint8(i & 1), l, K)
            clean = clean.astype(jnp.uint32); exists = exists.astype(jnp.uint32)
            acc = acc + jnp.sum(hi) + jnp.sum(lo) + jnp.sum(clean) + jnp.sum(exists)
        return acc.astype(jnp.float32)
    return f


print("A,B: skipped (measured: A ~0ms, B 103ms)", flush=True)

hi0, lo0, clean0, exists0 = jax.jit(lambda c, l: window_kmers(c, l, K))(codes, lengths)


# ---- B: lookup ----------------------------------------------------------------
def mk_lk(iters):
    @jax.jit
    def f(tb, bs, h, l):
        for i in range(iters):
            pos, found, aux = lookup_radix(tb, bs, h, l, n=sa["n"],
                                           iters=sa["iters"], shift=sa["shift"])
            h = h ^ pos.astype(jnp.uint32)
            l = l + jnp.uint32(1)
        return (jnp.sum(h.astype(jnp.uint32)) + jnp.sum(l)).astype(jnp.float32)
    return f


pass

pos0, found0, aux0 = jax.jit(lambda h, l: lookup_radix(
    inter, bstart, h, l, n=sa["n"], iters=sa["iters"], shift=sa["shift"]))(hi0, lo0)
hit0 = found0 & clean0 & exists0
node0 = jnp.where(hit0, aux0[..., 0], -1)
tout0 = jnp.where(hit0, aux0[..., 1], 0)
depth0 = jnp.where(hit0, aux0[..., 2], D)


# ---- C: unique scatter ---------------------------------------------------------
def mk_seen(iters):
    @jax.jit
    def f(p):
        seen = jnp.zeros(N + 1, jnp.uint8)
        for i in range(iters):
            up = jnp.where(hit0, p, N).reshape(-1)
            seen = seen.at[up].max(jnp.uint8(1))
            p = p + seen[N].astype(jnp.int32)
        return (jnp.sum(seen[::1024].astype(jnp.int32)) + jnp.sum(p)).astype(jnp.float32)
    return f


report("C seen scatter-max 1M->16M (in-place chain)", run_chain(mk_seen, (pos0,), iters=4))


def mk_seen_set(iters):
    @jax.jit
    def f(p):
        seen = jnp.zeros(N + 1, jnp.uint8)
        for i in range(iters):
            up = jnp.where(hit0, p, N).reshape(-1)
            seen = seen.at[up].set(jnp.uint8(1))
            p = p + seen[N].astype(jnp.int32)
        return (jnp.sum(seen[::1024].astype(jnp.int32)) + jnp.sum(p)).astype(jnp.float32)
    return f


report("C2 seen scatter-SET 1M->16M", run_chain(mk_seen_set, (pos0,), iters=4))


# ---- D: contig stats ------------------------------------------------------------
def mk_contig(iters):
    @jax.jit
    def f(lab):
        acc = jnp.float32(0)
        s_idx = jax.lax.broadcasted_iota(jnp.int32, (B, W), 1)
        for i in range(iters):
            label = lab ^ (i & 1)
            prev = jnp.concatenate([jnp.full((B, 1), -3, label.dtype), label[:, :-1]], axis=1)
            nxt = jnp.concatenate([label[:, 1:], jnp.full((B, 1), -3, label.dtype)], axis=1)
            boundary = exists0 & (label != prev)
            is_end = exists0 & (label != nxt)
            run_start = jax.lax.associative_scan(jnp.maximum, jnp.where(boundary, s_idx, -1), axis=1)
            clen = s_idx - run_start + 1
            end_hit = is_end & (label >= 0)
            tnode = jnp.where(end_hit, label, T).reshape(-1)
            clen_f = jnp.where(end_hit, clen, 0).reshape(-1)
            zT = jnp.zeros(T + 1, jnp.int32)
            contigs = zT.at[tnode].add(jnp.where(end_hit, 1, 0).reshape(-1))[:T]
            kmers = zT.at[tnode].add(clen_f)[:T]
            sq = zT.at[tnode].add(clen_f * clen_f)[:T]
            enc = (s_idx + W * jax.lax.broadcasted_iota(jnp.int32, (B, W), 0)).reshape(-1)
            comp_mc = jnp.where(end_hit.reshape(-1), ((W - clen.reshape(-1)) << 21) | enc,
                                jnp.iinfo(jnp.int32).max)
            mc = jnp.full(T + 1, jnp.iinfo(jnp.int32).max, jnp.int32).at[tnode].min(comp_mc)[:T]
            reads1 = zT.at[tnode].add(1)[:T]
            acc += (jnp.sum(contigs) + jnp.sum(kmers) + jnp.sum(sq) + jnp.sum(mc) + jnp.sum(reads1)).astype(jnp.float32)
        return acc
    return f


report("D contig scans+5 scatters", run_chain(mk_contig, (node0,)))


# ---- E: the 2-key 4-payload sort -------------------------------------------------
def mk_sort(iters):
    @jax.jit
    def f(nk, si, to, de):
        acc = jnp.float32(0)
        for i in range(iters):
            a, b, c, d = jax.lax.sort((nk, si, to, de), dimension=1, num_keys=2)
            nk = a ^ (i & 1)
            acc += (jnp.sum(a) + jnp.sum(b[:, :4]) + jnp.sum(c[:, :4]) + jnp.sum(d[:, :4])).astype(jnp.float32)
        return acc
    return f


BIGc = jnp.iinfo(jnp.int32).max
nk0 = jnp.where(hit0, node0, BIGc)
si0 = jax.lax.broadcasted_iota(jnp.int32, (B, W), 1)
report("E lax.sort [B,W] 2key 4arr", run_chain(mk_sort, (nk0, si0, tout0, depth0)))


# ---- F: single sort ----------------------------------------------------------------
def mk_sort1(iters):
    @jax.jit
    def f(x):
        acc = jnp.float32(0)
        for i in range(iters):
            s = jax.lax.sort(x, dimension=1)
            x = s ^ (i & 1)
            acc += jnp.sum(s).astype(jnp.float32)
        return acc
    return f


report("F lax.sort [B,W] 1key", run_chain(mk_sort1, (tout0,)))


# ---- H: rank queries ----------------------------------------------------------------
cand0 = jnp.asarray(rng.integers(0, T, (B, P)).astype(np.int32))
srt0 = jax.lax.sort(jnp.where(hit0, tout0, BIGc), dimension=1)


def mk_rank(iters):
    @jax.jit
    def f(c):
        acc = jnp.float32(0)
        for i in range(iters):
            lo_b = jnp.zeros_like(c)
            hi_b = jnp.full_like(c, W)
            for _ in range(int(np.ceil(np.log2(W + 1)))):
                mid = (lo_b + hi_b) >> 1
                v = jnp.take_along_axis(srt0, jnp.minimum(mid, W - 1), axis=1)
                upd = lo_b < hi_b
                go = v <= c
                lo_b = jnp.where(upd & go, mid + 1, lo_b)
                hi_b = jnp.where(upd & ~go, mid, hi_b)
            acc += jnp.sum(lo_b).astype(jnp.float32)
            c = (c + lo_b) % T
        return acc
    return f


report("H upper_bound [B,P] x1", run_chain(mk_rank, (cand0,)))


# ---- J: LCA fold ------------------------------------------------------------------
def mk_lca(iters):
    @jax.jit
    def f(c):
        acc0 = jnp.full((B,), -1, jnp.int32)
        accv = jnp.float32(0)
        for i in range(iters):
            acc = acc0
            for p in range(P):
                cp = c[:, p]
                aa = anc[jnp.maximum(acc, 0)]
                ab = anc[jnp.maximum(cp, 0)]
                match = (aa == ab) & (aa >= 0)
                dd = jnp.sum(match.astype(jnp.int32), axis=-1) - 1
                pair = jnp.take_along_axis(aa, jnp.maximum(dd, 0)[..., None], axis=-1)[..., 0]
                acc = jnp.where(cp >= 0, jnp.where(acc < 0, cp, pair), acc)
            accv += jnp.sum(acc).astype(jnp.float32)
            c = (c + 1) % T
        return accv
    return f


report("J LCA fold 10 paths", run_chain(mk_lca, (cand0,)))


# ---- I: tax err (incl f64) -----------------------------------------------------------
def mk_err(iters):
    @jax.jit
    def f(lab):
        acc = jnp.float32(0)
        n_win = jnp.maximum(lengths - (K - 1), 0)
        for i in range(iters):
            label = lab ^ (i & 1)
            n_miss = jnp.sum((label == -1).astype(jnp.int32), axis=1)
            col = jax.lax.broadcasted_iota(jnp.int32, (B, L), 1)
            bad_b = (codes > 3) & (col < lengths[:, None])
            early = jnp.sum((bad_b & (col <= (n_win - 2)[:, None])).astype(jnp.int32), axis=1)
            late = jnp.any(bad_b & (col >= (n_win - 1)[:, None]), axis=1).astype(jnp.int32)
            tax_err = n_miss + early + late
            failed = tax_err.astype(jnp.float64) > 0.5 * n_win.astype(jnp.float64)
            acc += jnp.sum(failed.astype(jnp.float32))
        return acc
    return f


report("I tax_err cumsums + f64 cmp", run_chain(mk_err, (node0,)))
print("done", flush=True)
