"""Round-3 stage decomposition of match_step on the real chip.

Times each hot-path stage in isolation with the dependent-chain trick
(f(N)-f(1), scalar materialized), plus full match_step ablations, on a
4M-key table (row-gather cost is ~size-independent; see probe_hot.py).
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

from genestrip_tpu.match.pipeline import MatchConfig, TableSpec, match_step
from genestrip_tpu.store.hash import build_hash, lookup_hash
from genestrip_tpu.ops.kmer import window_kmers

B, L, K = 8192, 150, 31
N = 4_000_000
T = 512
W = L - K + 1

rng = np.random.default_rng(0)
keys = np.unique(rng.integers(0, 2**62, int(1.2 * N), dtype=np.uint64))[:N]
vidx = rng.integers(0, T // 2, size=N).astype(np.int64)
t0 = time.time()
ht = build_hash(keys, vidx)
print(f"build_hash({N}) host: {time.time()-t0:.1f}s nb_bits={ht.nb_bits}", flush=True)
spec = TableSpec(ht.n_slots, ht.nb_bits)
rows = jnp.asarray(ht.rows)

parent = np.array([-1] + [i // 2 for i in range(1, T)], dtype=np.int32)
depth = np.zeros(T, np.int32)
for i in range(1, T):
    depth[i] = depth[parent[i]] + 1
sizes = np.ones(T, np.int64)
for i in range(T - 1, 0, -1):
    sizes[parent[i]] += sizes[i]
tout = (np.arange(T) + sizes).astype(np.int32)
md = int(depth.max()) + 1
anc_np = np.full((T, md), -1, np.int32)
for i in range(T):
    anc_np[i, depth[i]] = i
    if parent[i] >= 0:
        anc_np[i, : depth[i]] = anc_np[parent[i], : depth[i]]
anc = jnp.asarray(anc_np)
nv = T // 2
vaux_np = np.zeros((nv + 1, 4), np.int32)
vaux_np[:nv, 0] = np.arange(nv) % T
vaux_np[:nv, 1] = tout[np.arange(nv) % T]
vaux_np[:nv, 2] = depth[np.arange(nv) % T]
vaux_np[nv] = (-1, 0, 0, 0)
vaux = jnp.asarray(vaux_np)

# half the reads drawn from genome text built out of table keys? keep it
# simple: random codes, plus planted table keys decoded is hard. Use the
# hash hit rate via random: ~0 hits. For stage costs hit rate mostly
# matters for scatter densities; emulate half-hit by ORing found later.
codes = rng.integers(0, 4, size=(B, L)).astype(np.uint8)
codes_d = jnp.asarray(codes)
lengths_d = jnp.full((B,), L, jnp.int32)


def run_chain(make_fn, state, iters=6):
    f1 = make_fn(1)
    fN = make_fn(iters)
    float(np.asarray(f1(*state)))
    float(np.asarray(fN(*state)))
    t0 = time.time(); float(np.asarray(f1(*state))); t1 = time.time()
    float(np.asarray(fN(*state))); t2 = time.time()
    return ((t2 - t1) - (t1 - t0)) / (iters - 1)


def report(name, per):
    print(f"{name:48s}: {per*1e3:8.2f} ms/batch  ({B/per/1e3:8.1f} kreads/s)",
          flush=True)


# ---- stage 1: window kmers ---------------------------------------------------
def mk_win(iters):
    @jax.jit
    def f(codes):
        acc = jnp.uint32(0)
        c = codes
        for _ in range(iters):
            hi, lo, clean, exists = window_kmers(c, lengths_d, K)
            acc += hi[0, 0] + lo[-1, -1] + jnp.sum(clean[0]).astype(jnp.uint32)
            c = jnp.roll(c, 1, axis=0)
        return acc
    return f

report("window_kmers", run_chain(mk_win, (codes_d,)))


# ---- stage 2: hash lookup (2 row gathers + probes) ---------------------------
hi0, lo0, clean0, exists0 = window_kmers(codes_d, lengths_d, K)
hi0, lo0 = jax.block_until_ready(hi0), jax.block_until_ready(lo0)

def mk_lookup(iters):
    @jax.jit
    def f(rows, hi, lo):
        acc = jnp.int32(0)
        for i in range(iters):
            pos, found, vidx = lookup_hash(rows, hi + jnp.uint32(i), lo,
                                           nb_bits=spec.nb_bits)
            acc += jnp.sum(found.astype(jnp.int32)) + pos[0, 0] + vidx[-1, -1]
        return acc
    return f

report("lookup_hash (2 row-gathers + probe)", run_chain(mk_lookup, (rows, hi0, lo0)))


# ---- stage 3: vaux gather ----------------------------------------------------
vidx0 = jnp.asarray(rng.integers(0, nv, size=(B, W)).astype(np.int32))
hit0 = jnp.asarray(rng.random((B, W)) < 0.5)

def mk_vaux(iters):
    @jax.jit
    def f(vaux, vidx, hit):
        acc = jnp.int32(0)
        for i in range(iters):
            aux = vaux[jnp.where(hit, (vidx + i) % nv, nv).reshape(-1)]
            acc += aux[0, 0] + aux[-1, 1] + jnp.sum(aux[::4096, 2])
        return acc
    return f

report("vaux row-gather [Q,4]", run_chain(mk_vaux, (vaux, vidx0, hit0)))


# ---- stage 4: seen scatter ----------------------------------------------------
pos0 = jnp.asarray(rng.integers(0, spec.n, size=(B, W)).astype(np.int32))

def mk_seen(iters):
    @jax.jit
    def f(pos, hit):
        seen = jnp.zeros(spec.n + 1, jnp.uint8)
        for i in range(iters):
            upos = jnp.where(hit, (pos + i) % spec.n, spec.n).reshape(-1)
            seen = seen.at[upos].max(jnp.uint8(1))
        return jnp.sum(seen[::4096].astype(jnp.int32))
    return f

report("seen scatter-max (1M -> 16M u8)", run_chain(mk_seen, (pos0, hit0)))


# ---- stage 5: [B,W] contig scatters -------------------------------------------
lab0 = jnp.asarray(np.where(rng.random((B, W)) < 0.5,
                            rng.integers(0, T, size=(B, W)), -1).astype(np.int32))

def mk_contig(iters):
    @jax.jit
    def f(label):
        acc = jnp.int32(0)
        for i in range(iters):
            lab = jnp.where(label >= 0, (label + i) % T, -1)
            s_idx = jax.lax.broadcasted_iota(jnp.int32, (B, W), 1)
            prev = jnp.concatenate([jnp.full((B, 1), -3, lab.dtype), lab[:, :-1]], axis=1)
            nxt = jnp.concatenate([lab[:, 1:], jnp.full((B, 1), -3, lab.dtype)], axis=1)
            boundary = lab != prev
            is_end = lab != nxt
            run_start = jax.lax.associative_scan(jnp.maximum, jnp.where(boundary, s_idx, -1), axis=1)
            clen = s_idx - run_start + 1
            end_hit = is_end & (lab >= 0)
            tnode = jnp.where(end_hit, lab, T).reshape(-1)
            clen_f = jnp.where(end_hit, clen, 0).reshape(-1)
            zT = jnp.zeros(T + 1, jnp.int32)
            contigs = zT.at[tnode].add(jnp.where(end_hit, 1, 0).reshape(-1))[:T]
            kmers = zT.at[tnode].add(clen_f)[:T]
            sq = zT.at[tnode].add(clen_f * clen_f)[:T]
            acc += contigs[0] + kmers[1] + sq[2]
        return acc
    return f

report("contig RLE + 3 scatters to [T]", run_chain(mk_contig, (lab0,)))


# ---- stage 6: the [B,W] 4-operand sort ----------------------------------------
to0 = jnp.asarray(rng.integers(0, T, size=(B, W)).astype(np.int32))
dp0 = jnp.asarray(rng.integers(0, md, size=(B, W)).astype(np.int32))

def mk_sort(iters):
    @jax.jit
    def f(label, to, dp):
        BIG = jnp.iinfo(jnp.int32).max
        s_idx = jax.lax.broadcasted_iota(jnp.int32, (B, W), 1)
        acc = jnp.int32(0)
        for i in range(iters):
            nk = jnp.where(label >= 0, (label + i) % T, BIG)
            a, b, c, d = jax.lax.sort((nk, s_idx, to, dp), dimension=1, num_keys=2)
            acc += a[0, 0] + b[-1, -1] + c[0, -1] + d[-1, 0]
        return acc
    return f

report("per-read 4-op 2-key sort [B,W]", run_chain(mk_sort, (lab0, to0, dp0)))


# ---- full step ablations -------------------------------------------------------
def mk_step(cfg):
    def mk(iters):
        @jax.jit
        def f(rows, vaux, codes):
            seen = jnp.zeros(spec.n + 1, jnp.uint8)
            counts = jnp.zeros(1, jnp.int32)
            acc = jnp.float32(0)
            c = codes
            for _ in range(iters):
                out = match_step(cfg, spec, T, rows, vaux, anc,
                                 c, lengths_d, seen, counts)
                seen = out["seen"]
                counts = out["counts"]
                acc += (jnp.sum(out["kmers"]) + jnp.sum(out["class_node"])).astype(jnp.float32)
                c = jnp.roll(c, 1, axis=0)
            return acc + seen[0].astype(jnp.float32)
        return f
    return mk

report("match_step base (no unique, no classify)",
       run_chain(mk_step(MatchConfig(k=K, with_unique=False, classify=False)), (rows, vaux, codes_d)))
report("match_step +unique",
       run_chain(mk_step(MatchConfig(k=K, with_unique=True, classify=False)), (rows, vaux, codes_d)))
report("match_step +classify",
       run_chain(mk_step(MatchConfig(k=K, with_unique=False, classify=True)), (rows, vaux, codes_d)))
report("match_step FULL",
       run_chain(mk_step(MatchConfig(k=K, with_unique=True, classify=True)), (rows, vaux, codes_d)))
print("done", flush=True)
