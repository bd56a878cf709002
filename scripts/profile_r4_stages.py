"""Stage-level timing of match_step components at bench shapes on the real
chip. Each stage is its own jitted function, timed with block_until_ready,
so the 0.76 s/batch regression (bench r4: 10.7k reads/s vs r3's 156k) can be
pinned to a specific sub-stage."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

from genestrip_tpu.match.pipeline import (
    MatchConfig, TableSpec, match_step, _attach_aux)
from genestrip_tpu.store.hash import build_hash, lookup_join, lookup_hash

B, L, K = 8192, 150, 31
N = 16_000_000
T = 512
W = L - K + 1
Q = B * W

rng = np.random.default_rng(0)
keys = np.unique(rng.integers(0, 2**62, int(2.2 * N), dtype=np.uint64))[:N]
vidx = rng.integers(0, T // 2, size=N).astype(np.int64)
t0 = time.time()
ht = build_hash(keys, vidx)
print(f"build_hash: {time.time()-t0:.1f}s nb_bits={ht.nb_bits}", flush=True)
spec = TableSpec(ht.n_slots, ht.nb_bits)
rows = jnp.asarray(ht.rows)

nv = T // 2
vaux = np.zeros((nv + 1, 4), np.int32)
vaux[:nv, 0] = np.arange(nv)
vaux[:nv, 1] = np.arange(nv) + 1
vaux[:nv, 2] = 3
vaux[nv] = (-1, 0, 0, 0)
vaux_d = jnp.asarray(vaux)

# query mix: half real keys, half random
qk = np.concatenate([keys[rng.integers(0, N, Q // 2)],
                     rng.integers(0, 2**62, Q - Q // 2, dtype=np.uint64)])
rng.shuffle(qk)
q_hi = jnp.asarray((qk >> np.uint64(32)).astype(np.uint32).view(np.int32))
q_lo = jnp.asarray((qk & np.uint64(0xFFFFFFFF)).astype(np.uint32).view(np.int32))

codes = rng.integers(0, 4, size=(B, L)).astype(np.uint8)
codes_d = jnp.asarray(codes)
lengths_d = jnp.full((B,), L, jnp.int32)


def timeit(name, fn, *args, iters=5):
    c0 = time.time()
    out = jax.block_until_ready(fn(*args))
    c1 = time.time()
    t0 = time.time()
    for _ in range(iters):
        out = jax.block_until_ready(fn(*args))
    per = (time.time() - t0) / iters
    print(f"{name:42s}: {per*1e3:9.2f} ms   (compile {c1-c0:6.1f}s)",
          flush=True)
    return out


from genestrip_tpu.ops.kmer import window_kmers

# 1. window kmers
timeit("window_kmers [B,L]", jax.jit(lambda c, l: window_kmers(c, l, K)),
       codes_d, lengths_d)

# 2. lookup_join flat 1M
timeit("lookup_join flat Q",
       jax.jit(lambda r, h, l: lookup_join(r, h, l, nb_bits=spec.nb_bits)),
       rows, q_hi, q_lo)

# 3. attach_aux (2 planes)
vidx_q = jnp.asarray(rng.integers(0, nv, Q).astype(np.int32))
timeit("_attach_aux 2 planes",
       jax.jit(lambda v, i: _attach_aux(v, i, 2)), vaux_d, vidx_q)

# 4. unique scatter into seen
seen0 = jnp.zeros(spec.n + 1, jnp.uint8)
upos = jnp.asarray(rng.integers(0, spec.n, Q).astype(np.int32))


@jax.jit
def scat(seen, upos):
    return seen.at[upos].max(jnp.uint8(1))

timeit("seen scatter-max 1M -> n_slots", scat, seen0, upos)

# 5. [B, W] row sorts: 4-key sort (distinct-node), 3-key sort (candidates)
a = jnp.asarray(rng.integers(0, 2**30, (B, W)).astype(np.int32))
b = jnp.asarray(rng.integers(0, 2**30, (B, W)).astype(np.int32))
c = jnp.asarray(rng.integers(0, 2**30, (B, W)).astype(np.int32))
d = jnp.asarray(rng.integers(0, 2**30, (B, W)).astype(np.int32))
timeit("row sort [B,W] 4 arrays num_keys=2",
       jax.jit(lambda a, b, c, d: jax.lax.sort((a, b, c, d), dimension=1,
                                               num_keys=2)), a, b, c, d)
timeit("row sort [B,W] 3 arrays num_keys=2",
       jax.jit(lambda a, b, c: jax.lax.sort((a, b, c), dimension=1,
                                            num_keys=2)), a, b, c)
timeit("row sort [B,W+P] 2 arrays num_keys=1",
       jax.jit(lambda a, b: jax.lax.sort((a, b), dimension=1, num_keys=1)),
       a, b)

# 6. associative row scan + cumsum on [B, W]
timeit("assoc row scan max [B,W]",
       jax.jit(lambda a: jax.lax.associative_scan(jnp.maximum, a, axis=1)), a)
timeit("row cumsum [B,W]", jax.jit(lambda a: jnp.cumsum(a, axis=1)), a)

# 7. full match_step ablations
anc = np.full((T, 10), -1, np.int32)
anc[:, 0] = 0
for i in range(T):
    anc[i, min(i % 9 + 1, 9)] = i
anc_d = jnp.asarray(anc)
from genestrip_tpu.match.pipeline import error_bounds


def run_cfg(name, cfg):
    bounds = jnp.asarray(error_bounds(np.full(B, L, np.int32), K, cfg))
    seen = jnp.zeros(spec.n + 1, jnp.uint8)
    counts = jnp.zeros(1, jnp.int32)

    def f(rows, vaux, anc, codes, lengths, bounds):
        seen_l = jnp.zeros(spec.n + 1, jnp.uint8)
        counts_l = jnp.zeros(1, jnp.int32)
        out = match_step(cfg, spec, T, rows, vaux, anc, codes, lengths,
                         bounds, seen_l, counts_l)
        return out["class_node"], out["kmers"], out["seen"][::4096]

    timeit(name, jax.jit(f), rows, vaux_d, anc_d, codes_d, lengths_d, bounds)


run_cfg("match_step classify=F unique=F",
        MatchConfig(k=K, classify=False, with_unique=False))
run_cfg("match_step classify=F unique=T",
        MatchConfig(k=K, classify=False, with_unique=True))
run_cfg("match_step classify=T unique=F",
        MatchConfig(k=K, classify=True, with_unique=False))
run_cfg("match_step full", MatchConfig(k=K))
print("done", flush=True)
