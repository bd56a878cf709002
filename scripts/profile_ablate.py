"""Ablation timing of the REAL match_step via MatchConfig flags:
  1. with_unique=False, classify=False  -> window+lookup+contig stats
  2. with_unique=True,  classify=False  -> + seen scatter
  3. with_unique=False, classify=True   -> + sorts/candidates/LCA
  4. with_unique=True,  classify=True   -> full
Chained through donated seen/counts state; scalar materialized per call.
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

from genestrip_tpu.match.pipeline import MatchConfig, TableSpec, match_step, build_match_arrays
from genestrip_tpu.store.table import KmerTable
from genestrip_tpu.tax.small import SmallTaxTree

B, L, K = 8192, 150, 31
N = 16_000_000
T = 512

rng = np.random.default_rng(0)
keys = np.sort(np.unique(rng.integers(0, 2**62, 2 * N, dtype=np.uint64))[:N])
vidx = rng.integers(0, T // 2, size=N).astype(np.uint16)
table = KmerTable(K, keys, vidx, [str(i) for i in range(T // 2)])

parent = np.array([-1] + [i // 2 for i in range(1, T)], dtype=np.int32)
tree = SmallTaxTree([str(i) for i in range(T)], [str(i) for i in range(T)],
                    [-1] * T, parent, np.zeros(T, bool))
nov = np.arange(T // 2, dtype=np.int32) + T // 2 - 1
nov = np.clip(nov, 0, T - 1)
tree._node_of_value = {id(table): nov}  # may not match API; fallback below

try:
    raise Exception("skip")
    sa, spec = build_match_arrays(table, tree)
except Exception:
    # fallback: build hash arrays directly
    from genestrip_tpu.store.hash import build_hash
    depth = np.zeros(T, np.int32)
    for i in range(1, T):
        depth[i] = depth[parent[i]] + 1
    sizes = np.ones(T, np.int64)
    for i in range(T - 1, 0, -1):
        sizes[parent[i]] += sizes[i]
    tout = (np.arange(T) + sizes).astype(np.int32)
    ht = build_hash(table.keys, table.value_idx.astype(np.int64))
    nv = T // 2
    vaux = np.zeros((nv + 1, 4), np.int32)
    vaux[:nv, 0] = np.arange(nv) % T
    vaux[:nv, 1] = tout[np.arange(nv) % T]
    vaux[:nv, 2] = depth[np.arange(nv) % T]
    vaux[nv] = (-1, 0, 0, 0)
    sa = {"rows": __import__("jax.numpy", fromlist=["x"]).asarray(ht.rows),
          "vaux": __import__("jax.numpy", fromlist=["x"]).asarray(vaux)}
    spec = TableSpec(ht.n_slots, ht.nb_bits)
    md = int(depth.max()) + 1
    anc = np.full((T, md), -1, np.int32)
    for i in range(T):
        anc[i, depth[i]] = i
        if parent[i] >= 0:
            anc[i, : depth[i]] = anc[parent[i], : depth[i]]
    tree_anc = jnp.asarray(anc)
else:
    tree_anc = jnp.asarray(tree.ancestor_at_depth)

inter, bstart = sa["rows"], sa["vaux"]

genome = rng.integers(0, 4, size=200000).astype(np.uint8)
codes = rng.integers(0, 4, size=(B, L)).astype(np.uint8)
starts = rng.integers(0, 200000 - L, size=B // 2)
for i, s in enumerate(starts):
    codes[i] = genome[s:s + L]
codes_d = jnp.asarray(codes)
lengths_d = jnp.full((B,), L, jnp.int32)


def timed(name, cfg, iters=6):
    def step_chain(n):
        @jax.jit
        def f(inter, bstart, codes, lengths):
            seen = jnp.zeros(spec.n + 1, jnp.uint8)
            counts = jnp.zeros(1, jnp.int32)
            acc = jnp.float32(0)
            c = codes
            for i in range(n):
                out = match_step(cfg, spec, T, inter, bstart, tree_anc,
                                 c, lengths, seen, counts)
                seen = out["seen"]
                counts = out["counts"]
                acc += (jnp.sum(out["kmers"]) + jnp.sum(out["class_node"])
                        + jnp.sum(out["found"])).astype(jnp.float32)
                c = jnp.roll(c, 1, axis=0)
            return acc + jnp.sum(seen[::4096].astype(jnp.int32)).astype(jnp.float32)
        return f

    f1 = step_chain(1)
    fN = step_chain(iters)
    float(np.asarray(f1(inter, bstart, codes_d, lengths_d)))
    float(np.asarray(fN(inter, bstart, codes_d, lengths_d)))
    t0 = time.time(); float(np.asarray(f1(inter, bstart, codes_d, lengths_d))); t1 = time.time()
    float(np.asarray(fN(inter, bstart, codes_d, lengths_d))); t2 = time.time()
    per = ((t2 - t1) - (t1 - t0)) / (iters - 1)
    print(f"{name:40s}: {per*1e3:8.1f} ms/batch  ({B/per/1e3:7.1f} kreads/s)",
          flush=True)


timed("1 base (window+lookup+contig)", MatchConfig(k=K, with_unique=False, classify=False, return_labels=False))
timed("2 + unique scatter", MatchConfig(k=K, with_unique=True, classify=False, return_labels=False))
timed("3 + classify (no unique)", MatchConfig(k=K, with_unique=False, classify=True, return_labels=False))
timed("4 full", MatchConfig(k=K, with_unique=True, classify=True, return_labels=False))
print("done", flush=True)
