"""Reproduce the bench.py device-pipeline loop pattern to isolate why the
bench measures ~0.76 s/step while jitted match_step ablations run at 0.13 ms.
Variants:
  A. bench-identical: match_step directly (module-level jit, donated seen),
     python loop chaining seen/counts, block at end.
  B. same but block_until_ready every step.
  C. same as A but seen NOT chained (fresh zeros device array each step,
     no donation effect).
  D. outer-jit wrapper chaining 8 steps inside one jit.
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

from genestrip_tpu.match.pipeline import (
    MatchConfig, TableSpec, match_step, error_bounds)
from genestrip_tpu.store.hash import build_hash

B, L, K = 8192, 192, 31          # L=192 = bench _bucket_len(150)
READ = 150
N = 16_000_000
T = 512
W = L - K + 1

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
anc = np.full((T, 10), -1, np.int32)
anc[:, 0] = 0
for i in range(T):
    anc[i, min(i % 9 + 1, 9)] = i
anc_d = jnp.asarray(anc)

cfg = MatchConfig(k=K, return_labels=False)
n_steps = 8
staged = np.full((n_steps, B, L), 255, np.uint8)
staged[:, :, :READ] = rng.integers(0, 4, size=(n_steps, B, READ))
staged_d = jnp.asarray(staged)
lengths = jnp.full((B,), READ, jnp.int32)
bounds = jnp.asarray(error_bounds(np.full(B, READ, np.int32), K, cfg))


def loop(block_each=False, chain=True):
    seen = jnp.zeros(spec.n + 1, jnp.uint8)
    counts = jnp.zeros(1, jnp.int32)
    outs = None
    t0 = time.time()
    for i in range(n_steps):
        out = match_step(cfg, spec, T, rows, vaux_d, anc_d,
                         staged_d[i], lengths, bounds, seen, counts)
        if chain:
            seen, counts = out["seen"], out["counts"]
        else:
            seen = jnp.zeros(spec.n + 1, jnp.uint8)
            counts = jnp.zeros(1, jnp.int32)
        if block_each:
            jax.block_until_ready(out["class_node"])
        outs = out
    jax.block_until_ready(outs["class_node"])
    jax.block_until_ready(seen)
    return (time.time() - t0) / n_steps


# warmup/compile
per0 = loop()
print(f"A bench-identical (warm incl compile): {per0*1e3:9.1f} ms/step", flush=True)
for name, kw in [("A bench-identical", dict()),
                 ("B block each step", dict(block_each=True)),
                 ("C unchained state", dict(chain=False)),
                 ("A again", dict())]:
    per = loop(**kw)
    print(f"{name:38s}: {per*1e3:9.1f} ms/step ({B/per/1e3:8.1f} kreads/s)",
          flush=True)
print("done", flush=True)
