"""Run bench.py's exact world + device loop at reduced batch count, timing
each step, to see whether real (hit-bearing) data reproduces the 0.76 s/step
bench measurement that random-miss data does not."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

import importlib.util
spec_ = importlib.util.spec_from_file_location(
    "benchmod", os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "bench.py"))
bench = importlib.util.module_from_spec(spec_)
spec_.loader.exec_module(bench)

from genestrip_tpu.io.reads import _bucket_len
from genestrip_tpu.match.pipeline import (
    MatchConfig, build_match_arrays, match_step, error_bounds)

t0 = time.time()
table, tree, nov, genome = bench.build_world(16_000_000, 256)
tree.node_of_value = lambda tb: nov
codes_all = bench.make_reads(genome, 64 * 1024, 150, 0.5)
print(f"world: {time.time()-t0:.1f}s", flush=True)

k = table.k
sa, spec = build_match_arrays(table, tree)
rows, vaux = sa["rows"], sa["vaux"]
anc = jnp.asarray(tree.ancestor_at_depth)
n_nodes = len(tree)
cfg = MatchConfig(k=k, return_labels=False)
B = 8192
L = _bucket_len(150)
n_batches = 8
staged = np.full((n_batches, B, L), 255, np.uint8)
staged[:, :, :150] = codes_all[: n_batches * B].reshape(n_batches, B, 150)
lengths = jnp.full((B,), 150, jnp.int32)
bounds = jnp.asarray(error_bounds(np.full(B, 150, np.int32), k, cfg))
staged_d = jnp.asarray(staged)
seen = jnp.zeros(spec.n + 1, jnp.uint8)
counts = jnp.zeros(1, jnp.int32)

t0 = time.time()
out = match_step(cfg, spec, n_nodes, rows, vaux, anc,
                 staged_d[0], lengths, bounds, seen, counts)
seen, counts = out["seen"], out["counts"]
jax.block_until_ready(out["class_node"])
print(f"compile+first step: {time.time()-t0:.1f}s "
      f"(anc depth {anc.shape[1]}, T={n_nodes})", flush=True)

for rep in range(3):
    t0 = time.time()
    for i in range(n_batches):
        ts = time.time()
        out = match_step(cfg, spec, n_nodes, rows, vaux, anc,
                         staged_d[i], lengths, bounds, seen, counts)
        seen, counts = out["seen"], out["counts"]
        jax.block_until_ready(out["class_node"])
        if rep == 0:
            print(f"  step {i}: {(time.time()-ts)*1e3:8.1f} ms", flush=True)
    dt = time.time() - t0
    print(f"rep {rep}: {dt/n_batches*1e3:8.1f} ms/step "
          f"({B*n_batches/dt/1e3:8.1f} kreads/s)", flush=True)
cls = int(jnp.sum((out["class_node"] >= 0).astype(jnp.int32)))
print(f"classified(last)={cls}/{B}", flush=True)
