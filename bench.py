"""Benchmark: read-classification throughput (reads/sec/chip) on the real
device, over a synthetic database + read mix shaped like the reference's
human_virus micro-benchmark (small curated DB, 150 bp reads, ~half of the
reads classifiable).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "reads/s/chip", "vs_baseline": N}

vs_baseline: the reference publishes no benchmark numbers (BASELINE.md) and
cannot be run here (no JVM). The baseline constant below is a deliberately
generous estimate of the reference's multithreaded CPU throughput on a
modern desktop for small DBs (its hot loop is a per-k-mer binary search):
250k reads/s. vs_baseline = measured / BASELINE_READS_PER_SEC.
"""

import argparse
import json
import time

import numpy as np


BASELINE_READS_PER_SEC = 250_000.0


def build_world(n_genome_bp: int, n_taxa: int, seed: int = 7, k: int = 31):
    from genestrip_tpu.ops.kmer import window_kmers_np, split_u64
    from genestrip_tpu.store.table import TableBuilder

    rng = np.random.default_rng(seed)
    genome = rng.integers(0, 4, size=n_genome_bp, dtype=np.int64).astype(np.uint8)
    kmers, valid = window_kmers_np(genome, k)
    kmers = kmers[valid]
    builder = TableBuilder(k)
    # split the genome's k-mers across taxa in contiguous blocks
    bounds = np.linspace(0, len(kmers), n_taxa + 1).astype(np.int64)
    for t in range(n_taxa):
        builder.add(kmers[bounds[t]:bounds[t + 1]], str(1000 + t))
    table = builder.build()

    # simple binary-ish taxonomy over the taxa + root chain
    n_nodes = n_taxa + n_taxa // 4 + 1
    parent = np.full(n_nodes, -1, np.int32)
    for i in range(1, n_taxa // 4 + 1):
        parent[i] = (i - 1) // 2
    for t in range(n_taxa):
        parent[n_taxa // 4 + 1 + t] = 1 + (t % (n_taxa // 4))
    depth = np.zeros(n_nodes, np.int32)
    for i in range(1, n_nodes):
        depth[i] = depth[parent[i]] + 1
    order = np.argsort(depth, kind="stable")  # ensure parents precede children
    # renumber to pre-order-ish (parents before children suffices here)
    ren = np.empty(n_nodes, np.int64)
    ren[order] = np.arange(n_nodes)
    parent2 = np.full(n_nodes, -1, np.int32)
    for i in range(n_nodes):
        if parent[i] >= 0:
            parent2[ren[i]] = ren[parent[i]]
    from genestrip_tpu.tax.small import SmallTaxTree
    taxids = [str(2000 + i) for i in range(n_nodes)]
    # place the table's taxa at the leaf positions
    tree = SmallTaxTree(taxids, taxids, [-1] * n_nodes, parent2,
                        np.zeros(n_nodes, bool))
    node_of_value = np.array(
        [int(ren[n_taxa // 4 + 1 + t]) for t in range(n_taxa)], np.int32)
    nov = np.full(table.n_values, -1, np.int32)
    nov[: len(node_of_value)] = node_of_value
    return table, tree, nov, genome


def make_reads(genome: np.ndarray, n_reads: int, read_len: int, hit_frac: float,
               seed: int = 3):
    rng = np.random.default_rng(seed)
    n_hit = int(n_reads * hit_frac)
    starts = rng.integers(0, len(genome) - read_len, size=n_hit)
    idx = starts[:, None] + np.arange(read_len)[None, :]
    hit_reads = genome[idx]
    rand_reads = rng.integers(0, 4, size=(n_reads - n_hit, read_len),
                              dtype=np.int64).astype(np.uint8)
    codes = np.concatenate([hit_reads, rand_reads])
    rng.shuffle(codes, axis=0)
    return codes


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--db-bp", type=int, default=16_000_000)
    ap.add_argument("--taxa", type=int, default=256)
    ap.add_argument("--reads", type=int, default=512 * 1024)
    ap.add_argument("--read-len", type=int, default=150)
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--hit-frac", type=float, default=0.5)
    ap.add_argument("--verbose", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from genestrip_tpu.match.pipeline import MatchConfig, TableSpec, match_step

    t0 = time.time()
    table, tree, nov, genome = build_world(args.db_bp, args.taxa)
    codes_all = make_reads(genome, args.reads, args.read_len, args.hit_frac)
    t_build = time.time() - t0

    k = table.k
    node_plane = nov[table.value_idx.astype(np.int64)].astype(np.int32)
    safe = np.maximum(node_plane, 0)
    nv = table.n_values
    vaux = np.zeros((nv + 1, 4), np.int32)
    vaux[:nv, 0] = nov[:nv]
    vaux[:nv, 1] = np.where(nov[:nv] >= 0, tree.tout[np.maximum(nov[:nv], 0)], 0)
    vaux[:nv, 2] = np.where(nov[:nv] >= 0, tree.depth[np.maximum(nov[:nv], 0)], 0)
    vaux[nv] = (-1, 0, 0, 0)
    from genestrip_tpu.store.hash import build_hash
    ht = build_hash(table.keys, table.value_idx.astype(np.int64))
    spec = TableSpec(ht.n_slots, ht.nb_bits)
    rows = jnp.asarray(ht.rows)
    vaux_d = jnp.asarray(vaux)
    anc = jnp.asarray(tree.ancestor_at_depth)
    n_nodes = len(tree)
    cfg = MatchConfig(k=k, return_labels=False)
    B = args.batch
    lengths = jnp.full((B,), args.read_len, jnp.int32)

    n_batches = args.reads // B
    stacked = jnp.asarray(codes_all[: n_batches * B].reshape(n_batches, B, -1))

    # The measured loop runs as ONE jitted lax.scan over the staged batches:
    # per-call dispatch is amortized exactly as a production input pipeline
    # (double-buffered host feed) would hide it. seen/counts carry through the
    # scan, so steps are truly sequential on the device.
    def make_run(n):
        @jax.jit
        def run(rows, vaux_d, anc, batches):
            seen = jnp.zeros(spec.n + 1, jnp.uint8)
            counts = jnp.zeros(1, jnp.int32)

            def body(carry, codes):
                seen, counts = carry
                out = match_step(cfg, spec, n_nodes, rows, vaux_d, anc,
                                 codes, lengths, seen, counts)
                per = (jnp.sum((out["class_node"] >= 0).astype(jnp.int32)),
                       jnp.sum(out["kmers"]))
                return (out["seen"], out["counts"]), per

            (seen, counts), per = jax.lax.scan(body, (seen, counts),
                                               batches[:n])
            return per[0], jnp.sum(seen[::4096].astype(jnp.int32))

        return run

    run = make_run(n_batches)
    t0 = time.time()
    cls, _s = run(rows, vaux_d, anc, stacked)
    cls = np.asarray(cls)
    t_compile = time.time() - t0
    t0 = time.time()
    clsN, _s = run(rows, vaux_d, anc, stacked)
    clsN = np.asarray(clsN)
    dt = time.time() - t0
    n_done = n_batches * B
    rps = n_done / dt
    cls = int(clsN[-1])

    if args.verbose:
        print(f"# build={t_build:.1f}s compile={t_compile:.1f}s "
              f"measured {n_done} reads in {dt:.2f}s; "
              f"last-batch classified={cls}/{B}; table={table.entries} kmers; "
              f"device={jax.devices()[0]}")
    print(json.dumps({
        "metric": "classification throughput (k=31, 150bp reads, 16M-kmer DB, device pipeline)",
        "value": round(rps, 1),
        "unit": "reads/s/chip",
        "vs_baseline": round(rps / BASELINE_READS_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
