"""Multi-chip data-parallel matching over a device mesh.

Replaces the reference's single-JVM producer/consumer thread fan-out
(ref: fastq/AbstractFastqReader.java:88-185, ExecutionContext) with SPMD
over a jax.sharding.Mesh: read batches are sharded over the batch dimension
("reads" axis), the k-mer table and taxonomy arrays are replicated in every
chip's HBM (Genestrip databases are small by design, ref README.md:39), and
per-tax-id statistic vectors are merged with psum over ICI. The unique-k-mer
seen/count vectors are per-shard and OR/sum-merged on aggregation
(SURVEY.md §5.8).

For databases exceeding HBM, the planned alternative is range-sharding the
sorted table over devices with lookups routed by k-mer prefix (the radix
bits as shard key) — not yet implemented.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from genestrip_tpu.match.pipeline import MatchConfig, TableSpec, match_step

# outputs that are per-node vectors and must be summed across shards
_PSUM_OUTS = ("contigs", "kmers", "contig_sq", "reads1")
# outputs that stay sharded along the read axis
_SHARDED_OUTS = ("found", "n_win", "class_node", "read_kmers", "tax_err",
                 "stats_ok", "label")


def make_sharded_match_step(mesh: Mesh, cfg: MatchConfig, spec: TableSpec,
                            n_nodes: int, axis: str = "reads"):
    """A pjit-ed data-parallel match step over the given mesh.

    Returns fn(inter, bucket_start, anc, codes, lengths, seen, counts) ->
    outputs dict, where codes/lengths/seen/counts are sharded over `axis`
    (seen/counts being per-shard partial states with a leading device axis)
    and the table/tree arrays are replicated.
    """

    def local_step(inter, bucket_start, anc, codes, lengths, seen, counts):
        out = match_step(cfg, spec, n_nodes, inter, bucket_start, anc,
                         codes, lengths, seen[0], counts[0])
        res = {}
        for k_, v in out.items():
            if k_ in _PSUM_OUTS:
                res[k_] = jax.lax.psum(v, axis)
            elif k_ == "max_contig":
                res[k_] = jax.lax.pmax(v, axis)
            elif k_ == "argmax_enc":
                # min encoded (read, window) among shards that achieve the
                # global max; shards below the global max are masked out
                gmax = jax.lax.pmax(out["max_contig"], axis)
                enc = jnp.where(out["max_contig"] == gmax, v,
                                jnp.iinfo(jnp.int32).max)
                res[k_] = jax.lax.pmin(enc, axis)
            elif k_ in ("seen", "counts"):
                res[k_] = v[None]       # keep per-shard (position-space state)
            else:
                res[k_] = v
        return res

    n_dev = mesh.shape[axis]
    repl = P()
    in_specs = (repl, repl, repl,                     # table + tree arrays
                P(axis), P(axis),                     # codes, lengths
                P(axis), P(axis))                     # seen, counts (stacked)
    out_specs = {}
    # build out_specs lazily by running shapes through: simpler to declare
    # every per-node/psum output replicated and read-axis outputs sharded.
    def spec_for(name):
        if name in _SHARDED_OUTS:
            return P(axis)
        if name in ("seen", "counts"):
            return P(axis)
        return repl

    # determine output keys from cfg
    keys = ["found", "n_win", "contigs", "kmers", "contig_sq", "max_contig",
            "argmax_enc", "reads1", "seen", "counts",
            "class_node", "read_kmers", "tax_err", "stats_ok"]
    if cfg.return_labels:
        keys.append("label")
    out_specs = {k_: spec_for(k_) for k_ in keys}

    fn = shard_map(local_step, mesh=mesh, in_specs=in_specs,
                   out_specs=out_specs, check_rep=False)
    return jax.jit(fn, donate_argnums=(5, 6))


def replicate_unique_state(n_table: int, n_devices: int):
    """Per-shard unique-counter state with a leading device axis."""
    seen = jnp.zeros((n_devices, n_table + 1), jnp.uint8)
    counts = jnp.zeros((n_devices, 1), jnp.int32)
    return seen, counts


def merge_unique(seen_stacked: np.ndarray) -> np.ndarray:
    """OR-merge the per-shard seen vectors (host side)."""
    return np.asarray(seen_stacked).max(axis=0)
