"""Multi-host execution (parallel/distributed.py): file-level data
parallelism with an aggregation-time merge. Two simulated processes, each
matching an interleaved shard of the resources, must merge to EXACTLY the
state of a single run over all resources (SURVEY.md §5.8; the reference is
single-JVM — ref ExecutionContext.java:31-55 — so the single-host run is the
semantic anchor)."""

import numpy as np
import pytest

from fixtures import write_mini_taxonomy, write_fastq
from test_match_parity import build_world, make_reads, K

from genestrip_tpu.match.pipeline import MatchConfig
from genestrip_tpu.match.matcher import Matcher
from genestrip_tpu.parallel import distributed as dist


def _fake_allgather(locals_):
    """Builds an allgather over pre-collected per-process local trees."""
    import jax
    def allgather(_tree_unused):
        # stack leaves across the simulated processes
        return jax.tree_util.tree_map(
            lambda *leaves: np.stack([np.asarray(l) for l in leaves]), *locals_)
    return allgather


def _capture_local(m):
    """Collects the matcher's local tree exactly as _merge_across_processes
    builds it (by calling it with an identity allgather and snapshotting)."""
    captured = {}

    def identity_allgather(tree):
        captured["t"] = tree
        import jax
        return jax.tree_util.tree_map(lambda a: np.asarray(a)[None], tree)

    m._merge_across_processes(identity_allgather)
    return captured["t"]


def test_two_process_merge_equals_single_run(tmp_path):
    rng = np.random.default_rng(31337)
    table, small, genomes = build_world(tmp_path, rng)
    files = []
    for i in range(4):
        reads = make_reads(rng, genomes, n_reads=120)
        files.append(str(write_fastq(tmp_path / f"shard{i}.fastq", reads)))

    cfg = MatchConfig(k=K)

    def run(resource_indices):
        m = Matcher(table, small, cfg, db_md5="f00", batch_size=64,
                    max_kmer_res_counts=3)
        m.cfg = MatchConfig(k=K, with_counts=True)
        m.reset()
        # emulate the per-process interleaved shard by only feeding the
        # chosen resources, with _res_idx tracking their global index
        for idx in resource_indices:
            from genestrip_tpu.io.streams import StreamingResource
            m._res_idx = idx
            res = StreamingResource(files[idx])
            fasta = res.type_hint == "fasta"
            from genestrip_tpu.io.reads import BatchPacker, parse_reads
            packer = BatchPacker(m.batch_size, with_probs=m.with_probs,
                                 long_threshold=m.long_read_threshold)
            with res.open() as stream:
                pending = None
                for batch in parse_reads(stream, packer, fasta):
                    out = m._dispatch_batch(batch, False)
                    if pending is not None:
                        m._finalize_batch(*pending, None, None)
                    pending = (batch, out)
                if pending is not None:
                    m._finalize_batch(*pending, None, None)
        return m

    single = run([0, 1, 2, 3])
    p0 = run([0, 2])
    p1 = run([1, 3])

    locals_ = [_capture_local(p0), _capture_local(p1)]
    merged = Matcher(table, small, MatchConfig(k=K, with_counts=True),
                     db_md5="f00", batch_size=64, max_kmer_res_counts=3)
    merged.reset()
    merged._merge_across_processes(_fake_allgather(locals_))

    # integer statistics are BIT-identical to the single run; float error
    # accumulators are deterministic per-process partial sums, allowed to
    # differ from read-order addition in the last ulps (the documented
    # contract, parallel/distributed.py)
    for f in Matcher._SUM_FIELDS:
        a, b = getattr(merged, f), getattr(single, f)
        if np.asarray(b).dtype.kind == "f":
            np.testing.assert_allclose(a, b, rtol=1e-12, atol=1e-12,
                                       err_msg=f)
        else:
            np.testing.assert_array_equal(a, b, err_msg=f)
    assert (merged.total_reads, merged.total_kmers, merged.total_bps) == \
        (single.total_reads, single.total_kmers, single.total_bps)
    np.testing.assert_array_equal(merged.max_contig, single.max_contig)
    assert merged.max_contig_desc == [bytes(d) for d in single.max_contig_desc]
    # unique counter state merges exactly
    from genestrip_tpu.parallel import mesh as mesh_mod
    np.testing.assert_array_equal(
        np.asarray(merged._seen), mesh_mod.merge_seen(single._seen))
    np.testing.assert_array_equal(
        np.asarray(merged._counts).astype(np.int64),
        mesh_mod.merge_counts(single._counts))
    np.testing.assert_array_equal(merged._unique_per_node(),
                                  single._unique_per_node())


def test_process_sharding_skips_other_hosts(tmp_path, monkeypatch):
    """Matcher.run with a simulated 2-process environment only consumes this
    process's interleaved files."""
    rng = np.random.default_rng(7)
    table, small, genomes = build_world(tmp_path, rng)
    files = []
    for i in range(3):
        reads = make_reads(rng, genomes, n_reads=40)
        files.append(str(write_fastq(tmp_path / f"f{i}.fastq", reads)))
    monkeypatch.setattr(dist, "process_count", lambda: 2)
    monkeypatch.setattr(dist, "process_index", lambda: 1)
    # keep _build_result from trying a real allgather: capture the call
    called = {}
    monkeypatch.setattr(
        Matcher, "_merge_across_processes",
        lambda self, allgather=None: called.setdefault("merged", True))
    m = Matcher(table, small, MatchConfig(k=K), db_md5="x", batch_size=64)
    m.run(files)
    # process 1 of 2 sees only file index 1 -> 40 reads
    assert m.total_reads == 40
    assert called.get("merged")


def test_maybe_initialize_noop(monkeypatch):
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("GENESTRIP_COORDINATOR", raising=False)
    monkeypatch.delenv("GENESTRIP_MULTIHOST", raising=False)
    dist.maybe_initialize()          # must not raise or initialize anything
    assert dist.process_count() == 1
