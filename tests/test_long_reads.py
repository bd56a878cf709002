"""Long-read (matchlr) chunk path: a ~1 Mbp read matched through the
fixed-window chunk pipeline must produce EXACTLY the stats, kraken output and
filtered fastq of the unchunked whole-read path, and both must agree with the
golden scalar matcher (SURVEY.md §5.7; ref Goals.md:15 matchlr,
FastqKMerMatcher.java:390-420 contig merging across the whole read)."""

import io

import numpy as np

from fixtures import write_mini_taxonomy, write_fastq
from golden_matcher import GoldenMatcher

from genestrip_tpu.ops.kmer import window_kmers_np
from genestrip_tpu.store.table import TableBuilder
from genestrip_tpu.tax.tree import TaxTree
from genestrip_tpu.tax.small import SmallTaxTree
from genestrip_tpu.utils.dna import seq_to_codes
from genestrip_tpu.match.pipeline import MatchConfig
from genestrip_tpu.match.matcher import Matcher

K = 11


def _world(tmp_path, rng):
    tree = TaxTree(write_mini_taxonomy(tmp_path / "tax"))
    genomes = {}
    builder = TableBuilder(K)
    for tid in ["11053", "11060", "9606"]:
        g = rng.choice(list(b"CGAT"), size=4000).astype(np.uint8).tobytes()
        genomes[tid] = g
        kmers, valid = window_kmers_np(seq_to_codes(g), K)
        builder.add(kmers[valid], tid)
        tree.get(tid).mark_required()
        tree.get(tid).requested = True
    table = builder.build()
    small = SmallTaxTree.from_tax_tree(tree)
    small.init_store_indices(table)
    return table, small, genomes


def _long_read(rng, genomes, n_bp):
    """Chimeric long read: genome slices + random + bad-base stretches, so
    labels change across (and exactly at) chunk boundaries."""
    parts = []
    total = 0
    gs = list(genomes.values())
    while total < n_bp:
        kind = rng.integers(0, 4)
        ln = int(rng.integers(200, 3000))
        if kind == 0:
            seq = rng.choice(list(b"CGAT"), size=ln).astype(np.uint8).tobytes()
        elif kind == 3:
            seq = b"N" * int(rng.integers(1, 30))
        else:
            g = gs[rng.integers(0, len(gs))]
            s = int(rng.integers(0, max(len(g) - ln, 1)))
            seq = g[s:s + ln]
        parts.append(seq)
        total += len(seq)
    return b"".join(parts)[:n_bp]


def _run(table, small, reads, tmp_path, name, long_threshold, chunk_windows):
    fastq = write_fastq(tmp_path / f"{name}.fastq", reads)
    cfg = MatchConfig(k=K, classify=False)     # matchlr semantics
    m = Matcher(table, small, cfg, db_md5="f00", batch_size=8)
    m.long_read_threshold = long_threshold
    m.long_chunk_windows = chunk_windows
    kraken = io.BytesIO()
    filtered = io.BytesIO()
    m.run([str(fastq)], filtered_out=filtered, kraken_out=kraken)
    return m, kraken.getvalue(), filtered.getvalue()


def test_chunked_equals_unchunked_1mbp(tmp_path):
    rng = np.random.default_rng(4242)
    table, small, genomes = _world(tmp_path, rng)
    long_seq = _long_read(rng, genomes, 1_000_000)
    reads = [("short1 x", list(genomes.values())[0][100:250]),
             ("long1 y", long_seq),
             ("short2", rng.choice(list(b"CGAT"), size=120).astype(np.uint8).tobytes())]
    reads = [(d, bytes(s)) for d, s in reads]

    # chunked: the 1 Mbp read goes through the fixed-window chunk path
    mc, kc, fc = _run(table, small, reads, tmp_path, "chunked",
                      long_threshold=10_000, chunk_windows=8192)
    assert mc.total_reads == 3

    # unchunked: threshold above the read length forces the plain batch path
    mu, ku, fu = _run(table, small, reads, tmp_path, "unchunked",
                      long_threshold=2_000_000, chunk_windows=8192)

    np.testing.assert_array_equal(mc.kmers, mu.kmers)
    np.testing.assert_array_equal(mc.contigs, mu.contigs)
    np.testing.assert_array_equal(mc.contig_sq, mu.contig_sq)
    np.testing.assert_array_equal(mc.max_contig, mu.max_contig)
    assert mc.max_contig_desc == mu.max_contig_desc
    np.testing.assert_array_equal(mc.reads1, mu.reads1)
    np.testing.assert_array_equal(
        np.asarray(mc._unique_per_node()), np.asarray(mu._unique_per_node()))
    assert (mc.total_reads, mc.total_kmers, mc.total_bps) == \
        (mu.total_reads, mu.total_kmers, mu.total_bps)
    assert kc == ku
    assert fc == fu

    # and both agree with the golden scalar matcher
    golden = GoldenMatcher(table, small, K, classify=False)
    for _, seq in reads:
        golden.match_read(seq_to_codes(seq))
    T = len(small)
    g = golden.stats
    np.testing.assert_array_equal(mc.kmers, [g[t].kmers for t in range(T)])
    np.testing.assert_array_equal(mc.contigs, [g[t].contigs for t in range(T)])
    np.testing.assert_array_equal(mc.contig_sq, [g[t].contig_sq for t in range(T)])
    np.testing.assert_array_equal(mc.max_contig, [g[t].max_contig for t in range(T)])
    np.testing.assert_array_equal(mc.reads1, [g[t].reads1_kmer for t in range(T)])
    np.testing.assert_array_equal(
        np.asarray(mc._unique_per_node()), golden.unique_per_node())


def test_long_read_with_classification_unclamped(tmp_path):
    """Regression (round-4 advisor, medium): a classification-enabled long
    read takes the singleton-batch path with the wide per-read packing; its
    read_kmers / tax_err must NOT saturate at 2^15-1 (the old [B, 2] layout
    clamped both). A ~40 kbp read of pure genome content yields read_kmers
    ~ 40k > 32767."""
    rng = np.random.default_rng(777)
    table, small, genomes = _world(tmp_path, rng)
    g0 = list(genomes.values())[0]
    long_seq = (g0 * 11)[:40_000]
    reads = [("huge z", long_seq)]
    fastq = write_fastq(tmp_path / "huge.fastq", reads)

    cfg = MatchConfig(k=K, classify=True)
    m = Matcher(table, small, cfg, db_md5="f00", batch_size=8)
    m.long_read_threshold = 10_000         # read is long -> singleton batch
    res = m.run([str(fastq)])

    golden = GoldenMatcher(table, small, K, classify=True)
    golden.match_read(seq_to_codes(long_seq))
    T = len(small)
    g = golden.stats
    want_rk = [g[t].reads_kmers for t in range(T)]
    assert max(want_rk) > 32767            # the clamp would bite here
    np.testing.assert_array_equal(m.reads_kmers, want_rk)
    np.testing.assert_array_equal(m.reads, [g[t].reads for t in range(T)])
    np.testing.assert_array_equal(m.kmers, [g[t].kmers for t in range(T)])
    np.testing.assert_allclose(
        m.class_error_sum, [g[t].class_error_sum for t in range(T)],
        rtol=0, atol=1e-12)


def test_odd_chunk_boundary_sizes(tmp_path):
    """Chunk window counts that don't divide the read length, reads barely
    over the threshold, and a run spanning a chunk boundary."""
    rng = np.random.default_rng(99)
    table, small, genomes = _world(tmp_path, rng)
    g0 = list(genomes.values())[0]
    # read slightly above threshold whose single genome run spans boundaries
    seq = (g0 + g0 + g0)[: 2_100]
    reads = [("edge a", seq)]
    mc, kc, _ = _run(table, small, reads, tmp_path, "edge_c",
                     long_threshold=2_000, chunk_windows=500)
    mu, ku, _ = _run(table, small, reads, tmp_path, "edge_u",
                     long_threshold=100_000, chunk_windows=500)
    np.testing.assert_array_equal(mc.kmers, mu.kmers)
    np.testing.assert_array_equal(mc.contigs, mu.contigs)
    np.testing.assert_array_equal(mc.max_contig, mu.max_contig)
    assert kc == ku
