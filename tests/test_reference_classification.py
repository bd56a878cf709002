"""Independent multi-taxon classification fixture, transcribed from the
reference's hand-computed matcher tests
(core/src/test/java/org/metagene/genestrip/match/FastqKMerMatcherTest.java).

Unlike tests/golden_matcher.py (the builder's own scalar transcription of
matchRead), the expected values here come straight from the reference test
suite: the concrete read->classification table of testReadClassification
(:316-412) and the per-read stats recomputation of testMatchRead (:131-208).
The taxonomy is the reference's fixture tree (test resources taxtree/
nodes.dmp: 1 is root, 2 and 3 are its children).
"""

import io

import numpy as np
import pytest

from fixtures import write_fastq

from genestrip_tpu.match.matcher import Matcher
from genestrip_tpu.match.pipeline import MatchConfig
from genestrip_tpu.store.table import TableBuilder
from genestrip_tpu.tax.small import SmallTaxTree
from genestrip_tpu.utils.dna import seq_to_codes
from genestrip_tpu.ops.kmer import window_kmers_np

K = 2


def mini_tree():
    # ref test resources taxtree/nodes.dmp: 2 and 3 are children of root 1
    return SmallTaxTree(["1", "2", "3"], ["1", "2", "3"], [-1, -1, -1],
                        [-1, 0, 0], np.ones(3, bool))


def build_table(kmer_to_tax: dict):
    builder = TableBuilder(K)
    for seq, tax in kmer_to_tax.items():
        kmers, valid = window_kmers_np(seq_to_codes(seq.encode()), K)
        builder.add(kmers[valid][:1], tax)
    return builder.build()


def classify(reads, tax_err, tmp_path):
    """Run the device pipeline over the reads; returns list of taxid-or-None."""
    table = build_table({"CC": "1", "CT": "2", "CG": "3"})
    tree = mini_tree()
    tree.init_store_indices(table)
    cfg = MatchConfig(k=K, max_read_tax_error=tax_err)
    m = Matcher(table, tree, cfg, batch_size=8)
    m.progress = False
    kraken = io.BytesIO()
    fastq = write_fastq(tmp_path / "cls.fastq",
                        [(f"r{i}", s.encode()) for i, s in enumerate(reads)])
    m.run([str(fastq)], kraken_out=kraken)
    out = []
    for line in kraken.getvalue().split(b"\n")[:-1]:
        cols = line.split(b"\t")
        out.append(cols[2].decode() if cols[0] == b"C" else None)
    return out


# (read, expected classification) per maxReadTaxErrorCount — transcribed
# verbatim from FastqKMerMatcherTest.testReadClassification:346-411
REFERENCE_CASES = [
    (0.0, [("CCCC", "1"), ("GAGAGA", None), ("CCCG", "3"), ("AGGGG", "2"),
           ("CCCCCCT", "2")]),
    (1.0, [("CTCCT", "2"), ("CTCTCCT", None), ("TAGGGG", "2"),
           ("TAGGGGT", None)]),
    (0.5, [("CCA", "1"), ("CCAA", None)]),
    (0.1, [("CC", "1"), ("CCA", None), ("CCAA", None)]),
    (0.99, [("TTTT", None), ("CTTT", "2")]),
]


@pytest.mark.parametrize("tax_err,cases", REFERENCE_CASES)
def test_read_classification_reference_cases(tax_err, cases, tmp_path):
    got = classify([r for r, _ in cases], tax_err, tmp_path)
    assert got == [want for _, want in cases]


def ref_expected_stats(read: str):
    """The reference test's own per-read recomputation of per-taxid stats
    (FastqKMerMatcherTest.java:131-184), transcribed: DB is CC->tax index 0,
    TT->1, AG->2 (reverse complements GG, AA, CT)."""
    counters = [0, 0, 0]
    contigs = [0, 0, 0]
    max_contig = [0, 0, 0]
    t = -1
    contig_len = 0
    for j in range(1, len(read)):
        last_t = t
        pair = read[j - 1: j + 1]
        if pair in ("CC", "GG"):
            t = 0
        elif pair in ("AA", "TT"):
            t = 1
        elif pair in ("AG", "CT"):
            t = 2
        else:
            t = -1
        if t >= 0:
            counters[t] += 1
        if last_t != t and last_t != -1:
            contigs[last_t] += 1
            max_contig[last_t] = max(max_contig[last_t], contig_len)
            contig_len = 0
        if t != -1:
            contig_len += 1
    if t != -1:
        contigs[t] += 1
        max_contig[t] = max(max_contig[t], contig_len)
    return counters, contigs, max_contig


def test_match_read_stats_reference_recomputation(tmp_path):
    """testMatchRead transcription: random 500bp reads, per-taxid kmers /
    contigs / maxContigLen / unique counts checked against the reference
    test's own scalar recomputation (not the repo's golden model)."""
    rng = np.random.default_rng(42)
    table = build_table({"CC": "1", "TT": "2", "AG": "3"})
    tree = mini_tree()
    tree.init_store_indices(table)

    n_reads, read_len = 200, 500
    reads = ["".join("CGAT"[c] for c in rng.integers(0, 4, read_len))
             for _ in range(n_reads)]

    exp_kmers = np.zeros(3, np.int64)
    exp_contigs = np.zeros(3, np.int64)
    exp_max = np.zeros(3, np.int64)
    for r in reads:
        c, g, mx = ref_expected_stats(r)
        exp_kmers += c
        exp_contigs += g
        exp_max = np.maximum(exp_max, mx)

    fastq = write_fastq(tmp_path / "t.fastq",
                        [(f"r{i}", r.encode()) for i, r in enumerate(reads)])
    cfg = MatchConfig(k=K)
    m = Matcher(table, tree, cfg, batch_size=64)
    m.progress = False
    m.run([str(fastq)])

    # tree node order: 1, 2, 3 = DB taxid order here
    np.testing.assert_array_equal(m.kmers, exp_kmers)
    np.testing.assert_array_equal(m.contigs, exp_contigs)
    np.testing.assert_array_equal(m.max_contig, exp_max)
    # each taxid holds exactly ONE distinct k-mer (ref :203-204)
    uniq = m._unique_per_node()
    np.testing.assert_array_equal(uniq, np.where(exp_kmers > 0, 1, 0))
