"""Chunked LCA update equivalence: the bulk DBUpdater (db/build.py) must
produce the same final table as sequential per-region application, for any
chunk size — including k-mers updated by several distinct nodes within one
chunk (the fold path) and across chunk boundaries. The LCA merge is
commutative/associative (ref FastaReaderGoal.java:104-109), which is the
property under test here."""

import numpy as np
import pytest

from fixtures import write_mini_taxonomy

from genestrip_tpu.db.build import BuildOptions, DBUpdater, extract_region_kmers
from genestrip_tpu.store.table import TableBuilder
from genestrip_tpu.tax.tree import TaxTree

K = 31


@pytest.fixture()
def tree(tmp_path):
    write_mini_taxonomy(tmp_path / "tax")
    return TaxTree(tmp_path / "tax")


def _mk_table(genomes_by_taxid):
    builder = TableBuilder(K)
    opts = BuildOptions(k=K)
    for taxid, g in genomes_by_taxid:
        builder.add(extract_region_kmers(g, opts), taxid)
    return builder.build()


def _sequential_expect(tree, table, regions):
    """Golden model: per-region LCA rewrite, one region at a time."""
    taxid_of = {}
    for i, km in enumerate(table.keys.tolist()):
        taxid_of[km] = table.values[table.value_idx[i]]
    opts = BuildOptions(k=K)
    for taxid, seq in regions:
        node = tree.get(taxid)
        for km in extract_region_kmers(seq, opts).tolist():
            if km in taxid_of:
                old = tree.get(taxid_of[km])
                lca = tree.lca(old, node)
                if lca is not None:
                    taxid_of[km] = lca.tax_id
    return taxid_of


@pytest.mark.parametrize("chunk_kmers", [1, 100, 10_000, 1 << 24])
def test_chunked_update_equals_sequential(tree, chunk_kmers):
    rng = np.random.default_rng(5)
    g1 = bytes(rng.choice(list(b"CGAT"), size=300).astype(np.uint8))
    g2 = bytes(rng.choice(list(b"CGAT"), size=250).astype(np.uint8))
    table = _mk_table([("11053", g1), ("11060", g2)])

    # update regions: g1 under three different nodes (11060 -> LCA 12637,
    # then 9606 -> LCA root), slices of g2 under 11069, plus a non-matching
    # random region — exercising single-node and multi-node-per-kmer paths
    regions = [
        ("11060", g1),
        ("9606", g1[:150]),
        ("11069", g2[50:200]),
        ("139", bytes(rng.choice(list(b"CGAT"), size=200).astype(np.uint8))),
    ]
    expect = _sequential_expect(tree, table, regions)

    updater = DBUpdater(tree, table, set(), None, BuildOptions(k=K),
                        chunk_kmers=chunk_kmers)
    for taxid, seq in regions:
        updater._region(b"X", seq, None, tree.get(taxid))
    updater.finalize()

    got = {km: table.values[table.value_idx[i]]
           for i, km in enumerate(table.keys.tolist())}
    assert got == expect
    assert updater.kmers_moved > 0


def test_single_chunk_multi_node_fold(tree):
    """All regions in ONE chunk: a k-mer touched by two distinct nodes must
    fold LCA(LCA(old, a), b), not last-write-wins."""
    rng = np.random.default_rng(6)
    g = bytes(rng.choice(list(b"CGAT"), size=120).astype(np.uint8))
    table = _mk_table([("11053", g)])

    updater = DBUpdater(tree, table, set(), None, BuildOptions(k=K),
                        chunk_kmers=1 << 24)
    updater._region(b"X", g, None, tree.get("11060"))   # LCA -> 12637
    updater._region(b"X", g, None, tree.get("9606"))    # LCA -> 1 (root)
    updater.finalize()
    taxids = {table.values[v] for v in table.value_idx.tolist()}
    assert taxids == {"1"}
