"""Genbank assembly-summary parsing and selection tests.

Semantics mirrored from the reference's genbank/AssemblySummaryReader.java and
goals/genbank/{TaxNodesFromGenbankGoal,FastaFilesFromGenbankGoal}.java.
"""

import numpy as np
import pytest

from genestrip_tpu.db import genbank as gb
from genestrip_tpu.tax.tree import TaxTree
from tests.fixtures import write_mini_taxonomy


def _summary_row(taxid, species, level="Complete Genome", status="latest",
                 refgen="na", acc="GCA_000001.1", name="asm1"):
    cols = [""] * 23
    cols[0] = acc
    cols[4] = refgen
    cols[5] = taxid
    cols[6] = species
    cols[10] = status
    cols[11] = level
    cols[19] = f"https://ftp.ncbi.nlm.nih.gov/genomes/all/{acc}_{name}"
    return "\t".join(cols)


@pytest.fixture
def tree(tmp_path):
    write_mini_taxonomy(tmp_path)
    return TaxTree(tmp_path)


def _write_summary(tmp_path, rows):
    f = tmp_path / gb.ASSEMBLY_SUM_GENBANK
    f.write_text("#comment line\n# another\n" + "\n".join(rows) + "\n")
    return f


def test_quality_lattice():
    q = gb.AssemblyQuality.from_strings
    assert q("Complete Genome", "latest") == gb.AssemblyQuality.COMPLETE_LATEST
    assert q("Complete Genome", "replaced") == gb.AssemblyQuality.COMPLETE
    assert q("Chromosome", "latest") == gb.AssemblyQuality.CHROMOSOME_LATEST
    assert q("Scaffold", "x") == gb.AssemblyQuality.SCAFFOLD
    assert q("Contig", "latest") == gb.AssemblyQuality.CONTIG_LATEST
    assert q("whatever", "latest") == gb.AssemblyQuality.LATEST
    assert q("whatever", "old") == gb.AssemblyQuality.NONE
    # better quality = lower ordinal
    assert gb.AssemblyQuality.COMPLETE_LATEST < gb.AssemblyQuality.CONTIG


def test_read_summary_filters(tree, tmp_path):
    rows = [
        _summary_row("11053", "12637", acc="GCA_01", name="a"),
        _summary_row("11060", "12637", level="Contig", acc="GCA_02", name="b"),
        _summary_row("9606", "9606", acc="GCA_03", name="c"),
        _summary_row("999999", "999999", acc="GCA_04", name="d"),  # unknown taxid
        "short\trow",                                              # < 20 cols
    ]
    f = _write_summary(tmp_path, rows)
    n1 = tree.get("11053")
    n2 = tree.get("11060")
    entries, total = gb.read_assembly_summary(f, tree, filter_nodes={n1, n2})
    assert total == 4
    assert set(entries) == {n1, n2}
    e = entries[n1][0]
    assert e.quality == gb.AssemblyQuality.COMPLETE_LATEST
    assert e.file_name == "GCA_01_a_genomic.fna.gz"
    assert e.download_url.endswith("/GCA_01_a/GCA_01_a_genomic.fna.gz")

    # quality filter drops the Contig entry
    entries, _ = gb.read_assembly_summary(
        f, tree, filter_nodes={n1, n2},
        qualities=[gb.AssemblyQuality.COMPLETE_LATEST])
    assert set(entries) == {n1}


def test_reference_only(tree, tmp_path):
    rows = [
        _summary_row("11053", "12637", refgen="reference genome", acc="GCA_01"),
        _summary_row("11053", "12637", acc="GCA_02", name="x"),
    ]
    f = _write_summary(tmp_path, rows)
    n1 = tree.get("11053")
    entries, _ = gb.read_assembly_summary(f, tree, filter_nodes={n1},
                                          reference_only=True)
    assert len(entries[n1]) == 1
    assert entries[n1][0].is_reference


def test_cap_keeps_best():
    mk = lambda q: gb.AssemblyEntry("1", "http://x/y", q, False, "1")
    lst = [mk(gb.AssemblyQuality.CONTIG), mk(gb.AssemblyQuality.COMPLETE_LATEST),
           mk(gb.AssemblyQuality.SCAFFOLD_LATEST), mk(gb.AssemblyQuality.CHROMOSOME)]
    capped = gb.cap_entries_keep_best({"n": lst}, 2)["n"]
    assert sorted(e.quality for e in capped) == [
        gb.AssemblyQuality.COMPLETE_LATEST, gb.AssemblyQuality.CHROMOSOME]
    # no cap
    assert len(gb.cap_entries_keep_best({"n": lst}, 0)["n"]) == 4


def test_tax_nodes_for_genbank(tree):
    n1, n2, sp = tree.get("11053"), tree.get("11060"), tree.get("12637")
    counts = {n1: 5, sp: 1}
    # non-refseq DB: everything
    assert gb.tax_nodes_for_genbank([n1, n2], counts, 3, None, refseq_db=False) \
        == {n1, n2}
    # refseq DB, limit 3: n1 has 5 regions (enough), n2 has 0
    assert gb.tax_nodes_for_genbank([n1, n2], counts, 3, None, refseq_db=True) \
        == {n2}
    # limit 0 disables genbank access
    assert gb.tax_nodes_for_genbank([n1, n2], counts, 0, None, refseq_db=True) \
        == set()
    # RNA-only DBs never use genbank (genomic data only there)
    assert gb.tax_nodes_for_genbank([n1, n2], counts, 3, None, refseq_db=True,
                                    seq_type="RNA") == set()
    # rank restriction: only species-rank nodes are checked
    assert gb.tax_nodes_for_genbank([n1, n2, sp], counts, 3, "species",
                                    refseq_db=True) == {sp}
