"""Taxonomy tests — parsing, LCA, selection (ref: tax/TaxTreeLCATest,
tax/SmallTaxTreeLCATest) over the synthetic mini taxonomy."""

import numpy as np

from genestrip_tpu.tax.tree import (
    Rank, TaxTree, collect_tax_nodes, read_taxids_file, with_descendants,
)
from genestrip_tpu.tax.small import SmallTaxTree
from fixtures import write_mini_taxonomy


def make_tree(tmp_path):
    return TaxTree(write_mini_taxonomy(tmp_path / "tax"))


def test_parse_and_positions(tmp_path):
    t = make_tree(tmp_path)
    assert t.root is t.get("1")
    assert t.get("11053").parent is t.get("12637")
    assert t.get("9606").name == "Homo sapiens"
    assert t.get("12637").rank.name == "species"
    # pre-order positions: root first, children in file order
    assert t.get("1").position == 0
    assert t.get("10239").position < t.get("131567").position
    assert t.get("11053").depth == 4


def test_lca_and_ancestor(tmp_path):
    t = make_tree(tmp_path)
    assert t.lca(t.get("11053"), t.get("11060")) is t.get("12637")
    assert t.lca(t.get("11053"), t.get("9606")) is t.get("1")
    assert t.lca(t.get("11053"), t.get("12637")) is t.get("12637")
    assert t.is_ancestor_of(t.get("11053"), t.get("10239"))
    assert not t.is_ancestor_of(t.get("10239"), t.get("11053"))


def test_collect_tax_nodes(tmp_path):
    t = make_tree(tmp_path)
    f = tmp_path / "taxids.txt"
    f.write_text("# comment\n12637\n-11060 # excluded\n")
    inc, exc = read_taxids_file(t, f)
    assert inc == {t.get("12637")}
    assert exc == {t.get("11060")}
    nodes = collect_tax_nodes(t, f, None)
    ids = {n.tax_id for n in nodes}
    assert ids == {"12637", "11053", "11069"}


def test_with_descendants_rank_bound(tmp_path):
    t = make_tree(tmp_path)
    # Completion down to species must not descend below species: the dengue
    # subtypes are rank 'no rank' (indeterminate -> not below) so included;
    # but from Homo (genus), species 9606 is included (not below species).
    nodes = with_descendants({t.get("9605")}, Rank.by_name("species"))
    assert {n.tax_id for n in nodes} == {"9605", "9606"}


def test_small_tree(tmp_path):
    t = make_tree(tmp_path)
    for tid in ("11053", "11060", "9606"):
        t.get(tid).mark_required()
    t.get("11053").requested = True
    s = SmallTaxTree.from_tax_tree(t)
    # retained: paths to the required leaves
    assert set(s.taxids) == {"1", "10239", "3044782", "12637", "11053", "11060",
                             "131567", "2759", "9605", "9606"}
    # pre-order: root index 0, viruses before cellular
    assert s.taxids[0] == "1"
    assert s.get("10239") < s.get("131567")
    assert s.requested[s.get("11053")]
    # LCA / ancestor via arrays
    assert s.lca(s.get("11053"), s.get("11060")) == s.get("12637")
    assert s.lca(s.get("11053"), s.get("9606")) == s.get("1")
    assert s.is_ancestor_of(s.get("11053"), s.get("10239"))
    assert not s.is_ancestor_of(s.get("10239"), s.get("11053"))
    got = s.lca_np(
        np.array([s.get("11053"), s.get("11053"), -1]),
        np.array([s.get("11060"), s.get("9606"), s.get("9606")]),
    )
    np.testing.assert_array_equal(got, [s.get("12637"), s.get("1"), -1])


def test_small_tree_sort_and_json(tmp_path):
    t = make_tree(tmp_path)
    for tid in ("11053", "9606"):
        t.get(tid).mark_required()
    s = SmallTaxTree.from_tax_tree(t)
    order = s.sort_taxids(["9606", None, "11053", "1"])
    assert order == [None, "1", "11053", "9606"]
    s2 = SmallTaxTree.from_json(s.to_json())
    assert s2.taxids == s.taxids
    np.testing.assert_array_equal(s2.parent, s.parent)
    np.testing.assert_array_equal(s2.tout, s.tout)
