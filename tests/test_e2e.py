"""Hermetic end-to-end pipeline test: database generation (download ->
taxonomy -> catalog -> fill -> LCA update -> save) and analysis (match CSV,
kraken-out, filter, dbinfo, db2fastq) against a local fake NCBI mirror.

Mirrors the reference's dengue1 integration scenario
(goals/refseq/DBGoalTest.java): the same genome is attributed to 11053 via
the RefSeq catalog and to 9606 via additional.txt, so after the update phase
every k-mer moves to the root "1" while totals are preserved.
"""

import gzip
import hashlib
import zipfile

import numpy as np
import pytest

from fixtures import write_mini_taxonomy, write_fasta, write_fastq, random_genome

from genestrip_tpu.maker import GSMaker
from genestrip_tpu.project import Common, Project
from genestrip_tpu.store.database import Database

K = 31


@pytest.fixture()
def world(tmp_path):
    from fixtures import make_dengue_world
    return make_dengue_world(tmp_path)


def _wrap(seq: bytes, n=70):
    s = seq.decode()
    return "\n".join(s[i:i + n] for i in range(0, len(s), n)) + "\n"


def kmer_count(g: bytes) -> int:
    return len(g) - K + 1


def test_db_build_and_update(world):
    project, g1, g2, _ = world
    maker = GSMaker(project)

    filldb = maker.goal("filldb")
    db = filldb.get()
    stats = db.stats()
    # after fill: g1 k-mers at 11053, g2 k-mers at 11060 (all unique in the
    # random genomes with overwhelming probability)
    assert stats["11053"] > 0 and stats["11060"] > 0
    assert stats[None] == stats["11053"] + stats["11060"]

    updatedb = maker.goal("updatedb")
    db2 = updatedb.get()
    stats2 = db2.stats()
    # g1's k-mers moved to the LCA of 11053 and 9606 = root "1"
    assert stats2.get("11053", 0) == 0
    assert stats2["1"] == stats["11053"]
    assert stats2["11060"] == stats["11060"]
    assert stats2[None] == stats[None]

    maker.goal("db").make()
    assert project.db_file.exists()
    loaded = Database.load(project.db_file)
    assert loaded.md5
    np.testing.assert_array_equal(loaded.table.keys, db2.table.keys)
    assert loaded.stats() == stats2

    # requested flags survive the roundtrip (12637's descendants incl. 11053)
    t = loaded.tree
    assert t.requested[t.get("11053")]
    assert t.requested[t.get("11060")]


def test_match_goal(world):
    project, g1, g2, reads = world
    project.config.set_override("writeKrakenStyleOut", "true")
    maker = GSMaker(project, fastq_args=[str(project.fastq_dir / "test.fastq")],
                    key="test")
    maker.goal("match").make()
    csv = project.output_file("match", "csv", key="test")
    assert csv.exists()
    lines = csv.read_text().splitlines()
    assert lines[0].startswith("pos;level;name;rank;taxid;reads;")
    rows = {l.split(";")[4]: l.split(";") for l in lines[1:]}
    # TOTAL row
    total = rows[""]
    assert total[2] == "TOTAL"
    assert int(total[5]) == 4          # 4 reads
    # r1 and r4 classify to "1" (g1 k-mers moved there), r2 to 11060
    assert int(rows["1"][5]) == 2
    assert int(rows["11060"][5]) == 1
    # kmers per read = 100 - 31 + 1 = 70
    assert int(rows["11060"][7]) == 70          # kmers column
    assert int(rows["11060"][8]) == 70          # unique kmers
    assert int(rows["1"][7]) == 140
    # kraken out written
    out = project.output_file("matchres", "kraken_out", key="test")
    assert out.exists()
    out_lines = out.read_bytes().splitlines()
    assert len(out_lines) == 4
    assert out_lines[0].startswith(b"C\tr1\t1\t100\t1:70")
    assert out_lines[2].startswith(b"U\tr3\t0\t100\t0:70")

    # result object API
    res = maker.goal("matchres").get()["test"]
    assert res.global_stats.reads == 4


def test_dbinfo_and_db2fastq(world):
    project, g1, g2, _ = world
    maker = GSMaker(project, taxids_arg="11060")
    maker.goal("dbinfo").make()
    info = project.db_info_file.read_text().splitlines()
    assert info[0].startswith("pos;level;name;rank;taxid;stored kmers;")
    assert any(";11060;" in l and ";true;" in l for l in info)

    maker.goal("db2fastq").make()
    f = project.output_file("db2fastq", "fastq", key="11060", gzip=True)
    assert f.exists()
    import gzip as gz
    data = gz.open(f, "rb").read().splitlines()
    assert len(data) == 4 * kmer_count(g2)
    # each read is a k-mer of g2 (canonical form)
    from genestrip_tpu.ops.kmer import window_kmers_np
    from genestrip_tpu.utils.dna import seq_to_codes
    kms, _ = window_kmers_np(seq_to_codes(g2), K)
    got0 = data[1]
    gk, _ = window_kmers_np(seq_to_codes(got0), K)
    assert gk[0] in kms


def test_filter_goal(world):
    project, g1, g2, reads = world
    project.config.set_override("writeDumpedFastq", "true")
    maker = GSMaker(project, fastq_args=[str(project.fastq_dir / "test.fastq")],
                    key="test")
    maker.goal("filter").make()
    f = project.output_file("filter", "fastq_res", key="test", gzip=True)
    assert f.exists()
    import gzip as gz
    names = [l[1:].split()[0] for l in gz.open(f, "rt").read().splitlines()[::4]]
    # r1/r2/r4 hit requested-node k-mers... after the update g1 k-mers moved to
    # the root, which is NOT requested — so only r2 (11060) is retained.
    assert names == ["r2"]
    dumped = project.output_file("dumped", "fastq_res",
                                 base_file=f.name, gzip=True)
    assert dumped.exists()
    dnames = [l[1:].split()[0] for l in gz.open(dumped, "rt").read().splitlines()[::4]]
    assert dnames == ["r1", "r3", "r4"]


def test_clean_and_rebuild(world):
    project, *_ = world
    maker = GSMaker(project)
    maker.goal("db").make()
    assert project.db_file.exists()
    assert not project.temp_db_file.exists()   # removed after final save
    # goal is lazily skipped when output exists
    mtime = project.db_file.stat().st_mtime
    maker2 = GSMaker(project)
    maker2.goal("db").make()
    assert project.db_file.stat().st_mtime == mtime
    maker2.goal("db").clean()
    assert not project.db_file.exists()


def test_dbquality_goal(world):
    """The ft-module equivalent: per-taxid tp / tp+fp / tp+fn quality scan
    (ref: ft DBQualityCountsGoal + DBQualityCSVGoal)."""
    project, g1, g2, _ = world
    maker = GSMaker(project)
    maker.goal("dbquality").make()
    csv = project.output_file("dbquality", "csv")
    assert csv.exists()
    lines = csv.read_text().splitlines()
    assert lines[0].startswith("taxid;name;rank;parent taxid;tp;tp+fp;tp+fn;")
    rows = {l.split(";")[0]: l.split(";") for l in lines[1:]}
    db = Database.load(project.db_file)
    stats = db.stats()
    n1 = stats["1"]              # g1 k-mers, moved to root by the update
    n2 = stats["11060"]          # g2 k-mers
    # leaf 11053: all its k-mers are stored at root (an ancestor) -> all tp;
    # tp+fp = path sum root..11053 = n1 (only the root holds k-mers there)
    assert int(rows["11053"][4]) == n1 and int(rows["11053"][6]) == n1
    assert int(rows["11053"][5]) == n1
    # 9606 is not part of the database's compact tree (not a requested node),
    # so—exactly like the reference's null-leafNode skip—it gets no row
    assert "9606" not in rows
    # leaf 11060: stored under itself -> all tp; path sum includes root's n1
    assert int(rows["11060"][4]) == n2 and int(rows["11060"][6]) == n2
    assert int(rows["11060"][5]) == n1 + n2
    # aggregated species node (12637) groups its two counted leaves
    assert "12637" in rows
    assert int(rows["12637"][4]) == n1 + n2
