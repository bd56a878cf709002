"""Coverage for the goal tail: extract, fasta2fastq, svgtaxtree, matchlr,
showdbconf, dbdownload, extractrefseqfasta/csv, genall — plus a
GoalsTest-style smoke that makes every registered user goal on the hermetic
mirror world (ref: core GoalsTest.java:33-50).
"""

import gzip

import pytest

from fixtures import make_dengue_world, write_fasta, write_fastq

from genestrip_tpu.maker import GSMaker


@pytest.fixture()
def world(tmp_path):
    return make_dengue_world(tmp_path)


def _maker(project, **kw):
    return GSMaker(project, **kw)


def test_extract_goal(world):
    project, g1, g2, reads = world
    fq = project.fastq_dir / "test.fastq"
    m = _maker(project, fastq_args=[str(fq)], key="x1")
    # extractKey 'r' matches every read (r1..r4); 'r4' matches one
    project.config.layers[0]["extractKey"] = "r4"  # override layer
    m.goal("extract").make()
    out = project.output_file("extract", "fastq_res", key="x1",
                              gzip=project["gzipFastqOutput"])
    assert out.exists()
    data = gzip.open(out).read() if out.suffix == ".gz" else out.read_bytes()
    assert data.startswith(b"@r4")
    assert data.count(b"@r") == 1


def test_fasta2fastq_goal(world):
    project, g1, g2, reads = world
    fa = project.fasta_dir / "conv.fasta"
    write_fasta(fa, [("seqA desc", g1[:100]), ("seqB", g2[:80])])
    m = _maker(project, fastq_args=[str(fa)], key="f2f")
    m.goal("fasta2fastq").make()
    out = project.output_file("fasta2fastq", "fastq_res", key="f2f",
                              gzip=project["gzipFastqOutput"])
    assert out.exists()
    data = gzip.open(out).read() if out.suffix == ".gz" else out.read_bytes()
    lines = data.splitlines()
    assert lines[0] == b"@seqA desc"
    assert lines[1] == g1[:100]
    assert lines[4] == b"@seqB"
    assert len(lines) == 8


def test_matchlr_goal(world):
    project, g1, g2, reads = world
    fq = project.fastq_dir / "test.fastq"
    m = _maker(project, fastq_args=[str(fq)], key="lr1")
    m.goal("matchlr").make()
    out = project.output_file("matchlr", "csv", key="lr1")
    assert out.exists()
    text = out.read_text()
    # long-read mode counts k-mers but never classifies reads: every
    # per-taxid row has reads == 0 while k-mer columns are populated
    rows = [ln.split(";") for ln in text.splitlines()[1:]]
    per_tax = [r for r in rows if r[2] != "TOTAL"]
    assert all(r[5] == "0" for r in per_tax)
    assert any(int(r[7]) > 0 for r in per_tax)  # kmers column


def test_svgtaxtree_goal(world):
    project, g1, g2, reads = world
    m = _maker(project)
    m.goal("svgtaxtree").make()
    out = project.output_file("svgtaxtree", "svg")
    assert out.exists()
    svg = out.read_text()
    assert svg.startswith("<?xml") or svg.lstrip().startswith("<svg")
    assert "11053" in svg or "dengue" in svg.lower()


def test_showdbconf_and_dbconf(world, capsys):
    project, g1, g2, reads = world
    m = _maker(project)
    m.goal("showdbconf").make()
    outp = capsys.readouterr().out
    assert "database.genestrip.version" in outp or "=" in outp


def test_dbdownload_goal(world):
    project, g1, g2, reads = world
    # build a db, stash it as the "remote" artifact, clean, then install
    m = _maker(project)
    m.goal("db").make()
    src = project.db_file.read_bytes()
    remote = project.project_dir / "remote_db.zip"
    remote.write_bytes(src)
    project.db_file.unlink()
    (project.project_dir / "dbdownload.txt").write_text(f"file://{remote}\n")
    m2 = _maker(project)
    m2.goal("dbdownload").make()
    assert project.db_file.exists()
    assert project.db_file.read_bytes() == src


def test_extract_refseq_goals(world):
    project, g1, g2, reads = world
    m = _maker(project)
    m.goal("extractrefseqcsv").make()
    csv = project.output_file("extractrefseqcsv", "csv")
    assert csv.exists()
    text = csv.read_text()
    assert "NC_001477.1" in text
    # per-accession fastas extracted under the project's extract dir
    fastas = list((project.fasta_dir).rglob("*.f*")) + \
        list(project.project_dir.rglob("NC_001477*"))
    assert any("NC_001477" in str(f) for f in fastas), fastas


def test_genall_smoke(world):
    """ref GoalsTest.java:33-50 — every registered user goal makes cleanly."""
    project, g1, g2, reads = world
    fq = project.fastq_dir / "test.fastq"
    m = _maker(project, fastq_args=[str(fq)], key="all")
    # dbdownload needs a dbdownload.txt (covered above); clear wipes the
    # csv outputs, so it runs after the is_made checks
    skip = {"dbdownload", "clear"}
    for name in m.maker.user_goals():
        if name in skip:
            continue
        m.goal(name).make()
    for name in m.maker.user_goals():
        if name in skip:
            continue
        assert m.goal(name).is_made(), name
    m.goal("clear").make()
