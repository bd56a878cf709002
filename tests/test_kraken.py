"""Kraken interop: executor command templating, output parsing, stats
accumulation (ref: kraken/KrakenExecutor.java, KrakenResultProcessor.java,
goals/kraken/KrakenResCountGoal.java). The external binary is faked with a
shell script that emits a canned Kraken-format output."""

import io
import os
import stat

import pytest

from genestrip_tpu.kraken import (
    KrakenExecutor, KrakenResultProcessor, count_kraken_results,
)

KRAKEN_OUT = (
    b"C\tread1\t11053\t100\t11053:40 0:10 11053:20\n"
    b"C\tread2\t12637\t80\t11053:25 A:5 12637:20\n"
    b"U\tread3\t0\t60\t0:30\n"
)


def test_exec_line_template():
    ex = KrakenExecutor("krakenuniq", "{0} -db {1} {2}")
    line = ex.gen_exec_line("mydb", ["/tmp/a.fastq", "/tmp/b.fastq"])
    assert line.startswith("krakenuniq -db mydb ")
    assert "/tmp/a.fastq /tmp/b.fastq" in line
    assert not ex.with_file_for_output
    ex2 = KrakenExecutor("kraken", "{0} -db {1} {2} > {3}")
    assert ex2.with_file_for_output


def test_result_processor_totals_and_listener():
    proc = KrakenResultProcessor()
    events = []
    totals = proc.process(io.BytesIO(KRAKEN_OUT),
                          lambda *a: events.append(a))
    # 'A' segments are skipped; '0' (unclassified) segments count under "0"
    assert totals == {"11053": 40 + 20 + 25, "0": 10 + 30, "12637": 20}
    # positions advance by all segments including skipped 'A'
    line2 = [e for e in events if e[0] == 2]
    assert [(e[5], e[6], e[4]) for e in line2] == [
        ("11053", 25, 0), ("12637", 20, 30)]
    assert line2[0][2] == "12637" and line2[0][3] == 80


def test_count_kraken_results_with_fake_binary(tmp_path):
    out_file = tmp_path / "canned.out"
    out_file.write_bytes(KRAKEN_OUT)
    fake = tmp_path / "fakekraken"
    fake.write_text(f"#!/bin/sh\ncat {out_file}\n")
    fake.chmod(fake.stat().st_mode | stat.S_IEXEC)
    fq = tmp_path / "in.fastq"
    fq.write_text("@read1\nACGT\n+\n~~~~\n")

    ex = KrakenExecutor(str(fake), "{0} -db {1} {2}")
    stats = count_kraken_results(ex, "db", [fq])
    by_id = {s.taxid: s for s in stats}
    # per-segment kmers
    assert by_id["11053"].kmers == 85
    assert by_id["12637"].kmers == 20
    assert by_id["0"].kmers == 40
    # reads counted once per line under the classification taxid;
    # kmersInMatchingReads from the first segment when taxids match
    assert by_id["11053"].reads == 1 and by_id["11053"].kmers_in_matching_reads == 40
    assert by_id["12637"].reads == 1 and by_id["12637"].kmers_in_matching_reads == 0
    assert by_id["0"].reads == 1

    # restriction to a taxid set (ref KrakenResCountGoal taxNodesGoal)
    stats2 = count_kraken_results(ex, "db", [fq], taxids={"11053"})
    assert {s.taxid for s in stats2} == {"11053"}


def test_nonzero_exit_raises(tmp_path):
    fake = tmp_path / "failkraken"
    fake.write_text("#!/bin/sh\nexit 3\n")
    fake.chmod(fake.stat().st_mode | stat.S_IEXEC)
    ex = KrakenExecutor(str(fake), "{0} -db {1} {2}")
    with pytest.raises(RuntimeError, match="exited with 3"):
        ex.execute("db", [])


def test_url_helpers_honor_use_http():
    from genestrip_tpu.maker import _ncbi_url, _refseq_url

    class P(dict):
        def __getitem__(self, k):
            return super().__getitem__(k)

    p = P({"useHttp": True, "httpBaseURL": "https://x", "ftpBaseURL": "ftp.x",
           "refseq.httpBaseURL": "https://x/refseq",
           "refseq.ftpBaseURL": "ftp.x"})
    assert _ncbi_url(p, "/pub/taxonomy/t.zip") == "https://x/pub/taxonomy/t.zip"
    assert _refseq_url(p, "/release/a") == "https://x/refseq/release/a"
    p["useHttp"] = False
    assert _ncbi_url(p, "/pub/taxonomy/t.zip") == "ftp://ftp.x/pub/taxonomy/t.zip"
    assert _refseq_url(p, "/release/a") == "ftp://ftp.x/refseq/release/a"


def test_noop_config_key_warns(caplog):
    import logging
    from genestrip_tpu.config import Config
    with caplog.at_level(logging.WARNING, logger="genestrip"):
        Config({"useRadixStore": "true"})
    assert any("no effect" in r.message for r in caplog.records)


def test_krakencount_goal_through_maker(tmp_path):
    """Regression: _kraken_count must use TaxNode.tax_id (not .taxid), and
    _KrakenResGoal.is_made must not execute the kraken binary (memoization,
    ref: KrakenResFileGoal.provideFiles derives files from fastqMapGoal)."""
    from fixtures import make_dengue_world
    from genestrip_tpu.maker import GSMaker

    project, g1, g2, reads = make_dengue_world(tmp_path)
    out_file = tmp_path / "canned.out"
    out_file.write_bytes(KRAKEN_OUT)
    calls = tmp_path / "calls.txt"
    fake = tmp_path / "fakekraken"
    fake.write_text(f"#!/bin/sh\necho run >> {calls}\ncat {out_file}\n")
    fake.chmod(fake.stat().st_mode | stat.S_IEXEC)
    project.config.layers[0]["krakenBin"] = str(fake)

    fq = project.fastq_dir / "test.fastq"
    m = GSMaker(project, fastq_args=[str(fq)], key="kc1")
    # taxnodes is non-empty (taxids.txt has 12637 + descendants): this is the
    # path that crashed with AttributeError on n.taxid
    stats = m.goal("krakencount").get()
    by_id = {s.taxid: s for s in stats["kc1"]}
    # 11053 is a descendant of requested 12637 -> kept by the taxid filter
    assert by_id["11053"].kmers == 85
    assert calls.read_text().count("run") == 1

    m.goal("krakenres").make()
    res = project.output_file("krakenres", "kraken_out_res", key="kc1")
    assert res.exists()
    assert "11053;" in res.read_text()
    n_runs = calls.read_text().count("run")

    # a second make must be a no-op: files exist, binary NOT re-run
    m2 = GSMaker(project, fastq_args=[str(fq)], key="kc1")
    m2.goal("krakenres").make()
    assert calls.read_text().count("run") == n_runs
