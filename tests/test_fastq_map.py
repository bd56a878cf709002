"""-m map-file and -l URL-download transform paths (ref:
goals/FastqMapGoal.java + FastqMapTransformGoal.java + FastqDownloadsGoal):
a two-key map file yields one match CSV per key; a file:// URL fastq with
download_fastqs='project' is downloaded into the project fastq dir and the
matcher consumes the local copy."""

import gzip

import numpy as np
import pytest

from fixtures import make_dengue_world, write_fastq

from genestrip_tpu.maker import GSMaker


@pytest.fixture()
def world(tmp_path):
    return make_dengue_world(tmp_path), tmp_path


def test_map_file_two_keys(world):
    (project, g1, g2, reads), tmp_path = world
    fq2 = write_fastq(tmp_path / "other.fastq",
                      [("o1", g2[10:110]), ("o2", g2[40:140])])
    mapf = tmp_path / "map.txt"
    mapf.write_text(
        "# comment line\n"
        f"keyA {project.fastq_dir / 'test.fastq'}\n"
        f"keyB {fq2}\n")
    maker = GSMaker(project, map_file=str(mapf))
    maker.goal("match").make()
    csv_a = project.output_file("match", "csv", key="keyA")
    csv_b = project.output_file("match", "csv", key="keyB")
    assert csv_a.exists() and csv_b.exists()
    # keyB (pure g2 reads): total row counts 2 reads
    total_b = csv_b.read_text().splitlines()[1].split(";")
    assert total_b[2] == "TOTAL" and int(total_b[5]) == 2


def test_url_fastq_downloaded_with_l(world):
    (project, g1, g2, reads), tmp_path = world
    src = tmp_path / "remote.fastq.gz"
    with gzip.open(src, "wb") as f:
        for d, s in [("u1", g1[20:120]), ("u2", g1[60:160])]:
            f.write(b"@" + d.encode() + b"\n" + s + b"\n+\n"
                    + b"I" * len(s) + b"\n")
    url = f"file://{src}"
    maker = GSMaker(project, fastq_args=[url], key="dl",
                    download_fastqs="project")
    maker.goal("match").make()
    csv = project.output_file("match", "csv", key="dl")
    assert csv.exists()
    total = csv.read_text().splitlines()[1].split(";")
    assert int(total[5]) == 2
    # the URL was materialized into the project's fastq dir with the
    # reference's <project>_<key>[_<n>].fastq[.gz] naming
    local = list(project.fastq_dir.glob("dengue1_dl*"))
    assert local, "downloaded fastq missing from project fastq dir"
    with gzip.open(local[0], "rb") as f:
        assert f.readline().startswith(b"@u1")
