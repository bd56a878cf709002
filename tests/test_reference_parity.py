"""Golden parity against the reference's own committed dengue1 fixture.

The reference ships a miniature integration project at
core/src/test/resources/projects/dengue1 (genome fasta, 41bp test read, and
the golden Kraken-style classification output test.out produced by its
DBGoalTest.testKrakenOutput, DBGoalTest.java:124-141). We rebuild the same
scenario end-to-end with our pipeline — RefSeq fill under taxid 11053 plus
the deliberately "wrong" additional mapping of the same genome to 9606, so
the LCA update phase moves every k-mer to the root "1" — and assert BYTE
equality of our Kraken-style output with the reference's golden file.

Reference data is read in place (never copied into this repo).
"""

import gzip
import hashlib
import zipfile
from pathlib import Path

import pytest

from fixtures import write_mini_taxonomy

from genestrip_tpu.maker import GSMaker
from genestrip_tpu.project import Common, Project

REF = Path("/root/reference/core/src/test/resources/projects/dengue1")

pytestmark = pytest.mark.skipif(not REF.is_dir(), reason="reference fixture not mounted")


@pytest.fixture()
def world(tmp_path):
    mirror = tmp_path / "mirror"
    taxdir = write_mini_taxonomy(tmp_path / "taxsrc")
    (mirror / "pub/taxonomy").mkdir(parents=True)
    with zipfile.ZipFile(mirror / "pub/taxonomy/taxdmp.zip", "w") as z:
        z.write(taxdir / "nodes.dmp", "nodes.dmp")
        z.write(taxdir / "names.dmp", "names.dmp")

    # Serve the reference's dengue1 genome as the viral RefSeq category
    # (the reference test resolves NC_001477.1 -> 11053 via the catalog).
    fasta = (REF / "dengue1.fasta").read_bytes()
    rel = mirror / "refseq/release"
    (rel / "viral").mkdir(parents=True)
    (rel / "release-catalog").mkdir(parents=True)
    (rel / "RELEASE_NUMBER").write_text("230\n")
    fna = rel / "viral/viral.1.1.genomic.fna.gz"
    with gzip.open(fna, "wb") as f:
        f.write(fasta)
    md5 = hashlib.md5(fna.read_bytes()).hexdigest()
    with gzip.open(rel / "release-catalog/RefSeq-release230.catalog.gz", "wb") as f:
        f.write(b"11053\tDengue virus 1\tNC_001477.1\tviral\tPROVISIONAL\t1000\n")
    (rel / "release-catalog/release230.files.installed").write_text(
        f"{md5}\tviral.1.1.genomic.fna.gz\n")

    base = tmp_path / "data"
    proj = base / "projects/dengue1"
    (proj / "fasta").mkdir(parents=True)
    (proj / "fastq").mkdir()
    # Same project definition as the reference fixture: requested taxid set
    # {11053}, viral category, additional mapping 9606 -> the same genome.
    (proj / "taxids.txt").write_text("11053\n")
    (proj / "categories.txt").write_text("viral\n")
    (proj / "fasta/dengue1.fasta").write_bytes(fasta)
    (proj / "additional.txt").write_text("9606 dengue1.fasta\n")
    (proj / "fastq/test.fastq").write_bytes((REF / "test.fastq").read_bytes())

    overrides = {
        "httpBaseURL": f"file://{mirror}",
        "refseq.httpBaseURL": f"file://{mirror}/refseq",
        "matchBatchSize": "16",
        "writeKrakenStyleOut": "true",
    }
    common = Common(base)
    return Project(common, "dengue1", overrides=overrides)


def test_update_semantics(world):
    """ref: DBGoalTest.testUpdate:87-117 — after fill all k-mers belong to
    11053; after update they all moved to root '1', totals preserved."""
    maker = GSMaker(world)
    db = maker.goal("filldb").get()
    stats = db.stats()
    total = stats[None]
    assert total > 0
    assert stats["11053"] == total

    db2 = maker.goal("updatedb").get()
    stats2 = db2.stats()
    assert stats2.get("11053", 0) == 0
    assert stats2[None] == total
    assert stats2["1"] == total


def test_kraken_output_golden(world):
    """ref: DBGoalTest.testKrakenOutput:124-141 — byte equality with the
    committed golden test.out."""
    maker = GSMaker(world, fastq_args=[str(world.fastq_dir / "test.fastq")],
                    key="test")
    maker.goal("match").make()
    out = world.output_file("matchres", "kraken_out", key="test")
    assert out.read_bytes() == (REF / "test.out").read_bytes()
