"""Synthetic test fixtures: a miniature NCBI-style taxonomy and genomes.

All fixture content is generated here (no data copied from the reference
repo); tax ids follow the public NCBI numbering for realism.
"""

import gzip
import hashlib
import zipfile

import numpy as np

from genestrip_tpu.project import Common, Project

# (taxid, parent, rank, name) — child order in file order.
MINI_TAX = [
    ("1", "1", "no rank", "root"),
    ("10239", "1", "acellular root", "Viruses"),
    ("3044782", "10239", "clade", "Flasuviricetes"),
    ("12637", "3044782", "species", "Dengue virus"),
    ("11053", "12637", "no rank", "dengue virus type 1"),
    ("11060", "12637", "no rank", "dengue virus type 2"),
    ("11069", "12637", "no rank", "dengue virus type 3"),
    ("131567", "1", "no rank", "cellular organisms"),
    ("2759", "131567", "domain", "Eukaryota"),
    ("9605", "2759", "genus", "Homo"),
    ("9606", "9605", "species", "Homo sapiens"),
    ("2", "131567", "domain", "Bacteria"),
    ("139", "2", "species", "Borreliella burgdorferi"),
]


def write_mini_taxonomy(dirpath):
    """Write nodes.dmp / names.dmp in NCBI dump format into dirpath."""
    dirpath.mkdir(parents=True, exist_ok=True)
    with open(dirpath / "nodes.dmp", "w") as f:
        for taxid, parent, rank, _ in MINI_TAX:
            f.write(f"{taxid}\t|\t{parent}\t|\t{rank}\t|\t\t|\t8\t|\t0\t|\t1\t|\t0\t|\t0\t|\t0\t|\t0\t|\t0\t|\t\t|\n")
    with open(dirpath / "names.dmp", "w") as f:
        for taxid, _, _, name in MINI_TAX:
            f.write(f"{taxid}\t|\t{name}\t|\t\t|\tscientific name\t|\n")
    return dirpath


def random_genome(rng, n, seed_bases=b"CGAT"):
    """A random DNA sequence as bytes."""
    return bytes(rng.choice(list(seed_bases), size=n).astype(np.uint8))


def write_fasta(path, records, line_len=70):
    """records: list of (header, seq bytes)."""
    with open(path, "w") as f:
        for header, seq in records:
            f.write(f">{header}\n")
            s = seq.decode()
            for i in range(0, len(s), line_len):
                f.write(s[i:i + line_len] + "\n")
    return path


def write_fastq(path, records):
    """records: list of (descriptor, seq bytes) — quality is all '~'."""
    with open(path, "w") as f:
        for desc, seq in records:
            f.write(f"@{desc}\n{seq.decode()}\n+\n" + "~" * len(seq) + "\n")
    return path



def _wrap(seq: bytes, n=70):
    s = seq.decode()
    return "\n".join(s[i:i + n] for i in range(0, len(s), n)) + "\n"


def make_dengue_world(tmp_path, k=31):
    rng = np.random.default_rng(99)
    mirror = tmp_path / "mirror"
    # taxonomy: taxdmp.zip
    taxdir = write_mini_taxonomy(tmp_path / "taxsrc")
    (mirror / "pub/taxonomy").mkdir(parents=True)
    with zipfile.ZipFile(mirror / "pub/taxonomy/taxdmp.zip", "w") as z:
        z.write(taxdir / "nodes.dmp", "nodes.dmp")
        z.write(taxdir / "names.dmp", "names.dmp")
    # genomes
    g1 = random_genome(rng, 500)   # dengue 1 (11053) — also mapped to 9606
    g2 = random_genome(rng, 400)   # dengue 2 (11060)
    rel = mirror / "refseq/release"
    (rel / "viral").mkdir(parents=True)
    (rel / "release-catalog").mkdir(parents=True)
    (rel / "RELEASE_NUMBER").write_text("230\n")
    fna = rel / "viral/viral.1.1.genomic.fna.gz"
    body = (">NC_001477.1 Dengue virus 1, complete genome\n"
            + _wrap(g1) + ">NC_001474.2 Dengue virus 2, complete genome\n"
            + _wrap(g2))
    with gzip.open(fna, "wb") as f:
        f.write(body.encode())
    md5 = hashlib.md5(fna.read_bytes()).hexdigest()
    with gzip.open(rel / "release-catalog/RefSeq-release230.catalog.gz", "wb") as f:
        f.write(b"11053\tDengue virus 1\tNC_001477.1\tviral\tPROVISIONAL\t1000\n")
        f.write(b"11060\tDengue virus 2\tNC_001474.2\tviral\tPROVISIONAL\t1000\n")
        f.write(b"9606\tHomo sapiens\tNC_000001.11\tvertebrate_mammalian\tPROVISIONAL\t1000\n")
    (rel / "release-catalog/release230.files.installed").write_text(
        f"{md5}\tviral.1.1.genomic.fna.gz\n")

    # project
    base = tmp_path / "data"
    proj = base / "projects/dengue1"
    proj.mkdir(parents=True)
    (proj / "taxids.txt").write_text("12637\n")
    (proj / "categories.txt").write_text("viral\n")
    # additional: same genome under 9606 (deliberately "wrong", ref DBGoalTest)
    (proj / "fasta").mkdir()
    write_fasta(proj / "fasta/dengue1.fasta",
                [("NC_001477.1 Dengue virus 1, complete genome", g1)])
    (proj / "additional.txt").write_text("9606 dengue1.fasta\n")
    # reads: slices of g1 and g2 + one random read
    (proj / "fastq").mkdir()
    reads = [("r1", g1[10:110]), ("r2", g2[50:150]),
             ("r3", random_genome(rng, 100)), ("r4", g1[200:300])]
    write_fastq(proj / "fastq/test.fastq", reads)

    overrides = {
        "httpBaseURL": f"file://{mirror}",
        "refseq.httpBaseURL": f"file://{mirror}/refseq",
        "matchBatchSize": "64",
    }
    common = Common(base)
    project = Project(common, "dengue1", overrides=overrides)
    return project, g1, g2, reads
