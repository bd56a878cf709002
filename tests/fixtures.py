"""Synthetic test fixtures: a miniature NCBI-style taxonomy and genomes.

All fixture content is generated here (no data copied from the reference
repo); tax ids follow the public NCBI numbering for realism.
"""

import numpy as np

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
