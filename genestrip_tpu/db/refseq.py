"""RefSeq catalog / accession-map / categories support.

Reference equivalents: refseq/AccessionFileProcessor.java (no-alloc catalog
scan with seq-type/category/status filters), refseq/AccessionMapImpl.java
(sorted byte-array accession -> tax node map), refseq/RefSeqCategory.java,
goals/refseq/CategoriesGoal.java.
"""

from __future__ import annotations

from genestrip_tpu.io.streams import StreamingResource
from genestrip_tpu.tax.tree import TaxTree

CATEGORIES = [
    "archaea", "bacteria", "complete", "fungi", "invertebrate", "mitochondrion",
    "other", "plant", "plasmid", "plastid", "protozoa", "vertebrate_mammalian",
    "vertebrate_other", "viral",
]

ALL_GENOMIC_PREFIXES = ("AC_", "NC_", "NG_", "NT_", "NW_", "NZ_")
COMPLETE_GENOMIC_PREFIXES = ("AC_", "NC_", "NZ_")
RNA_PREFIXES = ("NR_", "XR_")
M_RNA_PREFIXES = ("NM_", "XM_")

REFSEQ_STATUSES = ["NA", "UNKNOWN", "REVIEWED", "VALIDATED", "PROVISIONAL",
                   "PREDICTED", "INFERRED", "MODEL"]


def read_categories(path) -> list[str]:
    """Parse categories.txt: one RefSeq category directory name per line."""
    out = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line and not line.startswith("#"):
                if line not in CATEGORIES:
                    raise ValueError(f"Unknown RefSeq category: {line}")
                out.append(line)
    return out


def _seq_type_flags(seq_type: str):
    dna = seq_type in ("GENOMIC", "ALL")
    rna = seq_type in ("RNA", "ALL", "ALL_RNA")
    mrna = seq_type in ("M_RNA", "ALL", "ALL_RNA")
    return dna, rna, mrna


class AccessionMap:
    """accession(.version) -> TaxNode, with optional complete-genomes-only
    prefix restriction at lookup time (ref: AccessionMapImpl.get)."""

    def __init__(self):
        self._map: dict[str, object] = {}
        # regions per tax node (ref: TaxTree.java:519 node.refSeqRegions++,
        # consumed by TaxNodesFromGenbankGoal)
        self.region_counts: dict[object, int] = {}

    def put(self, accession: str, node) -> None:
        self._map[accession] = node
        self.region_counts[node] = self.region_counts.get(node, 0) + 1

    def get(self, accession: str, complete_genomes_only: bool = False):
        if complete_genomes_only and not accession.startswith(COMPLETE_GENOMIC_PREFIXES):
            return None
        return self._map.get(accession)

    def __len__(self):
        return len(self._map)


def build_accession_map(catalog: StreamingResource, tree: TaxTree,
                        categories: list[str], seq_type: str = "GENOMIC",
                        statuses: list[str] | None = None) -> AccessionMap:
    """Stream the RefSeq release catalog and collect matching accessions.

    Catalog line: taxid \\t name \\t accession.version \\t categories \\t
    status \\t ... (ref: AccessionFileProcessor.processCatalog:95-130).
    """
    dna, rna, mrna = _seq_type_flags(seq_type)
    cats = set(categories)
    stats = set(statuses if statuses is not None else REFSEQ_STATUSES)
    amap = AccessionMap()
    with catalog.open() as stream:
        for raw in stream:
            parts = raw.decode("utf-8", "replace").rstrip("\n").split("\t")
            if len(parts) < 5:
                continue
            taxid, _name, acc, cat_field, status = parts[:5]
            ok = ((dna and acc.startswith(ALL_GENOMIC_PREFIXES))
                  or (rna and acc.startswith(RNA_PREFIXES))
                  or (mrna and acc.startswith(M_RNA_PREFIXES)))
            if not ok:
                continue
            # the category field may list several categories
            if not any(c in cat_field for c in cats):
                continue
            if status and status not in stats:
                continue
            node = tree.get(taxid)
            if node is not None:
                amap.put(acc, node)
    return amap


def fna_file_name_relevant(filename: str, seq_type: str) -> bool:
    """ref: RefSeqFnaFilesDownloadGoal.isRelevantFileName."""
    if seq_type in ("RNA", "M_RNA", "ALL_RNA"):
        return filename.endswith((".rna.fna.gz", ".rna.fna"))
    if seq_type == "ALL":
        return filename.endswith((".genomic.fna.gz", ".genomic.fna",
                                  ".rna.fna.gz", ".rna.fna"))
    return filename.endswith((".genomic.fna.gz", ".genomic.fna"))


def category_for_file_name(filename: str, categories: list[str]) -> str | None:
    for cat in categories:
        if filename.startswith(cat + "."):
            return cat
    return None


def parse_files_installed(path) -> list[tuple[str, str]]:
    """Parse releaseN.files.installed: '<md5>\\t<filename>' per line
    (ref: CheckSumMapGoal.doMakeThis)."""
    out = []
    with open(path, encoding="utf-8") as f:
        for line in f:
            line = line.rstrip("\r\n")
            if "\t" in line:
                md5, _, name = line.partition("\t")
                out.append((md5, name))
    return out
