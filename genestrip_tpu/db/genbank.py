"""Genbank assembly-summary support: select additional genomes for tax ids
that RefSeq covers poorly, filtered by assembly quality.

Reference equivalents: genbank/AssemblySummaryReader.java (summary parse +
quality lattice), goals/genbank/TaxNodesFromGenbankGoal.java (which tax ids
need Genbank data), goals/genbank/FastaFilesFromGenbankGoal.java (per-taxid
entry selection capped at genbank.maxPerTaxid keeping the best quality),
goals/genbank/FastaFilesGenbankDownloadGoal.java (download file naming).
"""

from __future__ import annotations

import enum
import os
from dataclasses import dataclass

from genestrip_tpu.io.streams import open_input

ASSEMBLY_SUM_REFSEQ = "assembly_summary_refseq.txt"
ASSEMBLY_SUM_GENBANK = "assembly_summary_genbank.txt"

# ref: AssemblySummaryReader.REFERENCE_GENOME_CAT
REFERENCE_GENOME_CAT = "reference genome"


class AssemblyQuality(enum.IntEnum):
    """Assembly quality lattice; lower ordinal = better quality
    (ref: AssemblySummaryReader.AssemblyQuality:262-309)."""

    ADDITIONAL = 0
    COMPLETE_LATEST = 1
    COMPLETE = 2
    CHROMOSOME_LATEST = 3
    CHROMOSOME = 4
    SCAFFOLD_LATEST = 5
    SCAFFOLD = 6
    CONTIG_LATEST = 7
    CONTIG = 8
    LATEST = 9
    NONE = 10

    @staticmethod
    def from_strings(complete: str, latest: str) -> "AssemblyQuality":
        l = latest == "latest"
        table = {
            "Complete Genome": (AssemblyQuality.COMPLETE_LATEST, AssemblyQuality.COMPLETE),
            "Chromosome": (AssemblyQuality.CHROMOSOME_LATEST, AssemblyQuality.CHROMOSOME),
            "Scaffold": (AssemblyQuality.SCAFFOLD_LATEST, AssemblyQuality.SCAFFOLD),
            "Contig": (AssemblyQuality.CONTIG_LATEST, AssemblyQuality.CONTIG),
        }
        pair = table.get(complete)
        if pair is None:
            return AssemblyQuality.LATEST if l else AssemblyQuality.NONE
        return pair[0] if l else pair[1]


def parse_quality_list(value) -> list[AssemblyQuality]:
    """Parse the genbank.fastaQualities config list (comma separated names)."""
    parts = value if isinstance(value, (list, tuple)) else str(value).split(",")
    out = []
    for part in parts:
        part = str(part).strip().upper()
        if part:
            out.append(AssemblyQuality[part])
    return out


@dataclass
class AssemblyEntry:
    """One assembly-summary row relevant for download
    (ref: AssemblySummaryReader.AssemblyEntry:150-260)."""

    taxid: str
    ftp_url: str
    quality: AssemblyQuality
    is_reference: bool
    species_taxid: str

    @property
    def file_name(self) -> str:
        """`<ftp basename>_genomic.fna.gz` (ref: AssemblyEntry ctor :170-196)."""
        url = self.ftp_url.rstrip("/")
        return url.rsplit("/", 1)[-1] + "_genomic.fna.gz"

    @property
    def download_url(self) -> str:
        url = self.ftp_url.rstrip("/")
        return f"{url}/{self.file_name}"


def read_assembly_summary(path, tree, filter_nodes=None, qualities=None,
                          reference_only: bool = False,
                          use_species_taxid: bool = False):
    """Parse an NCBI assembly summary file, grouping relevant rows by tax node.

    Columns used (ref: AssemblySummaryReader.getRelevantEntries:105-145):
    4=refseq_category, 5=taxid, 6=species_taxid, 10=version_status,
    11=assembly_level, 19=ftp_path. Rows with < 20 columns are skipped.
    Returns (dict node -> [AssemblyEntry], total_row_count).
    """
    result: dict = {}
    total = 0
    with open_input(path) as fh:
        for raw in fh:
            line = raw.decode("utf-8", "replace") if isinstance(raw, bytes) else raw
            if line.startswith("#"):
                continue
            parts = line.rstrip("\n").split("\t")
            if len(parts) < 20:
                continue
            total += 1
            refgen, taxid, species_taxid = parts[4], parts[5], parts[6]
            latest, complete, ftp = parts[10], parts[11], parts[19]
            node = tree.get(species_taxid if use_species_taxid else taxid)
            if node is None or (filter_nodes is not None and node not in filter_nodes):
                continue
            quality = AssemblyQuality.from_strings(complete, latest)
            if qualities is not None and quality not in qualities:
                continue
            is_ref = refgen == REFERENCE_GENOME_CAT
            if reference_only and not is_ref:
                continue
            if not ftp or ftp == "na":
                continue
            result.setdefault(node, []).append(
                AssemblyEntry(taxid, ftp, quality, is_ref, species_taxid))
    return result, total


def cap_entries_keep_best(entries: dict, max_per_taxid: int) -> dict:
    """Cap per-taxid entries at max_per_taxid, keeping the best qualities
    (ref: FastaFilesFromGenbankGoal.doMakeThis:130-140 — sorts worst-first
    and drops from the front)."""
    if max_per_taxid <= 0:
        return entries
    out = {}
    for node, lst in entries.items():
        if len(lst) > max_per_taxid:
            # stable sort worst-quality first, drop from the front
            lst = sorted(lst, key=lambda e: -int(e.quality))[len(lst) - max_per_taxid:]
        out[node] = lst
    return out


def tax_nodes_for_genbank(tax_nodes, region_counts, limit: int,
                          check_rank: str | None, refseq_db: bool,
                          seq_type: str = "GENOMIC"):
    """Which requested tax nodes need Genbank data
    (ref: TaxNodesFromGenbankGoal.doMakeThis:72-96): all of them when the
    database is not RefSeq-based; otherwise those with fewer than `limit`
    RefSeq regions (optionally only nodes of rank `check_rank`)."""
    if not refseq_db:
        return set(tax_nodes)
    if seq_type == "RNA" or limit <= 0:
        return set()
    out = set()
    for node in tax_nodes:
        if check_rank is not None:
            rank = getattr(node, "rank", None)
            want = getattr(check_rank, "name", None) or str(check_rank)
            if rank is None or rank.name != want:
                continue
        if region_counts.get(node, 0) < limit:
            out.add(node)
    return out
