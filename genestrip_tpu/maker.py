"""The goal DAG: wires every pipeline goal for a project.

Reference equivalent: GSMaker.java (createGoals:122-483 builds the ~50-goal
graph; convenience API match()/filter()/matchResult():502-663). Goal names
match the reference's GSGoalKey names (see the reference's Goals.md) so CLI
usage carries over.
"""

from __future__ import annotations

import datetime
import glob as globmod
import logging
import os
import zipfile
from pathlib import Path

from genestrip_tpu import __version__
from genestrip_tpu.db import build as dbbuild
from genestrip_tpu.db import genbank as gb
from genestrip_tpu.db.download import download, file_md5
from genestrip_tpu.db import refseq as rs
from genestrip_tpu.io.streams import (
    StreamingResource, is_gzip_name, open_input, open_output,
)
from genestrip_tpu.make.goal import FileGoal, Goal, Maker, MkdirGoal, ObjectGoal
from genestrip_tpu.match.filter import FastqFilter
from genestrip_tpu.match.matcher import Matcher
from genestrip_tpu.match.pipeline import MatchConfig
from genestrip_tpu.project import (
    DB_CREATION_DATE, GENESTRIP_TITLE, GENESTRIP_VERSION, Project, REFSEQ_RELEASE,
)
from genestrip_tpu.report.reporter import write_dbinfo, write_match_report
from genestrip_tpu.store.database import Database
from genestrip_tpu.store.index import KmerIndex
from genestrip_tpu.tax.small import SmallTaxTree
from genestrip_tpu.tax.tree import TaxTree, collect_tax_nodes

log = logging.getLogger("genestrip")

TAX_DMP_ZIP = "taxdmp.zip"


def _ncbi_url(p, path: str) -> str:
    """NCBI URL honoring useHttp: HTTP at httpBaseURL, else anonymous FTP at
    ftpBaseURL (ref: make/FileDownloadGoal.java:183-207 — the FTP path;
    urllib handles ftp:// URLs natively)."""
    if p["useHttp"]:
        return p["httpBaseURL"] + path
    return "ftp://" + p["ftpBaseURL"] + path


def _refseq_url(p, path: str) -> str:
    """RefSeq URL honoring useHttp (ref: RefSeqDownloadGoal getFTPDir —
    the FTP directory is /refseq/<path> on refseq.ftpBaseURL)."""
    if p["useHttp"]:
        return p["refseq.httpBaseURL"] + path
    return "ftp://" + p["refseq.ftpBaseURL"] + "/refseq" + path


class GSMaker:
    """Builds and owns the goal graph for one project."""

    def __init__(self, project: Project, fastq_args: list[str] | None = None,
                 map_file: str | None = None, key: str | None = None,
                 taxids_arg: str | None = None,
                 download_fastqs: str | None = None):
        """download_fastqs: None (stream URLs directly), 'project' (-l:
        download URL fastqs to the project fastq dir first) or 'common'
        (-ll: to the shared common fastq dir) — ref
        goals/FastqMapTransformGoal.java:38-90 + FastqDownloadsGoal.java."""
        if download_fastqs not in (None, "project", "common"):
            raise ValueError(f"download_fastqs must be None/'project'/'common', got {download_fastqs}")
        self.project = project
        self.maker = Maker()
        self.fastq_args = fastq_args or []
        self.map_file = map_file
        self.key = key
        self.taxids_arg = taxids_arg
        self.download_fastqs = download_fastqs
        self._create_goals()

    # -- convenience API (ref: GSMaker.match/filter :502-663) ---------------

    def goal(self, name: str) -> Goal:
        return self.maker.goal(name)

    def match(self, key: str, paths: list[str], lr: bool = False):
        self.fastq_args = list(paths)
        self.key = key
        self.maker.goals["rawfastqmap"].dump()
        self.maker.goals["fastqmap"].dump()
        self.goal("matchlr" if lr else "match").clean()
        # capture the result value before make(): the match goal's completion
        # auto-releases the matchres ObjectGoal (ref ObjectGoal.java:56-58)
        res = self.goal("matchreslr" if lr else "matchres").get().get(key)
        self.goal("matchlr" if lr else "match").make()
        return res

    def filter(self, key: str, paths: list[str]):
        self.fastq_args = list(paths)
        self.key = key
        self.maker.goals["rawfastqmap"].dump()
        self.maker.goals["fastqmap"].dump()
        self.goal("filter").clean()
        self.goal("filter").make()

    def dump_all(self):
        self.maker.dump_all()

    # -- DAG construction ----------------------------------------------------

    def _create_goals(self):
        p = self.project
        m = self.maker
        reg = m.register

        commonsetup = reg(MkdirGoal(p, "commonsetup", [
            p.common.common_dir, p.common.refseq_dir, p.common.genbank_dir,
            p.common.fastq_dir, p.common.fasta_dir]))
        setup = reg(MkdirGoal(p, "setup", [
            p.project_dir, p.fasta_dir, p.fastq_dir, p.db_dir, p.csv_dir,
            p.krakenout_dir, p.log_dir, p.genbank_dir], deps=[commonsetup]))

        # ---- taxonomy ----
        taxdownload = reg(_TaxDownloadGoal(p, deps=[commonsetup]))
        taxtree = reg(ObjectGoal(p, "taxtree", deps=[taxdownload],
                                 func=lambda: self._load_taxtree(taxdownload)))
        taxnodes = reg(ObjectGoal(p, "taxnodes", deps=[taxtree, setup], func=lambda: collect_tax_nodes(
            taxtree.get(), p.taxids_file, p["rankCompletionDepth"])))

        # ---- refseq metadata ----
        categories = reg(ObjectGoal(p, "categories", deps=[setup],
                                    func=lambda: rs.read_categories(p.categories_file)))
        refseqrelease = reg(_ReleaseNumberGoal(p, deps=[commonsetup]))
        refseqcat = reg(_CatalogDownloadGoal(p, refseqrelease, deps=[commonsetup]))
        checksummap = reg(ObjectGoal(p, "checksummap", deps=[refseqcat], func=lambda: dict(
            (name, md5) for md5, name in rs.parse_files_installed(refseqcat.installed_file))))
        refseqfna = reg(_FnaFilesDownloadGoal(p, categories, refseqcat, checksummap))
        accmap = reg(ObjectGoal(p, "accmap", deps=[taxtree, categories, refseqcat],
                                func=lambda: rs.build_accession_map(
                                    StreamingResource(str(refseqcat.catalog_file)),
                                    taxtree.get(), categories.get(),
                                    p["seqType"], p["refseq.status"])))

        # ---- genbank (ref: GSMaker.java:278-292) ----
        taxfromgenbank = reg(ObjectGoal(
            p, "taxfromgenbank", deps=[categories, taxnodes, accmap],
            func=lambda: gb.tax_nodes_for_genbank(
                taxnodes.get(),
                # the accession map (and thus the RefSeq catalog) is only
                # needed when the region-count limit is actually active
                (accmap.get().region_counts
                 if p["refseq.filldb"] and p["refSeq.limitForGenbankAccess"] > 0
                 and p["seqType"] != "RNA" else {}),
                p["refSeq.limitForGenbankAccess"], p["refSeq.limitForGenbankRank"],
                p["refseq.filldb"], p["seqType"])))
        assemblydownload = reg(_AssemblyDownloadGoal(p, deps=[commonsetup]))
        # assemblydownload is deliberately NOT a (strong) dependency: it is
        # only made on demand inside _genbank_entries when the wanted-node set
        # is non-empty (ref: FastaFilesFromGenbankGoal.isWeakDependency).
        fastasgenbank = reg(ObjectGoal(
            p, "fastasgenbank", deps=[taxtree, taxfromgenbank],
            func=lambda: self._genbank_entries(
                taxtree.get(), taxfromgenbank.get(), assemblydownload)))
        fastasgenbankdl = reg(_GenbankFnaDownloadGoal(p, fastasgenbank))

        # ---- additional fastas ----
        adddownloads = reg(_AdditionalDownloadsGoal(p, deps=[setup]))
        addfastas = reg(ObjectGoal(
            p, "addfastas",
            deps=[taxtree, adddownloads, fastasgenbank, fastasgenbankdl],
            func=lambda: self._additional_fastas(
                taxtree.get(), fastasgenbank, fastasgenbankdl)))

        # ---- db build ----
        filldb = reg(ObjectGoal(p, "filldb",
                                deps=[taxtree, taxnodes, categories, accmap, refseqfna,
                                      addfastas, setup],
                                func=lambda: self._fill_db(
                                    taxtree.get(), taxnodes.get(), categories.get(),
                                    accmap, refseqfna, addfastas.get())))
        tempdb = reg(_SaveDBGoal(p, "tempdb", p.temp_db_file, filldb))
        loadtempdb = reg(ObjectGoal(p, "loadtempdb", deps=[tempdb],
                                    func=lambda: self._load_db_file(p.temp_db_file, tempdb)))
        updatedb = reg(ObjectGoal(p, "updatedb",
                                  deps=[taxtree, taxnodes, categories, accmap, refseqfna,
                                        addfastas, loadtempdb],
                                  func=lambda: self._update_db(
                                      taxtree.get(), taxnodes.get(), categories.get(),
                                      accmap, refseqfna, addfastas.get(), loadtempdb.get())))
        db = reg(_FinalDBGoal(p, updatedb, tempdb))
        loaddb = reg(ObjectGoal(p, "loaddb", deps=[db],
                                func=lambda: self._load_db_file(p.db_file, db)))
        # heavy allocators log heap at INFO (ref Goal.logHeapInfo:277-290)
        for heavy in (filldb, updatedb, loaddb):
            heavy.log_heap_info = True
        dbconf = reg(ObjectGoal(p, "dbconf", deps=[db],
                                func=lambda: Database.load_config_info(p.db_file)))
        reg(_ShowDBConfGoal(p, dbconf))
        reg(_DBInfoGoal(p, "dbinfo", p.db_info_file, loaddb))
        reg(_DBInfoGoal(p, "tempdbinfo", p.temp_db_info_file, loadtempdb))

        # ---- filtering index ----
        fillindex = reg(ObjectGoal(p, "fillindex", deps=[loaddb],
                                   func=lambda: KmerIndex.from_database(loaddb.get())))
        index = reg(_SaveIndexGoal(p, fillindex))
        loadindex = reg(ObjectGoal(p, "loadindex", deps=[index],
                                   func=lambda: KmerIndex.load_npz(p.index_file)))

        # ---- analysis ----
        rawfastqmap = reg(ObjectGoal(p, "rawfastqmap", deps=[setup], func=self._fastq_map))
        fastqdownloads = reg(_FastqDownloadsGoal(p, rawfastqmap, self.download_fastqs))
        fastqmap = reg(ObjectGoal(
            p, "fastqmap", deps=[rawfastqmap, fastqdownloads],
            func=lambda: self._transform_fastq_map(rawfastqmap.get(), fastqdownloads)))
        matchres = reg(_MatchResGoal(p, "matchres", loaddb, fastqmap, classify=True))
        matchreslr = reg(_MatchResGoal(p, "matchreslr", loaddb, fastqmap, classify=False))
        reg(_MatchGoal(p, "match", matchres, fastqmap))
        reg(_MatchGoal(p, "matchlr", matchreslr, fastqmap))
        reg(_FilterGoal(p, loadindex, fastqmap))
        reg(_ExtractGoal(p, fastqmap))
        reg(_Fasta2FastqGoal(p, fastqmap))
        db2fastqtaxids = reg(ObjectGoal(p, "db2fastqtaxids", deps=[loaddb],
                                        func=lambda: self._db2fastq_taxids(loaddb.get())))
        reg(_DB2FastqGoal(p, loaddb, db2fastqtaxids))
        reg(_SVGTaxTreeGoal(p, loaddb))

        # ---- db quality (ref: ft module, FinerTreeMaker.java:46-119) ----
        dbqualitycounts = reg(ObjectGoal(
            p, "dbqualitycounts",
            deps=[taxtree, taxnodes, categories, accmap, refseqfna, addfastas,
                  loaddb],
            func=lambda: self._db_quality_counts(
                categories.get(), accmap, refseqfna, addfastas.get(),
                loaddb.get())))
        reg(_DBQualityCSVGoal(p, loaddb, dbqualitycounts))

        # ---- kraken interop (ref: goals/kraken/KrakenResCountGoal.java,
        #      KrakenResFileGoal.java — the reference's external parity
        #      harness; needs a kraken binary on PATH or krakenBin) ----
        krakencount = reg(ObjectGoal(
            p, "krakencount", deps=[fastqmap, taxnodes],
            func=lambda: self._kraken_count(fastqmap.get(), taxnodes.get())))
        reg(_KrakenResGoal(p, krakencount, fastqmap))

        # ---- refseq extraction (ref: GSMaker.java:302-307) ----
        extractrefseqfasta = reg(ObjectGoal(
            p, "extractrefseqfasta",
            deps=[taxtree, taxnodes, categories, accmap, refseqfna, setup],
            func=lambda: self._extract_refseq_fastas(
                taxnodes.get(), categories.get(), accmap, refseqfna)))
        reg(_ExtractRefSeqCSVGoal(p, extractrefseqfasta))

        reg(Goal(p, "genall", deps=[db, index], user_goal=True))
        reg(_ClearGoal(p))
        reg(_DBDownloadGoal(p))

        for name in ("db", "dbinfo", "db2fastq", "index", "match", "matchlr",
                     "filter", "extract", "svgtaxtree", "genall", "clear",
                     "fasta2fastq", "dbquality"):
            m.goals[name].user_goal = True

    # -- goal bodies ---------------------------------------------------------

    def _load_taxtree(self, taxdownload) -> TaxTree:
        return TaxTree(self.project.common.common_dir)

    def _load_db_file(self, path, goal) -> Database:
        return Database.load(path)

    def _build_opts(self, update: bool = False) -> dbbuild.BuildOptions:
        p = self.project
        o = dbbuild.BuildOptions(
            k=p["kMerSize"], max_dust=p["maxDust"], step_size=p["stepSize"],
            lowercase=p["lowerCaseBases"],
            max_genomes_per_taxid=p["maxGenomesPerTaxid"],
            max_kmers_per_taxid=p["maxKMersPerTaxid"],
            complete_genomes_only=p["refseq.completeGenomesOnly"],
            data_nodes=p["dataNodes"], file_nodes=p["fileNodes"],
            id_nodes=p["idNodes"], min_update=p["minUpdate"],
            update_complete_genomes_only=p["refseq.updateWithCompleteGenomesOnly"])
        o.max_genomes_rank = p["maxPerTaxidRank"]
        return o

    def _db_input_files(self, categories, refseqfna, additional: dict):
        """(refseq files, additional {path: node}) honoring refseq.filldb."""
        files = []
        if self.project["refseq.filldb"]:
            for f in refseqfna.files:
                if rs.category_for_file_name(os.path.basename(str(f)), categories):
                    files.append(f)
        return files, additional

    def _fill_db(self, tree, tax_nodes, categories, accmap_goal, refseqfna,
                 additional) -> Database:
        p = self.project
        opts = self._build_opts()
        use_refseq = p["refseq.filldb"]
        amap = accmap_goal.get() if use_refseq else None
        filler = dbbuild.DBFiller(tree, tax_nodes, amap, opts)
        files, additional = self._db_input_files(categories, refseqfna, additional)
        items = ([(f, None) for f in files]
                 + [(f, node) for f, node in additional.items()])
        filler.feed_items(items, threads=p["threads"])
        table = filler.build()
        tree.init_positions()
        small = SmallTaxTree.from_tax_tree(tree)
        for node in tax_nodes:
            i = small.get(node.tax_id)
            if i >= 0:
                small.requested[i] = True
        db = Database(table, small, p.all_properties())
        db.init_store_indices()
        log.info("Filled database: %d k-mers (%d incl. duplicates)",
                 table.entries, filler.total_kmers)
        return db

    def _update_db(self, tree, tax_nodes, categories, accmap_goal, refseqfna,
                   additional, filled: Database) -> Database:
        p = self.project
        opts = self._build_opts(update=True)
        amap = accmap_goal.get() if p["refseq.filldb"] else None
        updater = dbbuild.DBUpdater(tree, filled.table, tax_nodes, amap, opts,
                                    chunk_kmers=p["dbBuildChunkKMers"],
                                    device_update=p["dbDeviceUpdate"])
        files, additional = self._db_input_files(categories, refseqfna, additional)
        items = ([(f, None) for f in files]
                 + [(f, node) for f, node in additional.items()])
        updater.feed_items(items, threads=p["threads"])
        updater.finalize()
        log.info("KMers moved via update: %d", updater.kmers_moved)
        p.additional_properties[GENESTRIP_VERSION] = __version__
        p.additional_properties[GENESTRIP_TITLE] = "genestrip-tpu"
        p.additional_properties[DB_CREATION_DATE] = \
            datetime.datetime.now().strftime("%Y/%m/%d %H:%M:%S")
        return Database(filled.table, filled.tree, p.all_properties())

    def _genbank_entries(self, tree: TaxTree, wanted_nodes, assemblydownload) -> dict:
        """Select Genbank assembly entries per tax node
        (ref: goals/genbank/FastaFilesFromGenbankGoal.doMakeThis:103-150)."""
        p = self.project
        if not wanted_nodes:
            return {}
        # Optimization carried over from the reference: only download the
        # assembly summary when it is actually needed (weak dependency).
        assemblydownload.make()
        qualities = gb.parse_quality_list(p["genbank.fastaQualities"])
        entries, total = gb.read_assembly_summary(
            p.common.genbank_dir / gb.ASSEMBLY_SUM_GENBANK, tree,
            filter_nodes=set(wanted_nodes), qualities=qualities,
            reference_only=p["genbank.referenceOnly"])
        entries = gb.cap_entries_keep_best(entries, p["genbank.maxPerTaxid"])
        log.info("Genbank entries selected for download: %d (of %d total rows)",
                 sum(len(v) for v in entries.values()), total)
        return entries

    def _additional_fastas(self, tree: TaxTree, fastasgenbank=None,
                           fastasgenbankdl=None) -> dict:
        """Parse additional.txt: '<taxid> <file> [<URL> [<md5>]]'
        (ref: goals/AdditionalFastasGoal + AdditionalDownloadsGoal), then merge
        downloaded Genbank fastas (ref: AdditionalFastasGoal.java:108-116)."""
        p = self.project
        out = {}
        if fastasgenbank is not None and fastasgenbank.get():
            fastasgenbankdl.make()
            for node, entries in fastasgenbank.get().items():
                for e in entries:
                    path = p.common.genbank_dir / e.file_name
                    if path.exists():
                        out[path] = node
        f = p.additional_file
        if not f.exists():
            return out
        for line in f.read_text().splitlines():
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split()
            if len(parts) < 2:
                continue
            taxid, fname = parts[0], parts[1]
            node = tree.get(taxid)
            if node is None:
                log.warning("Unknown taxid in additional file (omitting fasta files for it): %s", taxid)
                continue
            # URL entries / downloads.txt entries were fetched by the
            # adddownloads dependency (ref AdditionalDownloadsGoal); resolve
            # project fasta dir first, then the shared common fasta dir.
            path = p.fasta_file_from_path(fname)
            if path is None:
                log.warning("Ignoring missing file %s.", fname)
                continue
            out[path] = node
        return out

    def _db_quality_counts(self, categories, accmap_goal, refseqfna,
                           additional, db):
        """Run the quality scan over the same inputs as the update phase
        (ref: ft FinerTreeMaker + DBQualityCountsGoal)."""
        from genestrip_tpu import ft
        p = self.project
        opts = self._build_opts()
        amap = accmap_goal.get() if p["refseq.filldb"] else None
        scanner = ft.QualityScanner(db, amap, opts)
        files, additional = self._db_input_files(categories, refseqfna, additional)
        for f in files:
            scanner.feed_file(f)
        for f, node in additional.items():
            scanner.feed_file(f, mapped_node=node)
        return scanner.finish()

    def _kraken_count(self, fastq_map, tax_nodes):
        """Run the external kraken binary over each input key and accumulate
        per-taxid read/k-mer stats (ref: goals/kraken/KrakenResCountGoal.java
        :100-180), restricted to the requested tax nodes when taxids.txt
        exists. Inputs must be local files (ref uses StreamingFileResource)."""
        from genestrip_tpu.kraken import KrakenExecutor, count_kraken_results
        p = self.project
        executor = KrakenExecutor(p["krakenBin"], p["krakenExecExpr"])
        taxids = {n.tax_id for n in tax_nodes} if tax_nodes else None
        out = {}
        for key, resources in fastq_map.items():
            files = []
            for res in resources:
                if res.is_url:
                    raise IOError(f"krakencount needs local files, got URL "
                                  f"{res.source} (use -l/-ll to download)")
                files.append(res._local_path())
            out[key] = count_kraken_results(executor, p["krakenDB"], files,
                                            taxids)
        return out

    def _extract_refseq_fastas(self, tax_nodes, categories, accmap_goal,
                               refseqfna) -> dict[str, str]:
        """Split the bundled RefSeq fna files into one fasta per included
        accession (ref: goals/refseq/ExtractRefSeqFastasGoal.java). Headers
        are rewritten to '>name|kraken:taxid|<taxid>' for kraken2 library
        compatibility. Returns {region name: taxid}."""
        from genestrip_tpu.io.fasta import iter_fasta_regions
        p = self.project
        amap = accmap_goal.get()
        complete_only = p["refseq.completeGenomesOnly"]
        gzip_out = p["reqseq.extract.gzip"]
        nodes = set(tax_nodes)
        descr2taxid: dict[str, str] = {}
        files = [f for f in refseqfna.files
                 if rs.category_for_file_name(os.path.basename(str(f)), categories)]
        for f in files:
            if not Path(f).exists():
                continue
            with open_input(f) as stream:
                for header, seq in iter_fasta_regions(stream):
                    sp = header.find(b" ")
                    name = (header[:sp] if sp >= 0 else header).decode()
                    node = amap.get(name, complete_only)
                    if node is None or (nodes and node not in nodes):
                        continue
                    descr2taxid[name] = node.tax_id
                    out = p.fasta_dir / (name + (".fa.gz" if gzip_out else ".fa"))
                    with open_output(out) as w:
                        w.write(f">{name}|kraken:taxid|{node.tax_id}\n".encode())
                        for i in range(0, len(seq), 70):
                            w.write(seq[i:i + 70])
                            w.write(b"\n")
        return descr2taxid

    def _fastq_map(self) -> dict[str, list]:
        """Parse -f/-m into {key: [StreamingResource]} (ref: goals/FastqMapGoal)."""
        p = self.project
        out: dict[str, list] = {}

        def resolve(spec: str) -> list:
            if "://" in spec:
                # alwaysAssumeGzip=false falls back to name-based detection
                # (ref GSConfigKey.java:122-125), it does not force plain.
                gz = True if p["alwaysAssumeGzip"] else None
                return [StreamingResource(spec, assume_gzip=gz)]
            for base in (Path("."), p.fastq_dir, p.common.fastq_dir,
                         p.common.base_dir / "fastq"):
                matches = sorted(globmod.glob(str(base / spec))) if any(
                    ch in spec for ch in "*?[") else (
                    [str(base / spec)] if (base / spec).exists() else [])
                if matches:
                    return [StreamingResource(mp) for mp in matches]
            if Path(spec).exists():
                return [StreamingResource(spec)]
            raise FileNotFoundError(f"fastq not found: {spec}")

        if self.map_file:
            for line in Path(self.map_file).read_text().splitlines():
                line = line.strip()
                if not line or line.startswith("#"):
                    continue
                key, _, spec = line.partition(" ")
                if spec.strip():
                    out.setdefault(key.strip(), []).extend(resolve(spec.strip()))
        for spec in self.fastq_args:
            key = self.key
            if key is None:
                name = os.path.basename(spec.split("?")[0])
                key = self.project.file_base_name(name)
            out.setdefault(key, []).extend(resolve(spec))
        return out

    def _transform_fastq_map(self, raw: dict[str, list], downloads) -> dict[str, list]:
        """Replace URL resources with their local download targets when -l/-ll
        is active (ref: goals/FastqMapTransformGoal.java:70-111); otherwise
        pass the map through unchanged."""
        if not self.download_fastqs:
            return raw
        downloads.make()
        out: dict[str, list] = {}
        for key, resources in raw.items():
            lst = []
            for res in resources:
                target = downloads.target_for(res, key)
                lst.append(StreamingResource(str(target)) if target is not None
                           else res)
            out[key] = lst
        return out

    def _db2fastq_taxids(self, db: Database) -> list[str]:
        """ref: goals/DB2FastqTaxNodesGoal — '-tx a,b+,c' with '+' meaning
        include descendants from the database's tax tree."""
        tree = db.tree
        arg = self.taxids_arg
        if not arg:
            arg_list = self.project["taxids"]
        else:
            arg_list = [t for t in arg.split(",") if t]
        if not arg_list:
            return list(tree.taxids)
        out = []
        for t in arg_list:
            desc = t.endswith("+")
            t = t[:-1] if desc else t
            i = tree.get(t)
            if i < 0:
                continue
            if desc:
                lo, hi = int(tree.tin[i]), int(tree.tout[i])
                out.extend(tree.taxids[lo:hi])
            else:
                out.append(t)
        return out


# ---------------------------------------------------------------------------
# concrete goals
# ---------------------------------------------------------------------------

class _TaxDownloadGoal(FileGoal):
    def __init__(self, project, deps):
        common = project.common.common_dir
        super().__init__(project, "taxdownload",
                         [common / "nodes.dmp", common / "names.dmp"], deps)

    def do_make(self):
        if self.is_made():
            return
        p = self.project
        common = p.common.common_dir
        zip_path = common / TAX_DMP_ZIP
        url = _ncbi_url(p, "/pub/taxonomy/" + TAX_DMP_ZIP)
        download(url, zip_path, tries=p["maxDownloadTries"])
        with zipfile.ZipFile(zip_path) as z:
            for name in ("nodes.dmp", "names.dmp"):
                z.extract(name, common)
        zip_path.unlink(missing_ok=True)

    def keep_on_clean_all(self):
        return True


class _ReleaseNumberGoal(FileGoal):
    def __init__(self, project, deps):
        self.release_file = project.common.refseq_dir / "RELEASE_NUMBER"
        super().__init__(project, "refseqrelease", [self.release_file], deps)

    def make_file(self, f):
        p = self.project
        download(_refseq_url(p, "/release/RELEASE_NUMBER"), f,
                 tries=p["maxDownloadTries"])

    def release_number(self) -> str:
        self.make()
        return self.release_file.read_text().strip()

    def keep_on_clean_all(self):
        return True


class _CatalogDownloadGoal(FileGoal):
    """ref: goals/refseq/RefSeqCatalogDownloadGoal."""

    def __init__(self, project, release_goal, deps):
        super().__init__(project, "refseqcat", None, deps + [release_goal])
        self.release_goal = release_goal

    def _resolve(self):
        n = self.release_goal.release_number()
        refseq_dir = self.project.common.refseq_dir
        self.catalog_file = refseq_dir / f"RefSeq-release{n}.catalog.gz"
        self.installed_file = refseq_dir / f"release{n}.files.installed"
        self._files = [self.catalog_file, self.installed_file]

    @property
    def files(self):
        if not self._files:
            self._resolve()
        return self._files

    def is_made(self):
        if not self._files:
            if not self.release_goal.is_made():
                return False
            self._resolve()
        return super().is_made()

    def make_file(self, f):
        p = self.project
        url = _refseq_url(p, "/release/release-catalog/" + f.name)
        download(url, f, tries=p["maxDownloadTries"])

    def keep_on_clean_all(self):
        return True


class _FnaFilesDownloadGoal(FileGoal):
    """ref: goals/refseq/RefSeqFnaFilesDownloadGoal — file list derived from
    files.installed, filtered by category and sequence type."""

    def __init__(self, project, categories_goal, catalog_goal, checksum_goal):
        super().__init__(project, "refseqfna", None,
                         [categories_goal, catalog_goal, checksum_goal])
        self.categories_goal = categories_goal
        self.catalog_goal = catalog_goal
        self.checksum_goal = checksum_goal
        self.file2cat = {}

    def _resolve(self):
        p = self.project
        self.catalog_goal.make()
        cats = self.categories_goal.get()
        seq_type = p["seqType"]
        files = []
        for _md5, name in rs.parse_files_installed(self.catalog_goal.installed_file):
            if not rs.fna_file_name_relevant(name, seq_type):
                continue
            cat = rs.category_for_file_name(name, cats)
            if cat is None:
                continue
            f = p.common.refseq_dir / cat / name
            files.append(f)
            self.file2cat[f] = cat
        self._files = files

    @property
    def files(self):
        if not self._files:
            self._resolve()
        return self._files

    def is_made(self):
        if not self._files:
            try:
                self._resolve()
            except Exception:
                return False
        return super().is_made()

    def make_file(self, f):
        p = self.project
        cat = self.file2cat[f]
        url = _refseq_url(p, "/release/" + cat + "/" + f.name)
        md5 = self.checksum_goal.get().get(f.name)
        try:
            download(url, f, md5=md5, tries=p["maxDownloadTries"],
                     use_md5_cache=p["checkSumCacheFile"])
        except IOError:
            if not p["ignoreMissingFastas"]:
                raise
            log.warning("Ignoring missing fasta %s", f.name)

    def keep_on_clean_all(self):
        return True


class _AssemblyDownloadGoal(FileGoal):
    """Download assembly_summary_genbank.txt
    (ref: goals/genbank/AssemblyFileDownloadGoal, FTP dir /genomes/genbank)."""

    def __init__(self, project, deps):
        super().__init__(project, "assemblydownload",
                         [project.common.genbank_dir / gb.ASSEMBLY_SUM_GENBANK],
                         deps)

    def make_file(self, f):
        p = self.project
        download(_ncbi_url(p, "/genomes/genbank/" + f.name), f,
                 tries=p["maxDownloadTries"])

    def keep_on_clean_all(self):
        return True


class _GenbankFnaDownloadGoal(FileGoal):
    """Download the selected Genbank assembly fastas
    (ref: goals/genbank/FastaFilesGenbankDownloadGoal)."""

    def __init__(self, project, entries_goal):
        super().__init__(project, "fastasgenbankdl", None, [entries_goal])
        self.entries_goal = entries_goal
        self._url_by_name = {}

    def _resolve(self):
        p = self.project
        files = []
        for entries in self.entries_goal.get().values():
            for e in entries:
                f = p.common.genbank_dir / e.file_name
                files.append(f)
                self._url_by_name[f.name] = e.download_url
        self._files = files

    @property
    def files(self):
        if not self._files:
            self._resolve()
        return self._files

    def is_made(self):
        if not self._files:
            if not self.entries_goal.is_made():
                return False
            self._resolve()
            if not self._files:
                return True
        return super().is_made()

    def do_make(self):
        self._resolve()
        super().do_make()

    def make_file(self, f):
        p = self.project
        try:
            download(self._url_by_name[f.name], f, tries=p["maxDownloadTries"])
        except IOError:
            if not p["ignoreMissingFastas"]:
                raise
            log.warning("Ignoring missing Genbank fasta %s", f.name)

    def keep_on_clean_all(self):
        return True


class _DBQualityCSVGoal(FileGoal):
    """Quality CSV (ref: ft DBQualityCSVGoal)."""

    def __init__(self, project, loaddb_goal, counts_goal):
        super().__init__(project, "dbquality",
                         [project.output_file("dbquality", "csv")],
                         [counts_goal])
        self.loaddb_goal = loaddb_goal
        self.counts_goal = counts_goal

    def make_file(self, f):
        from genestrip_tpu import ft
        with open(f, "w", encoding="utf-8") as out:
            ft.write_quality_csv(self.loaddb_goal.get(), self.counts_goal.get(),
                                 out)


class _ExtractRefSeqCSVGoal(FileGoal):
    """Manifest CSV of the extracted per-accession fastas
    (ref: goals/refseq/ExtractRefSeqCSVGoal.java)."""

    def __init__(self, project, extract_goal):
        super().__init__(project, "extractrefseqcsv",
                         [project.output_file("extractrefseqcsv", "csv")],
                         [extract_goal])
        self.extract_goal = extract_goal

    def make_file(self, f):
        descr2taxid = self.extract_goal.get()
        with open(f, "w", encoding="utf-8") as out:
            out.write("refseq descr; taxid;\n")
            for name, taxid in descr2taxid.items():
                out.write(f"{name};{taxid};\n")


class _AdditionalDownloadsGoal(Goal):
    """Downloads for additional fastas (ref: goals/AdditionalDownloadsGoal.java
    :60-140): entries of the project's additional.txt with a URL are fetched
    to the *project* fasta dir; URL-less entries missing locally are looked up
    in the shared <common>/fasta/downloads.txt ('<file> <URL> [<md5>]') and
    fetched to the *common* fasta dir."""

    DOWNLOADS_NAME = "downloads.txt"

    def __init__(self, project, deps):
        super().__init__(project, "adddownloads", deps)

    def _plan(self) -> list[tuple]:
        """[(target path, url, md5 | None)] for entries still missing."""
        p = self.project
        plan = []
        f = p.additional_file
        if not f.exists():
            return plan
        unresolved = []
        for line in f.read_text().splitlines():
            parts = line.strip().split()
            if not parts or parts[0].startswith("#") or len(parts) < 2:
                continue
            fname = parts[1]
            if len(parts) >= 3:
                plan.append((p.fasta_dir / fname, parts[2],
                             parts[3] if len(parts) > 3 else None))
            elif p.fasta_file_from_path(fname) is None:
                unresolved.append(fname)
        dl = p.common.fasta_dir / self.DOWNLOADS_NAME
        if unresolved and dl.exists():
            wanted = set(unresolved)
            for line in dl.read_text().splitlines():
                parts = line.strip().split()
                if len(parts) >= 2 and parts[0] in wanted:
                    plan.append((p.common.fasta_dir / parts[0], parts[1],
                                 parts[2] if len(parts) > 2 else None))
        return plan

    def is_made(self) -> bool:
        return all(t.exists() for t, _, _ in self._plan())

    def do_make(self) -> None:
        for target, url, md5 in self._plan():
            if not target.exists():
                target.parent.mkdir(parents=True, exist_ok=True)
                download(url, target, md5=md5,
                         tries=self.project["maxDownloadTries"])

    def clean_this(self) -> None:
        pass  # downloads are kept on clean (ref: cleanable=false goal flag)


class _FastqDownloadsGoal(Goal):
    """Downloads URL fastq resources to local files when -l/-ll is active
    (ref: goals/FastqDownloadsGoal.java). Target naming follows the
    reference's getOutputFile: <project>_<key>[_<n>].fastq[.gz] under the
    project (-l) or common (-ll) fastq dir."""

    def __init__(self, project, rawmap_goal, mode: str | None):
        super().__init__(project, "fastqdownloads", [rawmap_goal])
        self.rawmap_goal = rawmap_goal
        self.mode = mode

    def _dir(self):
        return (self.project.common.fastq_dir if self.mode == "common"
                else self.project.fastq_dir)

    def target_for(self, res: StreamingResource, key: str, n: int = None) -> Path | None:
        """Local target path for a URL resource, None for local resources."""
        if "://" not in res.source:
            return None
        if n is None:
            n = self._index_of(res, key)
        gz = is_gzip_name(res.name) or res.assume_gzip
        suffix = ".fastq.gz" if gz else ".fastq"
        infix = key if n == 0 else f"{key}_{n}"
        import urllib.parse
        infix = urllib.parse.quote_plus(infix)[:256]
        return self._dir() / f"{self.project.name}_{infix}{suffix}"

    def _index_of(self, res, key) -> int:
        urls = [r for r in self.rawmap_goal.get().get(key, [])
                if "://" in r.source]
        for i, r in enumerate(urls):
            if r is res:
                return i
        return 0

    def _plan(self):
        if not self.mode:
            return []
        out = []
        for key, resources in self.rawmap_goal.get().items():
            n = 0
            for res in resources:
                if "://" in res.source:
                    out.append((res, self.target_for(res, key, n)))
                    n += 1
        return out

    def is_made(self) -> bool:
        if not self.mode:
            return True
        return all(t.exists() and t.stat().st_size > 0 for _, t in self._plan())

    def do_make(self) -> None:
        for res, target in self._plan():
            if not (target.exists() and target.stat().st_size > 0):
                target.parent.mkdir(parents=True, exist_ok=True)
                download(res.source, target,
                         tries=self.project["maxDownloadTries"])

    def clean_this(self) -> None:
        pass  # downloaded inputs are kept on clean


class _SaveDBGoal(FileGoal):
    """ref: goals/refseq/StoreDBGoal — save a database object to a zip."""

    def __init__(self, project, name, path, source_goal):
        super().__init__(project, name, [path], [source_goal])
        self.source_goal = source_goal

    def make_file(self, f):
        self.source_goal.get().save(f)


class _FinalDBGoal(FileGoal):
    """Save the final db zip; delete the temp db afterwards
    (ref: GSMaker.java:323-353 dependentMade hook + removeTempDB)."""

    def __init__(self, project, updatedb, tempdb):
        super().__init__(project, "db", [project.db_file], [updatedb])
        self.updatedb = updatedb
        self.tempdb = tempdb

    def make_file(self, f):
        self.updatedb.get().save(
            f, include_hash=self.project["dbSaveLookupHash"])
        if self.project["removeTempDB"]:
            self.tempdb.clean()
            tdi = self.project.temp_db_info_file
            if tdi.exists():
                tdi.unlink()


class _DBInfoGoal(FileGoal):
    def __init__(self, project, name, path, db_goal):
        super().__init__(project, name, [path], [db_goal])
        self.db_goal = db_goal

    def make_file(self, f):
        db = self.db_goal.get()
        write_dbinfo(db.tree, db.stats(), db.k, db.table.entries, db.md5, f)


class _ShowDBConfGoal(Goal):
    def __init__(self, project, dbconf):
        super().__init__(project, "showdbconf", [dbconf])
        self.dbconf = dbconf

    def do_make(self):
        for k, v in sorted(self.dbconf.get().items()):
            print(f"{k}={v}")

    def is_made(self):
        return False


class _SaveIndexGoal(FileGoal):
    def __init__(self, project, fillindex):
        super().__init__(project, "index", [project.index_file], [fillindex])
        self.fillindex = fillindex

    def make_file(self, f):
        self.fillindex.get().save_npz(f)


class _MatchResGoal(ObjectGoal):
    """ref: goals/MatchResultGoal — runs the matcher per key, holding
    {key: MatchingResult}; optionally writes filtered/kraken-out files."""

    def __init__(self, project, name, loaddb, fastqmap, classify: bool):
        super().__init__(project, name, [loaddb, fastqmap])
        self.loaddb = loaddb
        self.fastqmap = fastqmap
        self.classify = classify

    def do_make(self):
        p = self.project
        db = self.loaddb.get()
        cfg = MatchConfig(
            k=db.k,
            max_paths=p["maxClassificationPaths"],
            classify=self.classify and p["classifyReads"],
            with_unique=p["countUniqueKMers"],
            with_counts=p["maxKMerResCounts"] > 0,
            max_read_tax_error=p["maxReadTaxErrorCount"],
            max_read_class_error=p["maxReadClassErrorCount"],
            threshold=p["minKMersForClass"],
            return_labels=False,
        )
        results = {}
        for key, resources in self.fastqmap.get().items():
            matcher = Matcher(db.table, db.tree, cfg, db_md5=db.md5 or "",
                              batch_size=p["matchBatchSize"],
                              max_kmer_res_counts=p["maxKMerResCounts"],
                              write_all=p["writeAll"],
                              shard_db=p["dbShard"],
                              shard_db_min_bytes=p["dbShardMinBytes"],
                              prebuilt_hash=getattr(db, "prebuilt_hash", None))
            matcher.with_probs = p["withProbs"]
            matcher.progress = p["progressBar"]
            matcher.progress_interval_ms = p["progressBarUpdateMs"]
            matcher.threads = p["threads"]
            gz = p["gzipFastqOutput"]
            filtered = kraken = None
            # multi-host: per-read outputs are host-local shards (suffix
            # .pN for N > 0); merged stats are identical on every process
            from genestrip_tpu.parallel import distributed as _dist
            pid = _dist.process_index()
            suff = (lambda f: f.with_name(f.name + f".p{pid}")) if pid else (lambda f: f)
            try:
                if p["writeFilteredFastq"]:
                    filtered = open_output(suff(p.output_file(
                        self.name, "fastq_res", key=key, gzip=gz)))
                if p["writeKrakenStyleOut"]:
                    kraken = open_output(suff(p.output_file(
                        self.name, "kraken_out", key=key, gzip=False)))
                res = matcher.run(resources, filtered_out=filtered, kraken_out=kraken)
            finally:
                if filtered:
                    filtered.close()
                if kraken:
                    kraken.close()
            res.complete_results(db.tree, db.stats())
            results[key] = res
        self.set(results)


class _MatchGoal(FileGoal):
    """ref: goals/MatchGoal — writes the match CSV per key."""

    def __init__(self, project, name, matchres, fastqmap):
        super().__init__(project, name, None, [matchres, fastqmap])
        self.matchres = matchres
        self.fastqmap = fastqmap

    @property
    def files(self):
        self._files = [
            self.project.output_file(self.name, "csv", key=key)
            for key in self.fastqmap.get().keys()]
        return self._files

    def is_made(self):
        try:
            return bool(self.files) and super().is_made()
        except Exception:
            return False

    def do_make(self):
        for key in self.fastqmap.get().keys():
            f = self.project.output_file(self.name, "csv", key=key)
            if not f.exists():
                f.parent.mkdir(parents=True, exist_ok=True)
                write_match_report(self.matchres.get()[key], f)


class _KrakenResGoal(FileGoal):
    """Writes per-taxid kraken stats CSV per key
    (ref: goals/kraken/KrakenResFileGoal.java:70-107)."""

    def __init__(self, project, krakencount, fastqmap):
        super().__init__(project, "krakenres", None, [krakencount])
        self.krakencount = krakencount
        self.fastqmap = fastqmap

    @property
    def files(self):
        # Output keys come from fastqmap (cheap), NOT from krakencount.get()
        # — that would execute the external kraken binary just to answer
        # is_made() and defeat FileGoal memoization
        # (ref: KrakenResFileGoal.provideFiles enumerates fastqMapGoal keys).
        self._files = [
            self.project.output_file(self.name, "kraken_out_res", key=key)
            for key in self.fastqmap.get().keys()]
        return self._files

    def is_made(self):
        try:
            return bool(self.files) and super().is_made()
        except Exception:
            return False

    def do_make(self):
        for key, stats in self.krakencount.get().items():
            f = self.project.output_file(self.name, "kraken_out_res", key=key)
            if f.exists():
                continue
            f.parent.mkdir(parents=True, exist_ok=True)
            with open(f, "w", encoding="utf-8") as out:
                out.write("taxid;reads;kmers;kmers in matching reads\n")
                for s in stats:
                    out.write(f"{s.taxid};{s.reads};{s.kmers};"
                              f"{s.kmers_in_matching_reads};\n")


class _FilterGoal(FileGoal):
    """ref: goals/FilterGoal."""

    def __init__(self, project, loadindex, fastqmap):
        super().__init__(project, "filter", None, [loadindex, fastqmap])
        self.loadindex = loadindex
        self.fastqmap = fastqmap

    @property
    def files(self):
        gz = self.project["gzipFastqOutput"]
        self._files = [
            self.project.output_file("filter", "fastq_res", key=key, gzip=gz)
            for key in self.fastqmap.get().keys()]
        return self._files

    def is_made(self):
        try:
            return bool(self.files) and super().is_made()
        except Exception:
            return False

    def do_make(self):
        p = self.project
        gz = p["gzipFastqOutput"]
        index = self.loadindex.get()
        for key, resources in self.fastqmap.get().items():
            out_path = p.output_file("filter", "fastq_res", key=key, gzip=gz)
            if out_path.exists():
                continue
            out_path.parent.mkdir(parents=True, exist_ok=True)
            ff = FastqFilter(index, min_pos_count=p["minPosCountFilter"],
                             pos_ratio=p["posRatioFilter"],
                             batch_size=p["matchBatchSize"],
                             with_probs=p["withProbs"])
            dumped = None
            filtered = open_output(out_path)
            try:
                if p["writeDumpedFastq"]:
                    dumped = open_output(p.output_file(
                        "dumped", "fastq_res", base_file=out_path.name, gzip=gz))
                ff.run(resources, filtered, dumped)
            finally:
                filtered.close()
                if dumped:
                    dumped.close()
            log.info("Filter %s: accepted %d/%d reads", key, ff.accepted, ff.total)


class _ExtractGoal(FileGoal):
    """ref: goals/ExtractGoal — copy reads whose descriptor starts with
    extractKey (after the '@')."""

    def __init__(self, project, fastqmap):
        super().__init__(project, "extract", None, [fastqmap])
        self.fastqmap = fastqmap

    @property
    def files(self):
        gz = self.project["gzipFastqOutput"]
        self._files = [
            self.project.output_file("extract", "fastq_res", key=key, gzip=gz)
            for key in self.fastqmap.get().keys()]
        return self._files

    def is_made(self):
        try:
            return bool(self.files) and super().is_made()
        except Exception:
            return False

    def do_make(self):
        from genestrip_tpu.io.reads import BatchPacker, parse_reads
        p = self.project
        gz = p["gzipFastqOutput"]
        key_prefix = p["extractKey"].encode()
        for key, resources in self.fastqmap.get().items():
            out_path = p.output_file("extract", "fastq_res", key=key, gzip=gz)
            out_path.parent.mkdir(parents=True, exist_ok=True)
            with open_output(out_path) as out:
                for res in resources:
                    fasta = res.type_hint == "fasta"
                    packer = BatchPacker(1024)
                    with res.open() as stream:
                        for batch in parse_reads(stream, packer, fasta):
                            for i in range(batch.n):
                                if batch.descriptors[i][1:].startswith(key_prefix):
                                    out.write(batch.descriptors[i] + b"\n" +
                                              batch.seqs[i] + b"\n+\n" +
                                              (batch.probs[i] if batch.probs else
                                               b"~" * len(batch.seqs[i])) + b"\n")


class _Fasta2FastqGoal(FileGoal):
    """ref: goals/Fasta2FastqGoal — rewrite fasta input as fastq."""

    def __init__(self, project, fastqmap):
        super().__init__(project, "fasta2fastq", None, [fastqmap])
        self.fastqmap = fastqmap

    @property
    def files(self):
        gz = self.project["gzipFastqOutput"]
        self._files = [
            self.project.output_file("fasta2fastq", "fastq_res", key=key, gzip=gz)
            for key in self.fastqmap.get().keys()]
        return self._files

    def is_made(self):
        try:
            return bool(self.files) and super().is_made()
        except Exception:
            return False

    def do_make(self):
        from genestrip_tpu.io.fasta import iter_fasta_regions
        p = self.project
        gz = p["gzipFastqOutput"]
        for key, resources in self.fastqmap.get().items():
            out_path = p.output_file("fasta2fastq", "fastq_res", key=key, gzip=gz)
            out_path.parent.mkdir(parents=True, exist_ok=True)
            with open_output(out_path) as out:
                for res in resources:
                    with res.open() as stream:
                        for header, seq in iter_fasta_regions(stream):
                            out.write(b"@" + header + b"\n" + seq + b"\n+\n" +
                                      b"~" * len(seq) + b"\n")


class _DB2FastqGoal(FileGoal):
    """ref: goals/DB2FastqGoal — dump each taxid's stored k-mers as reads."""

    def __init__(self, project, loaddb, taxids_goal):
        super().__init__(project, "db2fastq", None, [loaddb, taxids_goal])
        self.loaddb = loaddb
        self.taxids_goal = taxids_goal

    @property
    def files(self):
        self._files = [
            self.project.output_file("db2fastq", "fastq", key=t, gzip=True)
            for t in self.taxids_goal.get()]
        return self._files

    def is_made(self):
        try:
            return bool(self.files) and super().is_made()
        except Exception:
            return False

    def do_make(self):
        import numpy as np
        from genestrip_tpu.utils.dna import u64_to_seq
        db = self.loaddb.get()
        k = db.k
        table = db.table
        for taxid in self.taxids_goal.get():
            f = self.project.output_file("db2fastq", "fastq", key=taxid, gzip=True)
            if f.exists():
                continue
            f.parent.mkdir(parents=True, exist_ok=True)
            vi = table.get_index_for_value(taxid)
            with open_output(f) as out:
                if vi >= 0:
                    kmers = table.keys[table.value_idx == vi]
                    quality = b"~" * k
                    for i, km in enumerate(kmers.tolist()):
                        out.write(b"@" + taxid.encode() + b":" + str(i).encode() +
                                  b"\n" + u64_to_seq(km, k) + b"\n+\n" + quality + b"\n")


class _SVGTaxTreeGoal(FileGoal):
    """ref: goals/refseq/SVGTaxTreeGoal — compact SVG taxonomy rendering."""

    def __init__(self, project, loaddb):
        super().__init__(project, "svgtaxtree",
                         [project.output_file("svgtaxtree", "svg")], [loaddb])
        self.loaddb = loaddb

    def make_file(self, f):
        from genestrip_tpu.report.svg import write_svg_taxtree
        db = self.loaddb.get()
        write_svg_taxtree(self.project, db, f)


class _ClearGoal(Goal):
    """ref: 'clear' — delete all files in csv, log and krakenout."""

    def __init__(self, project):
        super().__init__(project, "clear", [], user_goal=True)

    def do_make(self):
        for d in (self.project.csv_dir, self.project.log_dir,
                  self.project.krakenout_dir):
            if d.is_dir():
                for f in d.iterdir():
                    if f.is_file():
                        f.unlink()

    def is_made(self):
        return False


class _DBDownloadGoal(FileGoal):
    """ref: goals/DBDownloadGoal — install a prebuilt database from a URL
    given in the project's 'db.url' property file entry."""

    def __init__(self, project):
        super().__init__(project, "dbdownload", [project.db_file], [])

    def make_file(self, f):
        p = self.project
        url_file = p.project_dir / "dbdownload.txt"
        if not url_file.exists():
            raise FileNotFoundError(
                "dbdownload requires a dbdownload.txt with '<URL> [<md5>]' in the project dir")
        parts = url_file.read_text().split()
        download(parts[0], f, md5=parts[1] if len(parts) > 1 else None,
                 tries=p["maxDownloadTries"])
