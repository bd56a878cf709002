"""External Kraken/KrakenUniq interop: run the binary, parse its output.

Reference equivalents: kraken/KrakenExecutor.java:40-120 (MessageFormat
command template `{0}`=bin `{1}`=db `{2}`=fastqs `{3}`=classOut, streamed
stdout, non-zero exit -> error), kraken/KrakenResultProcessor.java:60-160
(per-line parse of the Kraken output format with a listener per taxid:count
segment) and goals/kraken/KrakenResCountGoal.java:100-180 (per-taxid
read/k-mer stats, optionally restricted to a taxid set). The reference uses
this as its flagship parity harness against KrakenUniq; here it serves the
same role wherever a kraken binary is available (config keys `krakenBin`,
`krakenExecExpr`, `krakenDB`).
"""

from __future__ import annotations

import logging
import shlex
import subprocess
from dataclasses import dataclass, field
from pathlib import Path

log = logging.getLogger("genestrip")


def _quote(arg: str) -> str:
    return shlex.quote(str(arg))


class KrakenExecutor:
    """Builds and runs an external kraken command from a template.

    The template uses Java MessageFormat-style positional arguments
    (ref KrakenExecutor.java:46-83): {0}=binary, {1}=database,
    {2}=space-separated fastq files, {3}=classification output file.
    """

    def __init__(self, bin_path: str, exec_command: str = "{0} -db {1} {2}"):
        self.bin = _quote(bin_path)
        self.exec_command = exec_command

    def gen_exec_line(self, database: str, fastqs, class_out=None) -> str:
        fq = " ".join(_quote(Path(f).resolve()) for f in fastqs)
        return self.exec_command.format(
            self.bin, _quote(database), fq,
            _quote(Path(class_out).resolve()) if class_out is not None else "")

    @property
    def with_file_for_output(self) -> bool:
        """Whether the template writes classification to a file (uses {3})."""
        return "{3}" in self.exec_command

    def execute(self, database: str, fastqs, class_out=None, out_handler=None):
        """Run the command; stream stdout to out_handler(stream) if given.

        Raises RuntimeError on a non-zero exit (ref execute2's
        IllegalStateException)."""
        line = self.gen_exec_line(database, fastqs, class_out)
        log.info("Run kraken with %s", line)
        proc = subprocess.Popen(line, shell=True, stdout=subprocess.PIPE)
        try:
            if out_handler is not None:
                out_handler(proc.stdout)
            else:
                while proc.stdout.read(1 << 16):
                    pass
        finally:
            proc.stdout.close()
            rc = proc.wait()
        if rc != 0:
            raise RuntimeError(f"kraken exited with {rc}: {line}")


@dataclass
class KrakenResStats:
    """Per-taxid kraken result statistics (ref KrakenResCountGoal.KrakenResStats)."""

    taxid: str
    reads: int = 0
    kmers: int = 0
    kmers_in_matching_reads: int = 0


class KrakenResultProcessor:
    """Parses Kraken-style classification output.

    Line format: `C|U <tab> descriptor <tab> taxid <tab> readLen <tab>
    taxid:count taxid:count ...`. The listener is called once per segment
    with (line_no, descriptor, class_taxid, bps, pos, segment_taxid, count);
    segments tagged 'A' (ambiguous) are skipped, exactly like the reference
    (KrakenResultProcessor.java:137-160). Returns accumulated per-taxid
    total k-mer counts."""

    def process(self, stream, listener=None) -> dict[str, int]:
        totals: dict[str, int] = {}
        line_no = 0
        for raw in stream:
            line = raw.rstrip(b"\n").rstrip(b"\r")
            if not line:
                continue
            line_no += 1
            parts = line.split(b"\t")
            if len(parts) < 5:
                continue
            descriptor = parts[1]
            class_taxid = parts[2].decode()
            bps = int(parts[3])
            pos = 0
            for seg in parts[4].split(b" "):
                c = seg.rfind(b":")
                if c <= 0:
                    continue
                tag = seg[:c]
                count = int(seg[c + 1:])
                if tag != b"A":
                    taxid = tag.decode()
                    totals[taxid] = totals.get(taxid, 0) + count
                    if listener is not None:
                        listener(line_no, descriptor, class_taxid, bps, pos,
                                 taxid, count)
                pos += count
        return totals


def count_kraken_results(executor: KrakenExecutor, database: str, fastqs,
                         taxids=None) -> list[KrakenResStats]:
    """Runs kraken over fastqs and accumulates per-taxid stats.

    Reference: KrakenResCountGoal.computeStats:100-180 — per segment the
    k-mer count goes to the segment's taxid; once per read (line) the read
    count goes to the classification taxid, plus kmersInMatchingReads when
    the first segment's taxid equals it. Restricted to `taxids` when given.
    """
    if executor.with_file_for_output:
        raise IOError("krakencount does not work with an outfile parameter "
                      "(like in krakenuniq)")
    stats: dict[str, KrakenResStats] = {}
    last_line = [-1]

    def get(taxid: str) -> KrakenResStats:
        s = stats.get(taxid)
        if s is None:
            s = stats[taxid] = KrakenResStats(taxid)
        return s

    def listener(line_no, descriptor, class_taxid, bps, pos, taxid, count):
        if taxids is None or taxid in taxids:
            get(taxid).kmers += count
        if line_no != last_line[0]:
            last_line[0] = line_no
            if taxids is None or class_taxid in taxids:
                s = get(class_taxid)
                s.reads += 1
                if taxid == class_taxid:
                    s.kmers_in_matching_reads += count

    proc = KrakenResultProcessor()
    executor.execute(database, fastqs,
                     out_handler=lambda st: proc.process(st, listener))
    return sorted(stats.values(), key=lambda s: s.taxid)
