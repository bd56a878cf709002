"""Fastq/fasta read parsing into padded, 2-bit-packed device batches.

Reference equivalent: core fastq/AbstractFastqReader.java — its producer
thread parses reads into pooled byte buffers consumed by matcher threads
(ref: doReadFastq:288-368, doReadFasta:375-438). The TPU pipeline instead
packs reads into fixed-shape batches:

  codes   [B, L] uint8 (2-bit code, BAD for non-CGAT/padding)
  lengths [B]    int32
plus per-read descriptors and raw line spans for output rewriting.

Padded length L is bucketed to bound the number of distinct compiled shapes.
Multi-line fastq (sequence lines until a '+' line) and multi-line fasta are
supported exactly like the reference.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from genestrip_tpu.utils.dna import BAD, CODE_TABLE, CODE_TABLE_LOWER


@dataclass
class ReadBatch:
    codes: np.ndarray            # [B, L] uint8
    lengths: np.ndarray          # [B] int32
    descriptors: list[bytes]     # raw descriptor lines incl. leading '@'
    seqs: list[bytes]            # raw sequence bytes (for rewriting output)
    probs: list[bytes] | None    # quality strings, or None
    read_no0: int                # read number of the first read in this batch
    is_long: bool = False        # singleton batch holding one long read

    @property
    def n(self) -> int:
        return len(self.lengths)


def _bucket_len(n: int, min_len: int = 64) -> int:
    """Round padded length up a geometric ladder (1.25x steps) to bound
    the number of distinct XLA shapes."""
    L = min_len
    while L < n:
        L = max(L + 64, int(L * 1.25) // 64 * 64)
    return L


class BatchPacker:
    """Accumulates parsed reads and emits packed ReadBatches.

    Reads longer than `long_threshold` bases are emitted as singleton
    batches flagged `is_long`, cutting the current batch first so emission
    order equals read order (the matcher routes them through the chunked
    long-read path — SURVEY.md §5.7; ref matchlr, Goals.md:15)."""

    def __init__(self, batch_size: int, lowercase: bool = True,
                 with_probs: bool = False, long_threshold: int | None = None):
        self.batch_size = batch_size
        self.table = CODE_TABLE_LOWER if lowercase else CODE_TABLE
        self.with_probs = with_probs
        self.long_threshold = long_threshold
        self._descs: list[bytes] = []
        self._seqs: list[bytes] = []
        self._probs: list[bytes] = []
        self._ready: list[ReadBatch] = []
        self._read_no = 0

    def reset_read_no(self):
        self._read_no = 0

    def add(self, desc: bytes, seq: bytes, prob: bytes | None = None):
        if self.long_threshold is not None and len(seq) > self.long_threshold:
            if self._seqs:
                self._ready.append(self._pack())
            self._descs.append(desc)
            self._seqs.append(seq)
            if self.with_probs:
                self._probs.append(prob or b"")
            self._ready.append(self._pack(is_long=True))
            return
        self._descs.append(desc)
        self._seqs.append(seq)
        if self.with_probs:
            self._probs.append(prob or b"")
        if len(self._seqs) >= self.batch_size:
            self._ready.append(self._pack())

    def __len__(self):
        return len(self._seqs)

    def full(self) -> bool:
        return bool(self._ready) or len(self._seqs) >= self.batch_size

    def flush(self) -> ReadBatch | None:
        if self._ready:
            return self._ready.pop(0)
        if not self._seqs:
            return None
        return self._pack()

    def _pack(self, is_long: bool = False) -> ReadBatch:
        B = len(self._seqs)
        lengths = np.fromiter((len(s) for s in self._seqs), dtype=np.int32, count=B)
        L = _bucket_len(int(lengths.max(initial=1)))
        codes = np.full((B, L), BAD, dtype=np.uint8)
        flat = self.table[np.frombuffer(b"".join(self._seqs), dtype=np.uint8)]
        starts = np.zeros(B + 1, dtype=np.int64)
        np.cumsum(lengths, out=starts[1:])
        rows = np.repeat(np.arange(B), lengths)
        cols = np.arange(starts[-1]) - np.repeat(starts[:-1], lengths)
        codes[rows, cols] = flat
        batch = ReadBatch(codes, lengths, self._descs, self._seqs,
                          self._probs if self.with_probs else None, self._read_no,
                          is_long=is_long)
        self._read_no += B
        self._descs, self._seqs, self._probs = [], [], []
        return batch


def parse_fastq(stream, packer: BatchPacker):
    """Parse fastq from a binary stream, yielding ReadBatches.

    Sequence lines are joined until a line starting with '+'
    (ref: AbstractFastqReader.doReadFastq:299-307); quality lines are read
    until their total length reaches the sequence length (:318-341).
    """
    readline = stream.readline
    while True:
        desc = readline()
        if not desc:
            break
        desc = desc.rstrip(b"\r\n")
        if not desc:
            continue
        seq_parts = []
        seq_len = 0
        while True:
            line = readline()
            if not line or line.startswith(b"+"):
                break
            line = line.rstrip(b"\r\n")
            seq_parts.append(line)
            seq_len += len(line)
        seq = b"".join(seq_parts)
        prob_parts = []
        prob_len = 0
        while prob_len < seq_len:
            line = readline()
            if not line:
                break
            line = line.rstrip(b"\r\n")
            prob_parts.append(line)
            prob_len += len(line)
        packer.add(desc, seq, b"".join(prob_parts) if packer.with_probs else None)
        while packer.full():
            yield packer.flush()
    while True:
        b = packer.flush()
        if b is None:
            break
        yield b


def parse_fasta_as_reads(stream, packer: BatchPacker):
    """Parse fasta from a binary stream as reads, yielding ReadBatches.

    Descriptors get their '>' replaced by '@' (ref: doReadFasta:380).
    """
    readline = stream.readline
    desc = None
    seq_parts: list[bytes] = []
    while True:
        line = readline()
        if not line:
            break
        if line.startswith(b">"):
            if desc is not None:
                packer.add(desc, b"".join(seq_parts))
                while packer.full():
                    yield packer.flush()
            desc = b"@" + line[1:].rstrip(b"\r\n")
            seq_parts = []
        elif desc is not None:
            seq_parts.append(line.rstrip(b"\r\n"))
    if desc is not None:
        packer.add(desc, b"".join(seq_parts))
    while True:
        b = packer.flush()
        if b is None:
            break
        yield b


def parse_reads(stream, packer: BatchPacker, fasta: bool):
    return (parse_fasta_as_reads if fasta else parse_fastq)(stream, packer)
