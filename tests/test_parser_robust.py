"""Fastq parser robustness: the block-vectorized fast parser must produce
EXACTLY the robust line parser's output for any well-formed input, including
the reference's tolerated shapes — multi-line sequence/quality records
(ref doReadFastq:299-341), CRLF line endings, blank lines between records,
and truncated tails that force the mid-stream fallback."""

import io

import numpy as np
import pytest

from genestrip_tpu.io.reads import BatchPacker, parse_fastq, parse_fastq_blocks


def _collect(data: bytes, parser, batch=7, **kw):
    packer = BatchPacker(batch, with_probs=True)
    out = []
    for b in parser(io.BytesIO(data), packer, **kw):
        for i in range(b.n):
            out.append((bytes(b.descriptors[i]), bytes(b.seqs[i]),
                        bytes(b.probs[i]), int(b.lengths[i]),
                        b.codes[i, : b.lengths[i]].tolist()))
    return out


def _random_fastq(rng, n_reads, *, crlf=False, multiline=False,
                  blank_lines=False):
    eol = b"\r\n" if crlf else b"\n"
    recs = []
    expected = []
    for i in range(n_reads):
        ln = int(rng.integers(1, 200))
        seq = rng.choice(list(b"ACGTNacgt"), size=ln).astype(np.uint8).tobytes()
        qual = rng.choice(list(b"!IJK~"), size=ln).astype(np.uint8).tobytes()
        desc = b"@r%d some description %d" % (i, i)
        if blank_lines and rng.random() < 0.3:
            recs.append(eol)
        recs.append(desc + eol)
        if multiline and ln > 3 and rng.random() < 0.5:
            cut = int(rng.integers(1, ln))
            recs.append(seq[:cut] + eol + seq[cut:] + eol)
            qcut = int(rng.integers(1, ln))
            recs.append(b"+" + eol)
            recs.append(qual[:qcut] + eol + qual[qcut:] + eol)
        else:
            recs.append(seq + eol)
            recs.append(b"+" + eol)
            recs.append(qual + eol)
        expected.append((desc, seq, qual, ln))
    return b"".join(recs), expected


@pytest.mark.parametrize("crlf,multiline,blank", [
    (False, False, False),
    (True, False, False),
    (False, True, False),
    (False, False, True),
    (True, True, True),
])
def test_block_parser_equals_robust(crlf, multiline, blank):
    rng = np.random.default_rng(hash((crlf, multiline, blank)) % 2**31)
    data, expected = _random_fastq(rng, 300, crlf=crlf, multiline=multiline,
                                   blank_lines=blank)
    fast = _collect(data, parse_fastq_blocks)
    robust = _collect(data, parse_fastq)
    assert fast == robust
    assert len(fast) == len(expected)
    for got, (desc, seq, qual, ln) in zip(fast, expected):
        assert got[0] == desc
        assert got[1] == seq
        assert got[2] == qual
        assert got[3] == ln


def test_block_parser_small_blocks_force_carry():
    """Tiny block size exercises the carry path across record boundaries."""
    rng = np.random.default_rng(99)
    data, expected = _random_fastq(rng, 120)
    fast = _collect(data, parse_fastq_blocks, block_size=257)
    robust = _collect(data, parse_fastq)
    assert fast == robust and len(fast) == len(expected)


def test_truncated_tail():
    """A final record missing its quality line: both parsers agree."""
    data = (b"@r0 x\nACGT\n+\nIIII\n"
            b"@r1 y\nGGTT\n+\nII")       # truncated qual
    fast = _collect(data, parse_fastq_blocks)
    robust = _collect(data, parse_fastq)
    assert fast == robust
    assert len(fast) == 2
    assert fast[1][1] == b"GGTT"


def test_fasta_as_reads_multiline_crlf():
    from genestrip_tpu.io.reads import parse_fasta_as_reads
    data = (b">s1 first\r\nACGT\r\nTTAA\r\n"
            b">s2 second\r\nGG\r\n")
    packer = BatchPacker(4)
    out = []
    for b in parse_fasta_as_reads(io.BytesIO(data), packer):
        for i in range(b.n):
            out.append((bytes(b.descriptors[i]), bytes(b.seqs[i])))
    assert out == [(b"@s1 first", b"ACGTTTAA"), (b"@s2 second", b"GG")]
