"""BGZF (io/bgzf.py): writer emits valid gzip readable by the stdlib;
the parallel reader inflates bit-identically; StreamingResource
auto-detects BGZF vs plain gzip; a Matcher run over a bgzip'd fastq equals
the plain-gzip run byte for byte."""

import gzip
import io

import numpy as np
import pytest

from fixtures import write_mini_taxonomy
from test_match_parity import build_world, make_reads, K

from genestrip_tpu.io.bgzf import (
    BgzfWriter, is_bgzf_header, open_bgzf)
from genestrip_tpu.io.streams import StreamingResource
from genestrip_tpu.match.matcher import Matcher
from genestrip_tpu.match.pipeline import MatchConfig


def _payload(n=1_000_000, seed=0):
    rng = np.random.default_rng(seed)
    # compressible, line-structured payload
    return b"".join(b"@read%d\n" % i + bytes(rng.choice(list(b"ACGT"), 80))
                    + b"\n" for i in range(n // 90))


def test_writer_is_valid_gzip_and_reader_roundtrip(tmp_path):
    data = _payload()
    p = tmp_path / "x.bin.gz"
    with open(p, "wb") as f, BgzfWriter(f) as w:
        for i in range(0, len(data), 100_000):
            w.write(data[i:i + 100_000])
    # stdlib gzip reads BGZF transparently (concatenated members)
    assert gzip.open(p, "rb").read() == data
    # header is detected as BGZF
    head = open(p, "rb").read(18)
    assert is_bgzf_header(head)
    assert not is_bgzf_header(gzip.compress(b"hello")[:18])
    # parallel reader roundtrip, including small-read and readline access
    with open(p, "rb") as f:
        r = open_bgzf(f)
        got = r.read()
    assert got == data
    with open(p, "rb") as f:
        r = open_bgzf(f)
        lines = [r.readline() for _ in range(4)]
    assert b"".join(lines) == data[: sum(len(l) for l in lines)]


def test_streaming_resource_detects_bgzf(tmp_path, monkeypatch):
    import os as _os
    data = _payload(200_000, seed=1)
    pb = tmp_path / "a.fastq.gz"
    with open(pb, "wb") as f, BgzfWriter(f) as w:
        w.write(data)
    pg = tmp_path / "b.fastq.gz"
    with gzip.open(pg, "wb") as f:
        f.write(data)
    # parallel path engages only with >2 usable cores (streams.py gate);
    # force it regardless of this machine's core count
    monkeypatch.setattr(_os, "sched_getaffinity", lambda pid: set(range(4)),
                        raising=False)
    from genestrip_tpu.io.bgzf import _BgzfRaw
    st = StreamingResource(str(pb)).open()
    assert isinstance(st.raw, _BgzfRaw)          # parallel reader engaged
    assert st.read() == data
    st2 = StreamingResource(str(pg)).open()
    assert not isinstance(st2.raw, _BgzfRaw)     # plain gzip stays serial
    assert st2.read() == data
    # and with a small core count the serial path serves BGZF too
    monkeypatch.setattr(_os, "sched_getaffinity", lambda pid: {0, 1},
                        raising=False)
    st3 = StreamingResource(str(pb)).open()
    assert not isinstance(st3.raw, _BgzfRaw)
    assert st3.read() == data


def test_matcher_bgzf_equals_gzip(tmp_path):
    rng = np.random.default_rng(555)
    table, small, genomes = build_world(tmp_path, rng)
    reads = make_reads(rng, genomes, n_reads=300)
    raw = b"".join(b"@" + d.encode() + b"\n" + s + b"\n+\n"
                   + b"I" * len(s) + b"\n" for d, s in reads)
    pg = tmp_path / "r.fastq.gz"
    with gzip.open(pg, "wb") as f:
        f.write(raw)
    pb = tmp_path / "rb.fastq.gz"
    with open(pb, "wb") as f, BgzfWriter(f) as w:
        w.write(raw)

    def run(path):
        m = Matcher(table, small, MatchConfig(k=K), db_md5="x", batch_size=64)
        m.progress = False
        kraken = io.BytesIO()
        m.run([str(path)], kraken_out=kraken)
        return m, kraken.getvalue()

    mg, kg = run(pg)
    mb, kb = run(pb)
    assert kg == kb
    np.testing.assert_array_equal(mg.kmers, mb.kmers)
    np.testing.assert_array_equal(mg.reads, mb.reads)
    assert (mg.total_reads, mg.total_kmers) == (mb.total_reads, mb.total_kmers)
