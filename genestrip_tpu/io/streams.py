"""Stream providers: gzip-transparent, byte-counted, URL-or-file inputs.

Reference equivalents: base io/StreamProvider.java (gzip by filename suffix),
io/StreamingResource.java family (uniform file/URL streaming with byte-read
counting feeding progress/throughput logging).
"""

from __future__ import annotations

import gzip
import io
import os
import urllib.request
from pathlib import Path


def is_gzip_name(name: str) -> bool:
    return name.endswith(".gz") or name.endswith(".gzip")


class ByteCountingRaw(io.RawIOBase):
    """Wraps a raw binary stream, counting compressed bytes read."""

    def __init__(self, raw):
        self._raw = raw
        self.bytes_read = 0

    def readable(self):
        return True

    def readinto(self, b):
        n = self._raw.readinto(b)
        if n:
            self.bytes_read += n
        return n

    def close(self):
        self._raw.close()
        super().close()


class StreamingResource:
    """A (re-)streamable input: a local file or a URL, optionally gzipped.

    `type_hint` carries fasta/fastq detection by suffix, mirroring the
    reference's StreamingResource.getTypeHint().
    """

    def __init__(self, source, assume_gzip: bool | None = None, name: str | None = None):
        self.source = str(source)
        self.name = name or os.path.basename(self.source.split("?")[0])
        self.assume_gzip = assume_gzip
        self.counter: ByteCountingRaw | None = None

    @property
    def is_url(self) -> bool:
        return "://" in self.source and not self.source.startswith("file://")

    def size(self) -> int | None:
        if not self.is_url:
            p = self._local_path()
            try:
                return os.path.getsize(p)
            except OSError:
                return None
        return None

    def _local_path(self) -> str:
        if self.source.startswith("file://"):
            return self.source[len("file://"):]
        return self.source

    @property
    def type_hint(self) -> str | None:
        base = self.name
        for gz in (".gz", ".gzip"):
            if base.endswith(gz):
                base = base[: -len(gz)]
        if base.endswith((".fastq", ".fq")):
            return "fastq"
        if base.endswith((".fasta", ".fa", ".fna")):
            return "fasta"
        return None

    def open(self) -> io.BufferedReader:
        """Open for reading, gzip-decompressed if applicable, byte-counted."""
        if self.is_url:
            raw = urllib.request.urlopen(self.source)
            gz = self.assume_gzip if self.assume_gzip is not None else is_gzip_name(self.name)
        else:
            raw = open(self._local_path(), "rb", buffering=0)
            gz = is_gzip_name(self.name)
        self.counter = ByteCountingRaw(raw)
        buffered = io.BufferedReader(self.counter, buffer_size=1 << 20)
        if gz:
            return io.BufferedReader(gzip.GzipFile(fileobj=buffered), buffer_size=1 << 20)
        return buffered

    def __repr__(self):
        return f"StreamingResource({self.source})"


def open_input(path) -> io.BufferedReader:
    """Gzip-transparent buffered input stream for a file path."""
    return StreamingResource(path).open()


def open_output(path):
    """Gzip-transparent buffered output stream by filename suffix
    (ref: StreamProvider.getOutputStreamForFile)."""
    path = str(path)
    if is_gzip_name(path):
        # Stable bytes: fixed mtime so identical content => identical file.
        return gzip.GzipFile(path, "wb", compresslevel=5, mtime=0)
    return open(path, "wb", buffering=1 << 20)


def resources_from_paths(paths, assume_gzip_urls: bool = True) -> list[StreamingResource]:
    out = []
    for p in paths:
        if isinstance(p, StreamingResource):
            out.append(p)
        else:
            s = str(p)
            gz = None
            if "://" in s and assume_gzip_urls:
                gz = True
            out.append(StreamingResource(s, assume_gzip=gz))
    return out
