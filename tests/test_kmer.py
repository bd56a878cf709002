"""Codec + window k-mer tests.

Mirrors the reference's codec/rolling tests (core util/NextKMerTest.java,
util/CGATLongBufferTest.java): the vectorized all-window computation must
agree with a direct per-window scalar encoding, including canonicalization
and bad-base handling.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from genestrip_tpu.utils.dna import (
    BAD, seq_to_codes, codes_to_seq, kmer_to_u64_straight, kmer_to_u64_reverse,
    canonical_u64, u64_to_seq,
)
from genestrip_tpu.ops.kmer import window_kmers_np, window_kmers, split_u64, merge_u64


def scalar_windows(codes, k):
    """Direct per-window golden model."""
    W = max(len(codes) - k + 1, 0)
    out = np.zeros(W, dtype=np.uint64)
    valid = np.zeros(W, dtype=bool)
    for i in range(W):
        win = codes[i:i + k]
        s = kmer_to_u64_straight(win)
        if s >= 0:
            r = kmer_to_u64_reverse(win)
            out[i] = canonical_u64(s, r)
            valid[i] = True
    return out, valid


def test_codec_basics():
    codes = seq_to_codes(b"CGAT")
    assert list(codes) == [0, 1, 2, 3]
    assert seq_to_codes(b"cgat")[0] == 0
    assert seq_to_codes(b"cgat", lowercase=False)[0] == BAD
    assert seq_to_codes(b"NX-")[0] == BAD
    assert codes_to_seq(np.array([0, 1, 2, 3], dtype=np.uint8)) == b"CGAT"


def test_straight_reverse_example():
    # GGCA straight: G=1,G=1,C=0,A=2 -> 0b01_01_00_10
    codes = seq_to_codes(b"GGCA")
    assert kmer_to_u64_straight(codes) == 0b01010010
    # reverse complement of GGCA is TGCC -> T=3,G=1,C=0,C=0 -> 0b11_01_00_00
    assert kmer_to_u64_reverse(codes) == 0b11010000
    assert u64_to_seq(0b11010000, 4) == b"TGCC"


def test_window_kmers_np_matches_scalar():
    rng = np.random.default_rng(42)
    for k in (5, 16, 31):
        seq = rng.choice(list(b"CGATCGATCGATCGATN"), size=300).astype(np.uint8)
        codes = seq_to_codes(seq.tobytes())
        got, gvalid = window_kmers_np(codes, k)
        want, wvalid = scalar_windows(codes, k)
        np.testing.assert_array_equal(gvalid, wvalid)
        np.testing.assert_array_equal(got[gvalid], want[wvalid])


def test_window_kmers_device_matches_np():
    rng = np.random.default_rng(7)
    k = 31
    B, L = 4, 120
    lens = np.array([120, 45, 31, 30], dtype=np.int32)
    codes = np.full((B, L), BAD, dtype=np.uint8)
    for b in range(B):
        s = rng.choice(list(b"CGATCGATCGATCGATCGATN"), size=lens[b]).astype(np.uint8)
        codes[b, :lens[b]] = seq_to_codes(s.tobytes())
    hi, lo, clean, exists = window_kmers(jnp.asarray(codes), jnp.asarray(lens), k)
    hi, lo = np.asarray(hi), np.asarray(lo)
    clean, exists = np.asarray(clean), np.asarray(exists)
    for b in range(B):
        want, wvalid = window_kmers_np(codes[b, :lens[b]], k)
        W = max(lens[b] - k + 1, 0)
        assert exists[b, :W].all()
        assert not exists[b, W:].any()
        np.testing.assert_array_equal(clean[b, :W], wvalid)
        got = merge_u64(hi[b, :W], lo[b, :W])
        np.testing.assert_array_equal(got[wvalid], want[wvalid])


def test_split_merge_roundtrip():
    x = np.array([0, 1, 2**32 - 1, 2**32, 2**62 - 1], dtype=np.uint64)
    hi, lo = split_u64(x)
    np.testing.assert_array_equal(merge_u64(hi, lo), x)


def test_canonical_is_strand_symmetric():
    rng = np.random.default_rng(3)
    k = 21
    seq = rng.choice(list(b"CGAT"), size=100).astype(np.uint8)
    from genestrip_tpu.utils.dna import COMPLEMENT_TABLE
    rc = COMPLEMENT_TABLE[seq[::-1]]
    f, fv = window_kmers_np(seq_to_codes(seq.tobytes()), k)
    r, rv = window_kmers_np(seq_to_codes(rc.tobytes()), k)
    np.testing.assert_array_equal(np.sort(f), np.sort(r[::-1]))
