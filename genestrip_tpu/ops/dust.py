"""Windowed DUST low-complexity scores, vectorized over all k-mer windows.

Reference equivalent: the streaming DUST tracker inside
core util/CGATLongBuffer.java:131-216 (period-1/2/3 run tracking with
Fibonacci-difference weights, documented in ConfigParams.md `maxDust`).

Closed form of the streaming score for window [s, s+k):

  d(s) = sum over periods p in {1,2,3}, positions i in [s+p, s+k):
           m_p[i] * diff[min(r_p(i) - 1, i - p - s)]

where m_p[i] = (seq[i] == seq[i-p], all bases in [i-p, i] valid — the
streaming buffer resets on non-CGAT bases), r_p(i) = length of the
consecutive match-run ending at i, and diff is the reference's
dustFunctionDiff table (1, 1, 1, then Fibonacci sums). The `i - p - s`
term reproduces the window-departure decrements: a run is truncated at the
window start, and matches whose partner base left the window contribute
nothing. (The srl cap `size - p` in the reference never binds because the
window truncation i-p-s <= k-1-p is strictly tighter.)
"""

from __future__ import annotations

import numpy as np
from numpy.lib.stride_tricks import sliding_window_view


def dust_function_diff(k: int) -> np.ndarray:
    """ref: CGATLongBuffer.initDustFunctionDiff:105-121."""
    d = np.zeros(max(k, 3), dtype=np.int64)
    d[0:3] = 1
    for i in range(3, k):
        d[i] = d[i - 1] + d[i - 2]
    return d


def window_dust_np(codes: np.ndarray, k: int) -> np.ndarray:
    """DUST score of every window of a code array; [W] int64.

    Only meaningful for clean windows (windows containing a non-CGAT base
    are never stored anyway).
    """
    L = len(codes)
    W = max(L - k + 1, 0)
    if W == 0:
        return np.zeros(0, dtype=np.int64)
    diff = dust_function_diff(k)
    valid = codes <= 3
    d = np.zeros(W, dtype=np.int64)
    idx_global = np.arange(L)
    for p in (1, 2, 3):
        if L <= p:
            continue
        m = np.zeros(L, dtype=bool)
        m[p:] = (codes[p:] == codes[:-p]) & valid[p:]
        # all bases in [i-p, i] valid
        ok = valid.copy()
        for q in range(1, p + 1):
            ok[q:] &= valid[:-q]
        m &= ok
        # run length of consecutive matches ending at i
        lastfail = np.maximum.accumulate(np.where(~m, idx_global, -1))
        r = idx_global - lastfail           # r >= 1 at matches
        Mw = sliding_window_view(m, k)       # [W, k]; column j -> position s + j
        Rw = sliding_window_view(r, k)
        j = np.arange(k)
        idx = np.minimum(Rw - 1, j - p)      # j < p gives negative -> masked by Mw & j>=p
        mask = Mw & (j >= p)
        d += np.sum(np.where(mask, diff[np.maximum(idx, 0)], 0), axis=1)
    return d


def window_dust_chunked(codes: np.ndarray, k: int, chunk: int = 1 << 22) -> np.ndarray:
    """Chunked variant bounding the [chunk, k] intermediate for long genomes."""
    L = len(codes)
    W = max(L - k + 1, 0)
    if W <= chunk:
        return window_dust_np(codes, k)
    out = np.empty(W, dtype=np.int64)
    s = 0
    while s < W:
        e = min(s + chunk, W)
        # need bases [s, e + k - 1); runs crossing the chunk start need up to
        # k + 3 extra context bases on the left for exact run lengths... runs
        # can extend arbitrarily far left, so recompute r from the segment
        # start bounded by k: contributions only use min(r-1, i-p-s) with
        # i - p - s < k, so truncating run history at k + 3 bases is exact.
        ctx = min(s, k + 3)
        seg = codes[s - ctx: e + k - 1]
        d = window_dust_np(seg, k)
        out[s:e] = d[ctx: ctx + (e - s)]
        s = e
    return out
