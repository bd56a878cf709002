"""Quotient-packed two-choice (cuckoo-style) hash — the fast device lookup.

Reference equivalent: the lookup role of store/KMerSortedArray.java:298-349
(bloom probe + binary search) and store/RadixKMerStore.java:38-88 (radix
buckets + in-bucket search). On this TPU, XLA row-gathers from HBM cost
~13 ms per 1M [8]i32 rows regardless of locality (measured,
scripts/probe_hot.py), so lookup cost is proportional to the number AND
WIDTH of gathers per query. This layout needs exactly TWO [8]i32 row
gathers per lookup (one per bucket choice), with the value index packed
into the row — ~3.5x cheaper than the radix binary search (5-6 gathers).

Exactness (no false positives) by quotienting:
  * The 64-bit key container (hi, lo) is mixed by a 2-round Feistel
    bijection -> (h2, l2).
  * bucket1 = l2 & (NB-1); rem2 = l2 >> nb  (nb = log2(NB)).
  * bucket2 = bucket1 ^ (g(h2, rem2) | 1)   (cuckoo XOR trick: bucket1 is
    recoverable from bucket2 and the remainder, so storing WHICH choice was
    used makes (bucket, choice, h2, rem2) reconstruct the full key).
  * A slot stores h2 (plane1) and [rem2 | choice | vidx] (plane2). A query
    matches iff h2, rem2 AND the choice bit agree — that pins l2's bucket
    bits, i.e. the whole 64-bit key. Exact, zero false positives.

Bucket = 4 slots = one [8]i32 row: 4x plane1 then 4x plane2. Two-choice
placement at load <= 0.5 practically never overflows; on overflow the
builder doubles NB and retries.

The *slot id* (bucket*4 + lane) replaces the sorted-array storage position
(ref KMerSortedArray posStore) as the stable k-mer index feeding exact
unique counting (ref KMerUniqueCounterBits) — the semantics only need a
stable bijection, which slot ids provide via slot_of_entry.

Value-index capacity: vidx gets nb-1 bits (>= 16 since NB >= 2^17), so
large tables naturally support value spaces far beyond the sorted-array
cap of 65535 (ref RadixKMerStore maxValuesForRadix).
"""

from __future__ import annotations

import numpy as np

BUCKET = 4
MIN_NB_BITS = 17          # vidx gets nb-1 >= 16 bits


def _feistel_np(hi: np.ndarray, lo: np.ndarray):
    """2-round Feistel mix of the 64-bit container; bijective."""
    hi = hi.astype(np.uint32)
    lo = lo.astype(np.uint32)
    def mix(x, c):
        x = (x ^ (x >> np.uint32(16))) * np.uint32(c)
        x = (x ^ (x >> np.uint32(13))) * np.uint32(0xC2B2AE35)
        return x ^ (x >> np.uint32(16))
    h1 = hi ^ mix(lo, 0x85EBCA6B)
    l1 = lo ^ mix(h1, 0x9E3779B1)
    return h1, l1


def _g_np(h2: np.ndarray, rem2: np.ndarray, mask: np.uint32):
    g = (h2 * np.uint32(0x27D4EB2F)) ^ (rem2 * np.uint32(0x165667B1))
    g ^= g >> np.uint32(15)
    return (g & mask) | np.uint32(1)


class KmerHashTable:
    """Device-ready quotient hash of a KmerTable (derived data, built at load).

    Attributes:
      rows: [NB, 8] int32 — per bucket: 4x h2 then 4x (rem2|choice|vidx).
      nb_bits: log2(number of buckets).
      slot_of_entry: [N] int64 — table entry -> slot id (bucket*4 + lane).
      vidx_of_slot: [NB*4] int32 value index per slot (-1 = empty), for
        aggregating slot-indexed unique counts per value on the host.
    """

    def __init__(self, rows, nb_bits, slot_of_entry, vidx_of_slot):
        self.rows = rows
        self.nb_bits = nb_bits
        self.slot_of_entry = slot_of_entry
        self.vidx_of_slot = vidx_of_slot

    @property
    def nb(self) -> int:
        return 1 << self.nb_bits

    @property
    def n_slots(self) -> int:
        return self.nb * BUCKET

    @property
    def vidx_bits(self) -> int:
        return self.nb_bits - 1


def max_values_for(n_keys: int) -> int:
    """Value-space capacity of the hash layout for a table of n_keys."""
    nb_bits = max(int(np.ceil(np.log2(max(2 * n_keys, 1) / BUCKET + 1))), MIN_NB_BITS)
    return (1 << (nb_bits - 1)) - 1   # all-ones vidx is the empty marker


def build_hash(keys: np.ndarray, value_idx: np.ndarray) -> KmerHashTable:
    """Builds the quotient hash host-side (vectorized numpy).

    keys: [N] uint64 distinct canonical k-mers; value_idx: [N] integer
    value indices (must fit in nb-1 bits; all-ones reserved for empty).
    """
    n = len(keys)
    keys = np.asarray(keys, dtype=np.uint64)
    hi = (keys >> np.uint64(32)).astype(np.uint32)
    lo = (keys & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    h2, l2 = _feistel_np(hi, lo)

    nb_bits = max(int(np.ceil(np.log2(max(2 * n, 1) / BUCKET + 1))), MIN_NB_BITS)
    # widen buckets until the value-index space fits (vidx gets nb-1 bits,
    # all-ones reserved as the empty marker)
    max_vidx = int(np.max(value_idx)) if n else 0
    while (1 << (nb_bits - 1)) - 1 <= max_vidx:
        nb_bits += 1
    while True:
        nb = 1 << nb_bits
        mask = np.uint32(nb - 1)
        b1 = (l2 & mask).astype(np.int64)
        rem2 = (l2 >> np.uint32(nb_bits)).astype(np.uint32)
        b2 = (b1 ^ _g_np(h2, rem2, mask).astype(np.int64))
        placed = _place(b1, b2, nb)
        if placed is not None:
            break
        nb_bits += 1

    bucket_of, lane_of, choice_of = placed
    vb = nb_bits - 1
    empty = (1 << vb) - 1
    vidx = np.asarray(value_idx, dtype=np.int64)
    if np.any(vidx >= empty) or np.any(vidx < 0):
        raise ValueError(f"value index out of range for hash layout "
                         f"(max {empty - 1})")
    slot = bucket_of * BUCKET + lane_of

    rows = np.zeros((nb, 8), np.uint32)
    rows[:, 4:] = np.uint32(empty)   # choice=0, rem2=0, vidx=all-ones: empty
    plane2 = ((rem2.astype(np.uint64) << np.uint64(vb + 1))
              | (choice_of.astype(np.uint64) << np.uint64(vb))
              | vidx.astype(np.uint64)).astype(np.uint32)
    rows[bucket_of, lane_of] = h2
    rows[bucket_of, 4 + lane_of] = plane2

    vidx_of_slot = np.full(nb * BUCKET, -1, np.int64)
    vidx_of_slot[slot] = vidx
    return KmerHashTable(rows.view(np.int32), nb_bits,
                         slot.astype(np.int64), vidx_of_slot)


def _place(b1, b2, nb):
    """Two-choice placement; returns (bucket, lane, choice) or None."""
    n = len(b1)
    bucket_of = np.full(n, -1, np.int64)
    lane_of = np.full(n, -1, np.int32)
    choice_of = np.zeros(n, np.uint32)
    fill = np.zeros(nb, np.int32)

    pending = np.arange(n)
    cur = b1.copy()
    alt = b2.copy()
    cur_c = np.zeros(n, np.uint32)
    for _ in range(64):
        if len(pending) == 0:
            return bucket_of, lane_of, choice_of
        want = cur[pending]
        order = np.argsort(want, kind="stable")
        w_sorted = want[order]
        first = np.ones(len(order), bool)
        first[1:] = w_sorted[1:] != w_sorted[:-1]
        seg_start = np.maximum.accumulate(
            np.where(first, np.arange(len(order)), 0))
        rank = np.arange(len(order)) - seg_start
        lane = fill[w_sorted] + rank
        ok = lane < BUCKET
        idx = pending[order]
        win = idx[ok]
        bucket_of[win] = w_sorted[ok]
        lane_of[win] = lane[ok].astype(np.int32)
        choice_of[win] = cur_c[win]
        np.add.at(fill, w_sorted[ok], 1)
        pending = idx[~ok]
        # losers switch to their other choice, preferring the emptier one
        cur[pending], alt[pending] = alt[pending].copy(), cur[pending].copy()
        cur_c[pending] ^= np.uint32(1)
        sw = fill[cur[pending]] > fill[alt[pending]]
        swp = pending[sw]
        cur[swp], alt[swp] = alt[swp].copy(), cur[swp].copy()
        cur_c[swp] ^= np.uint32(1)
    return None


# ---------------------------------------------------------------------------
# device lookup
# ---------------------------------------------------------------------------

def lookup_hash(rows, q_hi, q_lo, *, nb_bits: int):
    """Two-gather exact hash lookup on device.

    rows: [NB, 8] int32; q_hi/q_lo: uint32 query halves, any shape.
    Returns (slot int32, found bool, vidx int32); slot is the stable k-mer
    index (NB*4 where not found — a dummy scatter target); vidx is -1 where
    not found.

    Queries are flattened internally: a [Q, 8] row-gather lowers to the fast
    path on TPU, while a [B, W, 8] one triggers a padded-layout blowup
    (measured ~30x slower). The 4-slot probe is unrolled into elementwise
    selects — no tiny-trailing-dim ops.
    """
    import jax
    import jax.numpy as jnp

    shape = q_hi.shape
    q_hi = q_hi.reshape(-1)
    q_lo = q_lo.reshape(-1)

    def mix(x, c):
        x = (x ^ (x >> jnp.uint32(16))) * jnp.uint32(c)
        x = (x ^ (x >> jnp.uint32(13))) * jnp.uint32(0xC2B2AE35)
        return x ^ (x >> jnp.uint32(16))

    h2 = q_hi ^ mix(q_lo, 0x85EBCA6B)
    l2 = q_lo ^ mix(h2, 0x9E3779B1)
    nb = 1 << nb_bits
    vb = nb_bits - 1
    empty = jnp.uint32((1 << vb) - 1)
    mask = jnp.uint32(nb - 1)
    b1 = (l2 & mask).astype(jnp.int32)
    rem2 = l2 >> jnp.uint32(nb_bits)
    g = (h2 * jnp.uint32(0x27D4EB2F)) ^ (rem2 * jnp.uint32(0x165667B1))
    g = ((g ^ (g >> jnp.uint32(15))) & mask) | jnp.uint32(1)
    b2 = b1 ^ g.astype(jnp.int32)

    r1 = rows[b1]                      # [Q, 8]
    r2 = rows[b2]

    def probe(r, choice):
        want_hi = (rem2 << jnp.uint32(1)) | jnp.uint32(choice)
        f = jnp.zeros(h2.shape, bool)
        lane = jnp.zeros(h2.shape, jnp.int32)
        v = jnp.zeros(h2.shape, jnp.uint32)
        for j in range(BUCKET):
            kj = jax.lax.bitcast_convert_type(r[:, j], jnp.uint32)
            pj = jax.lax.bitcast_convert_type(r[:, BUCKET + j], jnp.uint32)
            vj = pj & empty
            eqj = (kj == h2) & ((pj >> jnp.uint32(vb)) == want_hi) & (vj != empty)
            first = eqj & ~f
            lane = jnp.where(first, j, lane)
            v = jnp.where(first, vj, v)
            f = f | eqj
        return f, lane, v.astype(jnp.int32)

    f1, l1_, v1 = probe(r1, 0)
    f2, l2_, v2 = probe(r2, 1)
    found = f1 | f2
    bucket = jnp.where(f1, b1, b2)
    lane = jnp.where(f1, l1_, l2_)
    slot = jnp.where(found, bucket * BUCKET + lane, nb * BUCKET)
    vidx = jnp.where(found, jnp.where(f1, v1, v2), -1)
    return (slot.reshape(shape), found.reshape(shape), vidx.reshape(shape))
