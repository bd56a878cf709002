"""Bucketed two-choice hash layout for the k-mer table — the TPU lookup path.

Reference equivalent: the lookup role of core store/KMerSortedArray.java:298-349
(bloom probe + binary search) and store/RadixKMerStore.java (radix buckets +
in-bucket search). On this TPU, XLA row-gathers from HBM cost ~13 ms per 1M
rows regardless of locality (measured, scripts/devbench.py), so lookup cost is
simply proportional to the NUMBER of gathers per query:

  * sorted-array binary search: log2(N) ~ 24 gathers
  * radix-bucketed search:      ~7 gathers (bucket bounds + probes + row)
  * THIS: two-choice bucket hash: exactly 2 gathers (one fat row per choice)

Layout: NB power-of-two buckets x 8 slots. A key lives in bucket
h1(key) or h2(key), chosen at build time to balance load (classic two-choice:
max load stays ~avg + O(log log N)). Each bucket is one interleaved row
[8 x hi | 8 x lo | 8 x payload] (24 x i32 = 96 B) so a single row-gather
delivers all candidate keys plus payloads. Empty slots hold key bits that no
canonical k-mer can have (all ones).

The *slot id* (bucket * 8 + lane) replaces the sorted-array "storage position"
(ref KMerSortedArray posStore) as the stable k-mer index that feeds exact
unique counting (ref KMerUniqueCounterBits) — any bijection works, the
reference semantics only need stability.
"""

from __future__ import annotations

import numpy as np

BUCKET = 8

# odd 32-bit mixing constants (splitmix-style)
_C1 = np.uint32(0x9E3779B1)
_C2 = np.uint32(0x85EBCA77)
_C3 = np.uint32(0xC2B2AE3D)


def _mix(hi: np.ndarray, lo: np.ndarray, c: np.uint32) -> np.ndarray:
    x = (hi * c) ^ (lo * _C3)
    x ^= x >> np.uint32(15)
    x *= _C2
    x ^= x >> np.uint32(13)
    return x


def bucket_hashes_np(hi: np.ndarray, lo: np.ndarray, nb_mask: int):
    """The two candidate bucket ids per key (host golden model)."""
    h1 = _mix(hi.astype(np.uint32), lo.astype(np.uint32), _C1) & np.uint32(nb_mask)
    h2 = _mix(lo.astype(np.uint32), hi.astype(np.uint32), _C2) & np.uint32(nb_mask)
    return h1.astype(np.int64), h2.astype(np.int64)


class KmerHashTable:
    """Device-ready bucketed hash of a KmerTable (derived data, built at load).

    Attributes:
      rows: [NB, 16 + A*8] int32 — per bucket: 8 hi, 8 lo (uint32 bit
        patterns; empty = all ones, unreachable because a canonical k-mer of
        k<=31 never has bit 63 set), then 8 lanes per aux plane.
      nb: number of buckets (power of two).
      slot_of_entry: [N] int64 — table entry -> slot id (= bucket*8 + lane).
      vidx_of_slot: [NB*8] value index per slot (65535 = empty) for
        aggregating slot-indexed unique counts per value on the host.
    """

    def __init__(self, rows, nb, slot_of_entry, vidx_of_slot, n_aux):
        self.rows = rows
        self.nb = nb
        self.slot_of_entry = slot_of_entry
        self.vidx_of_slot = vidx_of_slot
        self.n_aux = n_aux

    @property
    def n_slots(self) -> int:
        return self.nb * BUCKET


def build_hash(keys: np.ndarray, aux: np.ndarray, value_idx: np.ndarray,
               target_load: float = 0.65) -> KmerHashTable:
    """Builds the bucketed two-choice layout host-side (vectorized numpy).

    keys: [N] uint64 (distinct canonical k-mers), aux: [N, A] int32 payload
    planes, value_idx: [N] uint16.

    Insertion is iterative-vectorized: everything tries its h1 bucket; keys
    that lose the per-bucket capacity race retry at h2, then alternate with
    the current emptier choice until placed. If anything remains unplaced
    (overflow) the table is rebuilt with 1.5x more buckets — two-choice at
    load <= 0.75 makes that vanishingly rare.
    """
    n = len(keys)
    hi = (keys >> np.uint64(32)).astype(np.uint32)
    lo = (keys & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    aux = np.asarray(aux, dtype=np.int32)
    if aux.ndim == 1:
        aux = aux[:, None]
    n_aux = aux.shape[1]

    nb = 1 << max(int(np.ceil(np.log2(max(n, 1) / (BUCKET * target_load) + 1))), 3)
    while True:
        placed = _place(hi, lo, nb)
        if placed is not None:
            break
        nb *= 2

    bucket_of, lane_of = placed
    slot = bucket_of * BUCKET + lane_of

    rows = np.empty((nb, 16 + n_aux * 8), np.int32)
    rows[:, :16] = -1  # all-ones bit pattern: unreachable canonical k-mer
    rows[:, 16:] = 0
    b, l = bucket_of, lane_of
    rows[b, l] = hi.view(np.int32)
    rows[b, 8 + l] = lo.view(np.int32)
    for a in range(n_aux):
        rows[b, 16 + 8 * a + l] = aux[:, a]

    vidx_of_slot = np.full(nb * BUCKET, 65535, np.uint16)
    vidx_of_slot[slot] = value_idx
    return KmerHashTable(rows, nb, slot.astype(np.int64), vidx_of_slot, n_aux)


def _place(hi, lo, nb):
    """Two-choice placement. Returns (bucket, lane) arrays or None on overflow."""
    n = len(hi)
    h1, h2 = bucket_hashes_np(hi, lo, nb - 1)
    bucket_of = np.full(n, -1, np.int64)
    lane_of = np.full(n, -1, np.int32)
    fill = np.zeros(nb, np.int32)

    pending = np.arange(n)
    choice = h1.copy()
    alt = h2.copy()
    for _ in range(64):
        if len(pending) == 0:
            return bucket_of, lane_of
        want = choice[pending]
        # race resolution: rank of each pending key within its wanted bucket
        order = np.argsort(want, kind="stable")
        w_sorted = want[order]
        first = np.ones(len(order), bool)
        first[1:] = w_sorted[1:] != w_sorted[:-1]
        seg_start = np.maximum.accumulate(np.where(first, np.arange(len(order)), 0))
        rank = np.arange(len(order)) - seg_start
        lane = fill[w_sorted] + rank
        ok = lane < BUCKET
        idx = pending[order]
        win_idx = idx[ok]
        bucket_of[win_idx] = w_sorted[ok]
        lane_of[win_idx] = lane[ok].astype(np.int32)
        np.add.at(fill, w_sorted[ok], 1)
        # losers switch to their other choice
        lose_idx = idx[~ok]
        pending = lose_idx
        new_choice = alt[lose_idx]
        alt[lose_idx] = choice[lose_idx]
        choice[lose_idx] = new_choice
        # prefer the emptier of the two from now on
        sw = fill[choice[lose_idx]] > fill[alt[lose_idx]]
        tmp = choice[lose_idx].copy()
        choice[lose_idx] = np.where(sw, alt[lose_idx], tmp)
        alt[lose_idx] = np.where(sw, tmp, alt[lose_idx])
    return None


# ---------------------------------------------------------------------------
# device lookup
# ---------------------------------------------------------------------------

def lookup_hash(rows, q_hi, q_lo, *, nb: int, n_aux: int):
    """Two-gather hash lookup on device.

    rows: [NB, 16 + 8*n_aux] int32; q_hi/q_lo: uint32 queries, any shape.
    Returns (slot int32, found bool, aux int32 [..., n_aux]); slot is the
    stable k-mer index (valid where found; NB*8 where not found, usable as a
    dummy scatter target).
    """
    import jax
    import jax.numpy as jnp

    def mixj(a, b, c):
        x = (a * jnp.uint32(c)) ^ (b * jnp.uint32(0xC2B2AE3D))
        x = x ^ (x >> jnp.uint32(15))
        x = x * jnp.uint32(0x85EBCA77)
        return x ^ (x >> jnp.uint32(13))

    mask = jnp.uint32(nb - 1)
    h1 = (mixj(q_hi, q_lo, 0x9E3779B1) & mask).astype(jnp.int32)
    h2 = (mixj(q_lo, q_hi, 0x85EBCA77) & mask).astype(jnp.int32)

    r1 = rows[h1]                      # [..., 16 + 8A]
    r2 = rows[h2]

    def probe(r):
        k_hi = jax.lax.bitcast_convert_type(r[..., 0:8], jnp.uint32)
        k_lo = jax.lax.bitcast_convert_type(r[..., 8:16], jnp.uint32)
        eq = (k_hi == q_hi[..., None]) & (k_lo == q_lo[..., None])
        lane = jnp.argmax(eq, axis=-1).astype(jnp.int32)
        return jnp.any(eq, axis=-1), lane

    f1, l1 = probe(r1)
    f2, l2 = probe(r2)
    found = f1 | f2
    bucket = jnp.where(f1, h1, h2)
    lane = jnp.where(f1, l1, l2)
    slot = jnp.where(found, bucket * BUCKET + lane, nb * BUCKET)
    r = jnp.where(f1[..., None], r1, r2)
    lane_e = lane[..., None]
    aux = jnp.stack(
        [jnp.take_along_axis(r[..., 16 + 8 * a:16 + 8 * (a + 1)], lane_e,
                             axis=-1)[..., 0] for a in range(n_aux)], axis=-1)
    return slot, found, aux
