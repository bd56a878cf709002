"""Round-4 probe: PRODUCTION-shaped scatter-join lookup over the existing
quotient-cuckoo rows (store/hash.py layout), with full resolution tracking.

Design (option B): each query emits TWO join entries (one per bucket choice).
Entries are sorted by (bucket, h2, want); distinct keys get rank-lanes in a
[NB, R] scratch; one elementwise pass over rows [NB, 8] vs scratch resolves
(found, vidx, slot) per lane; results scatter back to entry positions, are
broadcast along equal-key runs, and combine per query by qid scatter. A query
is resolved iff (either entry found) or (both entries got lanes). Unresolved
go to a fallback (counted here; production = compacted two-gather).

Also measures: small-table gathers (the vaux gather), scalar scatters into a
32M space (unique counter), and the V-scatter join for vidx->aux mapping.
"""
import time
import numpy as np
import jax
import jax.numpy as jnp

print("device:", jax.devices()[0], flush=True)

import sys
sys.path.insert(0, "/root/repo")
from genestrip_tpu.store.hash import build_hash, BUCKET


def timeit(name, f, *args, reps=10):
    out = jax.block_until_ready(f(*args))
    t0 = time.time()
    for _ in range(reps):
        out = jax.block_until_ready(f(*args))
    dt = (time.time() - t0) / reps
    print(f"{name:64s}: {dt*1e3:9.3f} ms", flush=True)
    return out


N = 16_000_000
rng = np.random.default_rng(1)
keys = np.unique(rng.integers(0, 1 << 62, N + 64, dtype=np.uint64))[:N]
vidx = rng.integers(0, 60000, N).astype(np.int64)

t0 = time.time()
ht = build_hash(keys, vidx)
print(f"build_hash: {time.time()-t0:.1f}s  nb_bits={ht.nb_bits} "
      f"rows={ht.rows.nbytes/1e6:.0f}MB", flush=True)
NB = ht.nb
nb_bits = ht.nb_bits
rows_d = jnp.asarray(ht.rows)

for Q in (1 << 20, 1 << 22):
    queries = np.concatenate([
        keys[rng.integers(0, N, Q // 2)],
        rng.integers(0, 1 << 62, Q - Q // 2, dtype=np.uint64),
    ])
    rng.shuffle(queries)
    q_hi = jnp.asarray((queries >> np.uint64(32)).astype(np.uint32).view(np.int32))
    q_lo = jnp.asarray((queries & np.uint64(0xFFFFFFFF)).astype(np.uint32).view(np.int32))

    for R in (2, 4):
        E = 2 * Q

        def make_join(R=R, Q=Q, E=E):
            @jax.jit
            def join(q_hi, q_lo, rows):
                hi_u = jax.lax.bitcast_convert_type(q_hi, jnp.uint32)
                lo_u = jax.lax.bitcast_convert_type(q_lo, jnp.uint32)

                def mix(x, c):
                    x = (x ^ (x >> jnp.uint32(16))) * jnp.uint32(c)
                    x = (x ^ (x >> jnp.uint32(13))) * jnp.uint32(0xC2B2AE35)
                    return x ^ (x >> jnp.uint32(16))

                h2 = hi_u ^ mix(lo_u, 0x85EBCA6B)
                l2 = lo_u ^ mix(h2, 0x9E3779B1)
                mask = jnp.uint32(NB - 1)
                vb = nb_bits - 1
                empty = jnp.uint32((1 << vb) - 1)
                b1 = (l2 & mask).astype(jnp.int32)
                rem2 = l2 >> jnp.uint32(nb_bits)
                g = (h2 * jnp.uint32(0x27D4EB2F)) ^ (rem2 * jnp.uint32(0x165667B1))
                g = ((g ^ (g >> jnp.uint32(15))) & mask) | jnp.uint32(1)
                b2 = b1 ^ g.astype(jnp.int32)

                want1 = (rem2 << jnp.uint32(1)).astype(jnp.int32)
                want2 = (want1 | 1)
                e_b = jnp.concatenate([b1, b2])
                e_h = jax.lax.bitcast_convert_type(
                    jnp.concatenate([h2, h2]), jnp.int32)
                e_w = jnp.concatenate([want1, want2])
                qid = jax.lax.broadcasted_iota(jnp.int32, (Q, 1), 0).reshape(-1)
                e_q = jnp.concatenate([qid, qid])

                s_b, s_h, s_w, s_q = jax.lax.sort((e_b, e_h, e_w, e_q), num_keys=3)

                pb = jnp.concatenate([jnp.full((1,), -1, jnp.int32), s_b[:-1]])
                ph = jnp.concatenate([jnp.full((1,), 0, jnp.int32), s_h[:-1]])
                pw = jnp.concatenate([jnp.full((1,), -1, jnp.int32), s_w[:-1]])
                new_key = (s_b != pb) | (s_h != ph) | (s_w != pw)
                new_bucket = s_b != pb
                pos = jax.lax.broadcasted_iota(jnp.int32, (E, 1), 0).reshape(-1)
                kidx = jnp.cumsum(new_key.astype(jnp.int32))
                bstart_k = jax.lax.associative_scan(
                    jnp.maximum, jnp.where(new_bucket, kidx, 0))
                rank = kidx - bstart_k

                lane_ok = new_key & (rank < R)
                tgt = jnp.where(lane_ok, s_b * R + rank, NB * R)
                sc_h = jnp.zeros(NB * R + 1, jnp.int32).at[tgt].set(s_h)
                sc_w = jnp.full(NB * R + 1, -1, jnp.int32).at[tgt].set(s_w)
                sc_p = jnp.zeros(NB * R + 1, jnp.int32).at[tgt].set(pos)

                sh = sc_h[:-1].reshape(NB, R)
                sw = sc_w[:-1].reshape(NB, R)
                sp = sc_p[:-1].reshape(NB, R)

                # table pass: unrolled over the 4 slots, elementwise over [NB, R]
                fnd = jnp.zeros((NB, R), bool)
                v = jnp.zeros((NB, R), jnp.int32)
                lane = jnp.zeros((NB, R), jnp.int32)
                sw_u = jax.lax.bitcast_convert_type(sw, jnp.uint32)
                for j in range(BUCKET):
                    kj = rows[:, j][:, None]
                    pj = jax.lax.bitcast_convert_type(rows[:, BUCKET + j], jnp.uint32)[:, None]
                    vj = (pj & empty).astype(jnp.int32)
                    eqj = (kj == sh) & ((pj >> jnp.uint32(vb)) == sw_u) & (vj != empty.astype(jnp.int32))
                    first = eqj & ~fnd
                    v = jnp.where(first, vj, v)
                    lane = jnp.where(first, j, lane)
                    fnd = fnd | eqj
                bidx = jax.lax.broadcasted_iota(jnp.int32, (NB, R), 0)
                slot = bidx * BUCKET + lane

                # scatter back to entry space
                f_flat = fnd.reshape(-1)
                p_flat = jnp.where(f_flat, sp.reshape(-1), E)
                r_v = jnp.full(E + 1, -1, jnp.int32).at[p_flat].set(v.reshape(-1))
                r_s = jnp.full(E + 1, -1, jnp.int32).at[p_flat].set(slot.reshape(-1))
                r_ok = jnp.zeros(E + 1, bool).at[
                    jnp.where(lane_ok, pos, E)].set(True)
                rv, rs, rok = r_v[:E], r_s[:E], r_ok[:E]

                # broadcast along equal-key runs
                def seg_copy(vals, init):
                    def comb(a, b):
                        keep = b[0] >= 0
                        return (jnp.where(keep, b[0], a[0]),
                                jnp.where(keep, b[1], a[1]))
                    return jax.lax.associative_scan(
                        comb, (jnp.where(new_key, pos, -1), vals))[1]
                rv_b = seg_copy(rv, -1)
                rs_b = seg_copy(rs, -1)
                rok_b = seg_copy(rok.astype(jnp.int32), 0)

                # combine per query
                out_env = jnp.zeros(Q, jnp.int32).at[s_q].max(
                    jnp.where(rv_b >= 0, rv_b + 1, 0))
                out_slot = jnp.full(Q, -1, jnp.int32).at[s_q].max(rs_b)
                n_lanes = jnp.zeros(Q, jnp.int32).at[s_q].add(rok_b)
                out_found = out_env > 0
                out_v = jnp.where(out_found, out_env - 1, -1)
                out_ok = out_found | (n_lanes == 2)
                n_unres = jnp.sum((~out_ok).astype(jnp.int32))
                return out_v, out_slot, out_ok, n_unres
            return join

        join = make_join()
        out_v, out_slot, out_ok, n_unres = timeit(
            f"cuckoo scatter-join Q={Q>>20}M R={R} (N=16M)", join, q_hi, q_lo, rows_d)
        # correctness
        gold_pos = np.searchsorted(keys, queries)
        gold_fnd = (gold_pos < N) & (keys[np.minimum(gold_pos, N - 1)] == queries)
        gv = np.where(gold_fnd, vidx[np.minimum(gold_pos, N - 1)], -1)
        ov = np.asarray(out_v); ok = np.asarray(out_ok)
        agree = (ov[ok] == gv[ok]).mean()
        # slot check: found queries' slot must map back to same vidx
        os_ = np.asarray(out_slot)
        fsel = ok & (ov >= 0)
        slot_v = ht.vidx_of_slot[os_[fsel]]
        print(f"   unresolved={int(n_unres)} ({100*int(n_unres)/Q:.4f}%)  "
              f"value agreement on resolved: {agree*100:.4f}%  "
              f"slot->vidx ok: {(slot_v == ov[fsel]).mean()*100:.4f}%", flush=True)

# ---- small-table gathers ----------------------------------------------------
Q = 1 << 20
idx = jnp.asarray(rng.integers(0, 257, Q).astype(np.int32))
vaux = jnp.asarray(rng.integers(0, 1 << 20, (257, 4)).astype(np.int32))

@jax.jit
def small_gather(vaux, idx):
    return vaux[idx].sum()
timeit("small-table row gather [257,4] x 1M", small_gather, vaux, idx)

vaux1 = jnp.asarray(rng.integers(0, 1 << 20, (257,)).astype(np.int32))
@jax.jit
def small_gather1(vaux1, idx):
    return vaux1[idx].sum()
timeit("small-table scalar gather [257] x 1M", small_gather1, vaux1, idx)

# V-scatter join: map idx -> vaux rows via sort + V-sized scatter
@jax.jit
def vscatter_join(vaux, idx):
    Qn = idx.shape[0]
    qid = jax.lax.broadcasted_iota(jnp.int32, (Qn, 1), 0).reshape(-1)
    s_i, s_q = jax.lax.sort((idx, qid), num_keys=1)
    pos = jax.lax.broadcasted_iota(jnp.int32, (Qn, 1), 0).reshape(-1)
    prev = jnp.concatenate([jnp.full((1,), -1, jnp.int32), s_i[:-1]])
    new = s_i != prev
    scr = jnp.full(257 + 1, Qn, jnp.int32).at[jnp.where(new, s_i, 257)].set(pos)
    res = jnp.zeros((Qn + 1, 4), jnp.int32).at[scr[:257]].set(vaux[:257])
    # broadcast along runs
    def comb(a, b):
        keep = b[0] >= 0
        return (jnp.where(keep, b[0], a[0]), jnp.where(keep[..., None], b[1], a[1]))
    _, vals = jax.lax.associative_scan(
        comb, (jnp.where(new, pos, -1), res[:Qn]))
    out = jnp.zeros((Qn, 4), jnp.int32).at[s_q].set(vals)
    return out
out = timeit("V-scatter join [257,4] -> 1M", vscatter_join, vaux, idx)
gold = np.asarray(vaux)[np.asarray(idx)]
print("   vscatter correct:", (np.asarray(out) == gold).all(), flush=True)

# ---- scalar scatters into a 32M space (unique counter) ----------------------
tgt32 = jnp.asarray(rng.integers(0, 32_000_000, Q).astype(np.int32))
seen = jnp.zeros(32_000_001, jnp.uint8)
@jax.jit
def scat_max(seen, tgt):
    return seen.at[tgt].max(jnp.uint8(1))
timeit("scatter-max 1M u8 into 32M", scat_max, seen, tgt32)

zT = jnp.zeros(1025, jnp.int32)
tgtT = jnp.asarray(rng.integers(0, 1024, Q).astype(np.int32))
val = jnp.asarray(rng.integers(0, 100, Q).astype(np.int32))
@jax.jit
def scat_add_small(zT, tgt, val):
    return zT.at[tgt].add(val)
timeit("scatter-add 1M i32 into 1K", scat_add_small, zT, tgtT, val)
print("done", flush=True)
