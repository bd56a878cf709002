"""What this established: XLA row-gathers cost ~13 ns/row regardless of
locality/table size on this chip -> lookup cost scales with gather COUNT and
WIDTH, which drove the 2-row-gather quotient hash (store/hash.py) and then
the gather-free scatter-join. Probes run with all arrays generated
ON DEVICE (jax.random) so nothing crosses the slow axon host link.

Measures the design-deciding numbers:
  * host->device link bandwidth (one small transfer, for the record)
  * random row-gather throughput vs row width and table size
  * the two-gather bucketed-hash lookup (store/hash.py) end to end
  * radix lookup (current production path) for comparison
  * 1M-lane sort, scatter-add/max costs
Timing: dependent-chain trick (fN vs f1) to cancel dispatch latency.
"""
import time
import numpy as np
import jax
import jax.numpy as jnp


def run_chain(make_fn, state, iters=8):
    f1 = make_fn(1)
    fN = make_fn(iters)
    float(np.asarray(f1(*state)))
    float(np.asarray(fN(*state)))
    t0 = time.time()
    float(np.asarray(f1(*state)))
    t1 = time.time()
    float(np.asarray(fN(*state)))
    t2 = time.time()
    return ((t2 - t1) - (t1 - t0)) / (iters - 1)


def report(name, per, work, unit="elem"):
    print(f"{name:46s}: {per*1e3:9.3f} ms/iter  {work/per/1e6:9.1f} M{unit}/s",
          flush=True)


key = jax.random.PRNGKey(0)
Q = 1 << 20

# ---- link speed (64 MB up) --------------------------------------------------
x_host = np.zeros(1 << 24, np.int32)
t0 = time.time()
jax.block_until_ready(jnp.asarray(x_host))
t1 = time.time()
print(f"h2d 64MB: {t1-t0:.2f}s -> {64/(t1-t0):.1f} MB/s", flush=True)

# ---- row gathers ------------------------------------------------------------
for N, width in [(16_000_000, 8), (2_000_000, 8), (2_000_000, 24),
                 (16_000_000, 1)]:
    tab = jax.random.randint(key, (N, width) if width > 1 else (N,),
                             0, 1 << 30, jnp.int32)
    idx0 = jax.random.randint(key, (Q,), 0, N, jnp.int32)

    def mk(iters, tab=tab, N=N, width=width):
        @jax.jit
        def f(t, i):
            for _ in range(iters):
                v = t[i]
                lead = v[:, 0] if width > 1 else v
                i = jnp.abs(lead * 1103515245 + i) % N
            return i[0].astype(jnp.float32)
        return f

    per = run_chain(mk, (tab, idx0))
    report(f"row-gather 1M x [{width}]i32 from {N//1_000_000}M", per, Q, "row")

# ---- bucketed-hash lookup (the real store) -----------------------------------
from genestrip_tpu.store.hash import build_hash, lookup_hash, BUCKET

for N in (16_000_000, 2_000_000):
    rng = np.random.default_rng(1)
    keys64 = rng.choice(np.uint64(1) << np.uint64(50), size=N, replace=False) \
        if False else np.unique(rng.integers(0, 1 << 50, 2 * N, dtype=np.uint64))[:N]
    aux = rng.integers(0, 1 << 20, (N, 3)).astype(np.int32)
    vidx = rng.integers(0, 1000, N).astype(np.uint16)
    t0 = time.time()
    ht = build_hash(keys64, aux, vidx)
    t1 = time.time()
    rows = jnp.asarray(ht.rows)
    print(f"build_hash {N//1_000_000}M: {t1-t0:.1f}s host, nb={ht.nb}, "
          f"rows={ht.rows.nbytes/1e6:.0f}MB", flush=True)

    q_hi0 = jax.random.randint(key, (Q,), 0, 1 << 18, jnp.int32).astype(jnp.uint32)
    q_lo0 = jax.random.randint(key, (Q,), 0, 1 << 30, jnp.int32).astype(jnp.uint32)

    def mk(iters, rows=rows, ht=ht):
        @jax.jit
        def f(qh, ql):
            for _ in range(iters):
                slot, found, aux_v = lookup_hash(rows, qh, ql, nb=ht.nb,
                                                 n_aux=ht.n_aux)
                qh = (qh + aux_v[:, 0].astype(jnp.uint32) + slot.astype(jnp.uint32))
                ql = ql ^ slot.astype(jnp.uint32)
            return (qh[0] + ql[0]).astype(jnp.float32)
        return f

    per = run_chain(mk, (q_hi0, q_lo0))
    report(f"hash lookup 1M from {N//1_000_000}M", per, Q, "lookup")

# ---- (radix lookup section removed: lookup_radix was a round-2 alternate,
# deleted from store/table.py once the quotient hash became the only
# production path - VERDICT r4 item 6) -------------------------------------

# ---- sorts / scatters ---------------------------------------------------------
a0 = jax.random.randint(key, (Q,), 0, 1 << 30, jnp.int32)
b0 = jax.random.randint(key, (Q,), 0, 1 << 30, jnp.int32)


def mk_sort(iters):
    @jax.jit
    def f(a, b):
        p = jnp.arange(Q, dtype=jnp.int32)
        for _ in range(iters):
            a, b, p = jax.lax.sort((a, b, p), num_keys=2)
            a, b = b, a
        return (a[0] + b[0] + p[0]).astype(jnp.float32)
    return f


per = run_chain(mk_sort, (a0, b0))
report("sort 1M 2key+payload", per, Q)

B, W = 8192, 128
x2 = jax.random.randint(key, (B, W), 0, 1 << 20, jnp.int32)


def mk_sort2(iters):
    @jax.jit
    def f(a):
        x = a
        for _ in range(iters):
            x = jax.lax.sort(x, dimension=1) ^ 1
        return x[0, 0].astype(jnp.float32)
    return f


per = run_chain(mk_sort2, (x2,))
report("rowsort [8192,128] axis=1", per, B * W)

T = 1024
idxT = jax.random.randint(key, (Q,), 0, T, jnp.int32)


def mk_scatter_small(iters):
    @jax.jit
    def f(i):
        acc = jnp.zeros(T + 1, jnp.int32)
        for _ in range(iters):
            acc = acc.at[i].add(1)
            i = (i + acc[jnp.minimum(i, T)]) % T
        return acc[0].astype(jnp.float32)
    return f


per = run_chain(mk_scatter_small, (idxT,))
report("scatter-add 1M into 1K", per, Q)

N16 = 16_000_000
idxN = jax.random.randint(key, (Q,), 0, N16, jnp.int32)


def mk_seen(iters):
    @jax.jit
    def f(i):
        acc = jnp.zeros(N16 + 1, jnp.uint8)
        for _ in range(iters):
            acc = acc.at[i].max(jnp.uint8(1))
            i = jnp.abs(i * 1103515245 + acc[i].astype(jnp.int32)) % N16
        return acc[0].astype(jnp.float32)
    return f


per = run_chain(mk_seen, (idxN,))
report("scatter-max-u8 1M into 16M (seen)", per, Q)

print("done", flush=True)
