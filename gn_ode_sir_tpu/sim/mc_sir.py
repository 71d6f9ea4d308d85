"""Vectorized Monte-Carlo SIR simulator (the throughput-critical entry point).

Stochastic process (identical in distribution to the reference's
``sir_torch``, ``ode_nn.py:46-82``): at each step, every infected node
independently tries to infect each susceptible neighbor with probability
beta (one Bernoulli coin per directed contact), and every node infected at
the start of the step recovers with probability gamma; recoveries and
infections both read start-of-step state.

TPU-native formulation: instead of drawing one coin per infected->susceptible
contact (data-dependent shapes, ``ode_nn.py:61-65``), we use the exact
per-node law: a susceptible node with k infected neighbors gets infected with
probability 1 - (1-beta)^k. That needs only the infected-neighbor COUNT
(one MXU matmul: I @ A with a {0,1} adjacency — int8 with s32 accumulation
on TPU, bf16 with f32 accumulation elsewhere; both EXACT, and bit-identical
label output between the two, with int8 measured up to 26% faster at enron
scale where the matmul dominates) plus one random word per node. All ``sims``
trajectories advance together as a [sims, n] matrix in a single
``lax.scan``; per-sim state indicators are summed on the fly so memory stays
[sims, n] regardless of T.

Only (I, R) are carried and reduced; S is implied (1 - I - R elementwise,
``sims - I - R`` for the sums) — indicators partition, so this is exact and
saves a third of the per-step state traffic and reduce work.

Coin generation (measured on TPU v5e):
- ``'auto'`` (default): ``rbg16`` on TPU, ``bits16`` elsewhere.
- ``'bits16'``: ONE threefry uint32 word per node per step, low 16 bits
  decide infection, high 16 bits decide recovery.
  Threshold granularity 2^-16 per coin, orders of magnitude below MC noise
  at any feasible simulation count.
- ``'rbg16'``: same 16+16 split from XLA's hardware-assisted
  RngBitGenerator — +11% sims/s over bits16 at openflights 10k sims.
- ``'bits32'``: two threefry uint32 words, full 32-bit thresholds.
- ``'uniform'``: two f32 uniforms (the textbook formulation) — slowest.
"""

from __future__ import annotations

import weakref
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from gn_ode_sir_tpu.graphs.graph import Graph

_COIN_MODES = ("auto", "bits16", "rbg16", "bits32", "uniform", "pallas")


def _resolve_coins(coins: str) -> str:
    """``'auto'`` picks the fastest measured generator for the backend:
    ``rbg16`` (XLA RngBitGenerator, hardware-assisted) on TPU — +11% sims/s
    over threefry ``bits16`` at openflights scale — and ``bits16`` elsewhere
    (keeps CPU streams identical to earlier releases; rbg on CPU is slower).
    """
    if coins not in _COIN_MODES:
        raise ValueError(f"coins must be one of {_COIN_MODES}, got {coins!r}")
    if coins == "auto":
        # backend name is 'axon' for the tunneled TPU, so test for CPU —
        # same convention as the matmul auto policy below
        return "bits16" if jax.default_backend() == "cpu" else "rbg16"
    return coins

def _raw_key(key):
    """Normalize a caller-supplied PRNG key to raw uint32[2] threefry data.

    Accepts both the legacy raw style (``jax.random.PRNGKey``) and new-style
    typed keys (``jax.random.key``) — the rbg16 coin path re-wraps the words
    for XLA's RngBitGenerator, which needs raw key data, so a typed key
    passed straight through would fail at trace time. Typed keys of wider
    impls (e.g. rbg, uint32[4]) contribute their first two words.
    """
    if jnp.issubdtype(jnp.asarray(key).dtype, jax.dtypes.prng_key):
        key = jax.random.key_data(key)
    key = jnp.asarray(key)
    if key.ndim != 1 or key.shape[0] < 2:
        raise ValueError(f"expected a PRNG key, got shape {key.shape}")
    return key[:2]


# Device-resident adjacency cache: re-uploading a 100+ MB dense adjacency per
# call dominated simulate_sir wall time before this existed.
_ADJ_CACHE: dict = {}


def _device_adjacency(graph: Graph, dtype) -> jax.Array:
    key = (id(graph), jnp.dtype(dtype).name)
    hit = _ADJ_CACHE.get(key)
    if hit is not None:
        return hit
    arr = jnp.asarray(graph.dense_adjacency, dtype)
    _ADJ_CACHE[key] = arr
    weakref.finalize(graph, _ADJ_CACHE.pop, key, None)
    return arr


def _sir_transition(i, r, a_mm, log1m_beta, gamma, key, t, coins):
    """One synchronous SIR step on the [sims, n] state matrices.

    Only (I, R) are carried; S is reconstructed as 1 - I - R (exact for
    indicators) which drops a third of the per-step HBM state traffic.
    """
    sims, n = i.shape
    dt = i.dtype  # f32 or int8 — the coin compares are dtype-independent
    s = (1 - i - r).astype(dt)
    k = jax.random.fold_in(key, t)
    # infected-neighbor counts via MXU matmul (A symmetric, {0,1}).
    # Both dtypes are EXACT for indicator x adjacency products: bf16
    # accumulates in f32, int8 in int32 (counts <= max_degree << 2^31);
    # int8 runs the v5e MXU at ~2x its bf16 rate.
    if a_mm.dtype == jnp.int8:
        counts = jnp.dot(
            i.astype(jnp.int8), a_mm, preferred_element_type=jnp.int32
        ).astype(jnp.float32)
    else:
        counts = jnp.dot(
            i.astype(a_mm.dtype), a_mm, preferred_element_type=jnp.float32
        )
    if coins == "pallas":
        # fused coins+update with the on-chip hardware PRNG (TPU only)
        from gn_ode_sir_tpu.sim.pallas_step import sir_update_pallas

        seed = jax.random.randint(key, (), 0, 2**31 - 1, jnp.int32) + t
        _, i2, r2 = sir_update_pallas(
            s, i, r, counts, log1m_beta, gamma, seed
        )
        return i2, r2
    p_inf = -jnp.expm1(counts * log1m_beta)  # 1 - (1-beta)^k, stable
    if coins in ("bits16", "rbg16"):
        if coins == "rbg16":
            # XLA RngBitGenerator (Philox-family, hardware-assisted on TPU)
            # instead of threefry VPU rounds; same 16+16-bit coin split.
            # Deterministic per (key, t): the rbg key is the folded threefry
            # key words doubled up to the uint32[4] rbg key shape.
            rk = jax.random.wrap_key_data(
                jnp.concatenate([k, k]), impl="rbg"
            )
            w = jax.random.bits(rk, (sims, n), jnp.uint32)
        else:
            w = jax.random.bits(k, (sims, n), jnp.uint32)
        u = (w & 0xFFFF).astype(jnp.float32)
        v = (w >> 16).astype(jnp.float32)
        new_inf = s * (u < p_inf * 65536.0).astype(dt)
        new_rec = i * (v < gamma * 65536.0).astype(dt)
    elif coins == "bits32":
        ku, kv = jax.random.split(k)
        u = jax.random.bits(ku, (sims, n), jnp.uint32).astype(jnp.float32)
        v = jax.random.bits(kv, (sims, n), jnp.uint32).astype(jnp.float32)
        new_inf = s * (u < p_inf * 4294967296.0).astype(dt)
        new_rec = i * (v < gamma * 4294967296.0).astype(dt)
    else:  # uniform
        ku, kv = jax.random.split(k)
        u = jax.random.uniform(ku, (sims, n))
        v = jax.random.uniform(kv, (sims, n))
        new_inf = s * (u < p_inf).astype(dt)
        new_rec = i * (v < gamma).astype(dt)
    return (
        (i + new_inf - new_rec).astype(dt),
        (r + new_rec).astype(dt),
    )


def _init_state(seeds_mask, sims, dtype=jnp.float32):
    n = seeds_mask.shape[0]
    i0 = jnp.broadcast_to(seeds_mask, (sims, n)).astype(dtype)
    return i0, jnp.zeros((sims, n), dtype)


def _scan_trial(a_mm, seeds_mask, beta, gamma, key, *, sims: int,
                max_time: int, coins: str, state_i8: bool):
    """One trial's scan body: ``sims`` trajectories -> (I, R) SUMS [T, 2, n]
    f32. Shared by the single-trial jit and the vmapped multi-trial jit;
    ``beta``/``gamma`` may be python floats or traced scalars (vmap)."""
    i0, r0 = _init_state(
        seeds_mask, sims, jnp.int8 if state_i8 else jnp.float32
    )
    log1m_beta = jnp.log1p(-jnp.float32(beta))
    gamma = jnp.float32(gamma)

    def ssum(x):  # f32 accumulator is exact for indicator counts < 2^24
        return x.sum(0, dtype=jnp.float32)

    def step(carry, t):
        i, r = _sir_transition(*carry, a_mm, log1m_beta, gamma, key, t, coins)
        return (i, r), jnp.stack([ssum(i), ssum(r)])

    _, sums = jax.lax.scan(step, (i0, r0), jnp.arange(1, max_time))
    sums0 = jnp.stack([ssum(i0), ssum(r0)])[None]
    return jnp.concatenate([sums0, sums], axis=0)  # [T, 2, n]


@partial(jax.jit,
         static_argnames=("sims", "max_time", "coins", "state_i8", "out_u16"))
def _simulate_chunk(a_mm, seeds_mask, beta, gamma, key, *, sims: int,
                    max_time: int, coins: str = "bits16",
                    state_i8: bool = False, out_u16: bool = False):
    """Run ``sims`` trajectories; return per-step (I, R) indicator SUMS
    [T, 2, n]. S sums are implied exactly: sum(S) = sims - sum(I) - sum(R)
    (indicators partition), so neither carrying S nor reducing it is needed —
    a third less per-step state traffic and reduce work.

    Sums of 0/1 indicators are integers, exact in f32 up to 2^24.
    ``state_i8`` carries the indicators as int8 (quarter of the f32 HBM
    traffic per step; bit-identical output — measured +47% sims/s at
    openflights, +35% at wiki-vote after the I/R-carry drop).
    ``out_u16`` emits the sums as uint16 (exact for sims < 65536) to halve
    the host-readback bytes through the tunnel.
    """
    out = _scan_trial(a_mm, seeds_mask, beta, gamma, key, sims=sims,
                      max_time=max_time, coins=coins, state_i8=state_i8)
    return out.astype(jnp.uint16) if out_u16 else out


@partial(jax.jit,
         static_argnames=("sims", "max_time", "coins", "state_i8", "out_u16"))
def _simulate_chunk_trials(a_mm, seeds_masks, betas, gammas, keys, *,
                           sims: int, max_time: int, coins: str = "bits16",
                           state_i8: bool = False, out_u16: bool = False):
    """B trials in ONE device program -> (I, R) SUMS [B, T, 2, n].

    The per-trial scan is vmapped over (seeds mask, beta, gamma, key) with
    the adjacency shared, so every step's neighbor-count matmuls batch into
    a single [B*sims, n] @ [n, n] MXU dot and ONE dispatch (+ one tunnel
    round-trip) serves the whole batch — label extraction for a trial matrix
    is tunnel-floor-bound per trial otherwise. With threefry coins
    (``bits16``) each trial's stream is bit-identical to the single-trial
    path under the same key (threefry vmaps exactly); ``rbg16`` streams are
    distinct but not reproductions of the unbatched stream (XLA's
    RngBitGenerator has no exact batching rule) — both are valid MC draws.
    """
    out = jax.vmap(
        lambda m, b, g, k: _scan_trial(
            a_mm, m, b, g, k, sims=sims, max_time=max_time, coins=coins,
            state_i8=state_i8,
        )
    )(seeds_masks, betas, gammas, keys)
    return out.astype(jnp.uint16) if out_u16 else out


def _expand_ir_sums(ir_sums, sims: int) -> np.ndarray:
    """[T, 2, n] (I, R) sums -> [T, 3, n] f32 (S, I, R) sums on the host."""
    arr = np.asarray(ir_sums, dtype=np.float32)
    s = np.float32(sims) - arr[:, 0] - arr[:, 1]
    return np.stack([s, arr[:, 0], arr[:, 1]], axis=1)


@partial(jax.jit, static_argnames=("sims", "max_time", "coins", "state_i8"))
def _simulate_chunk_per_sim(a_mm, seeds_mask, beta, gamma, key, *, sims: int,
                            max_time: int, coins: str = "bits16",
                            state_i8: bool = False):
    """Per-simulation indicator trajectories, [3, T, sims, n] uint8."""
    i0, r0 = _init_state(
        seeds_mask, sims, jnp.int8 if state_i8 else jnp.float32
    )
    log1m_beta = jnp.log1p(-jnp.float32(beta))
    gamma = jnp.float32(gamma)

    def step(carry, t):
        i, r = _sir_transition(*carry, a_mm, log1m_beta, gamma, key, t, coins)
        out = jnp.stack([1 - i - r, i, r]).astype(jnp.uint8)
        return (i, r), out

    _, states = jax.lax.scan(step, (i0, r0), jnp.arange(1, max_time))
    state0 = jnp.stack([1 - i0 - r0, i0, r0]).astype(jnp.uint8)[None]
    return jnp.concatenate([state0, states], axis=0).transpose(1, 0, 2, 3)


def simulate_sir_counts(
    graph: Graph,
    seed_nodes,
    beta: float,
    gamma: float,
    *,
    sims: int = 10000,
    max_time: int = 20,
    key=None,
    sims_chunk: int | None = None,
    coins: str = "auto",
    matmul: str = "auto",
):
    """Indicator-count sums [max_time, 3, n] (host f32) over ``sims``
    trajectories.

    ``sims_chunk`` bounds the [sims, n] working set for very large graphs
    (HBM control); chunks run sequentially, each fully vectorized.
    """
    coins = _resolve_coins(coins)
    key = jax.random.PRNGKey(0) if key is None else _raw_key(key)
    if matmul == "auto":
        # int8 MXU (s8xs8->s32) is exactly equal in output and measured
        # faster where the matmul dominates (enron 10k sims: 2,818/s vs
        # 2,229 bf16; openflights +6%; wiki-vote within tunnel noise);
        # CPU XLA lowers int8 dots poorly, so stay bf16 off-TPU
        matmul = "bf16" if jax.default_backend() == "cpu" else "int8"
    # int8 STATE carry (bit-identical output): after the I/R-carry drop the
    # round-2 "slower below ~4k nodes" result inverted — openflights (2.9k n)
    # measures +47% and wiki-vote +35% with it on (runs_r3/state_i8_ab.json)
    # — so it is now unconditional on the int8 matmul path; the pallas coin
    # kernel still consumes f32 states
    state_i8 = matmul == "int8" and coins != "pallas"
    a = _device_adjacency(graph, jnp.int8 if matmul == "int8" else jnp.bfloat16)
    seeds_mask = np.zeros(graph.n_nodes, np.float32)
    seeds_mask[np.asarray(seed_nodes)] = 1.0
    seeds_mask = jnp.asarray(seeds_mask)

    if sims_chunk is None or sims_chunk >= sims:
        ir = _simulate_chunk(
            a, seeds_mask, float(beta), float(gamma), key,
            sims=sims, max_time=max_time, coins=coins, state_i8=state_i8,
            out_u16=sims < 65536,  # halves tunnel-readback bytes, exact
        )
        return _expand_ir_sums(ir, sims)

    # equalize chunk sizes where possible: a ragged tail (e.g. 10000 in
    # 3000-chunks -> 3000,3000,3000,1000) is a SECOND static shape and a
    # second 15-300 s remote compile; k equal chunks of sims/k (2500 x 4
    # here) reuse one executable. Non-divisible sims falls back to the
    # ragged tail (still correct, one extra cached compile).
    n_chunks = -(-sims // sims_chunk)
    if sims % n_chunks == 0:
        sims_chunk = sims // n_chunks
    total = None
    done = 0
    chunk_id = 0
    while done < sims:
        c = min(sims_chunk, sims - done)
        ir = _simulate_chunk(
            a,
            seeds_mask,
            float(beta),
            float(gamma),
            jax.random.fold_in(key, 1000 + chunk_id),
            sims=c,
            max_time=max_time,
            coins=coins,
            state_i8=state_i8,
        )
        total = ir if total is None else total + ir
        done += c
        chunk_id += 1
    return _expand_ir_sums(total, sims)


def _auto_trials_chunk(n: int, sims: int, state_i8: bool) -> int:
    """Trials per batched dispatch, bounded by a conservative HBM budget.

    Per-trial working set ≈ [sims, n] x (I + R states, counts s32, coin
    words u32) plus fusion headroom; budget 4 GB leaves room for the dense
    adjacency and XLA scratch on a 16 GB v5e.
    """
    state_bytes = 1 if state_i8 else 4
    per_trial = sims * n * (2 * state_bytes + 4 + 4)
    return max(1, min(32, int(4e9 / max(per_trial, 1))))


def simulate_sir_counts_many(
    graph: Graph,
    trials,
    *,
    sims: int = 10000,
    max_time: int = 20,
    keys=None,
    trials_chunk: int | None = None,
    coins: str = "auto",
    matmul: str = "auto",
):
    """Indicator-count sums for MANY trials of one graph: returns a list of
    [max_time, 3, n] f32 arrays, one per ``(seed_nodes, beta, gamma)`` in
    ``trials``.

    TPU-first replacement for the reference's per-trial extraction loop
    (``ode_nn_ngraph_sim.py:190-206`` calls ``sir_torch`` once per trial):
    trials are batched ``trials_chunk`` at a time into one vmapped device
    program (one [B*sims, n] MXU matmul per step, one dispatch), amortizing
    the per-call dispatch/tunnel floor across the batch. ``trials_chunk``
    defaults to an HBM-derived size; the last chunk is padded to the full
    size with repeated trials so ONE compiled shape serves every dispatch.

    ``keys``: optional per-trial PRNG keys (defaults to fold_in(key0, idx)).
    With ``coins='bits16'`` each trial is bit-identical to the single-trial
    :func:`simulate_sir_counts` under the same key.
    """
    coins = _resolve_coins(coins)
    if matmul == "auto":
        matmul = "bf16" if jax.default_backend() == "cpu" else "int8"
    state_i8 = matmul == "int8"
    n = graph.n_nodes
    ntr = len(trials)
    if keys is None:
        k0 = jax.random.PRNGKey(0)
        keys = [jax.random.fold_in(k0, 1000 + j) for j in range(ntr)]
    keys = [_raw_key(k) for k in keys]
    if coins == "pallas":
        # the fused coin kernel has no batched-trials (vmap) path: fall back
        # to the single-trial program per trial so `--coins pallas` keeps
        # working through every extraction entry point
        return [
            simulate_sir_counts(
                graph, sn, b, g, sims=sims, max_time=max_time, key=keys[j],
                coins=coins, matmul=matmul,
            )
            for j, (sn, b, g) in enumerate(trials)
        ]
    if trials_chunk is None:
        # balance chunks so padding waste is bounded by n_chunks-1 trials
        # TOTAL (naive ceil-chunking can pad a near-empty final chunk: 16
        # trials at cap 13 would simulate 26 — measured 35% slower than the
        # balanced 2x8 split, runs_r3/batch_variants_openflights.json)
        cap = _auto_trials_chunk(n, sims, state_i8)
        n_chunks = -(-ntr // cap)
        trials_chunk = -(-ntr // n_chunks)
    if trials_chunk <= 1 or ntr == 1:
        return [
            simulate_sir_counts(
                graph, sn, b, g, sims=sims, max_time=max_time, key=keys[j],
                coins=coins, matmul=matmul,
            )
            for j, (sn, b, g) in enumerate(trials)
        ]

    a = _device_adjacency(graph, jnp.int8 if matmul == "int8" else jnp.bfloat16)
    masks = np.zeros((ntr, n), np.float32)
    betas = np.empty(ntr, np.float32)
    gammas = np.empty(ntr, np.float32)
    for j, (seed_nodes, beta, gamma) in enumerate(trials):
        masks[j, np.asarray(seed_nodes)] = 1.0
        betas[j], gammas[j] = beta, gamma
    keys_arr = jnp.stack(keys)

    out: list[np.ndarray] = []
    B = trials_chunk
    for lo in range(0, ntr, B):
        idx = list(range(lo, min(lo + B, ntr)))
        pad = idx + [idx[-1]] * (B - len(idx))  # fixed shape, surplus dropped
        ir = _simulate_chunk_trials(
            a, jnp.asarray(masks[pad]), jnp.asarray(betas[pad]),
            jnp.asarray(gammas[pad]), keys_arr[jnp.asarray(pad)],
            sims=sims, max_time=max_time, coins=coins, state_i8=state_i8,
            out_u16=sims < 65536,
        )
        ir_host = np.asarray(ir, dtype=np.float32)[: len(idx)]
        out.extend(_expand_ir_sums(row, sims) for row in ir_host)
    return out


def simulate_sir_many(
    graph: Graph,
    trials,
    *,
    sims: int = 10000,
    max_time: int = 20,
    keys=None,
    trials_chunk: int | None = None,
    coins: str = "auto",
    matmul: str = "auto",
):
    """Batched label triples: list of per-node (S, I, R) probability arrays
    (each [max_time, n]), one per trial. See :func:`simulate_sir_counts_many`.
    """
    sums = simulate_sir_counts_many(
        graph, trials, sims=sims, max_time=max_time, keys=keys,
        trials_chunk=trials_chunk, coins=coins, matmul=matmul,
    )
    out = []
    for arr in sums:
        probs = np.asarray(arr, dtype=np.float64) / float(sims)
        out.append((probs[:, 0, :], probs[:, 1, :], probs[:, 2, :]))
    return out


def simulate_sir_per_sim(
    graph: Graph,
    seed_nodes,
    beta: float,
    gamma: float,
    *,
    sims: int = 1000,
    max_time: int = 20,
    key=None,
    sims_chunk: int | None = None,
    coins: str = "auto",
    matmul: str = "auto",
):
    """Per-simulation indicator trajectories (S, I, R), each [sims, T, n] uint8.

    The reference's ``sir_pandas`` keeps full per-sim indicator tensors
    (``ode_nn.py:104-106``) enabling variance/quantile analyses over
    simulations (see :func:`sir_per_sim_stats`); :func:`simulate_sir_counts`
    only keeps running sums. Same knob surface as the counts path — ``coins``
    (rbg16/bits16/...), ``matmul`` (int8 MXU counts with the int8 state
    carry, bit-identical to bf16), ``sims_chunk`` (bounds the device-resident
    [sims_chunk, T, n] working set; chunks concatenate on the host, drawing
    the same per-chunk streams as the chunked counts path). The host-side
    tensor is still sims*T*n bytes per channel — at enron scale that is the
    binding constraint, exactly as it is for the reference's ``sir_pandas``.
    """
    coins = _resolve_coins(coins)
    key = jax.random.PRNGKey(0) if key is None else _raw_key(key)
    if matmul == "auto":
        matmul = "bf16" if jax.default_backend() == "cpu" else "int8"
    state_i8 = matmul == "int8" and coins != "pallas"
    a = _device_adjacency(graph, jnp.int8 if matmul == "int8" else jnp.bfloat16)
    seeds_mask = np.zeros(graph.n_nodes, np.float32)
    seeds_mask[np.asarray(seed_nodes)] = 1.0
    seeds_mask = jnp.asarray(seeds_mask)

    def one_chunk(k, c):
        states = _simulate_chunk_per_sim(
            a, seeds_mask, float(beta), float(gamma), k,
            sims=c, max_time=max_time, coins=coins, state_i8=state_i8,
        )
        return np.asarray(states)  # [3, T, c, n]

    if sims_chunk is None or sims_chunk >= sims:
        states = one_chunk(key, sims)
    else:
        # equalize chunk sizes exactly like the chunked counts path (one
        # compiled shape when divisible) — the two paths must draw the
        # SAME per-chunk sizes for their key schedules to aggregate
        n_chunks = -(-sims // sims_chunk)
        if sims % n_chunks == 0:
            sims_chunk = sims // n_chunks
        parts = []
        done, chunk_id = 0, 0
        while done < sims:
            c = min(sims_chunk, sims - done)
            # same per-chunk key schedule as the chunked counts path, so a
            # chunked per-sim run aggregates to the chunked counts run
            parts.append(one_chunk(jax.random.fold_in(key, 1000 + chunk_id), c))
            done += c
            chunk_id += 1
        states = np.concatenate(parts, axis=2)
    s, i, r = states[0], states[1], states[2]
    return s.transpose(1, 0, 2), i.transpose(1, 0, 2), r.transpose(1, 0, 2)


def sir_per_sim_stats(s, i, r):
    """Across-simulation statistics from per-sim indicator tensors.

    The analysis companion to :func:`simulate_sir_per_sim`, covering the
    reference's ``sir_pandas`` use case (``ode_nn.py:104-106``: per-sim
    tensors kept so callers can study run-to-run variability, not just the
    mean field). Returns ``{"mean": [3, T, n], "std": [3, T, n]}`` where
    axis 0 is (S, I, R); ``std`` is the Bernoulli per-node std over sims.

    Reduces each uint8 channel in place (f64 accumulators, [T, n] outputs
    only) — no float64 copy of the [sims, T, n] tensors, which at the
    wiki-vote scales this path targets would be 8x the indicator footprint.
    """
    mean = np.stack([np.mean(np.asarray(x), axis=0, dtype=np.float64)
                     for x in (s, i, r)])
    # indicators satisfy x^2 == x, so Var = E[x] - E[x]^2 = p(1-p): the std
    # follows from the mean with no second pass (np.std would materialize a
    # [sims, T, n] f64 `x - mean` temporary — ~1.1 GB at the wiki-vote
    # sims=1000 shape this path targets)
    std = np.sqrt(mean * (1.0 - mean))
    return {"mean": mean, "std": std}


def simulate_sir(
    graph: Graph,
    seed_nodes,
    beta: float,
    gamma: float,
    *,
    sims: int = 10000,
    max_time: int = 20,
    key=None,
    sims_chunk: int | None = None,
    coins: str = "auto",
    matmul: str = "auto",
):
    """Per-node S/I/R probabilities, each [max_time, n] (the label triple).

    Drop-in TPU replacement for ``load_SIR_labels``'s extractor call
    (``ode_nn_ngraph_sim.py:198-199``: ``sir_torch(...)[0] / sim``).
    """
    sums = simulate_sir_counts(
        graph,
        seed_nodes,
        beta,
        gamma,
        sims=sims,
        max_time=max_time,
        key=key,
        sims_chunk=sims_chunk,
        coins=coins,
        matmul=matmul,
    )
    probs = np.asarray(sums, dtype=np.float64) / float(sims)
    return probs[:, 0, :], probs[:, 1, :], probs[:, 2, :]
