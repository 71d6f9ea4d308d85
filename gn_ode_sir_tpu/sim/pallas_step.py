"""Pallas TPU kernel for the MC-SIR state update (hardware PRNG).

The simulator step is matmul (neighbor counts, MXU — XLA already at
roofline) + coins/update (VPU + RNG). The RNG is the second-largest cost:
``jax.random.bits`` runs a threefry keystream over [sims, n] every step.
This kernel replaces it with the TPU's native per-core PRNG
(``pltpu.prng_random_bits``) and fuses coin thresholding with the S/I/R
state update in one VMEM pass:

  p_inf = 1 - (1-beta)^counts   (from the precomputed count matrix)
  w ~ uint32;  infect on (w & 0xffff) < p_inf * 2^16,
               recover on (w >> 16)  < gamma * 2^16      (bits16 coins)

Grid is 2-D over (sim-row, node-column) tiles of the [sims, n] state —
whole-row blocks at 10k sims x 7k nodes were 98 MB of scoped VMEM against
the 16 MB budget (the round-1 "remote compile service 500s": the HTTP
error wrapped a plain kernel VMEM OOM). Each tile seeds the PRNG from
(step_seed, row-block, col-block) so streams are independent across tiles
and steps.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _step_kernel(seed_ref, s_ref, i_ref, r_ref, counts_ref, params_ref,
                 s_out, i_out, r_out):
    # Mosaic caps prng_seed at two values: fold the 2-D grid coordinate
    # into one stream id (tiles stay on independent streams per step seed)
    tile = pl.program_id(0) * pl.num_programs(1) + pl.program_id(1)
    pltpu.prng_seed(seed_ref[0], tile)
    log1m_beta = params_ref[0]
    gamma16 = params_ref[1]  # gamma * 65536

    counts = counts_ref[:]
    # 1-(1-beta)^k via exp (expm1 has no Pallas TPU lowering; exp is fine at
    # the 2^-16 coin granularity)
    p_inf = 1.0 - jnp.exp(counts * log1m_beta)
    # int32 bit-twiddling: uint32->f32 casts have no TPU lowering, but the
    # masked 16-bit halves are non-negative int32 and int32->f32 is supported
    w = pltpu.bitcast(pltpu.prng_random_bits(counts.shape), jnp.int32)
    u = (w & 0xFFFF).astype(jnp.float32)
    v = (jax.lax.shift_right_logical(w, 16) & 0xFFFF).astype(jnp.float32)

    s = s_ref[:]
    i = i_ref[:]
    r = r_ref[:]
    new_inf = s * (u < p_inf * 65536.0)
    new_rec = i * (v < gamma16)
    s_out[:] = s - new_inf
    i_out[:] = i + new_inf - new_rec
    r_out[:] = r + new_rec


@functools.partial(
    jax.jit, static_argnames=("block_rows", "block_cols", "interpret")
)
def sir_update_pallas(s, i, r, counts, log1m_beta, gamma, seed,
                      *, block_rows: int = 256, block_cols: int = 512,
                      interpret: bool = False):
    """One fused SIR update over [sims, n] states. Returns (s', i', r').

    ``seed`` is an int32 scalar (vary per time step); ``counts`` is the
    infected-neighbor count matrix from the MXU matmul. Tile size defaults
    to 256 x 512 f32 (0.5 MB x 7 live blocks x double buffering ~= 7 MB of
    VMEM — comfortably under the 16 MB scoped budget at any [sims, n]).
    """
    sims, n = s.shape
    sims_pad = _round_up(sims, block_rows)
    n_pad = _round_up(n, block_cols)
    if sims_pad != sims or n_pad != n:
        pad = ((0, sims_pad - sims), (0, n_pad - n))
        s, i, r, counts = (jnp.pad(x, pad) for x in (s, i, r, counts))
    grid = (sims_pad // block_rows, n_pad // block_cols)
    params = jnp.stack([log1m_beta.astype(jnp.float32),
                        (gamma * 65536.0).astype(jnp.float32)])
    block = pl.BlockSpec((block_rows, block_cols), lambda b, c, *_: (b, c),
                         memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((sims_pad, n_pad), jnp.float32)
    s2, i2, r2 = pl.pallas_call(
        _step_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[block, block, block, block,
                      pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=(block, block, block),
        ),
        out_shape=(out_shape, out_shape, out_shape),
        interpret=interpret,
    )(jnp.asarray([seed], jnp.int32), s, i, r, counts, params)
    return s2[:sims, :n], i2[:sims, :n], r2[:sims, :n]
