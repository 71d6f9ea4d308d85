"""Pallas TPU kernel v2 for sorted-COO SpMM: scatter-free, MXU-based.

Replaces the per-edge ``fori_loop`` of :mod:`gn_ode_sir_tpu.ops.pallas_spmm`
(v1, kept for reference) with a blocked design. The TPU has no fast scatter,
so the segment reduction is recast as a sequence of small dense matmuls:

  1. HOST (once per graph): greedily pack the dst-sorted edge list into
     chunks of at most ``K`` edges spanning at most ``R`` destination rows
     (:class:`SpmmPlan`). Power-law degree skew is absorbed naturally — hub
     rows fill chunks with few rows, tail rows fill rows with few edges;
     chunks are padded to exactly K edges with sentinel rows.
  2. XLA: gather messages ``x[src] * w`` — a row gather, which XLA lowers
     well on TPU (it is the SCATTER half of scatter-add that is slow).
  3. KERNEL (grid over chunks, sequential): build the chunk's one-hot
     routing matrix [R, K] from an iota/dst-local comparison (VPU) and
     accumulate ``onehot @ msgs`` (MXU, f32) into the VMEM-resident output
     at the chunk's base row. Sequential grid => race-free accumulation that
     never leaves the chip.

This is the TPU-native answer to the reference's ``scatter_add_`` SpMM
(``ode_nn_ngraph_sim.py:73``) and to torch-scatter's CUDA kernels
(SURVEY.md §2.3): the one-hot matmul costs R*K*h MACs per chunk — MXU
throughput makes the reduction free relative to the unavoidable
HBM traffic of reading one h-vector per edge.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


@dataclasses.dataclass(frozen=True)
class SpmmPlan:
    """Host-built chunk plan for one (graph, K, R) triple."""

    src_padded: np.ndarray  # [C*K] int32 gather rows (0 for padding)
    # [C, 8, K] int32 row-within-chunk (R for padding), replicated over a
    # sublane axis of 8: Mosaic requires VMEM block shapes whose last two
    # dims are (8k, 128k)-divisible, so a [1, K] block is not lowerable on
    # real hardware — the kernel reads replica 0.
    dst_local: np.ndarray
    row_base: np.ndarray  # [C] int32 first destination row of each chunk
    w_padded: np.ndarray | None  # [C*K] f32 edge weights (0 for padding)
    n_nodes: int
    k_edges: int
    r_rows: int

    @property
    def num_chunks(self) -> int:
        return self.row_base.shape[0]

    @staticmethod
    def build(src, dst, n_nodes: int, w=None, *, k_edges: int = 1024,
              r_rows: int = 256) -> "SpmmPlan":
        """Greedy (<=K edges, <R rows) chunking of a dst-sorted edge list."""
        src = np.asarray(src, np.int32)
        dst = np.asarray(dst, np.int32)
        assert np.all(np.diff(dst) >= 0), "edge list must be dst-sorted"
        E = dst.shape[0]

        # native host core (C++, the torch-geometric-C++ slot): one pass,
        # no per-chunk Python loop. Modest end-to-end win (0.165 s vs
        # 0.190 s for all 12 enron-protocol plans — the [C, 8, K] padding
        # materialization below dominates either way); equality-tested
        # against the fallback field-by-field (tests/test_native.py)
        from gn_ode_sir_tpu import native

        built = native.spmm_plan(src, dst, w, k_edges, r_rows)
        if built is not None:
            src_flat, dloc, base, w_flat = built
            C = base.shape[0]
        else:
            starts = [0]
            e = 0
            while e < E:
                r0 = dst[e]
                # furthest edge keeping <=K edges and dst < r0 + R
                hi = min(e + k_edges, E)
                hi = e + int(np.searchsorted(dst[e:hi], r0 + r_rows,
                                             side="left"))
                starts.append(hi)
                e = hi
            starts = np.asarray(starts, np.int64)
            C = starts.shape[0] - 1
            src_p = np.zeros((C, k_edges), np.int32)
            dloc = np.full((C, k_edges), r_rows, np.int32)  # sentinel pad
            base = np.zeros(C, np.int32)
            w_p = None if w is None else np.zeros((C, k_edges), np.float32)
            for c in range(C):
                s, t = starts[c], starts[c + 1]
                m = t - s
                base[c] = dst[s]
                src_p[c, :m] = src[s:t]
                dloc[c, :m] = dst[s:t] - dst[s]
                if w is not None:
                    w_p[c, :m] = np.asarray(w, np.float32)[s:t]
            src_flat = src_p.reshape(-1)
            w_flat = None if w_p is None else w_p.reshape(-1)
        return SpmmPlan(
            src_padded=src_flat,
            dst_local=np.ascontiguousarray(
                np.broadcast_to(dloc[:, None, :], (C, 8, k_edges))
            ),
            row_base=base,
            w_padded=w_flat,
            n_nodes=n_nodes,
            k_edges=k_edges,
            r_rows=r_rows,
        )


def _kernel(base_ref, dloc_ref, msgs_ref, out_ref, *, r_rows):
    c = pl.program_id(0)

    @pl.when(c == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    # one-hot routing [R, K]: row r collects the chunk edges with dst_local==r;
    # padding edges carry dst_local==R and match no row
    k = dloc_ref.shape[2]
    rows = jax.lax.broadcasted_iota(jnp.int32, (r_rows, k), 0)
    # one-hot in the message dtype: {0,1} is exact in bf16 too, and a bf16
    # one-hot x bf16 msgs dot runs at native MXU rate (f32 accumulate)
    onehot = (rows == dloc_ref[0, 0:1, :]).astype(msgs_ref.dtype)
    partial = jnp.dot(onehot, msgs_ref[:], preferred_element_type=jnp.float32)
    r0 = base_ref[c]
    out_ref[pl.ds(r0, r_rows), :] += partial


@functools.partial(
    jax.jit, static_argnames=("n_nodes", "k_edges", "r_rows", "interpret")
)
def _spmm2_call(row_base, dst_local, msgs, *, n_nodes, k_edges, r_rows, interpret):
    C = dst_local.shape[0]
    h = msgs.shape[1]
    if C == 0:
        # an empty plan (edgeless graph) would launch a grid-(0,) call whose
        # output buffer is never zero-initialized (the zero-init runs inside
        # kernel instance c==0, which never executes) — return the correct
        # all-zeros aggregation directly. Pallas2SwitchAdj clamps its branch
        # counts to 1 for the same hazard.
        return jnp.zeros((n_nodes, h), jnp.float32)
    n_pad = ((n_nodes + r_rows - 1) // r_rows) * r_rows + r_rows
    # Scoped-VMEM budget from the actual buffer sizes: the [n_pad, h] f32
    # output lives whole in VMEM (sequential race-free accumulation), and
    # Mosaic's stack accounting lands near 2x the output block (measured:
    # enron h=64 out 8.68 MB -> 16.56 MB scoped need, over the compiler's
    # 16 MB DEFAULT — not a hardware limit; v5e has 128 MiB VMEM). Request
    # 2.2x output + margin for double-buffered input blocks.
    msg_bytes = jnp.dtype(msgs.dtype).itemsize
    vmem_limit = int(
        2.2 * n_pad * h * 4
        + 4 * k_edges * h * msg_bytes
        + 4 * 8 * k_edges * 4
        + 2 * r_rows * k_edges * 4
        + (4 << 20)
    )
    vmem_limit = min(max(vmem_limit, 16 << 20), 120 << 20)
    out = pl.pallas_call(
        functools.partial(_kernel, r_rows=r_rows),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(C,),
            in_specs=[
                pl.BlockSpec((1, 8, k_edges), lambda c, *_: (c, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((k_edges, h), lambda c, *_: (c, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((n_pad, h), lambda c, *_: (0, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((n_pad, h), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_limit),
        interpret=interpret,
    )(row_base, dst_local, msgs)
    return out[:n_nodes]


def spmm_pallas2(plan: SpmmPlan, x, *, interpret: bool = False,
                 precision: str = "f32"):
    """out[d] = sum_{e: dst[e]==d} w[e] * x[src[e]] via the chunked kernel.

    ``x``: [n_nodes, h] f32. The gather ``x[plan.src_padded]`` runs in XLA
    (fast on TPU); only the reduction runs in Pallas. ``precision='bf16'``
    rounds the gathered messages to bf16 (halving their HBM traffic) and
    runs the one-hot routing matmul at native MXU bf16 rate; accumulation
    stays f32, so the reduction itself loses no further precision.
    """
    dt = jnp.bfloat16 if precision == "bf16" else jnp.float32
    msgs = jnp.asarray(x).astype(dt)[jnp.asarray(plan.src_padded)]
    if plan.w_padded is not None:
        msgs = msgs * jnp.asarray(plan.w_padded).astype(dt)[:, None]
    return _spmm2_call(
        jnp.asarray(plan.row_base),
        jnp.asarray(plan.dst_local),
        msgs,
        n_nodes=plan.n_nodes,
        k_edges=plan.k_edges,
        r_rows=plan.r_rows,
        interpret=interpret,
    )


def _apply_interpret_default():
    import jax

    return jax.devices()[0].platform == "cpu"


def _to_msgs(x, src, w, precision):
    dt = jnp.bfloat16 if precision == "bf16" else jnp.float32
    return x.astype(dt)[src] * w.astype(dt)[:, None]


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4))
def _spmm2_diff(n_nodes, k_edges, r_rows, interpret, precision,
                src_p, dloc, base, w_p, src_t, dloc_t, base_t, w_t, x):
    msgs = _to_msgs(x, src_p, w_p, precision)
    return _spmm2_call(base, dloc, msgs, n_nodes=n_nodes, k_edges=k_edges,
                       r_rows=r_rows, interpret=interpret)


def _spmm2_diff_fwd(n_nodes, k_edges, r_rows, interpret, precision,
                    src_p, dloc, base, w_p, src_t, dloc_t, base_t, w_t, x):
    out = _spmm2_diff(n_nodes, k_edges, r_rows, interpret, precision,
                      src_p, dloc, base, w_p, src_t, dloc_t, base_t, w_t, x)
    return out, (src_p, dloc, base, w_p, src_t, dloc_t, base_t, w_t)


def _spmm2_diff_bwd(n_nodes, k_edges, r_rows, interpret, precision, res, g):
    """d/dx = the TRANSPOSE SpMM of the cotangent: same kernel, src/dst
    swapped plan (src-sorted edges). Plan arrays get zero cotangents —
    shaped per-argument: the fwd and transpose plans have DIFFERENT chunk
    counts whenever in/out degree distributions differ (true-count slicing
    in Pallas2SwitchAdj exposes this; shared padding used to mask it)."""
    src_p, dloc, base, w_p, src_t, dloc_t, base_t, w_t = res
    msgs = _to_msgs(g, src_t, w_t, precision)
    dx = _spmm2_call(base_t, dloc_t, msgs, n_nodes=n_nodes, k_edges=k_edges,
                     r_rows=r_rows, interpret=interpret)
    zi = lambda a: np.zeros(a.shape, jax.dtypes.float0)
    return (zi(src_p), zi(dloc), zi(base), jnp.zeros_like(w_p),
            zi(src_t), zi(dloc_t), zi(base_t), jnp.zeros_like(w_t), dx)


_spmm2_diff.defvjp(_spmm2_diff_fwd, _spmm2_diff_bwd)


# Measured-safe VMEM budget for the kernel's [n_pad, h_eff] f32 output
# block (enron at h=64 is 8.7 MB and runs; whole-row blocks near 16 MB
# fault — CLAUDE.md / sim pallas history). Bounds the batch fold below.
_OUT_VMEM_BUDGET = 9 << 20


def _fold_group_limit(n_nodes: int, r_rows: int,
                      budget: int = _OUT_VMEM_BUDGET) -> int:
    """Max folded feature width sharing ONE kernel pass (see _fold_for_kernel)."""
    n_pad = ((n_nodes + r_rows - 1) // r_rows) * r_rows + r_rows
    max_h = (budget // (n_pad * 4)) // 64 * 64
    return max(64, max_h)


def _fold_for_kernel(x, fold_group: int):
    """Fold a [B, n, h] batch into lane-aligned kernel blocks.

    The plan is SHARED across the batch, so the batch dim can fold into the
    feature dim: samples [n, h] stack side-by-side into one [n, g*h] message
    block and ONE kernel pass serves g samples (the multigraph train path
    batches 8 trials of the same graph — 8x fewer grid traversals than a
    per-sample lax.map). Group size g is bounded by the kernel's VMEM
    output-block budget (``fold_group``).

    Mosaic faults on non-lane-aligned VMEM blocks: the kernel's (k_edges, h)
    message block needs a lane-aligned h (h=1 from the classical-baseline
    matvec crashed the TPU worker; 64 is the measured-working width).
    Zero-pad the folded feature dim up to the next multiple of 64 — not just
    h<64: an unaligned h>64 (e.g. --hidden 100) is the same fault class —
    and slice back.

    Returns ``(folded, unfold)`` where ``unfold`` maps the kernel output
    stack back to the caller's [B, n, h] layout.
    """
    b, n, h = x.shape
    g = max(1, min(b, fold_group // h))
    b_pad = (-b) % g
    if b_pad:
        x = jnp.pad(x, ((0, b_pad), (0, 0), (0, 0)))
    if g > 1:
        # [B/g, g, n, h] -> [B/g, n, g*h] (sample-major feature columns)
        x = x.reshape(-1, g, n, h).transpose(0, 2, 1, 3).reshape(-1, n, g * h)
    hf = x.shape[-1]
    pad = (-hf) % 64
    if pad:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, pad)))

    def unfold(out):
        if pad:
            out = out[..., :hf]
        if g > 1:
            out = out.reshape(-1, n, g, h).transpose(0, 2, 1, 3).reshape(-1, n, h)
        return out[:b] if b_pad else out

    return x, unfold


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class Pallas2Adj:
    """Adjacency pytree backed by the chunked Pallas kernel (fwd + VJP).

    Drop-in for :class:`~gn_ode_sir_tpu.ops.adjacency.CooAdj`: models call
    ``adj.matvec(x)`` with x [B, n, h]. Plan arrays are pytree LEAVES so they
    enter jitted programs as arguments, never as HLO constants.
    """

    src_p: jnp.ndarray
    dloc: jnp.ndarray
    base: jnp.ndarray
    w_p: jnp.ndarray
    src_t: jnp.ndarray
    dloc_t: jnp.ndarray
    base_t: jnp.ndarray
    w_t: jnp.ndarray
    n_nodes: int
    k_edges: int
    r_rows: int
    interpret: bool = False
    precision: str = "f32"

    @staticmethod
    def from_graph(graph, w=None, *, k_edges: int = 512, r_rows: int = 128,
                   interpret: bool | None = None,
                   precision: str = "f32") -> "Pallas2Adj":
        src = np.asarray(graph.src, np.int32)
        dst = np.asarray(graph.dst, np.int32)
        fwd = SpmmPlan.build(src, dst, graph.n_nodes,
                             w=np.ones(src.shape[0], np.float32) if w is None else w,
                             k_edges=k_edges, r_rows=r_rows)
        # transpose plan: swap src/dst, re-sort by the new dst (= old src)
        order = np.argsort(src, kind="stable")
        twd = SpmmPlan.build(dst[order], src[order], graph.n_nodes,
                             w=(np.ones(src.shape[0], np.float32) if w is None
                                else np.asarray(w, np.float32))[order],
                             k_edges=k_edges, r_rows=r_rows)
        if interpret is None:
            interpret = _apply_interpret_default()
        return Pallas2Adj(
            src_p=jnp.asarray(fwd.src_padded), dloc=jnp.asarray(fwd.dst_local),
            base=jnp.asarray(fwd.row_base), w_p=jnp.asarray(fwd.w_padded),
            src_t=jnp.asarray(twd.src_padded), dloc_t=jnp.asarray(twd.dst_local),
            base_t=jnp.asarray(twd.row_base), w_t=jnp.asarray(twd.w_padded),
            n_nodes=graph.n_nodes, k_edges=k_edges, r_rows=r_rows,
            interpret=bool(interpret), precision=precision,
        )

    # instance/class override point for the fold budget (tests exercise
    # g=1 / small-group / whole-batch folds through it)
    _OUT_VMEM_BUDGET = _OUT_VMEM_BUDGET

    def matvec(self, x):
        x, unfold = _fold_for_kernel(
            x, _fold_group_limit(self.n_nodes, self.r_rows,
                                 self._OUT_VMEM_BUDGET))

        def one(xb):
            return _spmm2_diff(
                self.n_nodes, self.k_edges, self.r_rows, self.interpret,
                self.precision,
                self.src_p, self.dloc, self.base, self.w_p,
                self.src_t, self.dloc_t, self.base_t, self.w_t, xb,
            )

        return unfold(jax.lax.map(one, x))

    def tree_flatten(self):
        leaves = (self.src_p, self.dloc, self.base, self.w_p,
                  self.src_t, self.dloc_t, self.base_t, self.w_t)
        return leaves, (self.n_nodes, self.k_edges, self.r_rows,
                        self.interpret, self.precision)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, n_nodes=aux[0], k_edges=aux[1], r_rows=aux[2],
                   interpret=aux[3], precision=aux[4])


_PLAN_KEYS = ("src_p", "dloc", "base", "w_p", "src_t", "dloc_t", "base_t", "w_t")


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class Pallas2SwitchAdj:
    """Stacked-plan adjacency that traverses ONLY the selected graph's real
    chunk grid.

    The plain stacked path (:class:`Pallas2Adj` via a padded-row gather) pads
    every graph's plan to the stack's max chunk count, so a train step on a
    1-chunk graph (dolphins, 159 edges) traverses the biggest train graph's
    grid (wiki-vote, ~200 chunks) AND gathers the padded message block —
    ~200x the work at the reference ngraphs composition. Here ``matvec``
    is a ``lax.switch`` over per-graph branches, each statically sliced to
    that graph's TRUE (fwd, transpose) chunk counts, so grid steps and the
    message gather scale with the selected graph's real edges.

    Bit-identical to the padded gather: padding chunks accumulate exact f32
    zeros at base row 0 and padded messages gather x[0]*0.0, so removing
    them changes no output bit. The selector ``row`` stays a traced scalar —
    one compiled program serves every graph (G kernel variants compile once).
    """

    stack: dict  # the 8 _PLAN_KEYS arrays, each [G, ...] (pytree leaves)
    row: jnp.ndarray  # scalar int32 stack row to apply
    counts_fwd: tuple  # static per-row true chunk counts, fwd plans
    counts_twd: tuple  # static per-row true chunk counts, transpose plans
    n_nodes: int
    k_edges: int
    r_rows: int
    interpret: bool = False
    precision: str = "f32"

    def _branch(self, g: int, xb):
        s, K = self.stack, self.k_edges
        # clamp to one chunk: a zero-edge graph would slice to a grid-(0,)
        # pallas_call whose output is never zero-initialized (the c==0 init
        # runs inside the kernel body); one sentinel chunk accumulates
        # exactly zero instead, preserving the bit-identical guarantee
        cf = max(1, self.counts_fwd[g])
        ct = max(1, self.counts_twd[g])
        return _spmm2_diff(
            self.n_nodes, K, self.r_rows, self.interpret, self.precision,
            s["src_p"][g, : cf * K], s["dloc"][g, :cf], s["base"][g, :cf],
            s["w_p"][g, : cf * K],
            s["src_t"][g, : ct * K], s["dloc_t"][g, :ct], s["base_t"][g, :ct],
            s["w_t"][g, : ct * K],
            xb,
        )

    _OUT_VMEM_BUDGET = _OUT_VMEM_BUDGET

    def matvec(self, x):
        x, unfold = _fold_for_kernel(
            x, _fold_group_limit(self.n_nodes, self.r_rows,
                                 self._OUT_VMEM_BUDGET))
        branches = [
            (lambda xb, g=g: self._branch(g, xb))
            for g in range(len(self.counts_fwd))
        ]

        def one(xb):
            if len(branches) == 1:
                return branches[0](xb)
            return jax.lax.switch(self.row, branches, xb)

        return unfold(jax.lax.map(one, x))

    def tree_flatten(self):
        return (self.stack, self.row), (
            self.counts_fwd, self.counts_twd, self.n_nodes, self.k_edges,
            self.r_rows, self.interpret, self.precision,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        stack, row = children
        return cls(stack, row, *aux)


def _pad_plan(plan: SpmmPlan, c_max: int):
    """Pad a plan's chunk arrays to ``c_max`` chunks. Padding chunks carry
    dst_local == r_rows everywhere (the sentinel matches no one-hot row), so
    the kernel accumulates exactly zero for them at base row 0."""
    C, K, R = plan.num_chunks, plan.k_edges, plan.r_rows
    pad_c = c_max - C
    src_p = np.concatenate([plan.src_padded, np.zeros(pad_c * K, np.int32)])
    dloc = np.concatenate(
        [plan.dst_local, np.full((pad_c, 8, K), R, np.int32)], axis=0
    )
    base = np.concatenate([plan.row_base, np.zeros(pad_c, np.int32)])
    w_p = np.concatenate([plan.w_padded, np.zeros(pad_c * K, np.float32)])
    return src_p, dloc, base, w_p


def stacked_plans(edge_lists, n_nodes: int, *, k_edges: int = 512,
                  r_rows: int = 128) -> dict:
    """Stack per-graph (fwd, transpose) chunk plans to a SHARED (C, K, R)
    geometry for the multigraph per-sample path.

    ``edge_lists``: per graph, (src, dst, w) over its REAL edges with dst
    sorted ascending (the :class:`~gn_ode_sir_tpu.graphs.batch.GraphBatch`
    layout). Every graph's plan pads to the max chunk count, so a per-batch
    gather of one graph's plan rows is a static-shape device op and all
    batches share one compiled program.

    Returns ``(stack, counts_fwd, counts_twd)``: the dict of [G, ...] plan
    arrays under ``_PLAN_KEYS`` (safe to ship whole into a jitted aux), and
    two static per-graph true chunk-count tuples for
    :class:`Pallas2SwitchAdj` — kept OUT of the dict so tree-mapping the
    stack to device can never silently turn trace-time grid sizes into
    arrays.
    """
    fwd, twd = [], []
    for src, dst, w in edge_lists:
        src = np.asarray(src, np.int32)
        dst = np.asarray(dst, np.int32)
        w = np.asarray(w, np.float32)
        fwd.append(SpmmPlan.build(src, dst, n_nodes, w=w,
                                  k_edges=k_edges, r_rows=r_rows))
        order = np.argsort(src, kind="stable")
        twd.append(SpmmPlan.build(dst[order], src[order], n_nodes, w=w[order],
                                  k_edges=k_edges, r_rows=r_rows))
    c_max = max(p.num_chunks for p in fwd + twd)
    stacks = {k: [] for k in _PLAN_KEYS}
    for f, t in zip(fwd, twd):
        for k, arr in zip(_PLAN_KEYS[:4], _pad_plan(f, c_max)):
            stacks[k].append(arr)
        for k, arr in zip(_PLAN_KEYS[4:], _pad_plan(t, c_max)):
            stacks[k].append(arr)
    out = {k: np.stack(v) for k, v in stacks.items()}
    return (out, tuple(p.num_chunks for p in fwd),
            tuple(p.num_chunks for p in twd))


def adj_from_stack(stack, graph_idx, n_nodes: int, *, k_edges: int,
                   r_rows: int, interpret: bool | None = None,
                   precision: str = "f32", counts=None):
    """Select ONE graph's plan from a stacked-plan dict (device op).

    ``graph_idx`` must be a scalar (or [B] of EQUAL ids — only element 0 is
    read: callers batch graph-homogeneously, see
    ``train.multigraph.multigraph_pallas2_fns``). ``k_edges``/``r_rows`` are
    the STATIC geometry the stack was built with (they cannot ride inside a
    traced aux dict).

    With ``counts`` — the ``(counts_fwd, counts_twd)`` static tuples from
    :func:`stacked_plans` — returns a :class:`Pallas2SwitchAdj` whose kernel
    grid covers only the selected graph's REAL chunks (bit-identical,
    strictly less work). Without it, falls back to gathering the padded plan
    row into a :class:`Pallas2Adj` (every graph pays the stack's max chunk
    count).
    """
    g0 = jnp.asarray(graph_idx).reshape(-1)[0]
    if interpret is None:
        interpret = _apply_interpret_default()
    if counts is not None:
        return Pallas2SwitchAdj(
            stack={k: stack[k] for k in _PLAN_KEYS}, row=g0,
            counts_fwd=tuple(counts[0]), counts_twd=tuple(counts[1]),
            n_nodes=n_nodes, k_edges=k_edges, r_rows=r_rows,
            interpret=bool(interpret), precision=precision,
        )
    return Pallas2Adj(
        *(stack[k][g0] for k in _PLAN_KEYS),
        n_nodes=n_nodes, k_edges=k_edges, r_rows=r_rows,
        interpret=bool(interpret), precision=precision,
    )
