"""Unit tests for the SpMM / segment-reduction kernel layer.

Strategy per SURVEY.md §4: validate every sparse primitive against the dense
matmul oracle on random graphs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gn_ode_sir_tpu.ops import (
    gcn_norm_edges,
    segment_prod,
    segment_sum,
    spmm,
    spmm_coo,
    spmm_coo_batched,
    spmm_dense,
)
from gn_ode_sir_tpu.ops.adjacency import CooAdj, DenseAdj, adjacency_from_graph


def test_spmm_coo_matches_dense(random_graph):
    g = random_graph
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((g.n_nodes, 16)), jnp.float32)
    dense = spmm_dense(jnp.asarray(g.dense_adjacency), x)
    coo = spmm_coo(jnp.asarray(g.src), jnp.asarray(g.dst), x, g.n_nodes)
    np.testing.assert_allclose(np.asarray(dense), np.asarray(coo), rtol=1e-5, atol=1e-5)


def test_spmm_batched_matches_loop(random_graph):
    g = random_graph
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((3, g.n_nodes, 8)), jnp.float32)
    batched = spmm_coo_batched(jnp.asarray(g.src), jnp.asarray(g.dst), x, g.n_nodes)
    for b in range(3):
        one = spmm_coo(jnp.asarray(g.src), jnp.asarray(g.dst), x[b], g.n_nodes)
        np.testing.assert_allclose(np.asarray(batched[b]), np.asarray(one), rtol=1e-5)


def test_spmm_dispatch(random_graph):
    g = random_graph
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((g.n_nodes, 4)), jnp.float32)
    a = spmm(g, x, prefer_dense=True)
    b = spmm(g, x, prefer_dense=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5)


def test_padded_edges_weighting(random_graph):
    g = random_graph
    e_max = g.n_edges + 37
    src, dst, w = g.padded_edges(e_max)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((g.n_nodes, 8)), jnp.float32)
    padded = spmm_coo(jnp.asarray(src), jnp.asarray(dst), x, g.n_nodes, jnp.asarray(w))
    exact = spmm_coo(jnp.asarray(g.src), jnp.asarray(g.dst), x, g.n_nodes)
    np.testing.assert_allclose(np.asarray(padded), np.asarray(exact), rtol=1e-5)


def test_segment_prod_identity_and_values():
    data = jnp.asarray([2.0, 3.0, 5.0, 7.0])
    ids = jnp.asarray([0, 0, 2, 2])
    out = segment_prod(data, ids, 4, indices_are_sorted=True)
    np.testing.assert_allclose(np.asarray(out), [6.0, 1.0, 35.0, 1.0])


def test_gcn_norm_edges(random_graph):
    g = random_graph
    src, dst, w = gcn_norm_edges(g)
    # dense oracle: D^-1/2 (A+I) D^-1/2
    a = g.dense_adjacency + np.eye(g.n_nodes, dtype=np.float32)
    d = a.sum(1)
    dinv = 1.0 / np.sqrt(d)
    a_norm = dinv[:, None] * a * dinv[None, :]
    x = np.random.default_rng(4).standard_normal((g.n_nodes, 8)).astype(np.float32)
    expect = a_norm @ x
    got = spmm_coo(jnp.asarray(src), jnp.asarray(dst), jnp.asarray(x), g.n_nodes, jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(got), expect, rtol=1e-4, atol=1e-4)


def test_graph_from_edges_rejects_out_of_range_ids():
    """Out-of-range node ids must raise up front: the native core's -1
    error return used to be read as 'library unavailable', falling through
    to the unvalidated numpy path where a -1 id floor-divides into a
    structurally wrong edge and dense_adjacency wraps it to the last node."""
    from gn_ode_sir_tpu.graphs import graph_from_edges

    with pytest.raises(ValueError, match="node id"):
        graph_from_edges(10, [(0, 1), (-1, 5)])
    with pytest.raises(ValueError, match="node id"):
        graph_from_edges(10, [(0, 10)])
    g = graph_from_edges(10, [(0, 9)])  # boundary ids stay valid
    assert g.n_edges == 2


def test_gcn_norm_edges_preexisting_self_loop():
    """A graph that already carries a self-loop must not get it doubled:
    PyG add_remaining_self_loops semantics — exactly one (i, i) edge per
    node afterwards, so the dense last-write-wins construction and the COO
    segment-sum path build the SAME normalized matrix."""
    from gn_ode_sir_tpu.graphs import graph_from_edges

    g = graph_from_edges(4, [(0, 1), (1, 2), (2, 3), (1, 1)], name="loopy")
    assert ((g.src == 1) & (g.dst == 1)).sum() == 1  # loaded loop, one copy
    src, dst, w = gcn_norm_edges(g)
    loops = src == dst
    assert int(loops.sum()) == g.n_nodes, "exactly one self-loop per node"
    # dense oracle built like the worker's GCN path (a[dst, src] = w)
    a_dense = np.zeros((4, 4), np.float32)
    a_dense[dst, src] = w
    x = np.random.default_rng(5).standard_normal((4, 8)).astype(np.float32)
    got = spmm_coo(jnp.asarray(src), jnp.asarray(dst), jnp.asarray(x),
                   g.n_nodes, jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(got), a_dense @ x,
                               rtol=1e-5, atol=1e-6)
    # degree of the loop node counts the loop ONCE: A+I row sum = 2 + 1
    a = np.zeros((4, 4), np.float32)
    a[g.dst[g.src != g.dst], g.src[g.src != g.dst]] = 1.0
    a += np.eye(4, dtype=np.float32)
    dinv = 1.0 / np.sqrt(a.sum(1))
    np.testing.assert_allclose(a_dense, dinv[:, None] * a * dinv[None, :],
                               rtol=1e-6)


def test_ell_adjacency_exact(random_graph):
    """Bucketed-ELL matvec == dense matvec exactly; work ratio bounded."""
    from gn_ode_sir_tpu.ops import EllAdj

    g = random_graph
    ell = EllAdj.from_graph(g)
    work = sum(int(np.prod(i.shape)) for i in ell.bucket_idx)
    assert work <= 2 * g.n_edges + 2 * g.n_nodes  # pow2 padding bound
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.random((2, g.n_nodes, 8)), jnp.float32)
    dense = adjacency_from_graph(g, prefer_dense=True)
    np.testing.assert_allclose(
        np.asarray(ell.matvec(x)), np.asarray(dense.matvec(x)), rtol=1e-5, atol=1e-5
    )
    # jit + grad flow through the pytree
    f = jax.jit(lambda a, x: a.matvec(x).sum())
    gr = jax.grad(lambda x: f(ell, x))(x)
    assert np.isfinite(np.asarray(gr)).all()


def test_ell_in_gnode(random_graph):
    """GNODE forward with EllAdj == with DenseAdj."""
    from gn_ode_sir_tpu.models import GNODE
    from gn_ode_sir_tpu.ops import EllAdj

    g = random_graph
    model = GNODE(hidden=8, max_time=6)
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(12)
    i0 = np.zeros((2, g.n_nodes), np.float32)
    i0[:, :2] = 1
    args = (jnp.asarray(1 - i0), jnp.asarray(i0), jnp.zeros((2, g.n_nodes)),
            jnp.asarray([0.3, 0.2]), jnp.asarray([0.1, 0.4]))
    a = model.predict(params, EllAdj.from_graph(g), *args)
    b = model.predict(params, adjacency_from_graph(g, prefer_dense=True), *args)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_adjacency_pytrees_jit(random_graph):
    g = random_graph
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.standard_normal((2, g.n_nodes, 8)), jnp.float32)
    dense = adjacency_from_graph(g, prefer_dense=True)
    coo = adjacency_from_graph(g, prefer_dense=False)

    @jax.jit
    def run(adj, x):
        return adj.matvec(x)

    np.testing.assert_allclose(
        np.asarray(run(dense, x)), np.asarray(run(coo, x)), rtol=1e-5, atol=1e-5
    )


def test_per_sample_coo_batch(random_graph):
    """CooAdj with a leading batch axis == per-sample loop."""
    g = random_graph
    rng = np.random.default_rng(7)
    e_max = g.n_edges + 128 - g.n_edges % 128
    src, dst, w = g.padded_edges(e_max)
    B = 3
    adj = CooAdj(
        jnp.asarray(np.stack([src] * B)),
        jnp.asarray(np.stack([dst] * B)),
        jnp.asarray(np.stack([w] * B)),
        g.n_nodes,
    )
    x = jnp.asarray(rng.standard_normal((B, g.n_nodes, 4)), jnp.float32)
    out = adj.matvec(x)
    for b in range(B):
        one = spmm_coo(jnp.asarray(g.src), jnp.asarray(g.dst), x[b], g.n_nodes)
        np.testing.assert_allclose(np.asarray(out[b]), np.asarray(one), rtol=1e-5)


def test_pallas_spmm2_interpret(random_graph):
    """Chunked MXU segment-sum kernel (v2) == COO oracle, incl. weights and
    chunk-boundary accumulation (tiny K/R force many chunks per row block)."""
    from gn_ode_sir_tpu.ops.pallas_spmm2 import SpmmPlan, spmm_pallas2

    g = random_graph
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((g.n_nodes, 16)), jnp.float32)
    ref = spmm_coo(jnp.asarray(g.src), jnp.asarray(g.dst), x, g.n_nodes)
    for k_edges, r_rows in ((16, 8), (64, 16)):
        plan = SpmmPlan.build(g.src, g.dst, g.n_nodes, k_edges=k_edges, r_rows=r_rows)
        out = spmm_pallas2(plan, x, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)
    w = rng.random(g.src.shape[0]).astype(np.float32)
    plan_w = SpmmPlan.build(g.src, g.dst, g.n_nodes, w=w, k_edges=32, r_rows=8)
    out_w = spmm_pallas2(plan_w, x, interpret=True)
    ref_w = spmm_coo(jnp.asarray(g.src), jnp.asarray(g.dst), x, g.n_nodes, edge_w=jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(out_w), np.asarray(ref_w), rtol=1e-4, atol=1e-4)


def test_pallas_spmm2_empty_plan_returns_zeros():
    """An edgeless graph builds a zero-chunk plan; the kernel's zero-init
    runs inside instance c==0, which never executes on a grid-(0,) launch —
    the call must short-circuit to explicit zeros, not return uninitialized
    memory."""
    from gn_ode_sir_tpu.ops.pallas_spmm2 import SpmmPlan, spmm_pallas2

    plan = SpmmPlan.build(np.zeros(0, np.int32), np.zeros(0, np.int32), 12,
                          k_edges=16, r_rows=8)
    assert plan.row_base.shape[0] == 0
    x = jnp.asarray(np.random.default_rng(0).standard_normal((12, 16)),
                    jnp.float32)
    out = spmm_pallas2(plan, x, interpret=True)
    assert out.shape == (12, 16)
    np.testing.assert_array_equal(np.asarray(out), 0.0)


def test_pallas2_adj_grad_matches_coo(random_graph):
    """Pallas2Adj (chunked kernel + transpose-plan custom VJP) must match the
    CooAdj forward AND gradient; plan arrays ride as pytree leaves (jit args,
    not HLO constants)."""
    from gn_ode_sir_tpu.ops.pallas_spmm2 import Pallas2Adj

    g = random_graph
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((2, g.n_nodes, 8)), jnp.float32)
    t = jnp.asarray(rng.standard_normal((2, g.n_nodes, 8)), jnp.float32)
    p2 = Pallas2Adj.from_graph(g, k_edges=32, r_rows=8)
    coo = adjacency_from_graph(g, prefer_dense=False)

    @jax.jit
    def loss(adj, xx):
        return (adj.matvec(xx) * t).sum()

    np.testing.assert_allclose(float(loss(p2, x)), float(loss(coo, x)), rtol=1e-5)
    g2 = jax.grad(lambda xx: loss(p2, xx))(x)
    gc = jax.grad(lambda xx: loss(coo, xx))(x)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(gc), rtol=1e-4, atol=1e-5)


def test_pallas2_switch_grad_asymmetric_plans():
    """Gradients through Pallas2SwitchAdj when the fwd and transpose plans
    have DIFFERENT true chunk counts (directed edge list: an out-star is
    R-limited forward, 1-chunk transposed). The custom VJP must shape each
    plan argument's zero cotangent from that argument — regression for the
    bwd rule building fwd-arg cotangents from transpose-plan arrays (shared
    padding used to mask the mismatch; true-count slicing exposed it)."""
    from gn_ode_sir_tpu.ops.pallas_spmm2 import adj_from_stack, stacked_plans

    n = 16
    src = np.zeros(15, np.int32)
    dst = np.arange(1, 16, dtype=np.int32)
    w = np.ones_like(src, np.float32)
    stack, cf, ct = stacked_plans([(src, dst, w)], n, k_edges=64, r_rows=4)
    assert cf != ct  # the shapes that used to crash the bwd rule
    adj = adj_from_stack(stack, jnp.zeros((1,), jnp.int32), n, k_edges=64,
                         r_rows=4, interpret=True, counts=(cf, ct))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, n, 4)), jnp.float32)
    A = np.zeros((n, n), np.float32)
    A[dst, src] = 1.0
    ref = np.einsum("ij,bjh->bih", A, np.asarray(x))
    np.testing.assert_allclose(np.asarray(adj.matvec(x)), ref,
                               rtol=1e-6, atol=1e-6)
    grad = jax.grad(lambda z: (adj.matvec(z) ** 2).sum())(x)
    ref_grad = 2 * np.einsum("ji,bjh->bih", A, ref)
    np.testing.assert_allclose(np.asarray(grad), ref_grad,
                               rtol=1e-5, atol=1e-6)


def test_pallas2_bf16_close_to_f32(random_graph):
    """precision='bf16' rounds messages to bf16 but accumulates f32: results
    must track the exact f32 kernel to bf16 rounding tolerance, fwd and grad."""
    from gn_ode_sir_tpu.ops.pallas_spmm2 import Pallas2Adj

    g = random_graph
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((2, g.n_nodes, 8)), jnp.float32)
    t = jnp.asarray(rng.standard_normal((2, g.n_nodes, 8)), jnp.float32)
    exact = Pallas2Adj.from_graph(g, k_edges=32, r_rows=8)
    fast = Pallas2Adj.from_graph(g, k_edges=32, r_rows=8, precision="bf16")

    @jax.jit
    def loss(adj, xx):
        return (adj.matvec(xx) * t).sum()

    scale = float(jnp.abs(exact.matvec(x)).max())
    np.testing.assert_allclose(
        np.asarray(fast.matvec(x)), np.asarray(exact.matvec(x)),
        atol=2e-2 * scale,
    )
    gf = jax.grad(lambda xx: loss(fast, xx))(x)
    ge = jax.grad(lambda xx: loss(exact, xx))(x)
    np.testing.assert_allclose(
        np.asarray(gf), np.asarray(ge),
        atol=2e-2 * float(jnp.abs(ge).max()),
    )


def test_pallas2_unaligned_h_padding(random_graph):
    """Every feature width pads up to the next multiple of 64 before entering
    the kernel (an unaligned h>64, e.g. --hidden 100, is the same Mosaic
    VMEM-block fault class as the h=1 crash): h in {1, 8, 100} must all
    match the COO oracle exactly after the internal pad+slice."""
    from gn_ode_sir_tpu.ops.pallas_spmm2 import Pallas2Adj

    g = random_graph
    rng = np.random.default_rng(11)
    p2 = Pallas2Adj.from_graph(g, k_edges=32, r_rows=8)
    coo = adjacency_from_graph(g, prefer_dense=False)
    for h in (1, 8, 100):
        x = jnp.asarray(rng.standard_normal((2, g.n_nodes, h)), jnp.float32)
        out = p2.matvec(x)
        assert out.shape == (2, g.n_nodes, h)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(coo.matvec(x)), rtol=1e-4, atol=1e-4
        )


def test_pallas2_default_geometry_pinned():
    """adjacency_from_graph builds pallas2 at the measured-optimal chunk
    geometry (k=2048 — 13-15% faster per apply than k=1024 on wiki-vote
    AND enron, runs_r5/probe_spmm_geometry.json); a silent default change
    regresses the large-graph SpMM path."""
    import numpy as np

    from gn_ode_sir_tpu.graphs.graph import graph_from_edges
    from gn_ode_sir_tpu.ops.adjacency import adjacency_from_graph

    rng = np.random.default_rng(0)
    edges = [(int(u), int(v)) for u, v in rng.integers(0, 64, (300, 2))
             if u != v]
    g = graph_from_edges(64, edges, name="geom")
    adj = adjacency_from_graph(g, kind="pallas2")
    assert adj.k_edges == 2048 and adj.r_rows == 256
