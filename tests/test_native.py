"""Native C++ graph core vs numpy fallback: both paths must agree exactly."""

import importlib
import os

import numpy as np
import pytest

from gn_ode_sir_tpu import native


pytestmark = pytest.mark.skipif(
    not native.native_available(), reason="native toolchain unavailable"
)


def _raw_pairs(seed=0, m=500, n=80):
    rng = np.random.default_rng(seed)
    pairs = rng.integers(0, n, (m, 2), dtype=np.int32)
    # inject duplicates + both orientations + self loops
    pairs = np.concatenate([pairs, pairs[:50], pairs[:30, ::-1],
                            np.stack([np.arange(5), np.arange(5)], 1).astype(np.int32)])
    return pairs, n


def test_coalesce_matches_fallback():
    pairs, n = _raw_pairs()
    src_n, dst_n = native.coalesce_undirected(pairs, n)

    os.environ["GN_ODE_SIR_NO_NATIVE"] = "1"
    try:
        import gn_ode_sir_tpu.graphs.graph as gg
        g = gg.graph_from_edges(n, [tuple(p) for p in pairs], name="t")
    finally:
        del os.environ["GN_ODE_SIR_NO_NATIVE"]
    np.testing.assert_array_equal(src_n, g.src)
    np.testing.assert_array_equal(dst_n, g.dst)
    # sorted by dst then src; symmetric apart from self-loops
    assert np.all(np.diff(dst_n.astype(np.int64) * n + src_n) > 0)


def test_graph_from_edges_uses_native_consistently():
    """The public constructor gives identical graphs with and without native."""
    pairs, n = _raw_pairs(seed=3)
    from gn_ode_sir_tpu.graphs.graph import graph_from_edges

    g1 = graph_from_edges(n, [tuple(p) for p in pairs], name="t")
    os.environ["GN_ODE_SIR_NO_NATIVE"] = "1"
    try:
        g2 = graph_from_edges(n, [tuple(p) for p in pairs], name="t")
    finally:
        del os.environ["GN_ODE_SIR_NO_NATIVE"]
    np.testing.assert_array_equal(g1.src, g2.src)
    np.testing.assert_array_equal(g1.dst, g2.dst)


def test_csr_offsets(random_graph):
    g = random_graph
    offsets = native.csr_offsets(g.dst, g.n_nodes)
    from gn_ode_sir_tpu.ops import row_offsets_from_sorted_dst

    expect = row_offsets_from_sorted_dst(g.dst, g.n_nodes)
    np.testing.assert_array_equal(offsets, expect.astype(np.int64))


def test_reverse_edge_index(random_graph):
    g = random_graph
    cave = native.reverse_edge_index(g.src, g.dst, g.n_nodes)
    E = g.n_edges
    # every undirected edge has its reverse present
    for i in [0, 1, E // 2, E - 1]:
        j = cave[i]
        assert j < E
        assert g.src[j] == g.dst[i] and g.dst[j] == g.src[i]
    # sentinel when reverse missing
    src = np.asarray([0, 2], np.int32)
    dst = np.asarray([1, 1], np.int32)
    cave2 = native.reverse_edge_index(src, dst, 3)
    np.testing.assert_array_equal(cave2, [2, 2])


def test_degrees(random_graph):
    g = random_graph
    deg = native.degrees(g.dst, g.n_nodes)
    np.testing.assert_array_equal(deg, np.bincount(g.dst, minlength=g.n_nodes))


def test_spmm_plan_matches_fallback(random_graph):
    """Native chunk-plan build == the Python greedy loop, field by field
    (src gather rows, local dst with sentinel padding, chunk bases, weights)."""
    from gn_ode_sir_tpu.ops.pallas_spmm2 import SpmmPlan

    g = random_graph
    w = np.random.default_rng(9).random(g.n_edges).astype(np.float32)
    kw = dict(k_edges=32, r_rows=8)
    p_nat = SpmmPlan.build(g.src, g.dst, g.n_nodes, w=w, **kw)
    os.environ["GN_ODE_SIR_NO_NATIVE"] = "1"
    try:
        p_py = SpmmPlan.build(g.src, g.dst, g.n_nodes, w=w, **kw)
    finally:
        del os.environ["GN_ODE_SIR_NO_NATIVE"]
    np.testing.assert_array_equal(p_nat.src_padded, p_py.src_padded)
    np.testing.assert_array_equal(p_nat.dst_local, p_py.dst_local)
    np.testing.assert_array_equal(p_nat.row_base, p_py.row_base)
    np.testing.assert_array_equal(p_nat.w_padded, p_py.w_padded)
    # unweighted variant too
    q_nat = SpmmPlan.build(g.src, g.dst, g.n_nodes, **kw)
    os.environ["GN_ODE_SIR_NO_NATIVE"] = "1"
    try:
        q_py = SpmmPlan.build(g.src, g.dst, g.n_nodes, **kw)
    finally:
        del os.environ["GN_ODE_SIR_NO_NATIVE"]
    assert q_nat.w_padded is None and q_py.w_padded is None
    np.testing.assert_array_equal(q_nat.src_padded, q_py.src_padded)
    np.testing.assert_array_equal(q_nat.dst_local, q_py.dst_local)
    np.testing.assert_array_equal(q_nat.row_base, q_py.row_base)
