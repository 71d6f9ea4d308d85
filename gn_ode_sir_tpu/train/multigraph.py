"""Multi-graph experiment assembly (the ``ode_nn_ngraphs``/``gnn_ngraphs`` path).

The reference trains one model across graphs of different sizes by
concatenating ragged node tensors (``ode_nn_ngraphs.py:179-196``) and
rebuilding a block-diagonal scipy adjacency inside every ODE function
evaluation (``:65-73``), with the graph id smuggled through feature column 2
(``:55``). Here every graph is padded once to (n_max, e_max); a trial carries
an explicit ``graph_idx``, and per-batch connectivity is a pure device gather
— the same ``fit`` engine serves single- and multi-graph experiments.

Split protocol reproduced from ``ode_nn_ngraphs.py:311-313,347-356`` /
``gnn_ngraphs.py:226-228,264-273``: all trials of the first G-1 graphs train;
the last graph's trials split half val / half test (reference:
``instances_per_graph=[36x5, 120]`` -> 180 train / 60 val / 60 test), so
evaluation measures transfer to an UNSEEN graph.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from gn_ode_sir_tpu.graphs import GraphBatch, pad_graphs
from gn_ode_sir_tpu.ops.adjacency import CooAdj, DenseAdj
from gn_ode_sir_tpu.train.data import build_trial_data


MG_DENSE_BYTES_LIMIT = 2 << 30  # auto picks dense below this stack size


def resolve_mg_kind(batch: GraphBatch, gcn_normalized: bool = False) -> str:
    """Resolve the 'auto' multigraph adjacency backend by scale + platform.

    Below the dense-stack HBM limit the [G, n, n] MXU gather wins (measured
    2.7x over COO at 7k-node padding). Above it, TPU gets the chunked
    Pallas kernel via the stacked-plan path (the measured-fastest sparse
    backend: 5.0 ms/apply on enron vs 7.5 COO, RESULTS.md) — callers then
    use :func:`multigraph_pallas2_fns` with graph-homogeneous batches.
    The CPU backend keeps COO segment-sum (interpret-mode Pallas crawls).
    """
    import jax

    itemsize = 4 if gcn_normalized else 2
    stack_bytes = batch.num_graphs * batch.n_max * batch.n_max * itemsize
    if stack_bytes <= MG_DENSE_BYTES_LIMIT:
        return "dense"
    return "coo" if jax.default_backend() == "cpu" else "pallas2"


@dataclasses.dataclass
class MultigraphConnectivity:
    """Resolved multigraph connectivity, backend-agnostic.

    Produced by :func:`multigraph_auto_fns`; feed straight into the training
    engine with ``fit(model, opt, params, data, tr, va, te,
    **conn.fit_kwargs(), ...)``. ``kind`` records the resolved backend
    ('dense' | 'coo' | 'pallas2'); ``batch_by_graph`` is True exactly when
    the backend needs graph-homogeneous minibatches (the stacked-Pallas2
    plans apply one graph's chunk grid to the whole batch).
    """

    adj_fn: object
    eval_adj_fn: object
    node_mask_fn: object
    aux: dict
    batch_by_graph: bool
    kind: str

    def fit_kwargs(self) -> dict:
        return {
            "adj_fn": self.adj_fn,
            "eval_adj_fn": self.eval_adj_fn,
            "node_mask_fn": self.node_mask_fn,
            "adj_aux": self.aux,
            "batch_by_graph": self.batch_by_graph,
        }


def multigraph_auto_fns(batch: GraphBatch, *, gcn_normalized: bool = False,
                        eval_graph: int = -1, kind: str = "auto",
                        **pallas_kw) -> MultigraphConnectivity:
    """Zero-config multigraph connectivity: resolve the backend by scale and
    platform, INCLUDING the above-dense-limit stacked-Pallas2 path.

    This is the library-user mirror of the worker's ``--mg_adj auto``
    dispatch (and of the reference's zero-config model dispatch,
    ``monitorer-ngraphs.py:25-30``): below the dense HBM limit it returns the
    [G, n, n] MXU gather; above it, TPU gets the chunked Pallas plans plus
    grouped batches — no ValueError, no backend-specific calling convention
    to learn. ``pallas_kw`` (``k_edges``, ``r_rows``, ``precision``,
    ``interpret``, ``per_graph_grid``) reaches
    :func:`multigraph_pallas2_fns` when that backend is selected.
    """
    import os

    # train_node_view is a BOTH-backend knob (dense gets the same view), so
    # pull it out before the "unused Pallas options" warning below; absent,
    # the operational escape hatch decides (mirrors GN_MG_PER_GRAPH_GRID:
    # turn the view off for running jobs without a code edit)
    node_view = pallas_kw.pop("train_node_view", None)
    explicit_view = node_view is not None
    if node_view is None:
        _nv_raw = os.environ.get("GN_MG_TRAIN_NODE_VIEW", "1").strip().lower()
        node_view = _nv_raw not in ("0", "false", "off", "no")
    if kind == "auto":
        kind = resolve_mg_kind(batch, gcn_normalized=gcn_normalized)
    if kind == "pallas2":
        tr_fn, ev_fn, mask_fn, aux = multigraph_pallas2_fns(
            batch, gcn_normalized=gcn_normalized, eval_graph=eval_graph,
            train_node_view=node_view, **pallas_kw)
        return MultigraphConnectivity(tr_fn, ev_fn, mask_fn, aux, True, kind)
    if pallas_kw:
        # scale-portable callers may set kernel knobs "for when it's big";
        # say so rather than letting them believe the knobs took effect
        import warnings

        warnings.warn(
            f"multigraph_auto_fns resolved to the {kind!r} backend; "
            f"Pallas-kernel options {sorted(pallas_kw)} are unused",
            stacklevel=2,
        )
    if kind != "dense" and explicit_view and node_view:
        # the COO per-sample gather has no sliced-plan variant: an explicit
        # request for the node-view saving must not silently no-op
        import warnings

        warnings.warn(
            f"train_node_view is not implemented for the {kind!r} backend; "
            "training runs at the full padded width",
            stacklevel=2,
        )
    adj_fn, mask_fn, aux = multigraph_adj_fns(
        batch, gcn_normalized=gcn_normalized, kind=kind)
    train_fn = adj_fn
    G = batch.num_graphs
    if kind == "dense" and G > 1 and node_view:
        # train-side node view for the dense backend too: the unseen-graph
        # protocol means no TRAIN trial ever needs the eval graph's rows, so
        # a pre-sliced train stack cuts each train step's [B, n, n] @
        # [B, n, h] MXU work by (n_max/n_train)^2 (wiki-vote-unseen config:
        # 5.8x). Sliced once, eagerly, ON DEVICE (one gather dispatch — no
        # host round-trip of the full stack through the tunnel); slicing the
        # gathered batch inside jit instead would rely on XLA fusing
        # slice-into-gather to avoid materializing full-width blocks.
        ev, train_ids, remap, n_train = _train_bucket(batch, eval_graph)
        if n_train < batch.n_max:
            aux = dict(aux)
            aux["dense_train"] = aux["dense"][
                jnp.asarray(np.asarray(train_ids, np.int32)),
                :n_train, :n_train]
            aux["dense_train_remap"] = jnp.asarray(remap)

            def train_fn(graph_idx, a):
                row = a["dense_train_remap"][graph_idx]
                return DenseAdj(a["dense_train"][row])

            train_fn.n_view = n_train
            train_fn.valid_train_graphs = frozenset(train_ids)
    return MultigraphConnectivity(train_fn, adj_fn, mask_fn, aux, False, kind)


def multigraph_adj_fns(batch: GraphBatch, gcn_normalized: bool = False,
                       kind: str = "auto"):
    """(adj_fn, node_mask_fn, adj_aux) for :func:`gn_ode_sir_tpu.train.fit`.

    ``adj_aux`` is the dict of connectivity arrays; pass it to
    ``fit(..., adj_aux=...)`` so it enters the compiled program as an
    ARGUMENT (a closure-captured device array would be baked into the HLO as
    a constant — megabytes-to-gigabytes of program text that can blow the
    compile). The closures take ``(graph_idx, aux)`` and do pure device
    gathers of per-trial rows.

    ``kind='dense'`` keeps a [G, n_max, n_max] adjacency stack (bf16 for the
    {0,1} case — exact; f32 when GCN-normalized) and gathers per-trial MXU
    blocks; ``'coo'`` gathers padded edge rows for segment-sum SpMM.
    """
    if kind == "auto":
        kind = resolve_mg_kind(batch, gcn_normalized=gcn_normalized)
        if kind == "pallas2":
            # this 3-tuple API can't carry the fast over-limit backend's
            # calling convention (separate eval adj_fn + grouped batches) —
            # point at the uniform auto API rather than silently serving the
            # measured-slowest COO
            raise ValueError(
                "auto resolved to the stacked-Pallas2 backend for this batch "
                "size; use multigraph_auto_fns(batch, ...) (uniform API, "
                "handles it) or multigraph_pallas2_fns(batch, ...) with "
                "fit(batch_by_graph=True), or pass kind='coo'/'dense' "
                "explicitly to keep heterogeneous batching"
            )
    if gcn_normalized:
        src, dst, w = _normalized_edges(batch)
    else:
        src, dst, w = batch.src, batch.dst, batch.edge_w
    n_max = batch.n_max

    def node_mask_fn(graph_idx, aux):
        return aux["node_mask"][graph_idx]

    if kind == "dense":
        dense = np.zeros((batch.num_graphs, n_max, n_max), np.float32)
        for g in range(batch.num_graphs):
            # additive scatter: padding edges land on (n_max-1, 0) with
            # weight 0 and must not overwrite a real entry there
            np.add.at(dense[g], (dst[g], src[g]), w[g])
        # keep f32 exactness when the stack is small; drop to bf16 (exact for
        # the {0,1} adjacency, activations round) only at scale
        f32_bytes = dense.size * 4
        dtype = (
            np.float32 if gcn_normalized or f32_bytes <= (512 << 20) else jnp.bfloat16
        )
        aux = {
            "dense": jnp.asarray(dense, dtype),
            "node_mask": batch.node_mask,
        }

        def adj_fn(graph_idx, aux):
            return DenseAdj(aux["dense"][graph_idx])

        return adj_fn, node_mask_fn, aux

    aux = {
        "src": src,
        "dst": dst,
        "w": w,
        "node_mask": batch.node_mask,
    }

    def adj_fn(graph_idx, aux):
        return CooAdj(
            aux["src"][graph_idx], aux["dst"][graph_idx], aux["w"][graph_idx], n_max
        )

    return adj_fn, node_mask_fn, aux


def _train_bucket(batch: GraphBatch, eval_graph: int):
    """(eval_id, train_ids, remap, n_train) for the train-side node view.

    One definition of the bucket rule for BOTH backends (dense and
    stacked-Pallas2): the train width is the largest non-eval graph's node
    count rounded up to 128 (tile-friendly [n, h] sublanes), capped at the
    global padding; ``remap[g]`` is g's row in the train-only stack.
    """
    G = batch.num_graphs
    ev = eval_graph % G
    train_ids = [g for g in range(G) if g != ev]
    if not train_ids:
        raise ValueError(
            "the unseen-eval-graph protocol needs at least 2 graphs in the "
            "batch (got 1: the eval graph would also be the only train "
            "graph) — use the single-graph path (adjacency_from_graph) "
            "instead")
    remap = np.zeros(G, np.int32)
    remap[train_ids] = np.arange(len(train_ids), dtype=np.int32)
    n_train = int(max(int(batch.n_nodes[g]) for g in train_ids))
    n_train = min(batch.n_max, -(-n_train // 128) * 128)
    return ev, train_ids, remap, n_train


def _real_edge_lists(batch: GraphBatch, graph_ids, gcn_normalized: bool):
    """Per-graph (src, dst, w) over REAL edges only (dst-sorted, the
    GraphBatch layout) — plan chunk counts then reflect each graph's true
    edge count, not the shared e_max padding."""
    if gcn_normalized:
        src, dst, w = _normalized_edges(batch)
        counts = [int(batch.n_edges[g]) + int(batch.n_nodes[g]) for g in graph_ids]
    else:
        src, dst, w = batch.src, batch.dst, batch.edge_w
        counts = [int(batch.n_edges[g]) for g in graph_ids]
    return [
        (src[g, :c], dst[g, :c], w[g, :c]) for g, c in zip(graph_ids, counts)
    ]


def multigraph_pallas2_fns(batch: GraphBatch, *, gcn_normalized: bool = False,
                           eval_graph: int = -1, k_edges: int = 512,
                           r_rows: int = 128, precision: str = "f32",
                           interpret: bool | None = None,
                           per_graph_grid: bool | None = None,
                           train_node_view: bool = False):
    """Stacked-Pallas2 connectivity for multigraph runs ABOVE the dense
    limit — the backend that takes the ngraphs protocol to enron scale.

    Returns ``(train_adj_fn, eval_adj_fn, node_mask_fn, aux)`` for
    ``fit(..., eval_adj_fn=..., batch_by_graph=True)``. Two bucketed plan
    stacks ride in ``aux`` (jit ARGUMENTS, never HLO constants):

    - the TRAIN stack covers only the non-eval graphs — a train step never
      traverses the 33k-node eval graph's chunk grid;
    - the EVAL stack covers all graphs at the full chunk count.

    With ``per_graph_grid`` (default), each minibatch traverses ONLY its own
    graph's real chunk grid: the adj is a ``lax.switch`` over per-graph
    statically-sliced plans (``ops.pallas_spmm2.Pallas2SwitchAdj``), so a
    dolphins step costs 1 chunk, not the stack-max ~200 — bit-identical
    output, strictly less grid + message-gather work. ``False`` keeps the
    padded-row gather (every step pays the stack's max chunk count; the
    measured round-3 behavior, kept for A/B probes).

    Both adj_fns apply ONE graph's plan per minibatch (``graph_idx[0]``),
    so batches MUST be graph-homogeneous (``fit(batch_by_graph=True)``
    builds them; the kernel then folds the whole batch into one grid pass —
    ``_fold_for_kernel``). Heterogeneous batching stays available via
    ``multigraph_adj_fns(kind='coo'|'dense')``.

    ``train_node_view=True`` builds the TRAIN adjacency at the train
    bucket's node width (largest non-eval graph, rounded up to 128) and
    declares it via ``train_adj_fn.n_view`` so :func:`fit` runs the whole
    compiled train epoch at that width — at the reference enron protocol
    the unseen eval graph sets n_max=33,696 while no train graph exceeds
    7,066, and the probe showed train-step cost is dominated by
    n_max-proportional HBM traffic (RESULTS.md round 4). Off by default:
    direct callers of ``train_adj_fn`` (SPMD steps, kernel A/B tests) feed
    full-width states; :func:`multigraph_auto_fns` turns it on.
    """
    import os

    from gn_ode_sir_tpu.ops.pallas_spmm2 import adj_from_stack, stacked_plans

    if per_graph_grid is None:
        # operational escape hatch: GN_MG_PER_GRAPH_GRID=0/false/off/no
        # reverts running jobs to the padded single-kernel grid without a
        # code edit (e.g. if the G-branch switch ever misbehaves in a
        # remote compile)
        raw = os.environ.get("GN_MG_PER_GRAPH_GRID", "1").strip().lower()
        per_graph_grid = raw not in ("0", "false", "off", "no")
    G = batch.num_graphs
    ev, train_ids, remap, n_train = _train_bucket(batch, eval_graph)
    n_max = batch.n_max
    kw = dict(k_edges=k_edges, r_rows=r_rows)
    train_stack, *t_counts = stacked_plans(
        _real_edge_lists(batch, train_ids, gcn_normalized), n_max, **kw)
    full_stack, *f_counts = stacked_plans(
        _real_edge_lists(batch, range(G), gcn_normalized), n_max, **kw)
    if not per_graph_grid:
        t_counts = f_counts = None
    elif max(f_counts[0][ev], f_counts[1][ev]) >= max(
            max(f_counts[0]), max(f_counts[1])):
        # reference protocol: the unseen eval graph is the LARGEST, so its
        # true chunk count IS the full-stack max — a per-graph switch on
        # the eval side would gain no runtime and compile G-1 dead kernel
        # variants through a tunnel where compiles run minutes. Keep the
        # padded single-kernel eval plan then; per-graph counts kick in
        # only when a smaller eval graph would otherwise pay the max grid.
        f_counts = None
    aux = {"node_mask": batch.node_mask, "p2t_remap": remap}
    aux.update({f"p2t_{k}": v for k, v in train_stack.items()})
    aux.update({f"p2f_{k}": v for k, v in full_stack.items()})

    def node_mask_fn(graph_idx, aux):
        return aux["node_mask"][graph_idx]

    # train bucket width from _train_bucket (shared with the dense backend);
    # plan chunk arrays are edge-derived so the SAME train stack serves any
    # output width >= the real node counts
    n_t = n_train if (train_node_view and n_train < n_max) else n_max

    def train_adj_fn(graph_idx, aux):
        row = aux["p2t_remap"][jnp.asarray(graph_idx).reshape(-1)[0]]
        stack = {k: aux[f"p2t_{k}"] for k in train_stack}
        return adj_from_stack(stack, row, n_t, k_edges=k_edges,
                              r_rows=r_rows, interpret=interpret,
                              precision=precision, counts=t_counts)

    if n_t < n_max:
        train_adj_fn.n_view = n_t
    # fit() validates train_idx stays inside these graphs — declared
    # UNCONDITIONALLY: the train plan stack excludes the eval graph even
    # at full width (remap[eval] is 0, so an eval-graph trial would
    # silently train against train-graph 0's connectivity), and under the
    # narrowed view an eval trial would additionally lose nodes
    train_adj_fn.valid_train_graphs = frozenset(train_ids)

    def eval_adj_fn(graph_idx, aux):
        stack = {k: aux[f"p2f_{k}"] for k in full_stack}
        return adj_from_stack(stack, graph_idx, n_max, k_edges=k_edges,
                              r_rows=r_rows, interpret=interpret,
                              precision=precision, counts=f_counts)

    # fit() refuses to run these with heterogeneous minibatches: adj_from_
    # stack applies graph_idx[0]'s plan to the WHOLE batch, which would
    # silently train most samples against the wrong graph's connectivity
    train_adj_fn.requires_grouped_batches = True
    eval_adj_fn.requires_grouped_batches = True
    return train_adj_fn, eval_adj_fn, node_mask_fn, aux


def _normalized_edges(batch: GraphBatch):
    """Per-graph GCN-normalized padded edges (self-loops on real nodes)."""
    G, e_max = batch.src.shape
    n_max = batch.n_max
    e_norm = e_max + n_max  # room for self-loops
    src = np.zeros((G, e_norm), np.int32)
    # padding dst = n_max-1 keeps each row dst-sorted (segment-sum sorted hint)
    dst = np.full((G, e_norm), n_max - 1, np.int32)
    w = np.zeros((G, e_norm), np.float32)
    for g in range(G):
        e = int(batch.n_edges[g])
        n = int(batch.n_nodes[g])
        # add_remaining_self_loops semantics, same as ops.gcn_norm_edges:
        # drop loops the graph already carries before appending one per
        # node — fb-food ships 11 loop edges, and double-counting them
        # inflated those nodes' degrees and rescaled every incident weight
        sg, dg = batch.src[g, :e], batch.dst[g, :e]
        keep = sg != dg
        sg, dg = sg[keep], dg[keep]
        s = np.concatenate([sg, np.arange(n, dtype=np.int32)])
        d = np.concatenate([dg, np.arange(n, dtype=np.int32)])
        deg = np.bincount(d, minlength=n_max).astype(np.float32)
        dinv = np.zeros(n_max, np.float32)
        dinv[:n] = 1.0 / np.sqrt(np.maximum(deg[:n], 1.0))
        ww = dinv[s] * dinv[d]
        order = np.lexsort((s, d))
        m = s.shape[0]  # e - dropped_loops + n
        src[g, :m] = s[order]
        dst[g, :m] = d[order]
        w[g, :m] = ww[order]
    return src, dst, w


def multigraph_split(instances_per_graph, eval_graph: int = -1):
    """(train_idx, val_idx, test_idx) with the reference's unseen-graph
    protocol: every trial of the non-eval graphs trains; the eval graph's
    trials split first-half val / second-half test."""
    counts = list(instances_per_graph)
    G = len(counts)
    eval_graph = eval_graph % G
    offsets = np.concatenate([[0], np.cumsum(counts)])
    train, val, test = [], [], []
    for g in range(G):
        idx = np.arange(offsets[g], offsets[g + 1])
        if g == eval_graph:
            half = len(idx) // 2
            val.extend(idx[:half])
            test.extend(idx[half:])
        else:
            train.extend(idx)
    return np.asarray(train), np.asarray(val), np.asarray(test)


def assemble_multigraph_trials(
    graphs,
    per_graph_params,
    *,
    label_dirs=None,
    sim: int = 10000,
    max_time: int = 20,
    node_multiple: int = 8,
    edge_multiple: int = 128,
    rng_key=None,
):
    """Build (GraphBatch, TrialData) for a multi-graph experiment.

    Args:
      graphs: list of :class:`~gn_ode_sir_tpu.graphs.Graph`.
      per_graph_params: per graph, a list of (seed_set, beta, gamma) trials.
      label_dirs: optional per-graph label-cache dirs (reference layout:
        ``Experiments-seed<k>-<graph>``); missing labels are extracted on
        device with the vectorized simulator.
    """
    import jax

    from gn_ode_sir_tpu.utils import load_or_extract_labels_many

    batch = pad_graphs(graphs, node_multiple, edge_multiple)
    if rng_key is None:
        rng_key = jax.random.PRNGKey(0)

    seed_sets, betas, gammas, triples, graph_idx = [], [], [], [], []
    for g_i, (graph, params) in enumerate(zip(graphs, per_graph_params)):
        save_dir = label_dirs[g_i] if label_dirs else None
        # cache misses batch into vmapped multi-trial device programs
        triples.extend(
            load_or_extract_labels_many(
                graph, list(params), sim=sim, max_time=max_time,
                save_dir=save_dir,
                keys=[jax.random.fold_in(rng_key, g_i * 100003 + t_i)
                      for t_i in range(len(params))],
            )
        )
        for seeds, beta, gamma in params:
            seed_sets.append(seeds)
            betas.append(beta)
            gammas.append(gamma)
            graph_idx.append(g_i)

    data = build_trial_data(
        batch.n_max, seed_sets, betas, gammas, triples,
        graph_idx=graph_idx, n_pad=batch.n_max,
    )
    return batch, data
