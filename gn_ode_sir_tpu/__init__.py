"""gn_ode_sir_tpu — a TPU-native JAX framework for learning SIR epidemic
dynamics on graphs with continuous-time Graph-Network ODEs.

Re-designed from scratch for TPU (JAX / XLA / Pallas / pjit) with the same
capabilities as the reference PyTorch codebase sissykosm/GN-ODE-SIR:

- ``graphs``   — graph ingestion (networkx pickles -> static COO/CSR arrays),
                 multi-graph padded batching (replaces per-f-eval
                 ``scipy.sparse.block_diag``, reference
                 ``ode_nn_ngraph_sim.py:68-70``).
- ``ops``      — SpMM / segment reductions (MXU dense path, sorted-COO
                 segment-sum path, Pallas TPU kernel) replacing
                 torch-scatter / torch-sparse.
- ``odeint``   — fixed-step euler/rk4/midpoint + adaptive dopri5 solvers via
                 ``lax.scan`` with checkpointed or backsolve-adjoint gradients,
                 replacing ``torchdiffeq.odeint_adjoint``.
- ``sim``      — Monte-Carlo SIR label extraction, vmapped over simulations
                 and sharded over a device mesh, replacing
                 sir_torch/sir_pandas/sir_nx (reference ``ode_nn.py:30-211``);
                 plus the classical mean-field RK baseline.
- ``models``   — GNODE (continuous-time graph-network ODE), GCN, GIN,
                 and DMP (dynamic message passing) model families.
- ``train``    — L1 training/eval loops, trial splits (incl. out-of-dist),
                 optax optimizers, Orbax checkpointing, CSV metric sink.
- ``parallel`` — device mesh construction, sharding rules, and
                 ``shard_map``-based data/edge parallelism.
- ``cli``      — experiment drivers (worker + monitorer experiment matrix).
"""

__version__ = "0.1.0"

from gn_ode_sir_tpu import graphs, models, odeint, ops, parallel, sim, train, utils

__all__ = [
    "graphs",
    "models",
    "odeint",
    "ops",
    "parallel",
    "sim",
    "train",
    "utils",
    "__version__",
]
