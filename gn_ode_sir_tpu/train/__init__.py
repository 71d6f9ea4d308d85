"""Training/evaluation layer (L4): loss, trial datasets, loops, checkpoints.

Rebuilds the reference's per-script train/test/main plumbing
(``ode_nn_ngraph_sim.py:208-486`` and friends) as one reusable engine:
epoch-level ``lax.scan`` training (no per-sample Python dispatch), the
best-val-triggers-test protocol, in-distribution and out-of-distribution
trial splits, the CSV metric sink, and Orbax checkpointing (a capability the
reference lacks — it never calls ``torch.save``; SURVEY.md §5).
"""

from gn_ode_sir_tpu.train.loss import l1_sir_loss, masked_l1
from gn_ode_sir_tpu.train.data import (
    TrialData,
    build_trial_data,
    make_out_of_dist_split,
    out_of_dist_split,
    split_indices,
)
from gn_ode_sir_tpu.train.loop import (
    FitResult,
    fit,
    make_eval_fn,
    make_eval_per_trial_fn,
    make_train_epoch_fn,
)
from gn_ode_sir_tpu.train.checkpoint import restore_checkpoint, save_checkpoint
from gn_ode_sir_tpu.train.ensemble import (
    EnsembleFitResult,
    fit_ensemble,
    init_ensemble,
)
from gn_ode_sir_tpu.train.multigraph import (
    MultigraphConnectivity,
    assemble_multigraph_trials,
    multigraph_adj_fns,
    multigraph_auto_fns,
    multigraph_pallas2_fns,
    multigraph_split,
    resolve_mg_kind,
)

__all__ = [
    "l1_sir_loss",
    "masked_l1",
    "TrialData",
    "build_trial_data",
    "split_indices",
    "out_of_dist_split",
    "make_out_of_dist_split",
    "FitResult",
    "fit",
    "make_eval_fn",
    "make_eval_per_trial_fn",
    "make_train_epoch_fn",
    "save_checkpoint",
    "restore_checkpoint",
    "EnsembleFitResult",
    "fit_ensemble",
    "init_ensemble",
    "MultigraphConnectivity",
    "assemble_multigraph_trials",
    "multigraph_adj_fns",
    "multigraph_auto_fns",
    "multigraph_pallas2_fns",
    "multigraph_split",
    "resolve_mg_kind",
]
