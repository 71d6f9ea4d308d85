"""Model zoo: GNODE (continuous-time graph-network ODE), GCN, GIN, DMP.

All families share the :mod:`gn_ode_sir_tpu.ops` message-passing primitives
and are plain-pytree functional models: ``Model.init(key) -> params`` and
``Model.apply(params, ...) -> predictions``, fully jit/vmap/pjit-composable.
"""

from gn_ode_sir_tpu.models.gnode import GNODE, gnode_ode_func, legacy_dense_gnode
from gn_ode_sir_tpu.models.gcn import GCN
from gn_ode_sir_tpu.models.gin import GIN
from gn_ode_sir_tpu.models.dmp import DMPSIR, cave_index
from gn_ode_sir_tpu.models.adapter import TimeUnrolledSIR

__all__ = [
    "GNODE",
    "GCN",
    "GIN",
    "DMPSIR",
    "TimeUnrolledSIR",
    "gnode_ode_func",
    "legacy_dense_gnode",
    "cave_index",
]
