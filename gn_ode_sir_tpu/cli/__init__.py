"""CLI layer: experiment worker + monitorer experiment-matrix driver.

The CLI (not the library) owns the host-specific data-root default: on this
box the reference checkout is mounted at ``/root/reference``, so relative
reference-style dataset paths ('./real_graphs/karate') resolve there unless
``GN_ODE_SIR_DATA_ROOT`` is already set (``graphs/load.py`` reads only the
env var).
"""

import os

os.environ.setdefault("GN_ODE_SIR_DATA_ROOT", "/root/reference")
