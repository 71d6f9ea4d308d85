"""CLI layer: experiment worker + monitorer experiment-matrix driver.

The CLI (not the library) owns the host-specific data-root default: on this
box the reference checkout is mounted at ``/root/reference``, so relative
reference-style dataset paths ('./real_graphs/karate') resolve there unless
``GN_ODE_SIR_DATA_ROOT`` is already set (``graphs/load.py`` reads only the
env var). The default is applied inside each ``main()`` entry point — NOT
at import time — so programmatic users of ``worker.main`` / ``run_matrix``
and their subprocesses see unmutated process env unless they invoke the CLI.
"""

import os


def apply_data_root_default() -> None:
    """Set the host-specific dataset-root default (CLI entry points only)."""
    os.environ.setdefault("GN_ODE_SIR_DATA_ROOT", "/root/reference")
