"""Wall-clock timing helpers with device synchronization.

The reference times with bare ``time.time()`` around async CUDA launches
(``ode_nn_ngraph_sim.py:224-228``); on TPU that would measure dispatch, not
compute, so the timer blocks on the result.
"""

from __future__ import annotations

import time

import jax


class Timer:
    """``with Timer() as t: ...; t.seconds`` — blocks on ``block_on`` pytree."""

    def __init__(self, block_on=None):
        self._block_on = block_on
        self.seconds = 0.0

    def __enter__(self):
        self._start = time.perf_counter()
        return self

    def __exit__(self, *exc):
        if self._block_on is not None:
            jax.block_until_ready(self._block_on)
        self.seconds = time.perf_counter() - self._start
        return False

    def block_on(self, x):
        """Record what to synchronize on before stopping the clock."""
        self._block_on = x
        return x


def timed(fn, *args, **kwargs):
    """Run fn, block on its output, return (result, seconds)."""
    start = time.perf_counter()
    out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    return out, time.perf_counter() - start
