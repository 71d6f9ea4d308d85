"""Shared parameter-initialization helpers (plain pytree params).

Linear layers follow torch ``nn.Linear`` reset semantics (the reference
never overrides them — its ``init_weights`` methods are dead code, e.g.
``ode_nn_ngraph_sim.py:54-56``): W, b ~ U(-1/sqrt(fan_in), +1/sqrt(fan_in)).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def linear_init(key, fan_in: int, fan_out: int, dtype=jnp.float32):
    kw, kb = jax.random.split(key)
    bound = 1.0 / jnp.sqrt(jnp.asarray(max(fan_in, 1), dtype))
    w = jax.random.uniform(kw, (fan_in, fan_out), dtype, -bound, bound)
    b = jax.random.uniform(kb, (fan_out,), dtype, -bound, bound)
    return {"w": w, "b": b}


def linear(p, x):
    return x @ p["w"] + p["b"]


def layer_norm(scale, bias, x, eps: float = 1e-5):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * scale + bias


def dropout(rng, x, rate: float, train: bool):
    """Inverted dropout (torch ``F.dropout`` semantics): identity unless
    training with a positive rate and an rng. Shared by GCN/GIN."""
    if not train or rate <= 0.0 or rng is None:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)
