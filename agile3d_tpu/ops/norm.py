"""Masked normalization ops.

``batch_norm`` replaces ME.MinkowskiBatchNorm (reference
models/modules/common.py:20-22, momentum 0.02 per main.py:38): BN over the N
valid sparse rows, exactly torch BatchNorm1d semantics — biased variance for
normalization, unbiased for the running-stat update, running = (1-m)*running
+ m*batch.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

EPS = 1e-5  # torch BatchNorm default


class BNState(NamedTuple):
    mean: jax.Array  # [C]
    var: jax.Array   # [C]


def init_bn(c: int, dtype=jnp.float32):
    params = {"scale": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype)}
    state = BNState(mean=jnp.zeros((c,), dtype), var=jnp.ones((c,), dtype))
    return params, state


def batch_norm(
    x: jax.Array,
    valid: jax.Array,
    params: dict,
    state: BNState,
    *,
    training: bool,
    momentum: float = 0.02,
) -> tuple[jax.Array, BNState]:
    """Masked BatchNorm over rows where valid. Returns (y, new_state).

    Pad rows are re-zeroed on output to preserve the zero-pad invariant.
    """
    if training:
        m = valid.astype(x.dtype)
        n = jnp.maximum(m.sum(), 1)
        mean = (x * m[:, None]).sum(0) / n
        d = jnp.where(valid[:, None], x - mean[None, :], 0)
        var = (d * d).sum(0) / n                     # biased, for normalization
        var_unbiased = (d * d).sum(0) / jnp.maximum(n - 1, 1)
        new_state = BNState(
            mean=(1 - momentum) * state.mean + momentum * mean,
            var=(1 - momentum) * state.var + momentum * var_unbiased,
        )
    else:
        mean, var = state.mean, state.var
        new_state = state
    y = (x - mean[None, :]) * jax.lax.rsqrt(var[None, :] + EPS)
    y = y * params["scale"][None, :] + params["bias"][None, :]
    return jnp.where(valid[:, None], y, 0), new_state


def layer_norm(x: jax.Array, params: dict, axis: int = -1) -> jax.Array:
    """torch nn.LayerNorm semantics (biased variance, eps 1e-5)."""
    mean = x.mean(axis=axis, keepdims=True)
    var = ((x - mean) ** 2).mean(axis=axis, keepdims=True)
    y = (x - mean) * jax.lax.rsqrt(var + EPS)
    return y * params["scale"] + params["bias"]


def init_layer_norm(c: int, dtype=jnp.float32):
    return {"scale": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype)}
