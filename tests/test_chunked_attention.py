"""Chunked (scanned) attention variants match the dense MHA, including
gradients (they serve the training path at large N)."""

import numpy as np
import jax
import jax.numpy as jnp

from agile3d_tpu.ops.attention import (
    init_mha,
    mha,
    mha_chunked_keys,
    mha_chunked_queries,
)


def _setup(rng, b=2, lq=24, lk=512, e=64):
    params = init_mha(jax.random.PRNGKey(0), e)
    q = jnp.asarray(rng.standard_normal((b, lq, e)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, lk, e)), jnp.float32)
    bias = jnp.where(jnp.asarray(rng.random((b, lq, lk))) < 0.2, -1e9, 0.0)
    return params, q, k, bias


def test_chunked_keys_matches_dense():
    rng = np.random.default_rng(0)
    params, q, k, bias = _setup(rng)
    ref = mha(params, q, k, k, 4, bias)
    got = mha_chunked_keys(params, q, k, k, 4, bias, chunk=128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_chunked_queries_matches_dense():
    rng = np.random.default_rng(1)
    params, q, k, bias = _setup(rng, lq=512, lk=24)
    ref = mha(params, q, k, k, 4, bias)
    got = mha_chunked_queries(params, q, k, k, 4, bias, chunk=128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_chunked_keys_gradients_match():
    rng = np.random.default_rng(2)
    params, q, k, bias = _setup(rng, b=1, lq=8, lk=256, e=32)

    def loss_dense(p, q, k):
        return jnp.sum(mha(p, q, k, k, 4, bias) ** 2)

    def loss_chunked(p, q, k):
        return jnp.sum(mha_chunked_keys(p, q, k, k, 4, bias, chunk=64) ** 2)

    g1 = jax.grad(loss_dense, argnums=(0, 1, 2))(params, q, k)
    g2 = jax.grad(loss_chunked, argnums=(0, 1, 2))(params, q, k)
    for a, b_ in zip(jax.tree_util.tree_leaves(g1),
                     jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-3, atol=1e-4)


def test_non_divisible_falls_back():
    rng = np.random.default_rng(3)
    params, q, k, bias = _setup(rng, lk=300)
    ref = mha(params, q, k, k, 4, bias)
    got = mha_chunked_keys(params, q, k, k, 4, bias, chunk=128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5)
