"""Positional encodings: Gaussian-Fourier (canonical), sine, and the 1D
click-order table (reference models/position_embedding.py:44-226)."""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np


def shift_scale_points(xyz, src_min, src_max):
    """Normalize per-sample coordinates to [0, 1] per axis
    (reference position_embedding.py:13-41 with the default dst range)."""
    diff = src_max - src_min
    diff = jnp.where(diff == 0, 1.0, diff)
    return (xyz - src_min) / diff


def fourier_pos(xyz, gauss_b, src_min=None, src_max=None, *, normalize=True):
    """Gaussian-Fourier features (reference position_embedding.py:123-152).

    xyz [..., 3]; gauss_b [3, d_pos//2]; src_min/src_max broadcastable
    [..., 3] per-sample ranges. Returns [..., d_pos] = [sin | cos].
    """
    if normalize:
        xyz = shift_scale_points(xyz, src_min, src_max)
    proj = (xyz * (2 * np.pi)) @ gauss_b
    return jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], axis=-1)


def sine_pos(xyz, d_pos, src_min=None, src_max=None, *, normalize=True,
             temperature=10000.0, scale=2 * math.pi):
    """Per-axis sine embedding (reference position_embedding.py:75-121).
    Channel budget d_pos is split across the 3 axes in even chunks with the
    remainder assigned two-at-a-time to the leading axes."""
    if normalize:
        xyz = shift_scale_points(xyz, src_min, src_max)
    ndim = d_pos // 3
    if ndim % 2 != 0:
        ndim -= 1
    rems = d_pos - ndim * 3

    embeds = []
    for d in range(3):
        cdim = ndim
        if rems > 0:
            cdim += 2
            rems -= 2
        dim_t = jnp.arange(cdim, dtype=jnp.float32)
        dim_t = temperature ** (2 * jnp.floor(dim_t / 2) / cdim)
        pos = xyz[..., d] * scale
        pos = pos[..., None] / dim_t
        sin = jnp.sin(pos[..., 0::2])
        cos = jnp.cos(pos[..., 1::2])
        interleaved = jnp.stack([sin, cos], axis=-1).reshape(*pos.shape[:-1], cdim)
        embeds.append(interleaved)
    return jnp.concatenate(embeds, axis=-1)


def positional_encoding_1d(d_model: int, length: int) -> np.ndarray:
    """Click-order table (reference position_embedding.py:210-226):
    pe[t, 0::2] = sin(t * w), pe[t, 1::2] = cos(t * w)."""
    if d_model % 2 != 0:
        raise ValueError(f"d_model must be even, got {d_model}")
    pe = np.zeros((length, d_model), dtype=np.float32)
    position = np.arange(length, dtype=np.float32)[:, None]
    div_term = np.exp(
        np.arange(0, d_model, 2, dtype=np.float32) * -(math.log(10000.0) / d_model)
    )
    pe[:, 0::2] = np.sin(position * div_term)
    pe[:, 1::2] = np.cos(position * div_term)
    return pe
