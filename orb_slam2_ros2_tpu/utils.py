"""Small shared jit-safe helpers."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def topk_bounded(x: jnp.ndarray, k: int):
    """``lax.top_k`` that tolerates ``k`` larger than the axis size.

    Map stores can start smaller than the configured window sizes before
    auto-growth (map-length scaling, SURVEY §5.7): clamp ``k`` to the axis and
    pad values with 0 / indices with 0.  Callers must gate on ``value > 0``
    (every selection in this codebase does), so padded slots read as empty —
    do NOT re-gather weights through the padded indices.
    """
    n = x.shape[-1]
    kk = min(k, n)
    v, i = jax.lax.top_k(x, kk)
    if kk < k:
        pad = x.shape[:-1] + (k - kk,)
        v = jnp.concatenate([v, jnp.zeros(pad, v.dtype)], axis=-1)
        i = jnp.concatenate([i, jnp.zeros(pad, i.dtype)], axis=-1)
    return v, i
