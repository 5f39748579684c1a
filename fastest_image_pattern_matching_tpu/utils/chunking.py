"""Chunked batch mapping to bound peak device memory.

The batched angle sweep and candidate descent would otherwise materialize
[A, Hc, Wc] canvases / [C*3, h+6, w+6] ROIs all at once; lax.map over fixed
chunks keeps HBM use bounded while compiling the body only once.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def chunked_map(fn, xs, n: int, chunk: int):
    """Apply fn over the leading axis of pytree `xs` (length n) in chunks.

    fn receives a pytree slice with leading dim `chunk` and must return a
    pytree with leading dim `chunk`. Pads n up to a multiple of chunk with
    zeros; padded outputs are sliced away.
    """
    chunk = max(1, min(chunk, n))
    n_pad = (n + chunk - 1) // chunk * chunk

    def pad(x):
        if n_pad == n:
            return x
        pw = [(0, n_pad - n)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, pw)

    xs_p = jax.tree_util.tree_map(pad, xs)
    xs_r = jax.tree_util.tree_map(
        lambda x: x.reshape((n_pad // chunk, chunk) + x.shape[1:]), xs_p)
    if n_pad // chunk == 1:
        ys_r = jax.tree_util.tree_map(lambda y: y[None], fn(
            jax.tree_util.tree_map(lambda x: x[0], xs_r)))
    else:
        ys_r = jax.lax.map(fn, xs_r)
    ys = jax.tree_util.tree_map(
        lambda y: y.reshape((n_pad,) + y.shape[2:])[:n], ys_r)
    return ys
