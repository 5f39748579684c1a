"""Chunked batch mapping to bound peak device memory.

The batched angle sweep and candidate descent would otherwise materialize
[A, Hc, Wc] canvases / [C*3, h+6, w+6] ROIs all at once; lax.map over fixed
chunks keeps HBM use bounded while compiling the body only once.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def chunked_map(fn, xs, n: int, chunk: int, pred=None):
    """Apply fn over the leading axis of pytree `xs` (length n) in chunks.

    fn receives a pytree slice with leading dim `chunk` and must return a
    pytree with leading dim `chunk`. Pads n up to a multiple of chunk with
    zeros; padded outputs are sliced away.

    pred: optional [n] bool array. Chunks whose pred entries are all False
    return zeros without executing fn (lax.cond — a real branch inside the
    lax.map while-loop, so skipped chunks cost nothing on device). With the
    caller sorting alive-first, this is exact adaptive compaction in ONE
    compiled program: the per-candidate pyramid descent only pays for
    ceil(n_alive/chunk) chunks, with no host round-trip to pick a bucket.
    """
    chunk = max(1, min(chunk, n))
    n_pad = (n + chunk - 1) // chunk * chunk

    def pad(x, value=0):
        if n_pad == n:
            return x
        pw = [(0, n_pad - n)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, pw, constant_values=value)

    xs_p = jax.tree_util.tree_map(pad, xs)
    xs_r = jax.tree_util.tree_map(
        lambda x: x.reshape((n_pad // chunk, chunk) + x.shape[1:]), xs_p)

    body = fn
    if pred is not None:
        pred_r = pad(pred, False).reshape(n_pad // chunk, chunk)

        def body(args):
            xs_c, p_c = args
            zeros = lambda c: jax.tree_util.tree_map(
                lambda s: jnp.zeros(s.shape, s.dtype), jax.eval_shape(fn, c))
            return jax.lax.cond(jnp.any(p_c), fn, zeros, xs_c)

        xs_r = (xs_r, pred_r)

    if n_pad // chunk == 1:
        ys_r = jax.tree_util.tree_map(lambda y: y[None], body(
            jax.tree_util.tree_map(lambda x: x[0], xs_r)))
    else:
        ys_r = jax.lax.map(body, xs_r)
    ys = jax.tree_util.tree_map(
        lambda y: y.reshape((n_pad,) + y.shape[2:])[:n], ys_r)
    return ys
