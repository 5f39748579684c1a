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
    return zeros without executing fn. Implemented as a lax.while_loop
    that STOPS at the last chunk containing any True (suffix-any), so a
    dead tail costs zero loop steps — not even a per-chunk branch. With
    the caller sorting alive-first (every call site does), this is exact
    adaptive compaction in ONE compiled program: the per-candidate
    pyramid descent pays for ceil(n_alive/chunk) loop steps, with no host
    round-trip to pick a bucket. Interior all-False chunks (unsorted
    callers) are masked to zeros in-body, preserving the exact output of
    the skip-everywhere semantics.
    """
    chunk = max(1, min(chunk, n))
    n_pad = (n + chunk - 1) // chunk * chunk
    n_chunks = n_pad // chunk

    def pad(x, value=0):
        if n_pad == n:
            return x
        pw = [(0, n_pad - n)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, pw, constant_values=value)

    xs_p = jax.tree_util.tree_map(pad, xs)
    xs_r = jax.tree_util.tree_map(
        lambda x: x.reshape((n_chunks, chunk) + x.shape[1:]), xs_p)

    if pred is None:
        if n_chunks == 1:
            ys_r = jax.tree_util.tree_map(lambda y: y[None], fn(
                jax.tree_util.tree_map(lambda x: x[0], xs_r)))
        else:
            ys_r = jax.lax.map(fn, xs_r)
    else:
        pred_r = pad(pred, False).reshape(n_chunks, chunk)
        chunk_any = jnp.any(pred_r, axis=1)                    # [n_chunks]
        # Number of leading chunks to run = last True chunk + 1.
        idx = jnp.arange(n_chunks)
        n_run = jnp.max(jnp.where(chunk_any, idx + 1, 0))

        xs0 = jax.tree_util.tree_map(lambda x: x[0], xs_r)
        out_sds = jax.eval_shape(fn, xs0)
        ys0 = jax.tree_util.tree_map(
            lambda s: jnp.zeros((n_chunks,) + s.shape, s.dtype), out_sds)

        def cond(state):
            i, _ = state
            return i < n_run

        def body(state):
            i, ys = state
            xs_c = jax.tree_util.tree_map(
                lambda x: jax.lax.dynamic_index_in_dim(x, i, 0,
                                                       keepdims=False), xs_r)
            y = fn(xs_c)
            # Interior all-dead chunks keep their zeros (exactness vs the
            # skip-everywhere semantics for unsorted preds).
            y = jax.tree_util.tree_map(
                lambda v: jnp.where(
                    jnp.reshape(chunk_any[i], (1,) * v.ndim), v,
                    jnp.zeros_like(v)), y)
            ys = jax.tree_util.tree_map(
                lambda buf, v: jax.lax.dynamic_update_index_in_dim(
                    buf, v, i, 0), ys, y)
            return i + 1, ys

        _, ys_r = jax.lax.while_loop(cond, body, (jnp.int32(0), ys0))
    ys = jax.tree_util.tree_map(
        lambda y: y.reshape((n_pad,) + y.shape[2:])[:n], ys_r)
    return ys
