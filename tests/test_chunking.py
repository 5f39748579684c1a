"""chunked_map: padding, chunk-count edge cases, and pred semantics.

The pred path is the single-program analogue of host-side candidate
compaction (reference refines a data-dependent candidate list,
MatchTool/MatchToolDlg.cpp:939): all-dead chunks must return zeros, and
with an alive-first-sorted pred the while_loop must stop after the last
live chunk.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from fastest_image_pattern_matching_tpu.utils.chunking import chunked_map


def _fn(x):
    return x * 2.0 + 1.0


@pytest.mark.parametrize("n,chunk", [(1, 1), (7, 3), (8, 8), (9, 8),
                                     (64, 8), (5, 64)])
def test_no_pred_matches_direct(n, chunk):
    xs = jnp.arange(n * 3, dtype=jnp.float32).reshape(n, 3)
    out = chunked_map(_fn, xs, n, chunk)
    np.testing.assert_allclose(np.asarray(out), np.asarray(_fn(xs)))


@pytest.mark.parametrize("alive_prefix", [0, 1, 7, 8, 9, 40])
def test_pred_sorted_prefix(alive_prefix):
    n, chunk = 40, 8
    xs = jnp.arange(n * 2, dtype=jnp.float32).reshape(n, 2)
    pred = jnp.arange(n) < alive_prefix
    out = np.asarray(chunked_map(_fn, xs, n, chunk, pred=pred))
    expect = np.asarray(_fn(xs))
    n_run_chunks = -(-alive_prefix // chunk)
    live = n_run_chunks * chunk
    np.testing.assert_allclose(out[:live], expect[:live])
    assert (out[live:] == 0).all()


def test_pred_unsorted_interior_dead_chunk_zeros():
    # Chunk 1 (indices 4..7) is all dead: its output must be zeros even
    # though a later chunk is live (exactness vs skip-everywhere).
    n, chunk = 16, 4
    xs = jnp.ones((n, 2), jnp.float32)
    pred = np.zeros(n, bool)
    pred[0] = True
    pred[9] = True
    out = np.asarray(chunked_map(_fn, xs, n, chunk,
                                 pred=jnp.asarray(pred)))
    assert (out[0:4] == 3.0).all()
    assert (out[4:8] == 0.0).all()
    assert (out[8:12] == 3.0).all()
    assert (out[12:16] == 0.0).all()


def test_pred_all_dead():
    n, chunk = 12, 4
    xs = jnp.ones((n, 2), jnp.float32)
    out = np.asarray(chunked_map(_fn, xs, n, chunk,
                                 pred=jnp.zeros(n, bool)))
    assert (out == 0.0).all()


def test_pred_pytree_multi_output():
    n, chunk = 10, 4

    def fn(args):
        a, b = args
        return {"s": a + b, "d": a - b}

    a = jnp.arange(n, dtype=jnp.float32)[:, None]
    b = jnp.ones((n, 1), jnp.float32)
    pred = jnp.arange(n) < 5
    out = chunked_map(fn, (a, b), n, chunk, pred=pred)
    np.testing.assert_allclose(np.asarray(out["s"][:8]),
                               np.asarray(a + b)[:8])
    assert (np.asarray(out["s"][8:]) == 0).all()
    np.testing.assert_allclose(np.asarray(out["d"][:8]),
                               np.asarray(a - b)[:8])
