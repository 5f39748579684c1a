"""Public batched matching API (models/batch.py): match_many /
match_patterns / BatchMatcher / batched inspect_corpus.

The per-frame contract: match_many(stack)[i] must equal
match(stack[i]) — one compiled dispatch, bit-equal results (the batched
program runs the identical per-frame stages under lax.map).
"""

import numpy as np
import pytest

import fastest_image_pattern_matching_tpu as fipm
from fastest_image_pattern_matching_tpu.models.batch import _next_bucket


@pytest.fixture(scope="module")
def fixtures():
    rng = np.random.default_rng(11)
    tpl = rng.integers(0, 255, (24, 32), np.uint8)
    frames = []
    for k in range(3):
        f = rng.integers(0, 60, (200, 260), np.uint8)
        f[30 + 40 * k:54 + 40 * k, 50 + 30 * k:82 + 30 * k] = tpl
        frames.append(f)
    frames.append(rng.integers(0, 60, (200, 260), np.uint8))  # empty frame
    pattern = fipm.learn_pattern(tpl, 256)
    cfg = fipm.MatchConfig(max_pos=5, score=0.8, tolerance_angle=0.0)
    return np.stack(frames), tpl, pattern, cfg


def _same(a, b):
    assert len(a) == len(b)
    for x, y in zip(a, b):
        assert abs(x.score - y.score) < 1e-6
        assert abs(x.pos_x - y.pos_x) < 1e-5
        assert abs(x.pos_y - y.pos_y) < 1e-5
        assert abs(x.angle - y.angle) < 1e-5


def test_match_many_per_frame_parity(fixtures):
    frames, _, pattern, cfg = fixtures
    batched = fipm.match_many(frames, pattern, cfg)
    assert len(batched) == frames.shape[0]
    for i in range(frames.shape[0]):
        _same(batched[i], fipm.match(frames[i], pattern, cfg))
    assert len(batched[-1]) == 0  # the empty frame


def test_match_many_bucket_padding(fixtures):
    """B=3 pads to the 4-bucket; padded frames must not leak results."""
    frames, _, pattern, cfg = fixtures
    assert _next_bucket(3) == 4
    b3 = fipm.match_many(frames[:3], pattern, cfg)
    full = fipm.match_many(frames, pattern, cfg, batch_bucket=4)
    for i in range(3):
        _same(b3[i], full[i])


def test_match_many_device_resident(fixtures):
    """The serving path: frames already in device memory."""
    import jax.numpy as jnp
    frames, _, pattern, cfg = fixtures
    dev = jnp.asarray(frames, jnp.float32)
    batched = fipm.match_many(dev, pattern, cfg)
    ref = fipm.match_many(frames, pattern, cfg)
    for a, b in zip(batched, ref):
        _same(a, b)


def test_match_many_u8_contract(fixtures):
    frames, _, pattern, cfg = fixtures
    bad = frames.astype(np.float32)
    bad[0, 0, 0] = 300.0
    with pytest.raises(ValueError, match="0, 255"):
        fipm.match_many(bad, pattern, cfg)


def test_match_many_shape_validation(fixtures):
    frames, _, pattern, cfg = fixtures
    with pytest.raises(ValueError, match="B, H, W"):
        fipm.match_many(frames[0], pattern, cfg)


def test_batch_matcher(fixtures):
    frames, _, pattern, cfg = fixtures
    bm = fipm.BatchMatcher(pattern, cfg, batch_size=4)
    bm.warmup(frames.shape[1:])
    out = bm.match_batch(frames)
    ref = fipm.match_many(frames, pattern, cfg)
    for a, b in zip(out, ref):
        _same(a, b)


def test_match_patterns_parity_and_grouping(fixtures):
    """Two same-shaped glyphs + one different shape: two shape groups, all
    three results equal to their single-pattern dispatches."""
    frames, tpl, pattern, cfg = fixtures
    rng = np.random.default_rng(12)
    pats = [
        pattern,
        fipm.learn_pattern(tpl[::-1].copy(), 256),           # same shape
        fipm.learn_pattern(rng.integers(0, 255, (18, 26), np.uint8), 256),
    ]
    outs = fipm.match_patterns(frames[0], pats, cfg)
    assert len(outs) == 3
    for pat, out in zip(pats, outs):
        ref = fipm.match_arrays(frames[0], pat, cfg)
        assert np.array_equal(out["valid"], ref["valid"])
        np.testing.assert_allclose(out["score"], ref["score"], atol=1e-6)
        np.testing.assert_allclose(out["center"][ref["valid"]],
                                   ref["center"][ref["valid"]], atol=1e-5)


def test_multi_template_batched_equals_loop(fixtures):
    from fastest_image_pattern_matching_tpu.models.multi_template import (
        MultiTemplateMatcher)
    frames, tpl, _, _ = fixtures
    m = MultiTemplateMatcher(fipm.MatchConfig(
        max_pos=5, score=0.8, tolerance_angle=0.0))
    m.learn("a", tpl)
    m.learn("b", tpl[::-1].copy())
    batched = m.match_all(frames[0], batched=True)
    looped = m.match_all(frames[0], batched=False)
    assert [x.label for x in batched] == [x.label for x in looped]
    for x, y in zip(batched, looped):
        assert abs(x.result.score - y.result.score) < 1e-6
        assert abs(x.result.pos_x - y.result.pos_x) < 1e-5


def test_inspect_corpus_batched(fixtures):
    from fastest_image_pattern_matching_tpu.models.corpus import (
        inspect_corpus)
    frames, _, pattern, cfg = fixtures
    reports = list(inspect_corpus(list(frames), pattern, cfg, batch_size=2))
    assert [r.index for r in reports] == list(range(frames.shape[0]))
    for r in reports:
        _same(r.results, fipm.match(frames[r.index], pattern, cfg))


def test_match_patterns_fragmentation_warning(fixtures, caplog):
    """A glyph set where every pattern has its own shape must warn that
    batching degrades toward per-glyph dispatch (VERDICT r4 weak #7)."""
    import logging
    frames, _, _, cfg = fixtures
    rng = np.random.default_rng(13)
    pats = [fipm.learn_pattern(
        rng.integers(0, 255, (14 + 2 * i, 20 + 2 * i), np.uint8), 256)
        for i in range(6)]
    with caplog.at_level(logging.WARNING,
                         logger="fastest_image_pattern_matching_tpu."
                                "models.batch"):
        fipm.match_patterns(frames[0], pats, cfg)
    assert any("distinct shape groups" in r.message for r in caplog.records)
