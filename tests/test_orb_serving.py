"""ORB serving parity: batched orb_match_many and the AOT ORB pack must
reproduce the single-pair orb_match results (ORBFeatureMatcher.cpp:21 —
the reference reruns the interactive pipeline per pair)."""

import numpy as np
import pytest
import cv2

import fastest_image_pattern_matching_tpu as fipm
from fastest_image_pattern_matching_tpu.models.orb import ORBConfig, orb_match
from fastest_image_pattern_matching_tpu.models.orb import orb_match_many
from fastest_image_pattern_matching_tpu.aot import AotOrb, export_orb_pack


def _textured(rng, h, w):
    img = rng.integers(0, 255, size=(h // 8, w // 8), dtype=np.uint8)
    img = cv2.resize(img, (w, h), interpolation=cv2.INTER_NEAREST)
    img = cv2.GaussianBlur(img, (5, 5), 1.0)
    for _ in range(40):
        x, y = rng.integers(10, w - 10), rng.integers(10, h - 10)
        cv2.circle(img, (int(x), int(y)), int(rng.integers(3, 9)),
                   int(rng.integers(0, 255)), -1)
    return img


@pytest.fixture(scope="module")
def pair():
    rng = np.random.default_rng(42)
    template = _textured(rng, 160, 200)
    M = cv2.getRotationMatrix2D((100, 80), 8.0, 1.0)
    M[:, 2] += (30, 22)
    source = cv2.warpAffine(template, M, (280, 240),
                            borderValue=90).astype(np.uint8)
    return source, template


CFG = ORBConfig(max_features=200, n_levels=3, ransac_iters=400,
                max_good_matches=80)


def test_match_many_equals_single(pair):
    source, template = pair
    ref = orb_match(source, template, CFG)
    assert ref.is_matched
    srcs = np.stack([source, np.roll(source, 5, axis=1)])
    res = orb_match_many(srcs, template, CFG)
    assert len(res) == 2
    for r in res:
        assert r.is_matched
    np.testing.assert_allclose(res[0].corners, ref.corners, atol=1e-2)
    assert res[0].num_inliers == ref.num_inliers
    # The rolled frame shifts the recovered corners by ~5 px in x.
    dx = np.asarray(res[1].corners)[:, 0] - np.asarray(res[0].corners)[:, 0]
    assert np.all(np.abs(dx - 5.0) < 2.5)


def test_aot_orb_pack_roundtrip(pair, tmp_path):
    source, template = pair
    path = str(tmp_path / "orb.fipm-aot.npz")
    timings = export_orb_pack(path, CFG, source.shape, template.shape,
                              batch_sizes=(2,))
    assert "single" in timings and "batch_2" in timings

    m = AotOrb.load(path)
    assert m.batch_sizes == [2]
    ref = orb_match(source, template, CFG)
    got = m.match(source, template)
    assert got.is_matched and ref.is_matched
    np.testing.assert_allclose(got.corners, ref.corners, atol=1e-2)
    assert got.num_inliers == ref.num_inliers

    many = m.match_many(source[None], template)
    assert len(many) == 1 and many[0].is_matched
    np.testing.assert_allclose(many[0].corners, ref.corners, atol=1.0)

    with pytest.raises(ValueError):
        m.match(source[:-2], template)
    with pytest.raises(ValueError):
        m.match(source, template[:-2])
    # Reload through the public alias works too.
    assert fipm.AotOrb.load(path).batch_sizes == [2]


def test_aot_orb_rejects_ncc_pack(tmp_path, pair):
    source, template = pair
    t = np.full((40, 56), 30, np.uint8)
    cv2.rectangle(t, (4, 4), (51, 35), 200, 2)
    pat = fipm.learn_pattern(t, 256)
    p = str(tmp_path / "ncc.npz")
    fipm.export_match_pack(p, pat, fipm.MatchConfig(max_pos=2, score=0.8,
                                                    tolerance_angle=0.0),
                           (120, 140))
    with pytest.raises(ValueError):
        AotOrb.load(p)


def test_aot_matcher_rejects_orb_pack(pair, tmp_path):
    """The reverse of test_aot_orb_rejects_ncc_pack: AotMatcher must give
    a clear error for an ORB pack, not a KeyError."""
    source, template = pair
    path = str(tmp_path / "orb2.npz")
    export_orb_pack(path, CFG, source.shape, template.shape)
    with pytest.raises(ValueError, match="not a match pack"):
        fipm.AotMatcher.load(path)
