"""ORB cross-validation against OpenCV's ORB pipeline on real image data.

The reference's ORB path (ORBMatch/ORBFeatureMatcher.cpp:21-201) estimates
ONE homography between template and source. On the multi-instance Test
Images pairs that problem is ill-posed — matches spread across repeated
identical parts, and cv2's own pipeline returns unstable/degenerate
homographies there (measured: corners collapsing to a point on Src8/Dst8,
None on Src4/Dst4, a reflected sliver on Src3/Dst3). Cross-validation is
therefore run on single-instance scenes built from the real reference
assets: the real Dst3/Dst9 templates planted at a known pose into a real
Src6 background crop. Both pipelines must recover the planted corners —
that checks ours against cv2 AND against absolute ground truth.
"""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

TI = "/root/reference/Test Images"


def _cv2_orb_corners(src, tpl):
    """The reference pipeline verbatim through cv2 (ORBFeatureMatcher.cpp:
    21-201): detect, Hamming match, top-150, RANSAC H, corners via H^-1."""
    orb = cv2.ORB_create(nfeatures=500, scaleFactor=1.2, nlevels=8,
                         scoreType=cv2.ORB_HARRIS_SCORE)
    ks, ds = orb.detectAndCompute(src, None)
    kt, dt = orb.detectAndCompute(tpl, None)
    if ds is None or dt is None:
        return None
    matches = cv2.BFMatcher(cv2.NORM_HAMMING, crossCheck=False).match(ds, dt)
    matches = sorted(matches, key=lambda m: m.distance)[:150]
    if len(matches) < 10:
        return None
    sp = np.float32([ks[m.queryIdx].pt for m in matches]).reshape(-1, 1, 2)
    tp = np.float32([kt[m.trainIdx].pt for m in matches]).reshape(-1, 1, 2)
    H, mask = cv2.findHomography(sp, tp, cv2.RANSAC, 2.0, maxIters=2000,
                                 confidence=0.99)
    if H is None:
        return None
    h, w = tpl.shape
    tc = np.float32([[0, 0], [w, 0], [w, h], [0, h]]).reshape(-1, 1, 2)
    return cv2.perspectiveTransform(tc, np.linalg.inv(H)).reshape(4, 2)


def _gt_corners(src, tpl, crop_xy=(0, 0)):
    """Ground truth from the (sub-pixel) template matcher on the full
    source, shifted into crop coordinates."""
    from fastest_image_pattern_matching_tpu import (MatchConfig,
                                                    learn_pattern, match)
    best = match(src, learn_pattern(tpl, 256),
                 MatchConfig(max_pos=1, score=0.9, tolerance_angle=180.0))[0]
    assert best.score > 0.99
    gt = np.array([best.lt, best.rt, best.rb, best.lb]) - np.array(crop_xy)
    return gt, best


def test_orb_corners_agree_with_cv2_and_ground_truth():
    """Single-instance REAL crop: Src9's upper-left e-clip (one instance of
    Dst9, naturally rotated ~14.6 deg in the photo). Ground truth is the
    template matcher's subpixel result (score 0.9986). Both cv2's ORB and
    ours must place the template corners near it; calibrated accuracy on
    this crop: cv2 ~7 px, ours 4.2-8.4 px across seeds (wide-then-narrow
    LO-RANSAC refit; corner-extrapolated homography error — the matcher
    itself is sub-pixel)."""
    if not (os.path.exists(f"{TI}/Src9.bmp")
            and os.path.exists(f"{TI}/Dst9.bmp")):
        pytest.skip("assets unavailable")
    src = cv2.imread(f"{TI}/Src9.bmp", cv2.IMREAD_GRAYSCALE)
    tpl = cv2.imread(f"{TI}/Dst9.bmp", cv2.IMREAD_GRAYSCALE)
    gt, best = _gt_corners(src, tpl)
    crop = src[0:260, 0:280]  # isolates the (133, 109) instance

    ref_corners = _cv2_orb_corners(crop, tpl)
    assert ref_corners is not None, "cv2 ORB failed on this crop"
    cv2_err = np.linalg.norm(ref_corners - gt, axis=1).max()
    assert cv2_err < 12.0, (ref_corners, gt)

    from fastest_image_pattern_matching_tpu.models.orb import orb_match
    res = orb_match(crop, tpl)
    assert res.is_matched
    assert res.num_inliers >= 10
    our_err = np.linalg.norm(res.corners - gt, axis=1).max()
    # At cv2's own bound on this crop (round-2 bound was 18).
    assert our_err < 12.0, (res.corners, gt)
    # And directly against cv2's estimate.
    assert np.linalg.norm(res.corners - ref_corners, axis=1).max() < 16.0
    ang_err = abs(((res.rotation_angle - best.angle) + 180) % 360 - 180)
    assert ang_err < 5.0, (res.rotation_angle, best.angle)


def test_orb_src8_crop_beats_cv2():
    """Second real single-instance crop: Src8's lower-left 200x200 target
    (score 0.999, rotated -12.75 deg). Ours must land within 12 px of
    ground truth across seeds; cv2's pipeline is UNSTABLE on this crop
    (measured 134 px corner error) — recorded here so a cv2 improvement
    flags the comparison for re-tightening."""
    if not (os.path.exists(f"{TI}/Src8.bmp")
            and os.path.exists(f"{TI}/Dst8.bmp")):
        pytest.skip("assets unavailable")
    src = cv2.imread(f"{TI}/Src8.bmp", cv2.IMREAD_GRAYSCALE)
    tpl = cv2.imread(f"{TI}/Dst8.bmp", cv2.IMREAD_GRAYSCALE)
    gt, best = _gt_corners(src, tpl, crop_xy=(0, 215))
    crop = src[215:480, 0:334]

    from fastest_image_pattern_matching_tpu.models.orb import orb_match
    for seed in (0, 1):
        res = orb_match(crop, tpl, seed=seed)
        assert res.is_matched
        our_err = np.linalg.norm(res.corners - gt, axis=1).max()
        assert our_err < 12.0, (seed, our_err)
        ang_err = abs(((res.rotation_angle - best.angle) + 180) % 360 - 180)
        assert ang_err < 5.0, (res.rotation_angle, best.angle)

    ref_corners = _cv2_orb_corners(crop, tpl)
    if ref_corners is not None:
        cv2_err = np.linalg.norm(ref_corners - gt, axis=1).max()
        assert cv2_err > 12.0, \
            "cv2 became accurate on this crop; add it to the strict set"


def test_orb_save_load_roundtrip(tmp_path):
    """ORB persistence with the reference's cv::FileStorage field set
    (ORBFeatureMatcher.cpp:420-441), yaml (OpenCV-interchangeable) and
    JSON forms."""
    if not os.path.exists(f"{TI}/Src9.bmp"):
        pytest.skip("assets unavailable")
    src = cv2.imread(f"{TI}/Src9.bmp", cv2.IMREAD_GRAYSCALE)
    tpl = cv2.imread(f"{TI}/Dst9.bmp", cv2.IMREAD_GRAYSCALE)
    from fastest_image_pattern_matching_tpu.models.orb import orb_match
    from fastest_image_pattern_matching_tpu.utils.serialization import (
        load_orb_result, save_orb_result)
    res = orb_match(src[0:260, 0:280], tpl)
    assert res.is_matched
    for name in ("r.yml", "r.json"):
        p = str(tmp_path / name)
        assert save_orb_result(p, res)
        back = load_orb_result(p)
        assert back["isMatched"]
        assert back["goodMatchesCount"] == res.num_good_matches
        assert abs(back["rotationAngle"] - res.rotation_angle) < 1e-3
        assert abs(back["scale"] - res.scale_mm_per_pix) < 1e-6
    # The yaml really is OpenCV FileStorage format.
    fs = cv2.FileStorage(str(tmp_path / "r.yml"), cv2.FILE_STORAGE_READ)
    assert fs.getNode("goodMatchesCount").real() == res.num_good_matches
    fs.release()

    # Unmatched results are refused, like the reference (:422).
    from fastest_image_pattern_matching_tpu.models.orb import ORBResult
    assert not save_orb_result(str(tmp_path / "no.yml"),
                               ORBResult(False, None, 0, 0, 0.0, None))


def test_orb_multi_instance_pairs_documented_ill_posed():
    """Record (not assert) the behavior on the raw multi-instance pairs:
    cv2's own homography is degenerate there, which is why cross-validation
    uses single-instance scenes. This test just pins that cv2 gives no
    usable reference on Src4/Dst4 (returns None or wild corners)."""
    if not os.path.exists(f"{TI}/Src4.bmp"):
        pytest.skip("assets unavailable")
    src = cv2.imread(f"{TI}/Src4.bmp", cv2.IMREAD_GRAYSCALE)
    tpl = cv2.imread(f"{TI}/Dst4.bmp", cv2.IMREAD_GRAYSCALE)
    c = _cv2_orb_corners(src, tpl)
    if c is not None:
        # A sane placement would have all corners inside the 260x260 scene
        # and span roughly the 33x17 template; degenerate output does not.
        span = np.ptp(c, axis=0)
        inside = (c >= -50).all() and (c <= 310).all()
        sane = inside and 10 < span.max() < 150
        assert not sane, "cv2 became stable here; tighten the main test"
