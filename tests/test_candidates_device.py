"""On-device candidate extraction vs the host pipeline (VERDICT r1 #2).

The device path (trace/candidates_device.py) must match
``candidates.extract_candidates(..., cluster_method='morphology')``: same
clustering semantics (ball-dilation single linkage), same cluster filter,
same greedy NMS order, and bitwise-identical float64 sub-voxel centroids
(the final einsum runs on host over device-gathered f32 values).
"""

import numpy as np
import pytest

from mica_tpu.trace import candidates_device as cdev
from mica_tpu.trace.candidates import build_neighbor_structure, extract_candidates

from synthetic import make_scenario


@pytest.fixture(scope="module")
def scenario():
    return make_scenario(n_res=40, shape=(48, 48, 48), seed=7)


def _host(vols, **kw):
    return extract_candidates(
        vols["carbon_alpha_probability"],
        vols["backbone_probability"],
        vols["amino_acid_probability"],
        vols["amino_acid_prediction"],
        cluster_method="morphology",
        **kw,
    )


def _device(vols, **kw):
    import jax.numpy as jnp

    return cdev.extract_candidates_device(
        jnp.asarray(vols["carbon_alpha_probability"]),
        jnp.asarray(vols["backbone_probability"]),
        jnp.asarray(vols["amino_acid_probability"]),
        **kw,
    )


def test_device_matches_host(scenario):
    _, _, vols = scenario
    host = _host(vols)
    dev = _device(vols)
    assert dev is not None
    assert len(dev["coords"]) == len(host.coords)
    # candidate ORDER must match too (NMS pick order drives downstream ids)
    np.testing.assert_array_equal(dev["pred"], host.aa_pred)
    np.testing.assert_allclose(dev["coords"], host.coords, atol=1e-12)
    np.testing.assert_allclose(dev["aa"], host.aa_prob, atol=1e-12)


def test_device_full_candidates_structure(scenario):
    """Routing device outputs through build_neighbor_structure (with the
    backbone volume still on device) reproduces the host Candidates."""
    import jax.numpy as jnp

    _, _, vols = scenario
    host = _host(vols)
    dev = _device(vols)
    cands = build_neighbor_structure(
        dev["coords"], dev["aa"], dev["pred"],
        jnp.asarray(vols["backbone_probability"]),
    )
    assert len(cands) == len(host)
    for a, b in zip(cands.neighbors2to6, host.neighbors2to6):
        np.testing.assert_array_equal(a, b)
    assert cands.best_neigh == host.best_neigh
    np.testing.assert_allclose(
        cands.neigh_mat.todense(), host.neigh_mat.todense(), atol=1e-9
    )


def test_device_threshold_parity(scenario):
    _, _, vols = scenario
    host = _host(vols, ca_score_threshold=0.5)
    dev = _device(vols, ca_score_threshold=0.5)
    assert len(dev["coords"]) == len(host.coords)
    np.testing.assert_allclose(dev["coords"], host.coords, atol=1e-12)


def test_device_nms_cap_escalation(scenario, monkeypatch):
    """A too-small first NMS cap escalates to the next and still matches."""
    _, _, vols = scenario
    host = _host(vols)
    monkeypatch.setattr(cdev, "NMS_CAPS", (2, 2048))
    dev = _device(vols)
    assert dev is not None
    np.testing.assert_allclose(dev["coords"], host.coords, atol=1e-12)


def test_device_point_cap_fallback(scenario, monkeypatch):
    """Maps exceeding the largest point cap report None (host fallback)."""
    _, _, vols = scenario
    monkeypatch.setattr(cdev, "POINT_CAPS", (4,))
    assert _device(vols) is None


def test_device_nonstandard_radius_falls_back(scenario):
    _, _, vols = scenario
    assert _device(vols, nms_radius_sq=16.0) is None


def test_empty_volume():
    vols = {
        "carbon_alpha_probability": np.zeros((24, 24, 24), np.float32),
        "backbone_probability": np.zeros((24, 24, 24), np.float32),
        "amino_acid_probability": np.zeros((20, 24, 24, 24), np.float32),
    }
    dev = _device(vols)
    assert dev is not None
    assert len(dev["coords"]) == 0
