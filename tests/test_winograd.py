"""z-axis Winograd conv (ops/winograd.py): exactness, gating, model parity.

The formulation must match ``lax.conv_general_dilated(..., 'SAME')`` up to
float reassociation in float32, engage only on its measured-win geometry,
and leave full-model outputs unchanged when forced on in float32.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import lax

from mica_tpu.ops.winograd import conv3d_wino_z, wino_eligible


def _direct(x, k, b=None):
    out = lax.conv_general_dilated(
        x, k, (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"), precision="highest")
    if b is not None:
        out = out + b
    return out


@pytest.mark.parametrize("m", [2, 4])
@pytest.mark.parametrize("shape", [(2, 8, 7, 9, 6), (1, 16, 5, 5, 3),
                                   (2, 12, 8, 8, 4)])
def test_wino_z_exact_f32(m, shape, rng):
    if shape[1] % m:
        pytest.skip("D not divisible by m")
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, 3, shape[-1], 5)) * 0.2,
                    jnp.float32)
    b = jnp.asarray(rng.standard_normal(5), jnp.float32)
    got = conv3d_wino_z(x, k, b, m=m, precision="highest")
    want = _direct(x, k, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=5e-5, rtol=1e-5)


def test_wino_z_grads_match_direct(rng):
    """Autodiff through the Winograd formulation equals the direct conv's
    gradients (training may enable it via MICA_TRAIN_WINO)."""
    x = jnp.asarray(rng.standard_normal((1, 8, 6, 6, 4)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, 3, 4, 3)) * 0.3, jnp.float32)

    def loss_w(k):
        return jnp.sum(conv3d_wino_z(x, k, m=4, precision="highest") ** 2)

    def loss_d(k):
        return jnp.sum(_direct(x, k) ** 2)

    gw = jax.grad(loss_w)(k)
    gd = jax.grad(loss_d)(k)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(gd),
                               atol=1e-3, rtol=1e-4)


def test_wino_eligible_gating(monkeypatch):
    ks = (3, 3, 3, 512, 256)
    xs = (8, 64, 64, 64, 512)
    monkeypatch.delenv("MICA_WINO", raising=False)
    # off-TPU: auto mode declines
    if jax.default_backend() != "tpu":
        assert not wino_eligible(xs, ks, jnp.bfloat16)
    # operator force-on: shape rules still apply
    monkeypatch.setenv("MICA_WINO", "1")
    assert wino_eligible(xs, ks, jnp.float32)
    assert not wino_eligible(xs, (5, 5, 5, 512, 256), jnp.float32)  # k!=3
    assert not wino_eligible((8, 63, 64, 64, 512), ks, jnp.float32)  # D%4
    assert not wino_eligible((8, 4, 64, 64, 512), ks, jnp.float32)  # D<8
    assert not wino_eligible((8, 64, 64, 64, 256), ks, jnp.float32)  # groups
    # operator force-off beats everything
    monkeypatch.setenv("MICA_WINO", "0")
    assert not wino_eligible(xs, ks, jnp.float32)


def test_wino_model_forward_parity(monkeypatch, rng):
    """Full MICA forward with the Winograd path forced on (float32, CPU)
    matches the direct-conv forward: the integration points (RDB conv3 /
    transitions) produce identical logits up to reassociation noise."""
    from mica_tpu.models.init import init_params_fast
    from mica_tpu.models.mica import MICA

    model = MICA(base=16, dtype=jnp.float32)
    x = jnp.asarray(rng.standard_normal((1, 16, 16, 16, 1)), jnp.float32)
    af = jnp.asarray(
        (rng.random((1, 16, 16, 16, 24)) < 0.02), jnp.float32)
    params = init_params_fast(model, (x, af))

    monkeypatch.delenv("MICA_WINO", raising=False)
    bb0, ca0, aa0 = model.apply({"params": params}, x, af)
    monkeypatch.setenv("MICA_WINO", "1")
    bb1, ca1, aa1 = model.apply({"params": params}, x, af)
    for a, b in ((bb0, bb1), (ca0, ca1), (aa0, aa1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-3, rtol=1e-3)
    # parameter trees are identical either way (checkpoint compatible)
    p2 = init_params_fast(MICA(base=16, dtype=jnp.float32), (x, af))
    assert jax.tree_util.tree_structure(params) == \
        jax.tree_util.tree_structure(p2)


def test_wino_in_relu_fused_matches_unfused(rng):
    """conv3d_wino_z_in_relu == relu(instance_norm(direct conv + bias))
    (f32, CPU): the fused statistics/apply change only summation order."""
    from mica_tpu.models.mica import instance_norm
    from mica_tpu.ops.winograd import conv3d_wino_z_in_relu

    x = jnp.asarray(rng.standard_normal((2, 8, 6, 7, 5)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, 3, 5, 4)) * 0.3, jnp.float32)
    b = jnp.asarray(rng.standard_normal(4), jnp.float32)
    got = conv3d_wino_z_in_relu(x, k, b, m=4)
    want = jax.nn.relu(instance_norm(_direct(x, k, b)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=5e-4, rtol=1e-3)
