"""Parity tests for the Pallas depthwise 3x3x3 conv kernel
(mica_tpu/ops/depthwise_pallas.py) against the shifted-FMA reference
formulation and flax's grouped nn.Conv. Runs in interpreter mode on CPU;
the compiled path is exercised on the real TPU by bench/scripts."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mica_tpu.ops.conv_fast import depthwise_conv3
from mica_tpu.ops.depthwise_pallas import depthwise_conv3_pallas


@pytest.mark.parametrize("shape,d_block", [
    ((2, 8, 8, 8, 8), 4),       # z-edges with nz=2
    ((1, 16, 8, 16, 16), 4),    # interior z-blocks
    ((1, 8, 8, 8, 8), 8),       # single z-block (both clamps masked)
])
def test_parity_f32(rng, shape, d_block):
    b, d, h, w, c = shape
    x = jnp.asarray(rng.normal(size=shape), jnp.float32)
    k = jnp.asarray(rng.normal(size=(3, 3, 3, 1, c)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(c,)), jnp.float32)
    ref = depthwise_conv3(x, k, bias)
    got = depthwise_conv3_pallas(x, k, bias, d_block=d_block, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_parity_vs_flax_grouped_conv(rng):
    """Against the layout/semantics oracle: flax grouped nn.Conv."""
    import flax.linen as nn

    c = 8
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 8, c)), jnp.float32)
    conv = nn.Conv(features=c, kernel_size=(3, 3, 3), padding="SAME",
                   feature_group_count=c)
    params = conv.init(jax.random.PRNGKey(0), x)
    ref = conv.apply(params, x)
    got = depthwise_conv3_pallas(
        x, params["params"]["kernel"], params["params"]["bias"],
        d_block=4, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_full_model_gate_parity(rng, monkeypatch):
    """MICA_PALLAS_DW=interpret drives the full MICA forward through the
    Pallas depthwise path with the SAME parameter tree (the
    local_conv/Conv_0 plumbing in models/mica.py DualAttention) and must
    match the default XLA grouped-conv path."""
    from mica_tpu.models.init import init_params_fast
    from mica_tpu.models.mica import MICA

    model = MICA(base=16)
    x = jnp.asarray(rng.normal(size=(1, 16, 16, 16, 1)), jnp.float32)
    monkeypatch.delenv("MICA_PALLAS_DW", raising=False)
    params = {"params": init_params_fast(model, (x,))}
    ref = model.apply(params, x)
    monkeypatch.setenv("MICA_PALLAS_DW", "interpret")
    got = model.apply(params, x)
    for r, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=2e-4, atol=2e-4)


def test_pick_depthwise_path_gates(monkeypatch):
    """Path selection: explicit env always wins; non-TPU backends never
    autotune (and never set the env var)."""
    from mica_tpu.ops import depthwise_pallas as dp

    monkeypatch.setenv("MICA_PALLAS_DW", "0")
    out = dp.pick_depthwise_path()
    assert out["autotuned"] is False
    monkeypatch.delenv("MICA_PALLAS_DW", raising=False)
    out = dp.pick_depthwise_path()  # CPU backend under tests
    assert out == {"path": "xla", "autotuned": False, "why": "not on tpu"}
    assert "MICA_PALLAS_DW" not in __import__("os").environ


def test_bf16_io(rng):
    """bf16 in/out with f32 accumulation: matches the f32 reference to
    bf16 tolerance."""
    c = 16
    xf = jnp.asarray(rng.normal(size=(1, 8, 8, 8, c)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(3, 3, 3, 1, c)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(c,)), jnp.float32)
    ref = depthwise_conv3(xf, k, bias)
    got = depthwise_conv3_pallas(xf.astype(jnp.bfloat16), k, bias,
                                 d_block=4, interpret=True)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32), np.asarray(ref),
                               rtol=0.1, atol=0.1)
