"""Statistical checks that the augmentation gates match the reference's
probabilities (dataset.py:8-110): overall gate 0.4, spatial block 0.6,
noise 0.7 within the gate, etc."""

import jax
import jax.numpy as jnp
import numpy as np

from mica_tpu.train import augment


def test_augmentation_gate_rates():
    d = 6
    density = jnp.zeros((1, d, d, d))
    af3 = jnp.zeros((24, d, d, d))
    tgt = jnp.asarray(np.random.default_rng(0).integers(1, 4, (3, d, d, d)))

    n = 300
    keys = jax.random.split(jax.random.PRNGKey(42), n)
    fn = jax.jit(augment.augment_sample)

    changed_any = 0
    changed_spatial = 0
    changed_density = 0
    for k in keys:
        dn, af, t = fn(k, density, af3, tgt)
        spatial = not np.array_equal(np.asarray(t), np.asarray(tgt))
        dens = not np.allclose(np.asarray(dn), 0.0)
        changed_spatial += spatial
        changed_density += dens
        changed_any += spatial or dens

    # overall gate 0.4; spatial fires with p = 0.4 * 0.6 * P(any spatial op)
    # where P(any) = 1 - (1-0.5)(1-0.3)(1-0.4 * P(shift!=0)) ~ 0.73
    rate_any = changed_any / n
    rate_spatial = changed_spatial / n
    assert 0.25 < rate_any < 0.55, rate_any
    assert 0.08 < rate_spatial < 0.30, rate_spatial
    # density-only ops (noise/brightness) fire more often than spatial
    assert changed_density >= changed_spatial


def test_augmentation_deterministic_per_key():
    d = 6
    rng = np.random.default_rng(1)
    density = jnp.asarray(rng.random((1, d, d, d)), jnp.float32)
    af3 = jnp.asarray(rng.random((24, d, d, d)), jnp.float32)
    tgt = jnp.asarray(rng.integers(0, 4, (3, d, d, d)))
    k = jax.random.PRNGKey(7)
    out1 = augment.augment_sample(k, density, af3, tgt)
    out2 = augment.augment_sample(k, density, af3, tgt)
    for a, b in zip(out1, out2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
