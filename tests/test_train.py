import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mica_tpu.train import augment, data, loss as loss_mod
from mica_tpu.train.trainer import (
    GRAD_HISTORY, PlateauScheduler, Trainer, adaptive_clip,
)

sys.path.insert(0, "/root/reference")


def test_weighted_ce_matches_torch(rng):
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    logits = rng.normal(size=(2, 5, 5, 5, 4)).astype(np.float32)
    targets = rng.integers(0, 4, (2, 5, 5, 5)).astype(np.int64)
    w = loss_mod.BACKBONE_CLASS_WEIGHTS

    ref = F.cross_entropy(
        torch.from_numpy(np.transpose(logits, (0, 4, 1, 2, 3))),
        torch.from_numpy(targets),
        weight=torch.tensor(w),
        reduction="mean",
    ).item()
    mine = float(loss_mod.weighted_cross_entropy(jnp.asarray(logits),
                                                 jnp.asarray(targets), w))
    np.testing.assert_allclose(mine, ref, rtol=1e-5)


def test_task_lambdas_schedule():
    # epoch 0: start weights; epoch >= 25: target weights (both normalized)
    np.testing.assert_allclose(loss_mod.task_lambdas(0), (0.6, 0.25, 0.15), atol=1e-6)
    np.testing.assert_allclose(loss_mod.task_lambdas(25), (0.25, 0.4, 0.35), atol=1e-6)
    np.testing.assert_allclose(loss_mod.task_lambdas(60), (0.25, 0.4, 0.35), atol=1e-6)
    mid = loss_mod.task_lambdas(12)
    assert 0.25 < mid[0] < 0.6 and abs(sum(mid) - 1.0) < 1e-6


def test_multi_task_loss_lambda_parity():
    """Cosine schedule matches the reference formula (loss.py:42-81)."""
    import math

    for epoch in (0, 5, 13, 24, 25, 40):
        if epoch <= 0:
            p = 0.0
        elif epoch >= 25:
            p = 1.0
        else:
            p = 0.5 * (1 - math.cos(math.pi * epoch / 25))
        lams = [s + (t - s) * p for s, t in ((0.6, 0.25), (0.25, 0.4), (0.15, 0.35))]
        tot = sum(lams)
        np.testing.assert_allclose(
            loss_mod.task_lambdas(epoch), [l / tot for l in lams], atol=1e-9
        )


def test_adaptive_clip():
    grads = {"w": jnp.full((4,), 10.0)}  # norm 20
    norms = jnp.array([1.0, 1.0, 1.0, 1.0, 0, 0, 0, 0, 0, 0], jnp.float32)
    count = jnp.asarray(4, jnp.int32)
    clipped_grads, new_norms, new_count, norm, clipped = adaptive_clip(
        grads, norms, count
    )
    # history now [1,1,1,1,20]: avg 4.8, norm 20 > 9.6 -> clip to 7.2
    assert bool(clipped)
    np.testing.assert_allclose(float(norm), 20.0)
    np.testing.assert_allclose(
        float(optax_global_norm(clipped_grads)), 4.8 * 1.5, rtol=1e-5
    )
    assert int(new_count) == 5

    # low norm: no clipping
    grads2 = {"w": jnp.full((4,), 1.0)}
    out2, *_, clipped2 = adaptive_clip(grads2, new_norms, new_count)
    assert not bool(clipped2)
    np.testing.assert_allclose(np.asarray(out2["w"]), 1.0)


def optax_global_norm(g):
    import optax

    return optax.global_norm(g)


def test_plateau_scheduler():
    s = PlateauScheduler(lr=1e-4, patience=2)
    lrs = []
    for m in [1.0, 0.9, 0.9, 0.9, 0.9, 0.9]:
        lrs.append(s.step(m))
    # best=0.9 at step 2; bad epochs 3,4,5 -> reduce at 3rd bad
    assert lrs[-1] == pytest.approx(5e-5)


def test_augment_joint_spatial_consistency(rng):
    d = 8
    density = np.zeros((1, d, d, d), np.float32)
    tgt = rng.integers(0, 4, (3, d, d, d)).astype(np.int32)
    af3 = np.repeat(tgt[:1].astype(np.float32), 24, axis=0)

    found_changed = False
    for seed in range(12):
        key = jax.random.PRNGKey(seed)
        _, af_out, tgt_out = augment.augment_sample(
            key, jnp.asarray(density), jnp.asarray(af3), jnp.asarray(tgt)
        )
        af_out, tgt_out = np.asarray(af_out), np.asarray(tgt_out)
        # af3 channel 0 must track target 0 through any spatial transform
        np.testing.assert_array_equal(af_out[0].astype(np.int32), tgt_out[0])
        assert set(np.unique(tgt_out)).issubset(set(np.unique(tgt)) | {0})
        if not np.array_equal(tgt_out, tgt):
            found_changed = True
    assert found_changed, "no augmentation fired in 12 seeds"


@pytest.mark.slow
def test_train_step_runs_and_learns():
    assert len(jax.devices()) == 8
    trainer = Trainer(base_filters=16, lr=3e-4, use_mesh=True,
                      use_augmentation=False, exp_only_prob=0.0)
    size = 16
    state = trainer.init_state((1, size, size, size, 1))
    batch = data.synthetic_batch(batch_size=8, size=size)

    step = trainer.train_step_for_epoch(0)
    lambdas = jnp.asarray(loss_mod.task_lambdas(0), jnp.float32)
    losses = []
    for i in range(8):
        state, metrics = step(state, tuple(jnp.asarray(b) for b in batch),
                              lambdas, jax.random.PRNGKey(i))
        losses.append(float(metrics["total_loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], f"no learning: {losses}"


def _skewed_batch(batch_size=8, size=16, seed=0):
    """Synthetic batch whose per-microbatch class-weight sums differ by
    orders of magnitude: the first half is nearly all background
    (weight 0.001-0.03), the second half dense atom classes (weight
    0.1-2.2).  Mean-of-microbatch-losses accumulation (the pre-round-5
    bug) diverges from the full-batch loss by ~2x on this data."""
    density, af3, bb, ca, aa = data.synthetic_batch(batch_size, size, seed)
    half = batch_size // 2
    rng = np.random.default_rng(seed + 1)
    for t, hi in ((bb, 4), (ca, 4), (aa, 21)):
        t[:half] = (rng.random(t[:half].shape) < 0.01) * rng.integers(
            1, hi, t[:half].shape)
        t[half:] = rng.integers(hi - 2, hi, t[half:].shape)
    return density, af3, bb, ca, aa


def test_microbatch_loss_terms_exact_on_skewed_weights():
    """Loss-level exactness of the denominator-split accumulation: with
    per-microbatch weight sums differing by ~100x, summing the
    ``denominators=``-scaled microbatch losses (and their gradients)
    reproduces the full-batch loss/grad to float tolerance, while naive
    mean-of-microbatch-losses is off by >10%."""
    rng = np.random.default_rng(3)
    n, d = 8, 5
    _, _, bb, ca, aa = _skewed_batch(batch_size=n, size=d, seed=3)
    tgt = tuple(jnp.asarray(t) for t in (bb, ca, aa))
    # confident-correct on the background-heavy half, random on the dense
    # half: the per-microbatch mean nll then differs, which is what makes
    # mean-of-microbatch-losses measurably wrong
    logits = []
    for t, c in zip((bb, ca, aa), (4, 4, 21)):
        lg = rng.normal(size=(n, d, d, d, c)).astype(np.float32)
        onehot = np.eye(c, dtype=np.float32)[t[: n // 2]]
        lg[: n // 2] += 6.0 * onehot
        logits.append(jnp.asarray(lg))
    logits = tuple(logits)
    lambdas = jnp.asarray(loss_mod.task_lambdas(0), jnp.float32)

    def full(lg):
        return loss_mod.multi_task_loss(lg, tgt, lambdas)[0]

    ref_loss = full(logits)
    ref_grad = jax.grad(full)(logits)

    denoms = loss_mod.class_weight_denominators(tgt)
    mb = 4

    def part(lg, sl):
        return loss_mod.multi_task_loss(
            tuple(l[sl] for l in lg),
            tuple(t[sl] for t in tgt)[0:3],
            lambdas, denominators=denoms)[0]

    acc_loss = 0.0
    acc_grad = jax.tree_util.tree_map(jnp.zeros_like, logits)
    naive = 0.0
    for i in range(n // mb):
        sl = slice(i * mb, (i + 1) * mb)
        l, g = jax.value_and_grad(part)(logits, sl)
        # scatter the microbatch grad back into the full-batch slot
        acc_grad = tuple(a.at[sl].add(gm[sl]) for a, gm in
                         zip(acc_grad, g))
        acc_loss += l
        naive += loss_mod.multi_task_loss(
            tuple(lg[sl] for lg in logits),
            tuple(t[sl] for t in tgt), lambdas)[0]
    naive /= (n // mb)

    np.testing.assert_allclose(float(acc_loss), float(ref_loss), rtol=1e-5)
    for a, r in zip(acc_grad, ref_grad):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r), atol=1e-6)
    assert abs(float(naive) - float(ref_loss)) / float(ref_loss) > 0.1, (
        "skew too weak to distinguish naive mean-of-means accumulation")


@pytest.mark.slow  # ~160 s of XLA:CPU compile for the two step variants
def test_microbatch_accumulation_matches_full_batch():
    """In-step gradient accumulation (the batch>=12 compiler-crash
    workaround, scripts/bisect_batch12.py) must be EXACT: with dropout
    off and augmentation off, the 2x4-microbatch step from the same
    state produces the same post-step loss trajectory as the batch-8
    step, to float-reassociation tolerance.  The batch is weight-skewed
    (microbatch weight sums differ ~100x) so per-microbatch-normalized
    accumulation would fail this test."""
    size = 16
    batch = _skewed_batch(batch_size=8, size=size)
    lambdas = jnp.asarray(loss_mod.task_lambdas(0), jnp.float32)

    results = []
    for mb in (None, 4):
        trainer = Trainer(base_filters=16, lr=3e-4, use_mesh=False,
                          use_augmentation=False, exp_only_prob=0.0,
                          seed=7, microbatch=mb)
        state = trainer.init_state((1, size, size, size, 1))
        # epoch 0 dropout is 0.01 > 0 — build a rate-0 step directly so
        # the comparison is deterministic
        step = trainer._build_train_step(0.0)
        losses = []
        for i in range(3):
            state, metrics = step(
                state, tuple(jnp.asarray(b) for b in batch), lambdas,
                jax.random.PRNGKey(i))
            losses.append(float(metrics["total_loss"]))
        results.append(losses)
    # float reassociation (sum-of-partials vs one sum) is amplified
    # through Adam's rsqrt over the 3 steps — measured 5.5e-5 rel; a
    # wrong accumulation (missing 1/nm, skipped microbatch, or the old
    # per-microbatch normalization on this skewed batch) is >=1e-2
    np.testing.assert_allclose(results[0], results[1], rtol=5e-4,
                               err_msg="microbatch accumulation diverged")


@pytest.mark.slow
def test_microbatch_scan_matches_unroll():
    """The lax.scan accumulation (ONE microbatch-size subgraph — the
    formulation for compilers that reject duplicated subgraphs) must
    match the unrolled accumulation bit-for-bit-ish on the same skewed
    batch.  Small model: XLA:CPU compiles the scanned grad pathologically
    slowly at larger sizes."""
    size = 8
    batch = _skewed_batch(batch_size=8, size=size)
    lambdas = jnp.asarray(loss_mod.task_lambdas(0), jnp.float32)

    results = []
    for impl in ("unroll", "scan"):
        trainer = Trainer(base_filters=16, lr=3e-4, use_mesh=False,
                          use_augmentation=False, exp_only_prob=0.0,
                          seed=7, microbatch=4, microbatch_impl=impl)
        state = trainer.init_state((1, size, size, size, 1))
        step = trainer._build_train_step(0.0)
        losses = []
        for i in range(2):
            state, metrics = step(
                state, tuple(jnp.asarray(b) for b in batch), lambdas,
                jax.random.PRNGKey(i))
            losses.append(float(metrics["total_loss"]))
        results.append(losses)
    np.testing.assert_allclose(results[0], results[1], rtol=1e-5,
                               err_msg="scan accumulation diverged")


@pytest.mark.slow
def test_train_step_bfloat16():
    """The production TPU training dtype: one bf16 step with augmentation
    and dropout (the bf16 grad path broke once on a mixed-dtype conv VJP)."""
    trainer = Trainer(base_filters=16, dtype=jnp.bfloat16, use_mesh=True,
                      use_augmentation=True)
    size = 16
    state = trainer.init_state((1, size, size, size, 1))
    batch = data.synthetic_batch(batch_size=8, size=size)
    step = trainer.train_step_for_epoch(0)
    lambdas = jnp.asarray(loss_mod.task_lambdas(0), jnp.float32)
    state, metrics = step(state, tuple(jnp.asarray(b) for b in batch),
                          lambdas, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["total_loss"]))


def test_validation_runs():
    trainer = Trainer(base_filters=16, use_mesh=True, use_augmentation=False)
    size = 16
    state = trainer.init_state((1, size, size, size, 1))
    batch = data.synthetic_batch(batch_size=8, size=size)
    metrics = trainer.run_validation(state, [batch], epoch=0)
    assert np.isfinite(metrics["total_loss"])


def test_train_val_split_deterministic():
    tr1, va1 = data.train_val_split(100)
    tr2, va2 = data.train_val_split(100)
    np.testing.assert_array_equal(tr1, tr2)
    assert len(va1) == 20 and len(set(tr1) & set(va1)) == 0
