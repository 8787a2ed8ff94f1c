"""Weighted multi-task cross-entropy loss with cosine-annealed task weights.

Behavioral re-implementation of the reference loss (utils/loss.py:6-116):
three per-class-weighted cross-entropies (backbone 4-class, C-alpha 4-class,
amino-acid 21-class) combined with task weights that anneal from
(0.6, 0.25, 0.15) to (0.25, 0.4, 0.35) over 25 epochs on a cosine schedule
and are renormalized to sum to 1.

Per-class weights use torch ``F.cross_entropy(weight=...)`` semantics: the
loss is the weight-of-target-weighted mean, i.e.
``sum_i w[y_i] * nll_i / sum_i w[y_i]``.

The reference stores a ``label_smoothing=0.1`` that it never applies
(loss.py:33,40 — dead parameter); exposed here as a functional option,
default off for parity.
"""

from __future__ import annotations

import math
from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp

BACKBONE_CLASS_WEIGHTS = (0.03, 0.001, 0.3, 1.0)
CARBON_ALPHA_CLASS_WEIGHTS = (0.01, 0.001, 0.1, 1.0)
AMINO_ACID_CLASS_WEIGHTS = (
    0.001,  # background + masked
    1.0,  # ALA
    1.8,  # CYS
    1.1,  # ASP
    1.1,  # GLU
    1.3,  # PHE
    1.0,  # GLY
    1.6,  # HIS
    1.1,  # ILE
    1.1,  # LYS
    0.9,  # LEU
    1.7,  # MET
    1.2,  # ASN
    1.2,  # PRO
    1.3,  # GLN
    1.1,  # ARG
    1.0,  # SER
    1.1,  # THR
    1.0,  # VAL
    2.2,  # TRP
    1.4,  # TYR
)

START_LAMBDAS = (0.6, 0.25, 0.15)
TARGET_LAMBDAS = (0.25, 0.4, 0.35)
TRANSITION_EPOCH = 25


def cosine_transition(epoch: float, start_epoch: float, end_epoch: float) -> float:
    """Smooth 0 -> 1 cosine ramp (loss.py:42-50)."""
    if epoch <= start_epoch:
        return 0.0
    if epoch >= end_epoch:
        return 1.0
    progress = (epoch - start_epoch) / (end_epoch - start_epoch)
    return 0.5 * (1.0 - math.cos(math.pi * progress))


def task_lambdas(epoch: float) -> Tuple[float, float, float]:
    """Annealed, normalized (lambda_b, lambda_c, lambda_a) for an epoch."""
    p = cosine_transition(epoch, 0, TRANSITION_EPOCH)
    lams = [s + (t - s) * p for s, t in zip(START_LAMBDAS, TARGET_LAMBDAS)]
    total = sum(lams)
    return tuple(l / total for l in lams)


def weighted_cross_entropy(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    class_weights: Sequence[float],
    label_smoothing: float = 0.0,
    denominator: jnp.ndarray = None,
) -> jnp.ndarray:
    """Per-class-weighted CE, channels-last logits (..., C), int targets (...).

    ``denominator`` overrides the normalizer ``sum_i w[y_i]``: gradient
    accumulation passes the FULL-batch weight sum so that summing
    per-microbatch losses reproduces the full-batch loss exactly (the
    denominator depends only on targets, never on params).
    """
    w = jnp.asarray(class_weights, jnp.float32)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    n_cls = logits.shape[-1]
    if label_smoothing > 0.0:
        onehot = jax.nn.one_hot(targets, n_cls, dtype=jnp.float32)
        smoothed = onehot * (1.0 - label_smoothing) + label_smoothing / n_cls
        nll = -jnp.sum(smoothed * logp, axis=-1)
    else:
        nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    sample_w = w[targets]
    if denominator is None:
        denominator = jnp.sum(sample_w)
    return jnp.sum(sample_w * nll) / denominator


def class_weight_denominators(
    targets: Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray],
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-task weighted-CE denominators ``sum_i w[y_i]`` over a batch.

    Pure function of the integer targets (no model forward) — cheap to
    evaluate on the full batch even when the forward/backward must run in
    microbatches.
    """
    return tuple(
        jnp.sum(jnp.asarray(w, jnp.float32)[t])
        for w, t in zip(
            (BACKBONE_CLASS_WEIGHTS, CARBON_ALPHA_CLASS_WEIGHTS,
             AMINO_ACID_CLASS_WEIGHTS),
            targets,
        )
    )


def multi_task_loss(
    outputs: Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray],
    targets: Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray],
    lambdas,
    label_smoothing: float = 0.0,
    denominators: Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Combined loss.  ``outputs`` are channels-last logits (N,D,H,W,C).

    ``lambdas`` is the (3,) task-weight vector (see :func:`task_lambdas`),
    passed as data so epoch changes don't retrace the train step.

    ``denominators`` (per-task, from :func:`class_weight_denominators` over
    the FULL batch) makes the loss a partial contribution whose sum over
    microbatches equals the full-batch loss exactly — the mechanism behind
    exact in-step gradient accumulation (trainer.py).
    """
    dn = denominators if denominators is not None else (None, None, None)
    lb, lc, la = lambdas[0], lambdas[1], lambdas[2]
    bb_loss = weighted_cross_entropy(
        outputs[0], targets[0], BACKBONE_CLASS_WEIGHTS, label_smoothing, dn[0]
    )
    ca_loss = weighted_cross_entropy(
        outputs[1], targets[1], CARBON_ALPHA_CLASS_WEIGHTS, label_smoothing, dn[1]
    )
    aa_loss = weighted_cross_entropy(
        outputs[2], targets[2], AMINO_ACID_CLASS_WEIGHTS, label_smoothing, dn[2]
    )
    total = lb * bb_loss + lc * ca_loss + la * aa_loss
    return total, {
        "total_loss": total,
        "backbone_loss": bb_loss,
        "carbon_alpha_loss": ca_loss,
        "amino_acid_loss": aa_loss,
        "lambda_b": jnp.asarray(lb),
        "lambda_c": jnp.asarray(lc),
        "lambda_a": jnp.asarray(la),
    }
