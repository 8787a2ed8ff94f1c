"""Data-parallel training loop: jit SPMD train step + host-side scheduling.

Re-design of the reference trainer (train.py:112-320).  The reference uses
single-process ``torch.nn.DataParallel`` (replicate + scatter/gather per
batch); here the step is one jit-compiled SPMD program over a
``jax.sharding.Mesh``: parameters replicated, batch sharded along the
``data`` axis, gradient reduction compiled to an ICI psum by XLA.

Feature parity:
  * Adam (lr 1e-4) with runtime-adjustable lr (optax.inject_hyperparams)
  * ReduceLROnPlateau equivalent (factor 0.5, patience 5 — train.py:265-271)
  * adaptive gradient clipping: keep the last 10 global grad norms; once 5
    are recorded, clip to 1.5x their mean whenever the current norm exceeds
    2x the mean (train.py:116-153) — implemented inside the jit step with a
    ring buffer carried in the train state
  * epoch-gated dropout schedule 0.01/0.05/0.1 (model.py:295-329)
  * cosine-annealed task-weight schedule passed in as data
  * epoch checkpoints with model/optimizer/scheduler state (orbax), plus
    torch-layout export for interop with reference checkpoints

The reference overwrites ``best_val_loss`` even when the epoch is not the
best (train.py:306 — a bug); here best tracking is correct.
"""

from __future__ import annotations


import logging
import time
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import flax
import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from ..models.mica import MICA, dropout_rate_for_epoch
from ..parallel.mesh import DATA_AXIS, make_mesh
from . import augment
from . import loss as loss_module
from .loss import multi_task_loss, task_lambdas

logger = logging.getLogger(__name__)

GRAD_HISTORY = 10
GRAD_HISTORY_MIN = 5


@flax.struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jnp.ndarray
    grad_norms: jnp.ndarray  # (GRAD_HISTORY,) ring buffer
    grad_count: jnp.ndarray  # number of valid entries


class PlateauScheduler:
    """Host-side ReduceLROnPlateau (torch semantics: factor 0.5, patience 5,
    rel threshold 1e-4, mode min)."""

    def __init__(self, lr: float, factor: float = 0.5, patience: int = 5,
                 threshold: float = 1e-4, min_lr: float = 0.0):
        self.lr = lr
        self.factor = factor
        self.patience = patience
        self.threshold = threshold
        self.min_lr = min_lr
        self.best = float("inf")
        self.num_bad = 0

    def step(self, metric: float) -> float:
        if metric < self.best * (1.0 - self.threshold):
            self.best = metric
            self.num_bad = 0
        else:
            self.num_bad += 1
            if self.num_bad > self.patience:
                self.lr = max(self.lr * self.factor, self.min_lr)
                self.num_bad = 0
                logger.info("plateau: reducing lr to %.3e", self.lr)
        return self.lr

    def state_dict(self):
        return {"lr": self.lr, "best": self.best, "num_bad": self.num_bad}

    def load_state_dict(self, d):
        self.lr = d["lr"]; self.best = d["best"]; self.num_bad = d["num_bad"]


def make_optimizer(lr: float = 1e-4) -> optax.GradientTransformation:
    return optax.inject_hyperparams(optax.adam)(learning_rate=lr)


def _global_norm(grads) -> jnp.ndarray:
    return optax.global_norm(grads)


def adaptive_clip(grads, grad_norms, grad_count):
    """Reference's adaptive clipping, stateless-functional."""
    norm = _global_norm(grads)
    slot = grad_count % GRAD_HISTORY
    grad_norms = grad_norms.at[slot].set(norm)
    grad_count = grad_count + 1
    n_valid = jnp.minimum(grad_count, GRAD_HISTORY)
    avg = jnp.sum(grad_norms) / n_valid.astype(jnp.float32)
    should_clip = (n_valid >= GRAD_HISTORY_MIN) & (norm > 2.0 * avg)
    clip_to = 1.5 * avg
    scale = jnp.where(should_clip & (norm > clip_to), clip_to / (norm + 1e-12), 1.0)
    grads = jax.tree_util.tree_map(lambda g: g * scale, grads)
    return grads, grad_norms, grad_count, norm, should_clip


class Trainer:
    def __init__(
        self,
        base_filters: int = 64,
        lr: float = 1e-4,
        dtype=None,
        mesh=None,
        use_mesh: bool = True,
        label_smoothing: float = 0.0,
        exp_only_prob: float = 0.4,
        use_augmentation: bool = True,
        seed: int = 2022,
        remat: bool = True,
        remat_scope: str = "blocks",
        microbatch: Optional[int] = None,
        microbatch_impl: str = "unroll",
    ):
        # microbatch: accumulate gradients over in-step microbatches of
        # this size (a lax.scan whose body is ONE microbatch's
        # value_and_grad).  Exact for the gradient: the weighted-CE
        # normalizer sum_i w[y_i] is computed over the FULL batch and
        # each microbatch contributes numerator/D_full (the normalizer
        # is target-only, so this is the true full-batch loss split into
        # additive terms), and every per-sample op (InstanceNorm,
        # dropout, augmentation) is batch-independent.  This is the
        # workaround for the batch>=12
        # XLA TPU compiler crash (scripts/bisect_batch12.py): the
        # compiled graph is the microbatch-sized one regardless of the
        # global batch.
        # remat: rematerialize in the backward pass — full-size training
        # at 64-cubes does not fit HBM otherwise (no-remat dies in the XLA
        # compiler).  remat_scope picks the granularity: "blocks" (inner
        # RDB/attention/heads only, stage boundaries saved) measured
        # 2.47 s/step at batch 8 on v5e vs 2.66 for the round-2 "both"
        # (nested stage+block remat recomputes each stage forward twice)
        # and 2.64 for "stages"; batch 12 under "blocks" exceeds compiler
        # resources (scripts/bench_train_remat.py).  "both" remains the
        # lowest-memory fallback for bigger windows/models.
        from ..utils.jaxcache import ensure_compilation_cache

        ensure_compilation_cache()
        self.model = MICA(base=base_filters, dtype=dtype, remat=remat,
                          remat_scope=remat_scope)
        # validate + A/B the depthwise-conv formulations for this model's
        # widths before the first trace (same per-width registry the
        # inference engine uses; pick_depthwise_path no-ops off-TPU, under
        # env override, and on multi-host — divergent per-host programs
        # would deadlock the collectives).  The selection gate itself
        # already proved grad parity for any width it enables.
        self.dw_autotune: Dict = {"path": "xla", "autotuned": False}
        if dtype == jnp.bfloat16:
            from ..ops.depthwise_pallas import pick_depthwise_path

            self.dw_autotune = pick_depthwise_path(
                widths=(base_filters, 2 * base_filters, 4 * base_filters),
                spatial=64)  # training grids are 64-cubes (SURVEY §2.2)
        self.tx = make_optimizer(lr)
        self.scheduler = PlateauScheduler(lr)
        self.mesh = mesh if mesh is not None else (make_mesh() if use_mesh else None)
        self.label_smoothing = label_smoothing
        self.microbatch = microbatch
        # "unroll": nm copies of the microbatch grad graph (fast XLA:CPU
        # compiles; op count scales with nm).  "scan": ONE copy inside a
        # lax.scan (the only formulation whose op count stays at the
        # microbatch size — the TPU compile helper dies on BOTH larger
        # per-op batches and duplicated subgraphs, scripts/
        # bisect_batch12.py; XLA:CPU compiles it pathologically slowly,
        # so it is opt-in).
        self.microbatch_impl = microbatch_impl
        self.exp_only_prob = exp_only_prob
        self.use_augmentation = use_augmentation
        self.rng = jax.random.PRNGKey(seed)
        self._train_steps: Dict[float, Any] = {}
        self._eval_step = None
        self._eval_step_unsharded = None

    # ------------------------------------------------------------------
    def _check_batch_divisible(self, n: int) -> None:
        """Batch sharding along the data axis needs batch % devices == 0;
        fail with a readable message instead of XLA's sharding error."""
        if self.mesh is not None:
            n_dev = self.mesh.devices.size
            if n % n_dev:
                raise ValueError(
                    f"batch size {n} is not divisible by the {n_dev}-device "
                    f"mesh; round the batch up (parallel.mesh."
                    f"pad_to_multiple) or drop the remainder"
                )

    # ------------------------------------------------------------------
    def init_state(self, sample_shape=(1, 64, 64, 64, 1)) -> TrainState:
        from ..models.init import init_params_fast

        self.rng, k = jax.random.split(self.rng)
        x = jnp.zeros(sample_shape, jnp.float32)
        af = jnp.zeros(sample_shape[:-1] + (24,), jnp.float32)
        # host-side init (same xavier-normal/zeros scheme) — flax's
        # compiled init program costs minutes on slow-compile hosts
        params = init_params_fast(self.model, (x, af),
                                  seed=int(jax.random.randint(k, (), 0, 2**31 - 1)))
        state = TrainState(
            params=params,
            opt_state=self.tx.init(params),
            step=jnp.zeros((), jnp.int32),
            grad_norms=jnp.zeros((GRAD_HISTORY,), jnp.float32),
            grad_count=jnp.zeros((), jnp.int32),
        )
        if self.mesh is not None:
            repl = NamedSharding(self.mesh, P())
            state = jax.device_put(state, repl)
        return state

    # ------------------------------------------------------------------
    def _build_train_step(self, dropout_rate: float):
        model, tx = self.model, self.tx
        ls = self.label_smoothing
        use_aug = self.use_augmentation
        exp_only_prob = self.exp_only_prob

        def step(state: TrainState, batch, lambdas, key):
            density, af3, bb_t, ca_t, aa_t = batch
            k_aug, k_zero, k_drop = jax.random.split(key, 3)

            targets = jnp.stack([bb_t, ca_t, aa_t], axis=1)  # (N,3,D,H,W)
            dens_cf = density[:, None]  # (N,1,D,H,W)
            if use_aug:
                dens_cf, af3, targets = augment.augment_batch(
                    k_aug, dens_cf, af3, targets
                )
            # random AF3 blanking (dataset.py:158-159): per-sample zeroing
            zero = (
                jax.random.uniform(k_zero, (af3.shape[0],)) < exp_only_prob
            ).reshape(-1, 1, 1, 1, 1)
            af3 = jnp.where(zero, jnp.zeros_like(af3), af3)

            x = jnp.moveaxis(dens_cf, 1, -1)  # NDHWC
            af = jnp.moveaxis(af3, 1, -1)
            tgt = (targets[:, 0], targets[:, 1], targets[:, 2])

            def loss_fn(params, x=x, af=af, tgt=tgt, k_drop=k_drop,
                        denominators=None):
                outs = model.apply(
                    {"params": params}, x, af,
                    dropout_rate=dropout_rate, train=True,
                    rngs={"dropout": k_drop},
                )
                return multi_task_loss(outs, tgt, lambdas, ls,
                                       denominators=denominators)

            n = x.shape[0]
            mb = self.microbatch
            if mb and mb < n and n % mb == 0:
                # gradient accumulation over unrolled microbatches: every
                # op in the graph stays at the microbatch size, which is
                # what sidesteps the large-batch compiler crash (the
                # crash is per-op/fusion scale, not graph length; a
                # lax.scan formulation was tried and compiles
                # pathologically slowly on XLA:CPU).
                #
                # Exactness: the per-task weighted-CE normalizer
                # sum_i w[y_i] (loss.py:92) depends only on targets, so
                # it is computed over the FULL batch here and every
                # microbatch contributes numerator/D_full — summing
                # losses and gradients then reproduces the full-batch
                # quantities exactly, including when microbatch weight
                # sums differ (class weights span 0.001..2.2, so they do
                # on real data).
                nm = n // mb
                denoms = loss_module.class_weight_denominators(tgt)
                keys = jax.random.split(k_drop, nm)
                if self.microbatch_impl == "scan":
                    def split(a):
                        return a.reshape((nm, mb) + a.shape[1:])

                    xs = (split(x), split(af)) + tuple(
                        split(t) for t in tgt) + (keys,)

                    def body(carry, inp):
                        g_acc, l_acc, m_acc = carry
                        xm, afm, t0, t1, t2, km = inp
                        (l_m, met_m), g_m = jax.value_and_grad(
                            loss_fn, has_aux=True)(
                                state.params, x=xm, af=afm,
                                tgt=(t0, t1, t2), k_drop=km,
                                denominators=denoms)
                        g_acc = jax.tree_util.tree_map(jnp.add, g_acc, g_m)
                        m_acc = jax.tree_util.tree_map(jnp.add, m_acc, met_m)
                        return (g_acc, l_acc + l_m, m_acc), None

                    zeros_g = jax.tree_util.tree_map(
                        jnp.zeros_like, state.params)
                    # derive the metric structure from the loss itself so
                    # new/removed metric keys flow through (a hardcoded
                    # key list silently dropped additions)
                    met_struct = jax.eval_shape(
                        lambda p: loss_fn(
                            p, x=x[:mb], af=af[:mb],
                            tgt=tuple(t[:mb] for t in tgt),
                            k_drop=keys[0], denominators=denoms)[1],
                        state.params)
                    zeros_m = jax.tree_util.tree_map(
                        lambda s: jnp.zeros(s.shape, s.dtype), met_struct)
                    (grads, loss, metrics), _ = jax.lax.scan(
                        body, (zeros_g, jnp.zeros((), jnp.float32),
                               zeros_m), xs)
                else:
                    grads = loss = metrics = None
                    for i in range(nm):
                        sl = slice(i * mb, (i + 1) * mb)
                        (loss_m, met_m), g_m = jax.value_and_grad(
                            loss_fn, has_aux=True)(
                                state.params, x=x[sl], af=af[sl],
                                tgt=tuple(t[sl] for t in tgt),
                                k_drop=keys[i], denominators=denoms)
                        if grads is None:
                            grads, loss, metrics = g_m, loss_m, dict(met_m)
                        else:
                            grads = jax.tree_util.tree_map(
                                jnp.add, grads, g_m)
                            loss = loss + loss_m
                            metrics = {k: metrics[k] + met_m[k]
                                       for k in metrics}
                # grads/losses are exact full-batch sums already; only the
                # per-microbatch-constant lambda metrics summed to nm*x
                for k in ("lambda_b", "lambda_c", "lambda_a"):
                    if k in metrics:
                        metrics[k] = metrics[k] / nm
            else:
                (loss, metrics), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(state.params)
            grads, grad_norms, grad_count, norm, clipped = adaptive_clip(
                grads, state.grad_norms, state.grad_count
            )
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            metrics = dict(metrics)
            metrics["gradient_norm"] = norm
            metrics["gradient_clipped"] = clipped
            new_state = TrainState(
                params=params, opt_state=opt_state, step=state.step + 1,
                grad_norms=grad_norms, grad_count=grad_count,
            )
            return new_state, metrics

        from ..infer.engine import _heavy_compile_options

        opts = _heavy_compile_options()  # 32 MB scoped VMEM: same conv
        # emitter win as the inference step (~1.5%, PERFORMANCE.md)
        if self.mesh is not None:
            repl = NamedSharding(self.mesh, P())
            bshard = NamedSharding(self.mesh, P(DATA_AXIS))
            return jax.jit(
                step,
                in_shardings=(repl, (bshard,) * 5, repl, repl),
                out_shardings=(repl, repl),
                donate_argnums=(0,),
                compiler_options=opts,
            )
        return jax.jit(step, donate_argnums=(0,), compiler_options=opts)

    def train_step_for_epoch(self, epoch: int):
        rate = dropout_rate_for_epoch(epoch)
        if rate not in self._train_steps:
            self._train_steps[rate] = self._build_train_step(rate)
        return self._train_steps[rate]

    # ------------------------------------------------------------------
    def _build_eval_step(self):
        model, ls = self.model, self.label_smoothing

        def step(params, batch, lambdas):
            density, af3, bb_t, ca_t, aa_t = batch
            x = density[..., None]
            af = jnp.moveaxis(af3, 1, -1)
            outs = model.apply({"params": params}, x, af)
            return multi_task_loss(outs, (bb_t, ca_t, aa_t), lambdas, ls)[1]

        if self.mesh is not None:
            repl = NamedSharding(self.mesh, P())
            bshard = NamedSharding(self.mesh, P(DATA_AXIS))
            return jax.jit(
                step,
                in_shardings=(repl, (bshard,) * 5, repl),
                out_shardings=repl,
            )
        return jax.jit(step)

    @property
    def eval_step(self):
        if self._eval_step is None:
            self._eval_step = self._build_eval_step()
        return self._eval_step

    @property
    def eval_step_unsharded(self):
        """Plain-jit eval for batches that do not divide the mesh (the
        validation tail with drop_last=False)."""
        if self._eval_step_unsharded is None:
            mesh, self.mesh = self.mesh, None
            try:
                self._eval_step_unsharded = self._build_eval_step()
            finally:
                self.mesh = mesh
        return self._eval_step_unsharded

    # ------------------------------------------------------------------
    def run_epoch(self, state: TrainState, loader, epoch: int) -> Tuple[TrainState, Dict[str, float]]:
        step_fn = self.train_step_for_epoch(epoch)
        lambdas = jnp.asarray(task_lambdas(epoch), jnp.float32)
        # refresh the optimizer lr from the plateau scheduler
        state = state.replace(
            opt_state=_set_lr(state.opt_state, self.scheduler.lr)
        )
        # Accumulate metrics as device arrays and sync ONCE at epoch end:
        # a float() per step forces a device round-trip that stalls the
        # SPMD pipeline (each step would wait for the previous readback).
        keys = ("total_loss", "backbone_loss", "carbon_alpha_loss",
                "amino_acid_loss")
        totals: Dict[str, object] = {}
        n = 0
        t0 = time.time()
        for batch in loader:
            self.rng, k = jax.random.split(self.rng)
            batch = tuple(jnp.asarray(b) for b in batch)
            self._check_batch_divisible(batch[0].shape[0])
            state, metrics = step_fn(state, batch, lambdas, k)
            n += 1
            for key in keys:
                totals[key] = (
                    metrics[key] if key not in totals
                    else totals[key] + metrics[key]
                )
        out = {k: float(v) / max(n, 1) for k, v in totals.items()}
        out["epoch_time"] = time.time() - t0
        out["steps"] = n
        return state, out

    def run_validation(self, state: TrainState, loader, epoch: int) -> Dict[str, float]:
        lambdas = jnp.asarray(task_lambdas(epoch), jnp.float32)
        keys = ("total_loss", "backbone_loss", "carbon_alpha_loss",
                "amino_acid_loss")
        totals: Dict[str, object] = {}
        n = 0
        for batch in loader:
            batch = tuple(jnp.asarray(b) for b in batch)
            n_batch = batch[0].shape[0]
            if self.mesh is not None and n_batch % self.mesh.devices.size:
                metrics = self.eval_step_unsharded(
                    jax.device_get(state.params), batch, lambdas)
            else:
                metrics = self.eval_step(state.params, batch, lambdas)
            n += 1
            for key in keys:
                totals[key] = (
                    metrics[key] if key not in totals
                    else totals[key] + metrics[key]
                )
        return {k: float(v) / max(n, 1) for k, v in totals.items()}


def _set_lr(opt_state, lr: float):
    """Update the injected learning rate inside an inject_hyperparams state."""
    return opt_state._replace(
        hyperparams={**opt_state.hyperparams, "learning_rate": jnp.asarray(lr, jnp.float32)}
    )


# ---------------------------------------------------------------------------
# checkpointing


def save_checkpoint(path: str, state: TrainState, scheduler: PlateauScheduler,
                    epoch: int, val_loss: float) -> None:
    """Orbax checkpoint with model/optimizer/scheduler state (train.py:294-314)."""
    import orbax.checkpoint as ocp

    ckpt = {
        "params": jax.device_get(state.params),
        "opt_state": jax.device_get(state.opt_state),
        "step": int(state.step),
        "grad_norms": np.asarray(state.grad_norms),
        "grad_count": int(state.grad_count),
        "epoch": epoch,
        "val_loss": float(val_loss),
        "scheduler": scheduler.state_dict(),
    }
    p = Path(path).absolute()
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(p, ckpt, force=True)


def load_checkpoint(path: str, target: Optional[dict] = None) -> dict:
    """Restore an orbax checkpoint.

    ``target`` is the checkpoint-structured template (e.g. built from a
    freshly initialized state): WITHOUT it, orbax returns plain nested
    dicts, which silently destroys the optax namedtuple optimizer state —
    ``_replace``/``tx.update`` then fail on resume.  Params-only readers
    (flax params are plain dicts anyway) may omit it.
    """
    import orbax.checkpoint as ocp

    with ocp.PyTreeCheckpointer() as ckptr:
        if target is not None:
            return ckptr.restore(Path(path).absolute(), item=target)
        return ckptr.restore(Path(path).absolute())


def resume_template(state: TrainState, scheduler: PlateauScheduler) -> dict:
    """Checkpoint-structured template for a full-state restore."""
    return {
        "params": jax.device_get(state.params),
        "opt_state": jax.device_get(state.opt_state),
        "step": 0,
        "grad_norms": np.asarray(state.grad_norms),
        "grad_count": 0,
        "epoch": 0,
        "val_loss": 0.0,
        "scheduler": scheduler.state_dict(),
    }
