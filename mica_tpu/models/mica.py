"""The MICA multi-task 3-D network, TPU-native (flax.linen, NDHWC).

Behavioral re-design of the reference network (models/model.py:5-348): a
multi-scale input stem over a 1-channel density cube plus an optional
24-channel AF3 encoding, three stride-1 encoder stages with residual-dense
blocks and dual (local depthwise + global squeeze-excite) attention, a
weighted FPN fusion, and three cascaded task heads (backbone 4-class,
C-alpha 4-class, amino-acid 21-class).

TPU-first choices:
  * channels-last (N, D, H, W, C) layout — XLA's native conv layout on TPU,
    keeping the channel dim on the 128-lane axis;
  * configurable compute dtype (bfloat16 by default for inference) with
    float32 parameters and float32 instance-norm statistics;
  * the data-dependent "is the AF3 input all zero?" branch
    (reference model.py:59-63) is expressed as a per-sample ``jnp.where``
    select between the two stem outputs, so the whole forward pass is a
    single traced graph (no host sync, no retrace);
  * everything is stride-1 at 64-cubes, so all convs keep static shapes and
    XLA tiles them straight onto the MXU.

Since there is no spatial downsampling anywhere in the reference network
(its encoder "transitions" are stride-1, model.py:142, making the FPN's
trilinear interpolation a no-op), the FPN here simply fuses the three
equal-size encoder outputs.

Dropout rates follow the reference's epoch schedule (model.py:295-329) via
the ``dropout_rate`` call argument; heads use 2x the base rate
(model.py:291-293).
"""

from __future__ import annotations

import os
from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


def _train_wino_convs() -> bool:
    """Use the z-axis Winograd formulation for the big convs in the
    TRAINING forward too (default off until its VJP cost is measured on
    silicon; ``MICA_TRAIN_WINO=1`` enables)."""
    return os.environ.get("MICA_TRAIN_WINO", "0") == "1"


def _train_wino_pallas() -> str:
    """Gate for the Pallas Winograd custom-VJP path in TRAINING
    (ops/wino_pallas.py round-5): ``MICA_TRAIN_WINO_PALLAS`` "1" on,
    "interpret" for CPU parity tests, default off until the silicon A/B
    records a win (scripts/bench_train_wino.py)."""
    return os.environ.get("MICA_TRAIN_WINO_PALLAS", "0")


def _train_fast_convs() -> bool:
    """Use the lane-packed small-Cout conv formulation in the TRAINING
    forward too (default on; ``MICA_TRAIN_PACKED=0`` disables).

    Measured on v5e (scripts/bench_train_remat.py, batch 8, remat
    "blocks"): 2.410 s/step packed vs 2.469 direct — the packed forward
    win survives its strided-conv VJP.  ``maybe_packed_conv`` itself
    no-ops off-TPU, so CPU tests and the f32 parity suites keep XLA's
    direct-conv reduction order."""
    return os.environ.get("MICA_TRAIN_PACKED", "1") != "0"


def instance_norm(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """InstanceNorm over spatial dims, no affine (torch InstanceNorm3d default).

    Statistics accumulate in float32 regardless of compute dtype, using the
    E[x^2] - E[x]^2 form so the cast-to-f32 fuses into the reductions: the
    naive ``jnp.var`` materializes a full-size padded f32 temporary per
    call, which blows training HBM (measured 2.25 GB per 512-ch call in
    the remat backward).
    """
    dt = x.dtype
    mean = jnp.mean(x, axis=(1, 2, 3), keepdims=True, dtype=jnp.float32)
    sq_mean = jnp.mean(
        jax.lax.square(x.astype(jnp.float32)), axis=(1, 2, 3), keepdims=True
    )
    var = jnp.maximum(sq_mean - jax.lax.square(mean), 0.0)
    scale = jax.lax.rsqrt(var + eps)
    if dt == jnp.float32:
        return (x - mean) * scale
    # low-precision compute: apply the normalization in the compute dtype
    # (stats stay f32).  The f32-applied variant promotes the whole tensor
    # to f32 — at large windows XLA materializes the broadcasts as
    # full-spatial f32 temporaries (2 x 8.5 GB at a 128-cube window,
    # OOM); in bf16 the apply fuses and costs half the bandwidth.
    return (x - mean.astype(dt)) * scale.astype(dt)


def global_avg_pool(x: jnp.ndarray) -> jnp.ndarray:
    """AdaptiveAvgPool3d(1) equivalent: mean over D,H,W, keepdims."""
    return jnp.mean(x.astype(jnp.float32), axis=(1, 2, 3), keepdims=True).astype(x.dtype)


class ChannelDropout(nn.Module):
    """torch Dropout3d equivalent: drops whole channels per sample."""

    @nn.compact
    def __call__(self, x, rate: float, train: bool):
        if not train or rate == 0.0:
            return x
        return nn.Dropout(rate=rate, broadcast_dims=(1, 2, 3), deterministic=False)(x)


class Conv(nn.Module):
    """3-D conv with SAME padding, torch-compatible init (xavier_normal).

    ``precision="highest"`` matters only for float32 compute (parity mode):
    XLA's DEFAULT precision decomposes f32 contractions into bf16 passes on
    the TPU MXU, which drifts ~0.2 in final logits vs a true-f32 oracle;
    bf16 compute (the production dtype) is unaffected by the flag.

    ``fast``: use the lane-packed reformulation for small-Cout k=3 convs
    on TPU (see ``conv_same``).  The parameter tree stays identical to the
    ``nn.Conv`` path (declared under ``Conv_0/{kernel,bias}``), so fast and
    direct modes share checkpoints.
    """

    features: int
    kernel: int = 3
    groups: int = 1
    dtype: Optional[Dtype] = None
    fast: bool = False

    @nn.compact
    def __call__(self, x):
        if (self.fast and self.groups == 1 and self.kernel == 3
                and self.features < 128):
            if self.dtype is not None:
                x = x.astype(self.dtype)  # nn.Conv's dtype promotion
            k, b = _ConvParams(
                (3, 3, 3, x.shape[-1], self.features), self.features,
                name="Conv_0",
            )()
            return conv_same(x, k, b, dtype=self.dtype, fast=True)
        f32 = self.dtype is None or self.dtype == jnp.float32
        return nn.Conv(
            features=self.features,
            kernel_size=(self.kernel,) * 3,
            padding="SAME",
            feature_group_count=self.groups,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            precision="highest" if f32 else None,
            kernel_init=nn.initializers.xavier_normal(),
            bias_init=nn.initializers.zeros,
        )(x)


class _ConvParams(nn.Module):
    """Declares conv kernel/bias params under the same path an nn.Conv
    would use, without instantiating XLA's generic conv lowering — the
    consumer computes the convolution with an MXU-friendly reformulation
    from mica_tpu.ops.conv_fast."""

    kernel_shape: tuple
    features: int

    @nn.compact
    def __call__(self):
        k = self.param("kernel", nn.initializers.xavier_normal(),
                       self.kernel_shape, jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.features,),
                       jnp.float32)
        return k, b


def _maybe_wino_in_relu(mod: nn.Module, x, features: int, train: bool,
                        name: str):
    """relu(instance_norm(conv3x3(x))) via the fused z-axis Winograd
    formulation when its gate passes (ops/winograd.py: TPU + bf16 +
    measured-win channel geometry, or MICA_WINO=1), else ``None`` — the
    caller then takes the direct path.  ``x`` may be a LIST of tensors
    standing for their channel concatenation: the Pallas kernel absorbs
    the concat (multi-operand read, never materialized in HBM — the RDB
    conv3's 33.8 ms concat tax, PERFORMANCE.md round-3); the XLA paths
    concatenate.  The InstanceNorm statistics ride the inverse-transform
    fusion, recovering the epilogue fusion the direct conv gets for
    free.  Parameters live at the identical ``<name>/Conv_0`` tree path;
    ``MICA_TRAIN_WINO=1`` opts training in.
    """
    train_pallas_env = _train_wino_pallas() if train else "0"
    if train and train_pallas_env == "0" and not _train_wino_convs():
        return None
    from ..ops.wino_pallas import (wino_conv3d_in_relu_pallas,
                                   wino_conv3d_in_relu_pallas_ad,
                                   wino_pallas_eligible)
    from ..ops.winograd import conv3d_wino_z_in_relu, wino_eligible

    parts = x if isinstance(x, (list, tuple)) else [x]
    ci = sum(p.shape[-1] for p in parts)
    kshape = (3, 3, 3, ci, features)
    # Training takes the Pallas kernel through its round-5 custom VJP
    # (gated by MICA_TRAIN_WINO_PALLAS); inference through the plain
    # fused forward.  Same eligibility either way.
    use_pallas = (not train or train_pallas_env != "0") and (
        wino_pallas_eligible([p.shape for p in parts], kshape, mod.dtype))
    if not use_pallas:
        if train and not _train_wino_convs():
            return None
        x = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=-1)
        if not wino_eligible(x.shape, kshape, mod.dtype):
            return None
    if mod.dtype is not None:
        if use_pallas:
            parts = [p.astype(mod.dtype) for p in parts]
        else:
            x = x.astype(mod.dtype)
    k, b = _NamedConvParams(kshape, features, name=name)()
    if use_pallas:
        # in-VMEM Winograd with fused IN statistics, emitter-layout
        # operands (ops/wino_pallas.py round-4): the custom-call
        # boundaries are layout bitcasts, not transpose copies
        if train:
            # positional eps/interpret: custom_vjp nondiff_argnums
            return wino_conv3d_in_relu_pallas_ad(
                tuple(parts), k, b, 1e-5,
                train_pallas_env == "interpret")
        return wino_conv3d_in_relu_pallas(
            tuple(parts), k, b,
            interpret=os.environ.get("MICA_WINO_PALLAS") == "interpret")
    return conv3d_wino_z_in_relu(x, k, b)


class SEBlock(nn.Module):
    """Squeeze-excite with dense bottleneck (reference model.py:241-258)."""

    channels: int
    reduction: int = 16
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, dropout_rate: float, train: bool):
        y = global_avg_pool(x).reshape(x.shape[0], self.channels)
        f32 = self.dtype is None or self.dtype == jnp.float32
        y = nn.Dense(self.channels // self.reduction, dtype=self.dtype,
                     param_dtype=jnp.float32,
                     precision="highest" if f32 else None,
                     kernel_init=nn.initializers.xavier_normal())(y)
        y = nn.relu(y)
        if train and dropout_rate > 0.0:
            y = nn.Dropout(rate=dropout_rate, deterministic=False)(y)
        y = nn.Dense(self.channels, dtype=self.dtype, param_dtype=jnp.float32,
                     precision="highest" if f32 else None,
                     kernel_init=nn.initializers.xavier_normal())(y)
        y = nn.sigmoid(y)
        return x * y.reshape(x.shape[0], 1, 1, 1, self.channels)


class MultiScaleInput(nn.Module):
    """Input stem: parallel k=3/5/7/9 convs + SE attention + AF3 gate.

    Reference model.py:5-74.  The AF3 branch is always computed and selected
    per-sample against the map-only branch with a ``where`` on the
    "AF3 all-zero" predicate, replacing the reference's Python branch.
    """

    base: int = 64
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, exp_map, af_features, dropout_rate: float, train: bool):
        drop = ChannelDropout()
        if train and dropout_rate > 0.0:
            exp_map = drop(exp_map, dropout_rate, train)

        from ..ops.conv_fast import multiscale_stem_conv

        class _StemConv(nn.Module):
            k: int
            features: int

            @nn.compact
            def __call__(self):
                return _ConvParams((self.k,) * 3 + (1, self.features),
                                   self.features, name="Conv_0")()

        stem_params = [
            _StemConv(k, self.base // 2, name=f"exp_conv{i}")()
            for i, k in enumerate((3, 5, 7, 9))
        ]
        # one fused patch matmul replaces the four Cin=1 convs: Pallas
        # kernel at inference, XLA formulation under training (grad path)
        # f32_out: the f32-accumulated stem conv fuses better into the
        # downstream f32 attention math at inference, but its VJP mixes
        # dtypes under grad -- the training path emits the compute dtype
        x_exp = multiscale_stem_conv(
            exp_map,
            [p[0] for p in stem_params],
            [p[1] for p in stem_params],
            allow_pallas=not train,
            f32_out=not train,
        )  # 2*base channels

        # SE-style attention over the multi-scale features
        a = global_avg_pool(x_exp)
        a = Conv(self.base, 1, dtype=self.dtype, name="exp_attn0")(a)
        a = nn.relu(a)
        a = Conv(self.base * 2, 1, dtype=self.dtype, name="exp_attn1")(a)
        a = nn.sigmoid(a)
        x_exp_enhanced = x_exp * a

        exp_only = Conv(self.base, 1, dtype=self.dtype, name="exp_downsizing")(x_exp_enhanced)

        if af_features is None:
            return exp_only

        # per-sample predicate: AF3 features effectively absent
        af_zero = (
            jnp.sum(jnp.abs(af_features.astype(jnp.float32)), axis=(1, 2, 3, 4))
            < 1e-6
        )

        if train and dropout_rate > 0.0:
            af_features = drop(af_features, dropout_rate, train)
        x_feat = Conv(self.base, 3, dtype=self.dtype, fast=not train or _train_fast_convs(),
                      name="feat_conv")(af_features)
        g = Conv(self.base // 4, 1, dtype=self.dtype, name="feat_gate0")(x_feat)
        g = nn.relu(g)
        g = Conv(1, 1, dtype=self.dtype, name="feat_gate1")(g)
        g = nn.sigmoid(g)
        x_feat_weighted = x_feat * g

        fused = Conv(self.base, 1, dtype=self.dtype, name="fusion")(
            jnp.concatenate([x_exp_enhanced, x_feat_weighted], axis=-1)
        )
        return jnp.where(af_zero.reshape(-1, 1, 1, 1, 1), exp_only, fused)


class DualAttention(nn.Module):
    """Depthwise local attention + global SE, fused 1x1 (model.py:76-101)."""

    channels: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, dropout_rate: float, train: bool):
        from ..ops.depthwise_pallas import depthwise_active

        dw_mode = os.environ.get("MICA_PALLAS_DW", "")
        use_pallas = dw_mode == "interpret" or (
            # bf16 compute only (float32 is the reference-parity mode and
            # must keep XLA's reduction order); the width must have been
            # validated on THIS platform by pick_depthwise_path — or the
            # operator forced MICA_PALLAS_DW=1 (handled inside the gate)
            self.dtype == jnp.bfloat16 and depthwise_active(self.channels)
        )
        if use_pallas:
            # VPU-native Pallas kernel: the depthwise conv is an MXU-free
            # bandwidth-class op that XLA's grouped-conv lowering runs far
            # above its roofline (ops/depthwise_pallas.py).  Enabled per
            # width after a measured, parity-gated win on the live
            # platform.  Differentiable (custom Pallas VJP, itself gated
            # on grad parity), so training takes it too; parameters live
            # at the identical tree path either way.
            from ..ops.depthwise_pallas import depthwise_conv3_pallas_ad

            k, b = _NamedConvParams((3, 3, 3, 1, self.channels),
                                    self.channels, name="local_conv")()
            local = depthwise_conv3_pallas_ad(
                x if self.dtype is None else x.astype(self.dtype), k, b,
                dw_mode == "interpret")
        else:
            # depthwise via XLA grouped conv: measured faster than explicit
            # shifted FMAs on v5e (68ms vs 81ms for the 64-ch encoder stage)
            local = Conv(self.channels, 3, groups=self.channels,
                         dtype=self.dtype, name="local_conv")(x)
        local = instance_norm(local)
        local = nn.relu(local)
        local = ChannelDropout()(local, dropout_rate, train)

        g = global_avg_pool(x)
        g = Conv(self.channels // 4, 1, dtype=self.dtype, name="global0")(g)
        g = nn.relu(g)
        g = ChannelDropout()(g, dropout_rate, train)
        g = Conv(self.channels, 1, dtype=self.dtype, name="global1")(g)
        g = nn.sigmoid(g)
        global_feat = g * x

        return Conv(self.channels, 1, dtype=self.dtype, name="fusion")(
            jnp.concatenate([local, global_feat], axis=-1)
        )


class ResidualDenseBlock(nn.Module):
    """Dense connections + SE (model.py:103-134)."""

    channels: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, dropout_rate: float, train: bool):
        c = self.channels
        drop = ChannelDropout()

        def block(inp, features, name):
            # inp may be a list (dense-connection concat): the wino
            # Pallas path absorbs it in-kernel; others concatenate
            h = _maybe_wino_in_relu(self, inp, features, train, name)
            if h is None:
                if isinstance(inp, (list, tuple)):
                    inp = jnp.concatenate(inp, axis=-1)
                h = Conv(features, 3, dtype=self.dtype,
                         fast=not train or _train_fast_convs(),
                         name=name)(inp)
                h = instance_norm(h)
                h = nn.relu(h)
            return drop(h, dropout_rate, train)

        x1 = block(x, c // 2, "conv1")
        x2 = block([x, x1], c // 2, "conv2")
        x3 = block([x, x1, x2], c, "conv3")
        return SEBlock(c, dtype=self.dtype, name="se")(x3, dropout_rate, train)


class EncoderStage(nn.Module):
    """RDB -> DualAttention -> stride-1 transition conv (model.py:136-152)."""

    in_channels: int
    out_channels: int
    dtype: Optional[Dtype] = None
    remat: bool = False

    @nn.compact
    def __call__(self, x, dropout_rate: float, train: bool):
        rdb_cls, attn_cls = ResidualDenseBlock, DualAttention
        if self.remat:
            rdb_cls = nn.remat(ResidualDenseBlock, static_argnums=(2, 3))
            attn_cls = nn.remat(DualAttention, static_argnums=(2, 3))
        x = rdb_cls(self.in_channels, dtype=self.dtype,
                    name="dense_block")(x, dropout_rate, train)
        x = attn_cls(self.in_channels, dtype=self.dtype,
                     name="dual_attn")(x, dropout_rate, train)
        h = _maybe_wino_in_relu(self, x, self.out_channels, train,
                                "transition")
        if h is None:
            h = Conv(self.out_channels, 3, dtype=self.dtype,
                     name="transition")(x)
            h = instance_norm(h)
            h = nn.relu(h)
        return ChannelDropout()(h, dropout_rate * 0.5, train)


class FPN(nn.Module):
    """Learned-softmax-weighted fusion of the three encoder outputs.

    Reference model.py:154-205.  All three feature maps share the spatial
    shape (the network never downsamples), so the reference's trilinear
    interpolation is the identity and is omitted.
    """

    base: int = 64
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, features: Sequence[jnp.ndarray], dropout_rate: float, train: bool):
        c3, c4, c5 = features
        assert c3.shape[1:4] == c4.shape[1:4] == c5.shape[1:4], (
            "FPN expects equal spatial shapes (stride-1 network)"
        )
        w = self.param("weights", nn.initializers.constant(1.0 / 3.0), (3,), jnp.float32)
        w = jax.nn.softmax(w)

        p3 = Conv(self.base, 1, dtype=self.dtype, name="lateral0")(c3)
        p4 = Conv(self.base, 1, dtype=self.dtype, name="lateral1")(c4)
        p5 = Conv(self.base, 1, dtype=self.dtype, name="lateral2")(c5)

        drop = ChannelDropout()
        smoothed = []
        for i, p in enumerate((p3, p4, p5)):
            # the learned fusion weight folds into the conv parameters:
            # w*(conv_{k,b}(p)) == conv_{w*k, w*b}(p), and channel dropout
            # commutes with the scalar — saves three full-tensor multiply
            # passes vs weighting after the conv
            k, b = _NamedConvParams((3, 3, 3, self.base, self.base),
                                    self.base, name=f"smooth{i}")()
            s = conv_same(p, k * w[i], b * w[i], dtype=self.dtype,
                          fast=not train or _train_fast_convs())
            s = drop(s, dropout_rate * 0.5, train)
            smoothed.append(s)

        # returned as PARTS of the logical channel concatenation: the
        # heads' fused conv1 can absorb the concat in-kernel (round-5,
        # ops/wino_pallas.wino_conv3d_pallas_padded); XLA consumers
        # concatenate at the use site
        return tuple(smoothed)


class _NamedConvParams(nn.Module):
    """Declares conv params under ``<name>/Conv_0/{kernel,bias}`` — the
    exact path an ``nn.Conv`` inside a ``Conv`` wrapper named ``name``
    would use — so fused consumers stay checkpoint-compatible."""

    kernel_shape: tuple
    features: int

    @nn.compact
    def __call__(self):
        return _ConvParams(self.kernel_shape, self.features, name="Conv_0")()


class TaskHeadParams(nn.Module):
    """Parameter container for a task head (reference model.py:207-239).

    Declares the same parameter tree as a standalone head module
    (conv1/conv2/cal0/cal1/final) without computing — the forward pass is
    assembled at the MICA level so the three heads' conv1 over the shared
    FPN tensor fuses into ONE 192-out convolution: the conv data staging
    (27*Cin*voxels) dominates these small-Cout convs, and fusing shares
    one staging pass across the heads (measured 71 -> 49 ms at batch 8)."""

    in_channels: int
    num_classes: int

    @nn.compact
    def __call__(self):
        return {
            "conv1": _NamedConvParams((3, 3, 3, self.in_channels, 64), 64,
                                      name="conv1")(),
            "conv2": _NamedConvParams((3, 3, 3, 64, 32), 32, name="conv2")(),
            "cal0": _NamedConvParams((1, 1, 1, 32, 8), 8, name="cal0")(),
            "cal1": _NamedConvParams((1, 1, 1, 8, 32), 32, name="cal1")(),
            "final": _NamedConvParams((1, 1, 1, 32, self.num_classes),
                                      self.num_classes, name="final")(),
        }


def conv_same(x, kernel, bias=None, dtype=None, fast=False):
    """Stride-1 SAME conv mirroring flax ``nn.Conv`` lowering exactly
    (same dtype promotion, no explicit accumulation-type annotation in
    low-precision mode, ``precision='highest'`` for the float32 parity
    path) so XLA produces the same conv+epilogue fusions it would for the
    module version.

    ``fast``: allow the lane-packed reformulation for small-Cout k=3 convs
    on TPU (ops.conv_fast.packed_conv3 — exact up to float reassociation;
    inference path only, the direct conv differentiates better)."""
    if fast:
        from ..ops.conv_fast import maybe_packed_conv

        out = maybe_packed_conv(x, kernel.astype(x.dtype), bias, dtype=dtype)
        if out is not None:
            return out
    f32 = dtype is None or dtype == jnp.float32
    out = jax.lax.conv_general_dilated(
        x, kernel.astype(x.dtype), (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        precision="highest" if f32 else None,
    )
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


class TaskHeadRest(nn.Module):
    """Everything after conv1 in a task head: IN -> relu -> conv2 -> IN ->
    relu -> dropout -> calibration SE -> final 1x1 (float32 logits)."""

    num_classes: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, h1, p, dropout_rate: float, train: bool,
                 out_slice=None):
        dt = self.dtype
        x = nn.relu(instance_norm(h1))
        x = conv_same(x, p["conv2"][0], p["conv2"][1], dtype=dt,
                      fast=not train or _train_fast_convs())
        x = nn.relu(instance_norm(x))

        x = ChannelDropout()(x, dropout_rate, train)

        cal = global_avg_pool(x)
        cal = conv_same(cal, p["cal0"][0], p["cal0"][1], dtype=dt)
        cal = nn.relu(cal)
        cal = ChannelDropout()(cal, dropout_rate, train)
        cal = conv_same(cal, p["cal1"][0], p["cal1"][1], dtype=dt)
        cal = nn.sigmoid(cal)
        x = x * cal

        # inference-only spatial slice (e.g. the sliding-window core):
        # the final conv is 1x1, so slicing before it is exact, and the
        # big num_classes=21 f32 logit tensor shrinks 64^3 -> 48^3
        if out_slice is not None:
            x = x[:, out_slice, out_slice, out_slice, :]

        # logits in float32 for a numerically stable softmax downstream
        return conv_same(
            x.astype(jnp.float32), p["final"][0], p["final"][1],
            dtype=jnp.float32,
        )


class FusedHeads(nn.Module):
    """The three cascaded task heads computed over a shared fused conv1.

    The heads share the FPN tensor as their dominant conv1 input; conv is
    linear in its input channels, so conv1_ca([fpn, bb]) =
    conv1_ca_fpn(fpn) + conv1_ca_bb(bb).  One fused 192-out conv shares
    the conv data staging the three 64-out convs would each pay; the
    cascaded 4/8-channel logit corrections are near-free convs summed
    into the sliced outputs.  Declares no parameters (they are passed in
    from the TaskHeadParams containers) so it can sit under ``nn.remat``
    as one unit — the training backward then saves only the FPN tensor,
    not the 192-channel fused conv output and head intermediates.
    """

    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, fpn, p_bb, p_ca, p_aa, dropout_rate: float,
                 train: bool, out_slice=None):
        parts = list(fpn) if isinstance(fpn, (list, tuple)) else [fpn]
        fpn_ch = sum(p.shape[-1] for p in parts)
        rest_bb = TaskHeadRest(4, dtype=self.dtype, name="backbone_rest")
        rest_ca = TaskHeadRest(4, dtype=self.dtype, name="ca_rest")
        rest_aa = TaskHeadRest(21, dtype=self.dtype, name="aa_rest")

        k_big = jnp.concatenate(
            [p_bb["conv1"][0],
             p_ca["conv1"][0][:, :, :, :fpn_ch],
             p_aa["conv1"][0][:, :, :, :fpn_ch]],
            axis=-1,
        )
        from ..ops.wino_pallas import (wino_conv3d_pallas_padded,
                                       wino_heads_eligible)

        kshape = (3, 3, 3, fpn_ch, k_big.shape[-1])
        if (not train and wino_heads_eligible(
                [p.shape for p in parts], kshape, self.dtype)):
            # padded-Co emitter-layout kernel: the FPN concat is absorbed
            # as multi-operand reads, the 192-out conv runs as 256-out
            # wino (the pad channels are sliced away for free below)
            big = wino_conv3d_pallas_padded(
                tuple(p.astype(self.dtype) for p in parts), k_big,
                interpret=os.environ.get("MICA_WINO_HEADS") == "interpret")
            fpn = parts[0]  # dtype/shape carrier for the cascade convs
        else:
            fpn = (parts[0] if len(parts) == 1
                   else jnp.concatenate(parts, axis=-1))
            big = conv_same(fpn, k_big, dtype=self.dtype)

        h_bb = big[..., :64] + p_bb["conv1"][1].astype(big.dtype)
        backbone = rest_bb(h_bb, p_bb, dropout_rate, train)

        bb_f = backbone.astype(fpn.dtype)
        h_ca = (
            big[..., 64:128]
            + conv_same(bb_f, p_ca["conv1"][0][:, :, :, fpn_ch:],
                        dtype=self.dtype, fast=not train or _train_fast_convs())
            + p_ca["conv1"][1].astype(big.dtype)
        )
        ca = rest_ca(h_ca, p_ca, dropout_rate, train)

        h_aa = (
            big[..., 128:192]
            + conv_same(
                jnp.concatenate([bb_f, ca.astype(fpn.dtype)], axis=-1),
                p_aa["conv1"][0][:, :, :, fpn_ch:], dtype=self.dtype,
                fast=not train or _train_fast_convs(),
            )
            + p_aa["conv1"][1].astype(big.dtype)
        )
        # only the LAST head in the cascade may slice to the window core:
        # bb/ca logits feed the later heads' 3^3 correction convs, which
        # need the full window
        aa = rest_aa(h_aa, p_aa, dropout_rate, train, out_slice)
        return backbone, ca, aa


class MICA(nn.Module):
    """Full multi-task network.

    Call: ``(exp_map, af_features) -> (backbone, ca, aa)`` logits, each
    (N, D, H, W, n_cls) with n_cls 4/4/21.  ``exp_map`` is (N, D, H, W, 1);
    ``af_features`` is (N, D, H, W, 24) or None.
    """

    base: int = 64
    dtype: Optional[Dtype] = None
    remat: bool = False  # rematerialize encoder stages (training memory)
    # remat granularity: "both" nests stage-level AND block-level remat
    # (lowest memory: the backward recomputes each stage forward twice);
    # "stages" / "blocks" keep a single remat layer — ~1 forward less
    # recompute per step when the working set fits HBM.
    remat_scope: str = "both"

    @nn.compact
    def __call__(self, exp_map, af_features=None, *, dropout_rate: float = 0.0,
                 train: bool = False, out_slice=None):
        dt = self.dtype or jnp.float32
        exp_map = exp_map.astype(dt)
        if af_features is not None:
            af_features = af_features.astype(dt)

        x = MultiScaleInput(self.base, dtype=self.dtype, name="input_processing")(
            exp_map, af_features, dropout_rate, train
        )

        remat_stages = self.remat and self.remat_scope in ("both", "stages")
        remat_blocks = self.remat and self.remat_scope in ("both", "blocks")
        stage_cls = (
            nn.remat(EncoderStage, static_argnums=(2, 3)) if remat_stages
            else EncoderStage
        )
        features = []
        ch = self.base
        for i in range(3):
            x = stage_cls(ch, ch * 2, dtype=self.dtype, remat=remat_blocks,
                          name=f"encoder{i}")(
                x, dropout_rate, train
            )
            ch *= 2
            features.append(x)

        fpn = FPN(self.base, dtype=self.dtype, name="fpn")(features, dropout_rate, train)

        head_rate = dropout_rate * 2
        fpn_ch = sum(p.shape[-1] for p in fpn)
        p_bb = TaskHeadParams(fpn_ch, 4, name="backbone_head")()
        p_ca = TaskHeadParams(fpn_ch + 4, 4, name="ca_head")()
        p_aa = TaskHeadParams(fpn_ch + 8, 21, name="aa_head")()

        heads_cls = (
            nn.remat(FusedHeads, static_argnums=(5, 6, 7)) if self.remat
            else FusedHeads
        )
        return heads_cls(dtype=self.dtype, name="heads")(
            fpn, p_bb, p_ca, p_aa, head_rate, train, out_slice
        )


def dropout_rate_for_epoch(epoch: int, schedule=(0.01, 0.05, 0.1)) -> float:
    """Reference's epoch-gated dropout schedule (model.py:295-302, 362-368)."""
    if epoch < 35:
        return schedule[0]
    if epoch < 50:
        return schedule[1]
    return schedule[2]
