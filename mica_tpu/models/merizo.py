"""TPU-native Merizo: the learned domain-segmentation network.

Architecture-faithful flax re-implementation of the reference's vendored
Merizo (modules/merizo/model/): an AF2-style invariant-point-attention
encoder (6 weight-SHARED iterations of one IPA module + a bidirectional-GRU
transition, ipa_encoder.py:54-60) followed by a mask-transformer decoder
(10 post-LN blocks with symmetric ALiBi bias, learned class embeddings,
cosine patch-class masks, a GRU background head and a GRU confidence head,
mask_decoder.py:91-215).

Weight interop: :func:`read_split_weight_files` merges the reference's
split ``weights_part_*.pt`` shards (predict.py:123-146 semantics) and
:func:`torch_state_dict_to_params` maps the torch state dict onto this
module's parameter tree — GRUs consume the torch weight layout directly
(gate order r/z/n), so converted weights are bit-compatible.

Reference quirks reproduced on purpose (they are what trained weights would
expect):
  * rotary embeddings are applied over axis -2 of the (N, H, C) q/k
    tensors — i.e. over the HEADS axis, making them a fixed per-head
    rotation (nndef_ipa.py:185-186 with rotary_embedding_torch's default
    ``seq_dim=-2``); interleaved (GPT-J) pairing, theta=10000;
  * the q/k/v point projections use the reference's "clunky" xyz-by-thirds
    layout (nndef_ipa.py:154-157);
  * the decoder's domain-id cleanup (clean_domains/clean_singletons,
    bg-mask product) runs INSIDE the forward in the reference
    (mask_decoder.py:190-198); here the jitted network returns the mask
    logits and the host applies the identical cleanup
    (:func:`postprocess_masks`).
"""

from __future__ import annotations

import functools
import math
from pathlib import Path
from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

N_CLASSES = 20
C_S = 512
C_Z = 32
NO_HEADS = 16
NO_QK_POINTS = 4
NO_V_POINTS = 8
NO_BLOCKS = 6
DECODER_LAYERS = 10
INF = 1e5
EPS = 1e-8

MIN_DOMAIN_SIZE = 50    # predict.py:34
MIN_FRAGMENT_SIZE = 10  # predict.py:35
DOM_AVE = 200           # predict.py:36
CONF_THRESHOLD = 0.75   # predict.py:37


# ===========================================================================
# building blocks
# ===========================================================================

def rotary_rotate_heads(t: jnp.ndarray, rot_dim: int,
                        theta: float = 10000.0) -> jnp.ndarray:
    """lucidrains rotary_embedding_torch semantics with seq_dim=-2.

    ``t`` is (N, H, C); positions run over the H axis (the reference quirk).
    Interleaved (GPT-J) pairing; only the first ``rot_dim`` channels rotate.
    """
    n, h, c = t.shape
    inv_freq = 1.0 / (theta ** (np.arange(0, rot_dim, 2) / rot_dim))
    pos = np.arange(h)
    freqs = np.einsum("i,j->ij", pos, inv_freq)          # (H, rot_dim/2)
    freqs = np.repeat(freqs, 2, axis=-1)                 # interleaved x2
    cos = jnp.asarray(np.cos(freqs), t.dtype)[None, :, :]
    sin = jnp.asarray(np.sin(freqs), t.dtype)[None, :, :]

    t_rot, t_pass = t[..., :rot_dim], t[..., rot_dim:]
    x = t_rot.reshape(n, h, rot_dim // 2, 2)
    rot_half = jnp.stack([-x[..., 1], x[..., 0]], axis=-1).reshape(
        n, h, rot_dim
    )
    t_rot = t_rot * cos + rot_half * sin
    return jnp.concatenate([t_rot, t_pass], axis=-1)


class TorchGRU(nn.Module):
    """Multi-layer bidirectional GRU consuming torch nn.GRU weight layout.

    Gate order r/z/n; update rule matches torch exactly:
      r = sigmoid(W_ir x + b_ir + W_hr h + b_hr)
      z = sigmoid(W_iz x + b_iz + W_hz h + b_hz)
      n = tanh(W_in x + b_in + r * (W_hn h + b_hn))
      h' = (1 - z) n + z h

    Parameters are declared per (layer, direction) with torch shapes:
    weight_ih (3H, In), weight_hh (3H, H), bias_ih (3H,), bias_hh (3H,).
    Returns (output (N, 2H), h_n (2 * layers, H)).
    """

    input_size: int
    hidden_size: int
    num_layers: int = 2

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        hs = self.hidden_size
        h_ns = []
        for layer in range(self.num_layers):
            in_size = self.input_size if layer == 0 else 2 * hs
            outs = []
            for direction, suffix in enumerate(("", "_reverse")):
                w_ih = self.param(f"weight_ih_l{layer}{suffix}",
                                  nn.initializers.normal(0.02),
                                  (3 * hs, in_size), jnp.float32)
                w_hh = self.param(f"weight_hh_l{layer}{suffix}",
                                  nn.initializers.normal(0.02),
                                  (3 * hs, hs), jnp.float32)
                b_ih = self.param(f"bias_ih_l{layer}{suffix}",
                                  nn.initializers.zeros, (3 * hs,),
                                  jnp.float32)
                b_hh = self.param(f"bias_hh_l{layer}{suffix}",
                                  nn.initializers.zeros, (3 * hs,),
                                  jnp.float32)
                seq = x if direction == 0 else x[::-1]
                gi = seq @ w_ih.T + b_ih  # (N, 3H)

                def step(h, gi_t, w_hh=w_hh, b_hh=b_hh):
                    gh = h @ w_hh.T + b_hh
                    i_r, i_z, i_n = jnp.split(gi_t, 3, axis=-1)
                    h_r, h_z, h_n_ = jnp.split(gh, 3, axis=-1)
                    r = jax.nn.sigmoid(i_r + h_r)
                    z = jax.nn.sigmoid(i_z + h_z)
                    new = jnp.tanh(i_n + r * h_n_)
                    h2 = (1.0 - z) * new + z * h
                    return h2, h2

                h0 = jnp.zeros((hs,), x.dtype)
                h_last, out = jax.lax.scan(step, h0, gi)
                if direction == 1:
                    out = out[::-1]
                outs.append(out)
                h_ns.append(h_last)
            x = jnp.concatenate(outs, axis=-1)
        return x, jnp.stack(h_ns)


class IPA(nn.Module):
    """InvariantPointAttention (nndef_ipa.py:37-278), batch-free (N, ...)."""

    @nn.compact
    def __call__(self, s, z, rot, trans, mask):
        n = s.shape[0]
        h, c_h = NO_HEADS, C_S  # per-head hidden = c_hidden = 512
        pq, pv = NO_QK_POINTS, NO_V_POINTS

        dense = lambda feats, name: nn.Dense(  # noqa: E731
            feats, name=name, param_dtype=jnp.float32)

        q = dense(h * c_h, "linear_q")(s).reshape(n, h, c_h)
        kv = dense(2 * h * c_h, "linear_kv")(s).reshape(n, h, 2 * c_h)
        k, v = kv[..., :c_h], kv[..., c_h:]

        def points(lin_out, count):
            # reference layout: thirds are x / y / z (nndef_ipa.py:154-157)
            p = jnp.stack(jnp.split(lin_out, 3, axis=-1), axis=-1)  # (n,hp,3)
            p = jnp.einsum("nij,npj->npi", rot, p) + trans[:, None, :]
            return p.reshape(n, h, count, 3)

        q_pts = points(dense(h * pq * 3, "linear_q_points")(s), pq)
        kv_pts = points(dense(h * (pq + pv) * 3, "linear_kv_points")(s),
                        pq + pv)
        k_pts, v_pts = kv_pts[:, :, :pq], kv_pts[:, :, pq:]

        # rotary over the heads axis (reference quirk; see module docstring)
        q = rotary_rotate_heads(q, c_h // 2)
        k = rotary_rotate_heads(k, c_h // 2)

        a = jnp.einsum("nhc,mhc->hnm", q, k) * math.sqrt(1.0 / (3 * c_h))
        b = dense(h, "linear_b")(z)  # (n, m, h)
        a = a + math.sqrt(1.0 / 3) * jnp.transpose(b, (2, 0, 1))

        head_weights = self.param("head_weights",
                                  nn.initializers.zeros, (h,), jnp.float32)
        hw = jax.nn.softplus(head_weights) * math.sqrt(
            1.0 / (3 * (pq * 9.0 / 2))
        )
        d2 = jnp.sum(
            (q_pts[:, None] - k_pts[None, :]) ** 2, axis=-1
        )  # (n, m, h, pq)
        pt_att = jnp.sum(d2 * hw[None, None, :, None], axis=-1) * (-0.5)
        a = a + jnp.transpose(pt_att, (2, 0, 1))

        square_mask = INF * (mask[:, None] * mask[None, :] - 1.0)
        a = jax.nn.softmax(a + square_mask[None], axis=-1)  # (h, n, m)

        o = jnp.einsum("hnm,mhc->nhc", a, v).reshape(n, h * c_h)
        s_out = dense(C_S, "hidden_out")(o)

        o_pair = jnp.einsum("hnm,nmz->nhz", a, z).reshape(n, h * C_Z)
        s_out = s_out + dense(C_S, "pair_out")(o_pair)

        o_pt = jnp.einsum("hnm,mhpj->nhpj", a, v_pts)
        o_pt = jnp.einsum(
            "nji,nhpj->nhpi", rot, o_pt - trans[:, None, None, :]
        )  # invert_apply: R^T (p - t)
        o_pt_norm = jnp.sqrt(jnp.sum(o_pt ** 2, axis=-1) + EPS).reshape(
            n, h * pv
        )
        # reference cat([*unbind(o_pt, -1)], -1): all x, then y, then z
        o_pt_flat = o_pt.reshape(n, h * pv, 3)
        o_pt_cat = jnp.concatenate(
            [o_pt_flat[..., 0], o_pt_flat[..., 1], o_pt_flat[..., 2]],
            axis=-1,
        )
        s_out = s_out + dense(C_S, "points_out")(o_pt_cat)
        s_out = s_out + dense(C_S, "points_norm_out")(o_pt_norm)
        return s_out


class IPABlock(nn.Module):
    """ipa_block (ipa_encoder.py): 6 weight-shared IPA+GRU iterations."""

    @nn.compact
    def __call__(self, s, z, rot, trans, mask):
        s = nn.LayerNorm(epsilon=1e-5, name="layer_norm_s")(s)
        s = nn.Dense(C_S, name="linear_in", param_dtype=jnp.float32)(s)
        z = nn.LayerNorm(epsilon=1e-5, name="layer_norm_z")(z)

        ipa = IPA(name="ipa")
        ln_ipa = nn.LayerNorm(epsilon=1e-5, name="layer_norm_ipa")
        gru = TorchGRU(C_S, C_S // 2, num_layers=2, name="transition_gru")
        ln_tr = nn.LayerNorm(epsilon=1e-5, name="transition_ln")

        for _ in range(NO_BLOCKS):  # same weights every iteration
            s = s + ipa(s, z, rot, trans, mask)
            s = ln_ipa(s)
            s = ln_tr(gru(s)[0])
        return s


class DecoderBlock(nn.Module):
    """Mask-transformer block (mask_decoder.py:74-90): pre-LN MHA + FF."""

    heads: int = NO_HEADS
    d_model: int = C_S
    d_ff: int = C_S

    @nn.compact
    def __call__(self, x, bias):
        n = x.shape[0]
        h = self.heads
        hd = self.d_model // h
        y = nn.LayerNorm(epsilon=1e-5, name="norm1")(x)
        qkv = nn.Dense(3 * self.d_model, name="qkv",
                       param_dtype=jnp.float32)(y)
        qkv = qkv.reshape(n, 3, h, hd)
        q, k, v = qkv[:, 0], qkv[:, 1], qkv[:, 2]  # (n, h, hd)
        # NOTE: the reference applies NO 1/sqrt(d) scaling (mask_decoder.py:57)
        qk = jnp.einsum("nhd,mhd->hnm", q, k)
        if bias is not None:
            qk = qk + bias
        attn = jax.nn.softmax(qk, axis=-1)
        o = jnp.einsum("hnm,mhd->nhd", attn, v).reshape(n, self.d_model)
        x = x + nn.Dense(self.d_model, name="proj", param_dtype=jnp.float32)(o)

        y = nn.LayerNorm(epsilon=1e-5, name="norm2")(x)
        y = nn.Dense(self.d_ff, name="fc1", param_dtype=jnp.float32)(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.d_model, name="fc2", param_dtype=jnp.float32)(y)
        return x + y


def alibi_slopes(heads: int) -> np.ndarray:
    """Symmetric ALiBi slopes (posenc/alibi.py:18-28)."""

    def pow2(n):
        start = 2 ** (-(2 ** -(math.log2(n) - 3)))
        return [start * start ** i for i in range(n)]

    if math.log2(heads).is_integer():
        return np.asarray(pow2(heads))
    closest = 2 ** math.floor(math.log2(heads))
    return np.asarray(
        pow2(closest) + pow2(2 * closest)[0::2][: heads - closest]
    )


def alibi_bias(res_index: jnp.ndarray, heads: int = NO_HEADS,
               clip: int = 32, slope_factor: float = 1.0) -> jnp.ndarray:
    """(h, n, n) symmetric ALiBi bias (posenc/alibi.py:31-40)."""
    rel = jnp.abs(res_index[None, :] - res_index[:, None])
    rel = jnp.minimum(rel, clip)
    slopes = jnp.asarray(alibi_slopes(heads), rel.dtype)
    return -(rel[None, :, :] * slopes[:, None, None] * slope_factor)


class MaskDecoder(nn.Module):
    """MaskTransformer (mask_decoder.py:91-215) minus the host cleanup.

    Returns (domain_mask_logits (n, 20), bg_logits (n, 2), features (n, d));
    the data-dependent id cleanup and per-domain GRU confidence run on host
    (postprocess_masks / domain_confidences).
    """

    @nn.compact
    def __call__(self, s, bias):
        n = s.shape[0]
        cls_emb = self.param("cls_emb", nn.initializers.normal(1.0),
                             (N_CLASSES, C_S), jnp.float32)
        x = jnp.concatenate([s, cls_emb.astype(s.dtype)], axis=0)
        bias = jnp.pad(bias, ((0, 0), (0, N_CLASSES), (0, N_CLASSES)))

        for i in range(DECODER_LAYERS):
            x = DecoderBlock(name=f"block{i}")(x, bias)
        x = nn.LayerNorm(epsilon=1e-5, name="decoder_norm")(x)

        proj_patch = self.param("proj_patch", nn.initializers.normal(1.0),
                                (C_S, C_S), jnp.float32)
        proj_classes = self.param("proj_classes", nn.initializers.normal(1.0),
                                  (C_S, C_S), jnp.float32)
        features = x[:n] @ proj_patch
        classes = x[n:] @ proj_classes
        features = features / jnp.linalg.norm(features, axis=-1,
                                              keepdims=True)
        classes = classes / jnp.linalg.norm(classes, axis=-1, keepdims=True)
        masks = nn.LayerNorm(epsilon=1e-5, name="class_norm")(
            features @ classes.T
        )
        bg_out, _ = TorchGRU(C_S, C_S // 2, num_layers=2, name="bg_gru")(
            features
        )
        bg = nn.Dense(2, name="bg_out", param_dtype=jnp.float32)(bg_out)
        return masks, bg, features


class ConfidenceHead(nn.Module):
    """Per-domain confidence GRU (mask_decoder.py:135-142, 203-213).

    The torch conf_gru is ``batch_first=True``, so
    ``domain_masks[:, dom_ids == d]`` (1, n_d, K) runs the GRU ALONG the
    domain's residues; ``conf_out(h_n[-1:]).flatten().clamp(0, 1)`` is
    ONE value per domain (last layer's reverse-direction final hidden),
    broadcast to the domain's residues by the caller.  Returns a scalar.
    """

    @nn.compact
    def __call__(self, dom_masks):
        _, h_n = TorchGRU(N_CLASSES, C_S, num_layers=2, name="conf_gru")(
            dom_masks
        )
        conf = nn.Dense(1, name="conf_out", param_dtype=jnp.float32)(
            h_n[-1]
        )
        return jnp.clip(conf[0], 0.0, 1.0)


class Merizo(nn.Module):
    """Full network (network.py:10-54): embeddings -> IPA -> decoder."""

    @nn.compact
    def __call__(self, s_onehot, z_dist, rot, trans, res_index,
                 mask: Optional[jnp.ndarray] = None):
        n = s_onehot.shape[0]
        if mask is None:
            mask = jnp.ones((n,), s_onehot.dtype)
        s = nn.Dense(C_S, use_bias=False, name="linear_s_in",
                     param_dtype=jnp.float32)(s_onehot)
        z = nn.Dense(C_Z, use_bias=False, name="linear_z_in",
                     param_dtype=jnp.float32)(z_dist[..., None])
        s = IPABlock(name="ipa")(s, z, rot, trans, mask)
        bias = alibi_bias(res_index)
        return MaskDecoder(name="decoder_head")(s, bias)


# ===========================================================================
# host-side postprocessing (reference semantics)
# ===========================================================================

def clean_domains(dom_ids: np.ndarray, min_num: int) -> np.ndarray:
    """utils.py:168-181: too-small domains absorb the previous residue's id."""
    dom_ids = dom_ids.copy()
    nz = dom_ids[dom_ids != 0]
    vals, counts = np.unique(nz, return_counts=True)
    remove = set(vals[counts < min_num].tolist())
    for i in range(len(dom_ids)):
        if dom_ids[i] in remove and i > 0:
            dom_ids[i] = dom_ids[i - 1]
    return dom_ids


def _segment_lengths(dom_ids: np.ndarray) -> np.ndarray:
    """Reference-exact transcription of get_segment_length
    (utils.py:205-227), INCLUDING its off-by-one: the counter resets to 0
    (not 1) at each segment boundary, so every segment after the first
    reports length-1 — which is what clean_singletons' thresholds
    actually compare against in the reference (its docstring example does
    not match its code).  A trailing single-element segment keeps the
    initial count of 1."""
    n = len(dom_ids)
    counts = np.ones(n, np.int64)
    counter, _idx, idx = 1, 0, 0
    for i in range(n):
        if i == 0:
            counter, _idx, idx = 1, 0, 0
        elif dom_ids[i] == dom_ids[i - 1]:
            counter += 1
            idx = i
        else:
            counts[_idx : idx + 1] = counter
            counter = 0
            _idx = i
        if i == n - 1:
            counts[_idx : idx + 1] = counter
    return counts


def clean_singletons(dom_ids: np.ndarray, threshold: int) -> np.ndarray:
    """Reference-exact port of utils.py:230-273 (verified against it):

    * terminal stretches up to AND INCLUDING the first long-or-background
      residue assimilate into the id of the residue after it
      (assimilate_short_terminal, utils.py:184-202);
    * short INTERNAL stretches — background included (the reference's
      ``* (dom_ids == 0)`` is commented out) — divide between the
      preceding and following segment at their median position;
    * segment lengths are computed ONCE up front and reused by all three
      stages (reference quirk: the internal stage sees pre-assimilation
      lengths).
    """
    dom_ids = np.asarray(dom_ids).copy()
    n = len(dom_ids)
    seg_len = _segment_lengths(dom_ids)

    def assimilate(ids, sl, c_term):
        if c_term:
            ids, sl = ids[::-1].copy(), sl[::-1]
        brk = None
        for i in range(len(ids)):
            if sl[i] >= threshold or ids[i] == 0:
                brk = i
                break
        if brk is not None and brk + 1 < len(ids):
            ids[: brk + 1] = ids[brk + 1]
        return ids[::-1].copy() if c_term else ids

    dom_ids = assimilate(dom_ids, seg_len, c_term=False)
    dom_ids = assimilate(dom_ids, seg_len, c_term=True)

    short = seg_len < threshold
    non_short = np.where(~short)[0]
    if len(non_short):
        short[: non_short[0]] = False
        short[non_short[-1]:] = False
        i = 0
        while i < n:
            if not short[i]:
                i += 1
                continue
            j = i
            while j < n and short[j]:
                j += 1
            mid = (i + j - 1) // 2  # torch.median = lower median index
            dom_ids[i : mid + 1] = dom_ids[i - 1]
            dom_ids[mid:j] = dom_ids[j]
            i = j
    return dom_ids


def separate_components(dom_ids: np.ndarray, ca_coords: np.ndarray,
                        cutoff: float = 8.0) -> np.ndarray:
    """utils.py:276+: split spatially disconnected components of a domain
    (connected components of the 8 A contact graph within each domain)."""
    out = dom_ids.copy()
    next_id = int(out.max()) + 1 if len(out) else 1
    for d in np.unique(out):
        if d == 0:
            continue
        idx = np.where(out == d)[0]
        if len(idx) < 2:
            continue
        sub = ca_coords[idx]
        adj = (np.linalg.norm(sub[:, None] - sub[None], axis=-1) < cutoff)
        n_sub = len(idx)
        comp = -np.ones(n_sub, np.int64)
        cur = 0
        for seed in range(n_sub):
            if comp[seed] >= 0:
                continue
            stack = [seed]
            comp[seed] = cur
            while stack:
                u = stack.pop()
                for vtx in np.where(adj[u] & (comp < 0))[0]:
                    comp[vtx] = cur
                    stack.append(vtx)
            cur += 1
        for c in range(1, cur):
            out[idx[comp == c]] = next_id
            next_id += 1
    return out


def remap_ids(dom_ids: np.ndarray) -> np.ndarray:
    """utils.py:66-86: renumber non-zero ids from 1 in order of occurrence."""
    mapping: Dict[int, int] = {}
    out = np.zeros_like(dom_ids)
    for i, v in enumerate(dom_ids):
        if v == 0:
            continue
        if v not in mapping:
            mapping[v] = len(mapping) + 1
        out[i] = mapping[v]
    return out


def postprocess_masks(mask_logits: np.ndarray, bg_logits: np.ndarray
                      ) -> np.ndarray:
    """The in-forward id derivation (mask_decoder.py:185-198)."""
    pred = np.argmax(mask_logits, axis=-1)
    pred = clean_domains(pred, MIN_DOMAIN_SIZE)
    pred = clean_singletons(pred, MIN_FRAGMENT_SIZE)
    return pred * np.argmax(bg_logits, axis=-1)


# ===========================================================================
# features (model/utils/features.py:32-71 equivalents)
# ===========================================================================

def gram_schmidt_frames(n_xyz: np.ndarray, ca_xyz: np.ndarray,
                        c_xyz: np.ndarray, eps: float = 1e-8):
    """rigidFrom3Points (frames.py:44-84): R columns (e1, e2, e3), t = CA."""
    v1 = ca_xyz - n_xyz
    v2 = c_xyz - ca_xyz
    e1 = v1 / np.sqrt((v1 ** 2).sum(-1, keepdims=True) + eps)
    u2 = v2 - e1 * (e1 * v2).sum(-1, keepdims=True)
    e2 = u2 / np.sqrt((u2 ** 2).sum(-1, keepdims=True) + eps)
    e3 = np.cross(e1, e2)
    rot = np.stack([e1, e2, e3], axis=-1)  # columns
    return rot, ca_xyz


def chain_features(atoms: np.ndarray):
    """Structured atom array (one chain) -> merizo input features."""
    from ..io import pdb as pdb_io

    ca = pdb_io.select(atoms, name="CA", standard_aa=True)
    order = np.argsort(ca["res_id"], kind="stable")
    ca = ca[order]
    res_ids = ca["res_id"].astype(np.float32)
    n_at = pdb_io.select(atoms, name="N", standard_aa=True)
    c_at = pdb_io.select(atoms, name="C", standard_aa=True)
    o_at = pdb_io.select(atoms, name="O", standard_aa=True)
    n_by = {int(r): i for i, r in enumerate(n_at["res_id"])}
    c_by = {int(r): i for i, r in enumerate(c_at["res_id"])}
    # the reference's check_bb (pdb_parser.py:210-240) drops residues
    # missing ANY of N/CA/C/O — O is required even though the features
    # never read it; keeping such residues would shift every downstream
    # index vs the reference
    o_ids = {int(r) for r in o_at["res_id"]}
    keep = [i for i, r in enumerate(ca["res_id"])
            if int(r) in n_by and int(r) in c_by and int(r) in o_ids]
    ca = ca[keep]
    res_ids = res_ids[keep]

    ca_xyz = pdb_io.coords(ca).astype(np.float64)
    n_xyz = np.stack([pdb_io.coords(n_at)[n_by[int(r)]] for r in ca["res_id"]])
    c_xyz = np.stack([pdb_io.coords(c_at)[c_by[int(r)]] for r in ca["res_id"]])

    onehot = np.zeros((len(ca), 20), np.float32)
    for i, rn in enumerate(ca["res_name"]):
        ix = pdb_io.AA_INDEX.get(str(rn), -1)
        if ix >= 0:
            onehot[i, ix] = 1.0
    dist = np.linalg.norm(
        ca_xyz[:, None] - ca_xyz[None], axis=-1
    ).astype(np.float32)
    rot, trans = gram_schmidt_frames(n_xyz, ca_xyz, c_xyz)
    return {
        "s": onehot,
        "z": dist,
        "rot": rot.astype(np.float32),
        "trans": trans.astype(np.float32),
        "ri": res_ids,
        "ca_xyz": ca_xyz,
        "ca_atoms": ca,
    }


# ===========================================================================
# weights: split-shard loader + torch state-dict conversion
# ===========================================================================

def read_split_weight_files(directory: str) -> Dict[str, np.ndarray]:
    """Merge ``*.pt`` weight shards (predict.py:123-146 semantics)."""
    import torch

    weights: Dict[str, np.ndarray] = {}
    for f in sorted(Path(directory).glob("*.pt")):
        shard = torch.load(f, map_location="cpu")
        weights.update({k: v.detach().numpy() for k, v in shard.items()})
    return weights


def _set(tree: dict, path: str, value: np.ndarray):
    parts = path.split("/")
    node = tree
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = jnp.asarray(value)


def torch_state_dict_to_params(sd: Dict[str, np.ndarray]) -> dict:
    """Map the reference torch Merizo state dict onto this module's tree."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    params: dict = {}

    def dense(tp, fp, bias=True):
        _set(params, fp + "/kernel", sd[tp + ".weight"].T)
        if bias:
            _set(params, fp + "/bias", sd[tp + ".bias"])

    def ln(tp, fp):
        _set(params, fp + "/scale", sd[tp + ".weight"])
        _set(params, fp + "/bias", sd[tp + ".bias"])

    def gru(tp, fp, layers=2):
        for layer in range(layers):
            for suffix in ("", "_reverse"):
                for w in ("weight_ih", "weight_hh", "bias_ih", "bias_hh"):
                    _set(params, f"{fp}/{w}_l{layer}{suffix}",
                         sd[f"{tp}.{w}_l{layer}{suffix}"])

    dense("linear_s_in", "linear_s_in", bias=False)
    dense("linear_z_in", "linear_z_in", bias=False)

    ln("ipa.layer_norm_s", "ipa/layer_norm_s")
    ln("ipa.layer_norm_z", "ipa/layer_norm_z")
    ln("ipa.layer_norm_ipa", "ipa/layer_norm_ipa")
    dense("ipa.linear_in", "ipa/linear_in")
    for name in ("linear_q", "linear_kv", "linear_q_points",
                 "linear_kv_points", "linear_b", "pair_out", "hidden_out",
                 "points_out", "points_norm_out"):
        dense(f"ipa.ipa.{name}", f"ipa/ipa/{name}")
    _set(params, "ipa/ipa/head_weights", sd["ipa.ipa.head_weights"])
    gru("ipa.transition.layers.0", "ipa/transition_gru")
    ln("ipa.transition.layer_norm", "ipa/transition_ln")

    for i in range(DECODER_LAYERS):
        tp = f"decoder_head.blocks.{i}"
        fp = f"decoder_head/block{i}"
        ln(f"{tp}.norm1", f"{fp}/norm1")
        ln(f"{tp}.norm2", f"{fp}/norm2")
        dense(f"{tp}.attn.qkv", f"{fp}/qkv")
        dense(f"{tp}.attn.proj", f"{fp}/proj")
        dense(f"{tp}.mlp.fc1", f"{fp}/fc1")
        dense(f"{tp}.mlp.fc2", f"{fp}/fc2")
    _set(params, "decoder_head/cls_emb", sd["decoder_head.cls_emb"][0])
    _set(params, "decoder_head/proj_patch", sd["decoder_head.proj_patch"])
    _set(params, "decoder_head/proj_classes", sd["decoder_head.proj_classes"])
    ln("decoder_head.decoder_norm", "decoder_head/decoder_norm")
    ln("decoder_head.class_norm", "decoder_head/class_norm")
    gru("decoder_head.bg_gru", "decoder_head/bg_gru")
    dense("decoder_head.bg_out", "decoder_head/bg_out")

    conf: dict = {}
    for layer in range(2):
        for suffix in ("", "_reverse"):
            for w in ("weight_ih", "weight_hh", "bias_ih", "bias_hh"):
                _set(conf, f"conf_gru/{w}_l{layer}{suffix}",
                     sd[f"decoder_head.conf_gru.{w}_l{layer}{suffix}"])
    _set(conf, "conf_out/kernel", sd["decoder_head.conf_out.weight"].T)
    _set(conf, "conf_out/bias", sd["decoder_head.conf_out.bias"])
    return {"merizo": params, "confidence": conf}


@functools.lru_cache(maxsize=2)
def _load_weights_cached(directory: str) -> dict:
    return torch_state_dict_to_params(read_split_weight_files(directory))


def load_weights(directory: str) -> dict:
    """Split shards -> flax parameter trees (merizo + confidence head).

    Cached per directory: processing an AF3 result calls the segmenter
    once per chain, and re-reading the multi-hundred-MB shard set each
    time is pure re-work."""
    return _load_weights_cached(str(directory))


# ===========================================================================
# driver: segment / iterative_segmentation (predict.py:40-120, 148-195)
# ===========================================================================

def _forward(params: dict, feats: dict, keep: Optional[np.ndarray] = None):
    model = Merizo()
    sel = slice(None) if keep is None else keep
    masks, bg, _ = model.apply(
        {"params": params["merizo"]},
        jnp.asarray(feats["s"][sel]),
        jnp.asarray(feats["z"][sel][:, sel] if keep is not None
                    else feats["z"]),
        jnp.asarray(feats["rot"][sel]),
        jnp.asarray(feats["trans"][sel]),
        jnp.asarray(feats["ri"][sel]),
    )
    return np.asarray(masks), np.asarray(bg)


def domain_confidences(params: dict, mask_logits: np.ndarray,
                       dom_ids: np.ndarray) -> np.ndarray:
    """Per-residue confidence via the conf GRU (mask_decoder.py:203-213)."""
    head = ConfidenceHead()
    conf = np.zeros(len(dom_ids), np.float32)
    for d in np.unique(dom_ids[dom_ids != 0]):
        rows = mask_logits[dom_ids == d]
        c = head.apply({"params": params["confidence"]}, jnp.asarray(rows))
        conf[dom_ids == d] = np.asarray(c, np.float32)
    return conf


def segment(params: dict, feats: dict,
            iterate: bool = True,
            max_iterations: int = 3) -> Tuple[np.ndarray, np.ndarray]:
    """Full segmentation protocol (predict.py:148-195 + 40-120).

    Returns (domain_ids (n,), conf_res (n,)); ids remapped from 1 in order
    of occurrence (remap_ids), 0 = background.
    """
    masks, bg = _forward(params, feats)
    dom_ids = postprocess_masks(masks, bg).astype(np.int64)
    conf = domain_confidences(params, masks, dom_ids)

    if iterate and len(dom_ids) > DOM_AVE * 2:
        ignore: set = set()
        for _ in range(max_iterations):
            big = [d for d in np.unique(dom_ids[dom_ids != 0])
                   if d not in ignore and (dom_ids == d).sum() > DOM_AVE]
            if not big:
                break
            counter = 1
            for d in big:
                keep = np.where(dom_ids == d)[0]
                masks_d, bg_d = _forward(params, feats, keep)
                sub_ids = postprocess_masks(masks_d, bg_d).astype(np.int64)
                uniq = np.unique(sub_ids[sub_ids != 0])
                if len(uniq) <= 1:
                    ignore.add(d)
                    continue
                sub_conf = domain_confidences(params, masks_d, sub_ids)
                offset = counter * N_CLASSES
                new_ids = sub_ids + offset
                new_ids[sub_ids == 0] = 0
                dom_ids[keep] = new_ids
                conf[keep] = sub_conf
                counter += 1

    dom_ids = separate_components(dom_ids, feats["ca_xyz"])
    if len(np.unique(dom_ids)) > 1:
        dom_ids = clean_domains(dom_ids, MIN_DOMAIN_SIZE)
        dom_ids = clean_singletons(dom_ids, MIN_FRAGMENT_SIZE)
    return remap_ids(dom_ids), conf


def segment_chain_atoms(atoms: np.ndarray, weights_dir: str,
                        min_confidence: float = 0.0):
    """One-call path: chain atom array + weights dir ->
    (domain ids, residue ids) over the residues with complete N/CA/C.

    Domains whose confidence falls below ``min_confidence`` are zeroed
    (CONF_THRESHOLD gating, predict.py:37)."""
    params = load_weights(weights_dir)
    feats = chain_features(atoms)
    ids, conf = segment(params, feats)
    if min_confidence > 0:
        for d in np.unique(ids[ids != 0]):
            if conf[ids == d].mean() < min_confidence:
                ids[ids == d] = 0
    return ids, feats["ca_atoms"]["res_id"].astype(np.int64)
