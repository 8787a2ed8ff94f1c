"""On-device CA candidate extraction: one jit program per map shape.

The host pipeline (candidates.py, re-implementing modeler.py:762-899)
needs the full carbon-alpha and backbone probability volumes on the host
— at 256-cube that is 2 x 67 MB of f32 across the device->host link
before the trace stage can start (a ~38 s stall on a tunneled setup, and
a needless PCIe round-trip anywhere).  This module runs

  threshold -> ball-dilation single-linkage clustering -> cluster filter
  -> greedy NMS -> 3-cube neighborhood gathers

inside ONE compiled program on the accelerator; only O(candidates)
outputs (a few MB) ever reach the host, where the final sub-voxel
centroid is computed in float64 with arithmetic identical to
candidates.refine_candidates (bitwise-equal coordinates).

Semantics match the host pipeline with ``cluster_method='morphology'``
(single-linkage at ``eps`` via radius-eps/2 ball dilation + 26-connected
components — the same construction candidates.cluster_points uses; exact
sklearn DBSCAN additionally drops <min_points noise clusters on small
clouds, a difference the cluster filter almost always erases).

Static shape budget: points above threshold are compacted with ``top_k``
under a cap chosen from a ladder after a one-scalar count readback; the
NMS output has its own cap.  Overflow of either cap is reported so the
caller can escalate or fall back to the host path.
"""

from __future__ import annotations

import functools
import logging
from typing import Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)

POINT_CAPS = (4096, 16384, 65536, 262144, 1048576)
NMS_CAPS = (2048, 8192, 32768)
_INT_INF = np.iinfo(np.int32).max


def _ball_kernel(r: int) -> np.ndarray:
    zz, yy, xx = np.ogrid[-r:r + 1, -r:r + 1, -r:r + 1]
    return ((zz * zz + yy * yy + xx * xx) <= r * r).astype(np.float32)


@functools.lru_cache(maxsize=16)
def _build_pipeline(shape: Tuple[int, int, int], r: int, k_cap: int,
                    m_cap: int):
    """Jitted threshold->cluster->filter->NMS->gather program."""
    import jax
    import jax.numpy as jnp

    n_vox = int(np.prod(shape))
    ball = _ball_kernel(r)[..., None, None]  # DHWIO

    def pipeline(ca, bb, aa_cl, thr):
        # ---- threshold ------------------------------------------------
        mask = ca > thr
        # ---- ball dilation (radius eps/2 -> single linkage at eps) ----
        dil = jax.lax.conv_general_dilated(
            mask[None, ..., None].astype(jnp.float32), jnp.asarray(ball),
            window_strides=(1, 1, 1), padding="SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )[0, ..., 0] > 0
        # ---- 26-connected components by min-label relaxation ----------
        # labels start as the voxel's own flat index; each round takes the
        # neighborhood min and then pointer-jumps (lbl = lbl[lbl]), which
        # doubles the effective propagation distance -> O(log diameter)
        # rounds instead of O(diameter).
        flat_ix = jnp.arange(n_vox, dtype=jnp.int32).reshape(shape)
        lbl0 = jnp.where(dil, flat_ix, _INT_INF)

        def relax(lbl):
            m = jax.lax.reduce_window(
                lbl, _INT_INF, jax.lax.min, (3, 3, 3), (1, 1, 1), "SAME"
            )
            return jnp.where(dil, jnp.minimum(lbl, m), _INT_INF)

        def jump(lbl):
            f = lbl.reshape(-1)
            j = jnp.where(f == _INT_INF, f, f[jnp.clip(f, 0, n_vox - 1)])
            return j.reshape(shape)

        def cond(state):
            _, changed, it = state
            return changed & (it < n_vox)

        def body(state):
            lbl, _, it = state
            new = jump(relax(lbl))
            return new, jnp.any(new != lbl), it + 1

        lbl, _, n_iters = jax.lax.while_loop(
            cond, body, (jump(relax(lbl0)), jnp.bool_(True), jnp.int32(0))
        )

        # ---- compact the above-threshold points (static cap) ----------
        score_flat = jnp.where(mask, ca, -1.0).reshape(-1)
        vals, idx = jax.lax.top_k(score_flat, k_cap)
        valid = vals > thr
        n_above = jnp.sum(mask)
        labels = jnp.where(valid, lbl.reshape(-1)[idx], _INT_INF)
        bbv = bb.reshape(-1)[idx]

        # ---- per-cluster backbone filter (candidates.filter_clusters) -
        order = jnp.argsort(labels)
        sl = labels[order]
        sv = jnp.where(valid[order], bbv[order], 0.0)
        sc = valid[order].astype(jnp.float32)
        new_seg = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), (sl[1:] != sl[:-1]).astype(jnp.int32)]
        )
        cid = jnp.cumsum(new_seg)
        sums = jax.ops.segment_sum(sv, cid, num_segments=k_cap)
        counts = jax.ops.segment_sum(sc, cid, num_segments=k_cap)
        real = counts > 0
        sums_max = jnp.max(jnp.where(real, sums, -jnp.inf))
        means = jnp.where(
            (sums > sums_max / 10) & real, sums / jnp.maximum(counts, 1.0), 0.0
        )
        keep_label = means > jnp.max(means) / 2
        keep_sorted = valid[order] & keep_label[cid]
        keep = jnp.zeros((k_cap,), bool).at[order].set(keep_sorted)

        # ---- greedy NMS by descending score (candidates.nms) ----------
        pts = jnp.stack(jnp.unravel_index(idx, shape), axis=-1).astype(
            jnp.float32
        )

        def nms_cond(state):
            alive, _, cnt = state
            return jnp.any(alive) & (cnt < m_cap)

        def nms_body(state):
            alive, out, cnt = state
            s = jnp.where(alive, vals, -jnp.inf)
            i = jnp.argmax(s)
            out = out.at[cnt].set(i.astype(jnp.int32))
            d2 = jnp.sum((pts - pts[i]) ** 2, axis=-1)
            return alive & (d2 > 9.0), out, cnt + 1

        alive0 = keep
        alive, out_ix, n_out = jax.lax.while_loop(
            nms_cond, nms_body,
            (alive0, jnp.zeros((m_cap,), jnp.int32), jnp.int32(0)),
        )
        nms_overflow = jnp.any(alive)

        # ---- 3-cube neighborhood gathers for sub-voxel refinement -----
        vox = jnp.stack(jnp.unravel_index(idx[out_ix], shape), axis=-1)
        vox = vox.astype(jnp.int32)  # (M, 3)
        shp = jnp.asarray(shape, jnp.int32)
        inner = jnp.all((vox >= 1) & (vox <= shp - 2), axis=1)
        offs = jnp.stack(
            jnp.meshgrid(*([jnp.arange(-1, 2)] * 3), indexing="ij"), axis=-1
        ).reshape(27, 3).astype(jnp.int32)
        neigh = jnp.clip(vox[:, None, :] + offs[None], 0, shp - 1)  # (M,27,3)
        ca_n = ca[neigh[..., 0], neigh[..., 1], neigh[..., 2]]  # (M, 27)
        aa_n = aa_cl[neigh[..., 0], neigh[..., 1], neigh[..., 2]]  # (M,27,20)
        return {
            "n_above": n_above,
            "n_out": n_out,
            "nms_overflow": nms_overflow,
            "vox": vox,
            "inner": inner,
            "ca_neigh": ca_n,
            "aa_neigh": aa_n,
            "cc_iters": n_iters,
        }

    return jax.jit(pipeline)


def extract_candidates_device(
    ca_prob,
    bb_prob,
    aa_prob,
    aa_pred=None,
    ca_score_threshold: float = 0.3,
    cluster_eps: float = 10.0,
    nms_radius_sq: float = 9.0,
) -> Optional[dict]:
    """Device-side candidate extraction from device-resident volumes.

    ``aa_prob`` is (20, X, Y, Z) (the engine's keep_on_device layout).
    Returns ``{"coords", "aa", "pred"}`` matching
    ``candidates.extract_candidates(..., cluster_method='morphology')``
    bit-for-bit (the float64 centroid runs on host over device-gathered
    f32 values), or ``None`` when the point/NMS caps cannot hold the map
    (caller should fall back to the host path).

    ``nms_radius_sq`` must be the default 9.0 (the jitted program bakes
    it); other values fall back to the host path.
    """
    import jax.numpy as jnp

    if nms_radius_sq != 9.0:
        return None
    shape = tuple(int(s) for s in ca_prob.shape)
    r = int(np.floor(cluster_eps / 2))
    ca = jnp.asarray(ca_prob)
    bb = jnp.asarray(bb_prob)
    aa_cl = jnp.moveaxis(jnp.asarray(aa_prob), 0, -1)

    n_above = int(jnp.sum(ca > ca_score_threshold))
    caps = [k for k in POINT_CAPS if k >= n_above]
    if not caps:
        logger.info("device extraction: %d points exceed the %d cap",
                    n_above, POINT_CAPS[-1])
        return None
    k_cap = caps[0]

    for m_cap in NMS_CAPS:
        fn = _build_pipeline(shape, r, k_cap, m_cap)
        res = fn(ca, bb, aa_cl, np.float32(ca_score_threshold))
        if not bool(res["nms_overflow"]):
            break
    else:
        logger.info("device extraction: NMS cap %d overflowed", NMS_CAPS[-1])
        return None
    if int(res["n_above"]) > k_cap:  # raced vs the count readback
        return None

    n = int(res["n_out"])
    vox = np.asarray(res["vox"][:n])
    inner = np.asarray(res["inner"][:n])
    # keep f32 — the host path normalizes the weights and aggregates the
    # AA probabilities in float32 (refine_candidates); matching dtypes
    # makes the centroids bitwise-identical
    ca_n = np.asarray(res["ca_neigh"][:n])
    aa_n = np.asarray(res["aa_neigh"][:n])
    logger.info("device extraction: %d above thr, %d NMS candidates "
                "(%d cc rounds)", n_above, n, int(res["cc_iters"]))

    # boundary candidates dropped like the host path (modeler.py:854-855)
    vox, ca_n, aa_n = vox[inner], ca_n[inner], aa_n[inner]
    if len(vox) == 0:
        return {"coords": np.zeros((0, 3)), "aa": np.zeros((20, 0)),
                "pred": np.zeros((0,), np.int64)}

    # identical arithmetic to candidates.refine_candidates: f32 weight
    # normalization, f64 position einsum, f32 AA aggregation
    offs = np.array(
        [[di, dj, dk] for di in (-1, 0, 1) for dj in (-1, 0, 1)
         for dk in (-1, 0, 1)]
    )
    neigh = vox[:, None, :] + offs[None, :, :]
    w = ca_n / ca_n.sum(axis=1, keepdims=True)
    coords = np.einsum("nk,nkd->nd", w, neigh.astype(np.float64))
    aa = np.einsum("nk,nkc->cn", w, aa_n)

    # aa_pred at the rounded refined position: always inside the gathered
    # 3-cube (|centroid - voxel| < 1 by construction), so the argmax over
    # the matching neighbor's channel vector equals the host's
    # aa_pred-volume gather
    rounded = np.clip(np.rint(coords).astype(np.int64), 0,
                      np.asarray(shape) - 1)
    off = rounded - vox + 1
    flat = off[:, 0] * 9 + off[:, 1] * 3 + off[:, 2]
    pred = np.argmax(aa_n[np.arange(len(vox)), flat], axis=-1)
    return {"coords": coords, "aa": aa, "pred": pred}
