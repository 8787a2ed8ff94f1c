"""Convert reference PyTorch MICA checkpoints to mica_tpu parameter trees.

The reference ships its trained model as a torch ``.pth`` with a
``model_state_dict`` saved from a ``DataParallel``-wrapped module (so keys
may carry a ``module.`` prefix — train.py:294-314, stripped at load time in
predict.py:237-240).  This module maps that state dict onto the flax
parameter tree of :class:`mica_tpu.models.mica.MICA`.

Weight layout conversions:
  * Conv3d ``(out, in/groups, kd, kh, kw)`` -> flax ``(kd, kh, kw, in/groups, out)``
  * Linear ``(out, in)`` -> flax ``(in, out)``
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np


def _conv(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(w, (2, 3, 4, 1, 0)))


def _dense(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(w, (1, 0)))


def _head_map(torch_prefix: str, flax_prefix: str) -> Dict[str, tuple]:
    return {
        f"{torch_prefix}.conv1": (f"{flax_prefix}/conv1/Conv_0", "conv"),
        f"{torch_prefix}.conv2": (f"{flax_prefix}/conv2/Conv_0", "conv"),
        f"{torch_prefix}.calibration.1": (f"{flax_prefix}/cal0/Conv_0", "conv"),
        f"{torch_prefix}.calibration.4": (f"{flax_prefix}/cal1/Conv_0", "conv"),
        f"{torch_prefix}.final": (f"{flax_prefix}/final/Conv_0", "conv"),
    }


def _layer_map() -> Dict[str, tuple]:
    """torch module path -> (flax path, kind). Kinds: conv | dense | raw."""
    m: Dict[str, tuple] = {}
    ip = "input_processing"
    for i in range(4):
        m[f"{ip}.exp_convs.{i}"] = (f"{ip}/exp_conv{i}/Conv_0", "conv")
    m[f"{ip}.feat_conv"] = (f"{ip}/feat_conv/Conv_0", "conv")
    m[f"{ip}.exp_attention.1"] = (f"{ip}/exp_attn0/Conv_0", "conv")
    m[f"{ip}.exp_attention.3"] = (f"{ip}/exp_attn1/Conv_0", "conv")
    m[f"{ip}.exp_downsizing"] = (f"{ip}/exp_downsizing/Conv_0", "conv")
    m[f"{ip}.feat_gate.0"] = (f"{ip}/feat_gate0/Conv_0", "conv")
    m[f"{ip}.feat_gate.2"] = (f"{ip}/feat_gate1/Conv_0", "conv")
    m[f"{ip}.fusion"] = (f"{ip}/fusion/Conv_0", "conv")

    for i in range(3):
        e, f = f"encoder.{i}", f"encoder{i}"
        for c in (1, 2, 3):
            m[f"{e}.dense_block.conv{c}.0"] = (f"{f}/dense_block/conv{c}/Conv_0", "conv")
        m[f"{e}.dense_block.se.fc.0"] = (f"{f}/dense_block/se/Dense_0", "dense")
        m[f"{e}.dense_block.se.fc.3"] = (f"{f}/dense_block/se/Dense_1", "dense")
        m[f"{e}.dual_attn.local_attn.0"] = (f"{f}/dual_attn/local_conv/Conv_0", "conv")
        m[f"{e}.dual_attn.global_attn.1"] = (f"{f}/dual_attn/global0/Conv_0", "conv")
        m[f"{e}.dual_attn.global_attn.4"] = (f"{f}/dual_attn/global1/Conv_0", "conv")
        m[f"{e}.dual_attn.fusion"] = (f"{f}/dual_attn/fusion/Conv_0", "conv")
        m[f"{e}.transition.0"] = (f"{f}/transition/Conv_0", "conv")

    for i in range(3):
        m[f"fpn.lateral.{i}"] = (f"fpn/lateral{i}/Conv_0", "conv")
        m[f"fpn.smooth.{i}.0"] = (f"fpn/smooth{i}/Conv_0", "conv")

    m.update(_head_map("backbone_head", "backbone_head"))
    m.update(_head_map("ca_head", "ca_head"))
    m.update(_head_map("aa_head", "aa_head"))
    return m


def _set_nested(tree: dict, path: str, leaf_name: str, value: np.ndarray) -> None:
    node = tree
    for part in path.split("/"):
        node = node.setdefault(part, {})
    node[leaf_name] = value


def torch_state_dict_to_params(state_dict: Mapping[str, "np.ndarray"]) -> dict:
    """Build a flax ``params`` dict from a torch state dict.

    Accepts tensors or numpy arrays; strips any ``module.`` prefix.
    """
    sd = {}
    for k, v in state_dict.items():
        if k.startswith("module."):
            k = k[len("module."):]
        arr = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
        sd[k] = arr.astype(np.float32)

    params: dict = {}
    layer_map = _layer_map()
    for tpath, (fpath, kind) in layer_map.items():
        wkey, bkey = f"{tpath}.weight", f"{tpath}.bias"
        if wkey not in sd:
            raise KeyError(f"checkpoint missing {wkey}")
        w = sd[wkey]
        if kind == "conv":
            _set_nested(params, fpath, "kernel", _conv(w))
        else:
            _set_nested(params, fpath, "kernel", _dense(w))
        if bkey in sd:
            _set_nested(params, fpath, "bias", sd[bkey])

    if "fpn.weights" in sd:
        params.setdefault("fpn", {})["weights"] = sd["fpn.weights"]
    return params


def load_torch_checkpoint(path: str) -> dict:
    """Load a reference ``.pth`` checkpoint file into a flax params tree."""
    import torch  # CPU-only torch, used solely for deserialization

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    state_dict = ckpt.get("model_state_dict", ckpt)
    return torch_state_dict_to_params(state_dict)


def params_to_torch_state_dict(params: Mapping) -> Dict[str, np.ndarray]:
    """Inverse mapping: flax params -> reference-layout numpy state dict."""
    flat: Dict[str, np.ndarray] = {}

    def walk(node, prefix=""):
        for k, v in node.items():
            p = f"{prefix}/{k}" if prefix else k
            if isinstance(v, Mapping):
                walk(v, p)
            else:
                flat[p] = np.asarray(v)

    walk(params)
    out: Dict[str, np.ndarray] = {}
    for tpath, (fpath, kind) in _layer_map().items():
        w = flat[f"{fpath}/kernel"]
        if kind == "conv":
            out[f"{tpath}.weight"] = np.ascontiguousarray(np.transpose(w, (4, 3, 0, 1, 2)))
        else:
            out[f"{tpath}.weight"] = np.ascontiguousarray(np.transpose(w, (1, 0)))
        b = flat.get(f"{fpath}/bias")
        if b is not None:
            out[f"{tpath}.bias"] = b
    out["fpn.weights"] = flat["fpn/weights"]
    return out
