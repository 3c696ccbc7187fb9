"""Convert PyTorch state_dicts (DCVC-RT / reference checkpoints) to flax pytrees.

Our flax modules mirror the reference's attribute tree with torch Sequential
indices flattened into names (torch ``enc.dec_1.3.dc.0.weight`` ->
flax path ``('enc', 'dec_1_3', 'dc_0', 'kernel')``), so conversion is a pure
name/layout transform:

  * integer path components merge into the preceding name with ``_``
  * conv ``weight`` (4D, OIHW) -> ``kernel`` (HWIO); depthwise included
  * per-QP tables and Bitparm params (Q, C, 1, 1) -> (Q, C)
  * everything else passes through

Also implements the reference's transfer-learning tricks
(trainer_seg_video_model.py:743-846): checkpoint prefix auto-normalization and
input-conv inflation from 3 to 4 channels for the mask channel.
"""

from __future__ import annotations

from typing import Dict, Mapping, Tuple

import numpy as np

try:  # torch is only needed when actually importing a .pth checkpoint
    import torch
except Exception:  # pragma: no cover
    torch = None

FlatParams = Dict[Tuple[str, ...], np.ndarray]


def _to_numpy(v) -> np.ndarray:
    if torch is not None and isinstance(v, torch.Tensor):
        return v.detach().cpu().numpy()
    return np.asarray(v)


def torch_key_to_flax_path(key: str) -> Tuple[str, ...]:
    """'enc.dec.0.dc.2.weight' -> ('enc', 'dec_0', 'dc_2', 'weight')."""
    parts = []
    for comp in key.split("."):
        if comp.isdigit() and parts:
            parts[-1] = f"{parts[-1]}_{comp}"
        else:
            parts.append(comp)
    return tuple(parts)


def convert_state_dict(state_dict: Mapping[str, "np.ndarray"]) -> FlatParams:
    """Translate a torch state_dict into a flat {flax_path: array} dict."""
    out: FlatParams = {}
    for key, value in state_dict.items():
        arr = _to_numpy(value)
        path = torch_key_to_flax_path(key)
        leaf = path[-1]
        if leaf == "weight" and arr.ndim == 4:
            # conv OIHW -> HWIO (valid for grouped/depthwise convs too)
            arr = arr.transpose(2, 3, 1, 0)
            path = path[:-1] + ("kernel",)
        elif arr.ndim == 4 and arr.shape[2] == 1 and arr.shape[3] == 1:
            # per-QP tables q_* (Q, C, 1, 1) and Bitparm h/b/a -> (Q, C)
            arr = arr[:, :, 0, 0]
        elif leaf == "weight":
            path = path[:-1] + ("kernel",)
            if arr.ndim == 2:
                arr = arr.T
        out[path] = np.ascontiguousarray(arr, dtype=np.float32)
    return out


def unflatten(flat: FlatParams):
    """Flat path dict -> nested flax params dict."""
    tree: dict = {}
    for path, arr in flat.items():
        node = tree
        for comp in path[:-1]:
            node = node.setdefault(comp, {})
        node[path[-1]] = arr
    return tree


def flatten(tree, prefix: Tuple[str, ...] = ()) -> FlatParams:
    out: FlatParams = {}
    for k, v in tree.items():
        if isinstance(v, Mapping):
            out.update(flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = np.asarray(v)
    return out


# Params this rebuild adds on top of the reference's parameter set; a torch
# checkpoint legitimately lacks them and the template's init (identity)
# keeps reference semantics. z_gain: from-scratch bootstrap gain
# (models/dmc.py setup), ones == identity.
DEFAULT_OK_LEAVES = frozenset({"z_gain"})


def align_params(flat_src: FlatParams, params_template) -> dict:
    """Fill a flax params template from converted torch params.

    Keys present in the torch checkpoint but absent from the model (e.g. the
    reference's dead ``hyper_in_adapter``, seg_video_model.py:225) are
    dropped; keys the model needs but the checkpoint lacks raise — except
    rebuild-only params (DEFAULT_OK_LEAVES), which keep their init values.
    """
    template_flat = flatten(params_template)
    missing = [k for k in template_flat
               if k not in flat_src and k[-1] not in DEFAULT_OK_LEAVES]
    if missing:
        raise KeyError(f"checkpoint missing {len(missing)} params, e.g. "
                       f"{missing[:5]}")
    picked: FlatParams = {}
    for key, tmpl in template_flat.items():
        if key not in flat_src and key[-1] in DEFAULT_OK_LEAVES:
            picked[key] = tmpl
            continue
        arr = flat_src[key]
        if tuple(arr.shape) != tuple(tmpl.shape):
            raise ValueError(f"shape mismatch at {key}: ckpt {arr.shape} vs "
                             f"model {tmpl.shape}")
        picked[key] = arr
    return unflatten(picked)


def normalize_prefix(state_dict: Mapping[str, object], target_keys) -> Dict[str, object]:
    """Strip/choose the checkpoint key prefix maximizing overlap with target_keys.

    Mirrors the reference's tolerant video-checkpoint loading
    (trainer_seg_video_model.py:743-755): try stripping common wrapper
    prefixes ('module.', 'model.', 'p_frame_model.', ...) and keep whichever
    normalization matches the most target keys.
    """
    target = set(target_keys)
    candidates = ["", "module.", "model.", "p_frame_model.", "i_frame_model.",
                  "net.", "_orig_mod."]
    best, best_overlap = state_dict, -1
    for prefix in candidates:
        if prefix:
            sub = {k[len(prefix):]: v for k, v in state_dict.items()
                   if k.startswith(prefix)}
        else:
            sub = dict(state_dict)
        overlap = len(target & set(sub))
        if overlap > best_overlap:
            best, best_overlap = sub, overlap
    return dict(best)


def inflate_input_conv(kernel: np.ndarray, extra_in: int = 1,
                       mode: str = "zero") -> np.ndarray:
    """Widen a conv kernel (H, W, I, O) to I+extra_in input channels.

    Reference behaviour (_inflate_input_convs_from_ckpt,
    trainer_seg_video_model.py:757-793): the new slice is zero / kaiming /
    mean-of-existing initialized so a 3-channel-pretrained model accepts the
    extra mask channel without perturbing its function at load time.
    """
    h, w, i, o = kernel.shape
    if mode == "zero":
        extra = np.zeros((h, w, extra_in, o), dtype=kernel.dtype)
    elif mode == "mean":
        extra = np.repeat(kernel.mean(axis=2, keepdims=True), extra_in, axis=2)
    elif mode == "kaiming":
        fan_in = h * w * (i + extra_in)
        std = np.sqrt(2.0 / fan_in)
        extra = np.random.default_rng(0).normal(0.0, std, (h, w, extra_in, o)).astype(kernel.dtype)
    else:
        raise ValueError(f"unknown inflation mode {mode!r}")
    return np.concatenate([kernel, extra], axis=2)


def load_torch_checkpoint(path: str) -> Dict[str, object]:
    """Load a .pth/.tar checkpoint and extract its state_dict.

    Handles the DCVC/reference checkpoint wrappers (src/utils/common.py:38-68):
    raw state_dict, {'state_dict': ...}, {'model': ...}, {'net': ...}.
    """
    if torch is None:
        raise RuntimeError("torch is required to import PyTorch checkpoints")
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    for key in ("state_dict", "model", "net"):
        if isinstance(ckpt, dict) and key in ckpt and isinstance(ckpt[key], dict):
            ckpt = ckpt[key]
    return {k.removeprefix("module."): v for k, v in ckpt.items()}
