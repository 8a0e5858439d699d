"""PyTorch/timm checkpoint -> parameter-pytree conversion.

Replaces the reference's TF/PT name-translation grammar
(tfimm/utils/timm.py:39-229) with a much simpler scheme: tfimm_tpu parameter
trees mirror the timm module hierarchy, so a flattened path maps to the timm
state_dict key via leaf renames only:

    kernel -> weight      (with a layout transpose, see below)
    scale  -> weight      (norm layers, no transpose)
    mean   -> running_mean
    var    -> running_var

Layout transposes for "kernel" leaves:
    4D conv    OIHW -> HWIO      transpose (2, 3, 1, 0)
    3D conv1d  OIW  -> WIO       transpose (2, 1, 0)
    2D linear  (out, in) -> (in, out)   transpose (1, 0)

Architectures with naming quirks override ``Model.pt_name_rules`` (a list of
``(regex, replacement)`` applied to the flattened path) or
``Model.convert_pt_weight`` for value-level transforms.
"""

from __future__ import annotations

import logging
import re
from typing import Dict

import jax.numpy as jnp
import numpy as np

from tfimm_tpu.utils.tree import flatten_params, unflatten_params

__all__ = ["convert_pt_state_dict", "load_pt_state_dict", "load_timm_weights",
           "load_pth_url_weights", "load_hf_pytorch_weights"]

logger = logging.getLogger(__name__)

_LEAF_RENAMES = {
    "kernel": "weight",
    "scale": "weight",
    "bias": "bias",
    "mean": "running_mean",
    "var": "running_var",
}


def pt_key_for(model, path: str) -> str:
    """Map a flattened param path to the corresponding PT state_dict key."""
    head, _, leaf = path.rpartition(".")
    if leaf in _LEAF_RENAMES:
        path = f"{head}.{_LEAF_RENAMES[leaf]}" if head else _LEAF_RENAMES[leaf]
    for pattern, repl in getattr(model, "pt_name_rules", ()):
        path = re.sub(pattern, repl, path)
    return path


def _default_value_transform(path: str, arr: np.ndarray,
                             target_shape) -> np.ndarray:
    leaf = path.rpartition(".")[2]
    if leaf == "kernel":
        if arr.ndim == 4:
            arr = arr.transpose(2, 3, 1, 0)
        elif arr.ndim == 3:
            arr = arr.transpose(2, 1, 0)
        elif arr.ndim == 2:
            arr = arr.transpose(1, 0)
    if arr.shape != tuple(target_shape):
        # Depthwise conv: PT stores (C, 1, kh, kw) -> HWIO gives (kh, kw, 1, C);
        # grouped convs may need a reshape of the I/O split.
        arr = arr.reshape(target_shape)
    return arr


def convert_pt_state_dict(model, state_dict: Dict[str, np.ndarray],
                          strict: bool = True) -> Dict:
    """Convert a PT state_dict into a param pytree matching ``model.params``."""
    if model.params is None:
        model.init(0)
    template = flatten_params(model.params)
    sd = {k: _to_numpy(v) for k, v in state_dict.items()}

    ignore_missing = set(getattr(model, "keys_to_ignore_on_load_missing", ()))
    custom = getattr(model, "convert_pt_weight", None)

    out, missing, used = {}, [], set()
    for path, tval in template.items():
        pt_key = pt_key_for(model, path)
        if pt_key not in sd:
            if path in ignore_missing or pt_key in ignore_missing:
                out[path] = tval
                continue
            missing.append(f"{path} (expected PT key {pt_key!r})")
            out[path] = tval
            continue
        arr = sd[pt_key]
        used.add(pt_key)
        if custom is not None:
            converted = custom(path, arr, tval.shape)
        else:
            converted = None
        if converted is None:
            converted = _default_value_transform(path, arr, tval.shape)
        if converted.shape != tuple(tval.shape):
            raise ValueError(
                f"Converted weight {path} has shape {converted.shape}, "
                f"expected {tuple(tval.shape)} (PT key {pt_key})"
            )
        out[path] = jnp.asarray(np.ascontiguousarray(converted), dtype=tval.dtype)

    unexpected = [k for k in sd if k not in used
                  and not k.endswith("num_batches_tracked")]
    if missing and strict:
        raise ValueError(f"Missing keys when converting PT weights: {missing[:20]}"
                         f"{' ...' if len(missing) > 20 else ''}")
    if missing:
        logger.warning("Missing PT keys: %s", missing)
    if unexpected:
        logger.info("Unused PT keys: %s", unexpected[:20])
    return unflatten_params(out)


def load_pt_state_dict(model, state_dict, strict: bool = True):
    model.params = convert_pt_state_dict(model, state_dict, strict=strict)
    return model


def _to_numpy(v) -> np.ndarray:
    if isinstance(v, np.ndarray):
        return v
    try:  # torch tensor
        return v.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(v)


# -- network loaders (reference: tfimm/utils/timm.py:232-282) -------------------

def load_timm_weights(model, timm_name: str):
    """Instantiate ``timm`` model with pretrained weights and convert."""
    try:
        import timm  # noqa
    except ImportError as e:
        raise ImportError(
            "Loading '[timm]' weights requires the timm package. Convert the "
            "checkpoint offline with scripts/convert_pt_to_jax.py instead."
        ) from e
    pt_model = timm.create_model(timm_name, pretrained=True)
    return load_pt_state_dict(model, pt_model.state_dict())


def load_pth_url_weights(model, url: str):
    import torch

    state_dict = torch.hub.load_state_dict_from_url(url, map_location="cpu")
    if isinstance(state_dict, dict) and "state_dict" in state_dict:
        state_dict = state_dict["state_dict"]
    if isinstance(state_dict, dict) and "model" in state_dict:
        state_dict = state_dict["model"]
    return load_pt_state_dict(model, state_dict)


def load_hf_pytorch_weights(model, url: str):
    try:
        from huggingface_hub import hf_hub_download
    except ImportError as e:
        raise ImportError("'[hf-pytorch]' urls require huggingface_hub") from e
    import torch

    repo_id, filename = url.rsplit("/", 1)
    path = hf_hub_download(repo_id=repo_id, filename=filename)
    state_dict = torch.load(path, map_location="cpu")
    return load_pt_state_dict(model, state_dict)
