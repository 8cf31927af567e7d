"""Torch-checkpoint -> flax-params converter.

Maps released reference checkpoints (torch ``state_dict``) onto our parameter
trees so the "within 5% of released checkpoints" target is reachable without
retraining. Works purely on numpy arrays — torch is only needed to unpickle.

Naming rules (see ops/transformer.py / models/vae.py / models/denoiser.py):
  torch "input_blocks.0.linear1.weight"  -> params["input_blocks_0"]["linear1"]["kernel"].T
  torch "...self_attn.in_proj_weight"    -> ["self_attn"]["in_proj_kernel"].T
  torch LayerNorm weight/bias            -> scale/bias
  torch "...pe" / embedding tables       -> kept as-is
"""
from __future__ import annotations

from typing import Dict, Mapping

import numpy as np


def _to_numpy(t):
    try:
        return t.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(t)


def _insert(tree: Dict, path, value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _merge_indices(parts):
    """["input_blocks", "0", "self_attn"] -> ["input_blocks_0", "self_attn"]."""
    out = []
    for p in parts:
        if p.isdigit() and out:
            out[-1] = f"{out[-1]}_{p}"
        else:
            out.append(p)
    return out


# leaf params that are NOT torch-Linear weights and must keep their layout
_KEEP_LAYOUT = {
    "pe", "global_motion_token", "action_embedding", "hidden",
    "position_embedding", "token_embedding",
}

# module names whose `weight` is a LayerNorm scale (1-D)
_NORM_HINTS = ("norm", "layer_norm", "final_layer_norm", "ln_")


def torch_state_dict_to_flax(state: Mapping[str, "np.ndarray"],
                             strip_prefix: str = "") -> Dict:
    """Convert a flat torch state_dict into a nested flax params dict."""
    tree: Dict = {}
    for key, tensor in state.items():
        if strip_prefix:
            if not key.startswith(strip_prefix):
                continue
            key = key[len(strip_prefix):]
        arr = _to_numpy(tensor)
        parts = key.split(".")
        leaf = parts[-1]
        path = _merge_indices(parts[:-1])

        if leaf == "in_proj_weight":
            _insert(tree, path + ["in_proj_kernel"], arr.T)
        elif leaf == "in_proj_bias":
            _insert(tree, path + ["in_proj_bias"], arr)
        elif leaf == "weight":
            if arr.ndim == 2:
                _insert(tree, path + ["kernel"], arr.T)
            elif arr.ndim == 1:
                _insert(tree, path + ["scale"], arr)  # LayerNorm
            elif arr.ndim == 3:
                # Conv1d weight (out, in, k) -> flax (k, in, out)
                _insert(tree, path + ["kernel"], arr.transpose(2, 1, 0))
            else:
                _insert(tree, path + ["kernel"], arr)
        elif leaf == "bias":
            _insert(tree, path + ["bias"], arr)
        elif any(h in leaf for h in _KEEP_LAYOUT) or leaf in _KEEP_LAYOUT:
            _insert(tree, path + [leaf], arr)
        else:
            _insert(tree, path + [leaf], arr)
    return tree


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Unpickle a torch/lightning checkpoint into a flat numpy state dict."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    state = ckpt.get("state_dict", ckpt)
    return {k: _to_numpy(v) for k, v in state.items()}


def assert_tree_shapes_match(converted: Dict, init_params: Dict, path=""):
    """Raise with a readable diff when converted params don't line up."""
    c_keys, i_keys = set(converted), set(init_params)
    if c_keys != i_keys:
        raise ValueError(
            f"param tree mismatch at '{path}': "
            f"only-in-checkpoint={sorted(c_keys - i_keys)}, "
            f"only-in-model={sorted(i_keys - c_keys)}")
    for k in c_keys:
        cv, iv = converted[k], init_params[k]
        if isinstance(iv, dict):
            assert_tree_shapes_match(cv, iv, f"{path}/{k}")
        else:
            if tuple(np.shape(cv)) != tuple(np.shape(iv)):
                raise ValueError(
                    f"shape mismatch at '{path}/{k}': "
                    f"ckpt {np.shape(cv)} vs model {np.shape(iv)}")
