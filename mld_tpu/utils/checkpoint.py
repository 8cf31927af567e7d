"""Orbax checkpointing + torch-checkpoint interop.

Replaces Lightning ModelCheckpoint / resume-scan (reference train.py:26-53,
124-133, modeltype/base.py:96-127):
  * periodic orbax saves with keep-all semantics (save_top_k=-1 parity)
  * resume = latest step in the experiment dir
  * CLIP params are excluded from saves and re-hydrated on load (the
    reference strips text_encoder.* the same way)
  * `load_reference_checkpoint` maps a released torch .ckpt onto our params
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, keep: Optional[int] = None):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=keep, create=True)
        self._mgr = ocp.CheckpointManager(self.directory, options=options)

    def save(self, step: int, params: Dict, opt_state: Any = None,
             extra: Optional[Dict] = None):
        """Save trainable params (+ optimizer state); CLIP excluded."""
        payload = {"params": {k: v for k, v in params.items() if k != "clip"}}
        if opt_state is not None:
            payload["opt_state"] = opt_state
        if extra:
            payload["extra"] = extra
        self._mgr.save(step, args=ocp.args.StandardSave(payload))
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, step: Optional[int] = None,
                like: Optional[Dict] = None,
                like_opt_state: Any = None) -> Dict:
        """Restore a payload. `like` is a params tree template (clip
        stripped); opt_state is restored when a template is given."""
        step = step if step is not None else self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.directory}")
        if like is not None:
            ref = {"params": {k: v for k, v in like.items() if k != "clip"}}
            if like_opt_state is not None:
                ref["opt_state"] = like_opt_state
            return self._mgr.restore(
                step, args=ocp.args.StandardRestore(ref))
        return self._mgr.restore(step)


def save_params_npz(path: str, params: Dict):
    """Flat .npz export (simple interchange format)."""
    flat = {}

    def walk(node, prefix):
        for k, v in node.items():
            key = f"{prefix}/{k}" if prefix else k
            if isinstance(v, dict):
                walk(v, key)
            else:
                flat[key] = np.asarray(v)

    walk(params, "")
    np.savez(path, **flat)


def load_params_npz(path: str) -> Dict:
    flat = np.load(path)
    tree: Dict = {}
    for key in flat.files:
        node = tree
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = flat[key]
    return tree


# ------------------------------------------------- reference-ckpt conversion
def load_reference_checkpoint(ckpt_path: str, target_params: Dict) -> Dict:
    """Map a released reference torch checkpoint (Lightning .ckpt) onto our
    param tree. Handles: vae.* / denoiser.* prefixes, the Sequential
    emb_proj.1 rename, and validates shapes against `target_params`.
    """
    from mld_tpu.utils.torch_convert import (
        assert_tree_shapes_match,
        load_torch_checkpoint,
        torch_state_dict_to_flax,
    )

    state = load_torch_checkpoint(ckpt_path)
    out = dict(target_params)
    for top in ("vae", "denoiser"):
        sub = {k[len(top) + 1:]: v for k, v in state.items()
               if k.startswith(top + ".")}
        if not sub:
            continue
        tree = torch_state_dict_to_flax(sub)
        if top == "denoiser" and "emb_proj_1" in tree:
            tree["emb_proj"] = tree.pop("emb_proj_1")
        # action condition: reference EmbedAction lives at denoiser.emb_proj,
        # ours is named emb_proj_action (mld_denoiser.py:74 vs denoiser.py:107)
        if (top == "denoiser" and "emb_proj" in tree
                and "emb_proj_action" in target_params.get(top, {})):
            tree["emb_proj_action"] = tree.pop("emb_proj")
        # the reference strips denoiser.sequence_pos_encoding.pe on load
        # (train.py:186-190) — drop any key absent from our tree
        tree = _prune_to(tree, target_params.get(top, {}))
        assert_tree_shapes_match(tree, target_params[top], top)
        out[top] = jax.tree_util.tree_map(np.asarray, tree)
    return out


def _prune_to(tree: Dict, ref: Dict) -> Dict:
    pruned = {}
    for k, v in tree.items():
        if k not in ref:
            continue
        if isinstance(v, dict) and isinstance(ref[k], dict):
            pruned[k] = _prune_to(v, ref[k])
        else:
            pruned[k] = v
    return pruned
