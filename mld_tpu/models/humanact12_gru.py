"""HumanAct12 GRU action classifier (a2m FID/accuracy evaluator).

Parity target: mld/models/architectures/humanact12_gru.py:6-92 — stacked
unidirectional GRU over flattened joints [B, T, 72], last-valid-state
selection, tanh(linear1) features (FID variant) -> linear2 logits.

Torch layout note: torch GRU param names are weight_ih_l{k}; the converter
maps them unchanged onto our per-layer params.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from mld_tpu.ops.gru import gru_scan


class MotionDiscriminator(nn.Module):
    input_size: int = 72
    hidden_size: int = 128
    hidden_layers: int = 2
    output_size: int = 12

    @nn.compact
    def __call__(self, motion, lengths, h0=None, return_features=False):
        """motion [B, T, input_size] -> logits [B, output_size], or the
        tanh(linear1) feature (FID variant) when return_features."""
        B, T, _ = motion.shape
        H = self.hidden_size
        from mld_tpu.ops.gru import _torch_gru_init
        init = _torch_gru_init(H)  # torch symmetric U(+-1/sqrt(H))
        x = motion
        for layer in range(self.hidden_layers):
            I = self.input_size if layer == 0 else H
            w_ih = self.param(f"recurrent/weight_ih_l{layer}", init,
                              (3 * H, I))
            w_hh = self.param(f"recurrent/weight_hh_l{layer}", init,
                              (3 * H, H))
            b_ih = self.param(f"recurrent/bias_ih_l{layer}", init, (3 * H,))
            b_hh = self.param(f"recurrent/bias_hh_l{layer}", init, (3 * H,))
            h_init = (jnp.zeros((B, H), x.dtype) if h0 is None
                      else h0[layer])
            x, _ = gru_scan(x, lengths, h_init, w_ih, w_hh, b_ih, b_hh)
        # last valid output (reference indexes gru_o[length-1])
        idx = jnp.clip(lengths - 1, 0, T - 1)
        out = x[jnp.arange(B), idx]
        feats = jnp.tanh(nn.Dense(30, name="linear1")(out))
        # linear2 always runs so the param tree is call-independent
        logits = nn.Dense(self.output_size, name="linear2")(feats)
        return feats if return_features else logits


def convert_humanact12_checkpoint(tar_path: str) -> dict:
    """Load humanact12_gru.tar and convert to our param tree."""
    import torch
    import numpy as np

    ckpt = torch.load(tar_path, map_location="cpu", weights_only=False)
    state = ckpt.get("model", ckpt)
    params: dict = {}
    for k, v in state.items():
        arr = v.detach().cpu().numpy().astype(np.float32)
        if k.startswith("recurrent."):
            params[f"recurrent/{k.split('.', 1)[1]}"] = arr
        elif k.startswith(("linear1.", "linear2.")):
            mod, leaf = k.split(".")
            params.setdefault(mod, {})[
                "kernel" if leaf == "weight" else "bias"] = (
                arr.T if leaf == "weight" else arr)
    return params
