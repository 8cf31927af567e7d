"""Frozen CLIP text tower in flax + host-side tokenization.

The reference wraps HuggingFace CLIP ViT-L/14 and tokenizes INSIDE forward on
the host (mld/models/architectures/mld_clip.py:50-90) — a host<->device
boundary per call. Here tokenization lives in the input pipeline and the text
tower is a jit-compiled flax module, so prompt->motion is one XLA program.

Two output modes, matching mld_clip.py:73-82:
  * "clip":        pooled EOS embedding @ text_projection  -> [B, 1, width]
  * "clip_hidden": full last_hidden_state                  -> [B, 77, width]

Weights convert from a local HF clone (`prepare/prepare_clip.sh` layout in
the reference); with no weights available the tower runs random-init (useful
for from-scratch training / smoke tests only).
"""
from __future__ import annotations

import os
import re
import zlib
from typing import List, Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

CLIP_VOCAB = 49408
CLIP_BOS = 49406
CLIP_EOS = 49407
CLIP_CONTEXT = 77


def quick_gelu(x):
    return x * nn.sigmoid(1.702 * x)


def _clip_use_flash() -> bool:
    """Opt-in fused Pallas attention for the CLIP tower (default OFF).

    Measured on TPU v5e at B=128/S=77 the fused kernel LOSES to the XLA
    einsum path (21.3 ms vs 13.2 ms full tower, docs/bench_clip_flash_r4
    .json): Mosaic's mandatory 77->128 / 64->128 lane padding does ~5.5x
    the real FLOPs, which outweighs keeping the score tensor in VMEM.
    The production fix is upstream instead: serving crops token ids to
    EOT buckets (ClipTokenizer buckets=...), which shrinks the score
    tensor at the source. MLD_TPU_CLIP_FLASH=1 forces the kernel on
    (interpret mode off-TPU, for parity tests).
    """
    return os.environ.get("MLD_TPU_CLIP_FLASH", "0") not in (
        "0", "false", "off", "auto")


class ClipAttention(nn.Module):
    width: int
    heads: int
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, causal_mask):
        B, S, D = x.shape
        H = self.heads
        Dh = D // H
        dt = self.compute_dtype
        q = nn.Dense(D, dtype=dt, name="q_proj")(x) * (Dh ** -0.5)
        k = nn.Dense(D, dtype=dt, name="k_proj")(x)
        v = nn.Dense(D, dtype=dt, name="v_proj")(x)

        def split(t):
            return t.reshape(B, S, H, Dh).transpose(0, 2, 1, 3)

        if _clip_use_flash():
            from mld_tpu.ops.attention import flash_causal_sdpa
            out = flash_causal_sdpa(split(q), split(k), split(v), 1.0)
        else:
            scores = jnp.einsum("bhqd,bhkd->bhqk", split(q), split(k),
                                preferred_element_type=jnp.float32)
            scores = scores + causal_mask.astype(jnp.float32)
            probs = nn.softmax(scores, axis=-1).astype(dt)
            out = jnp.einsum("bhqk,bhkd->bhqd", probs, split(v))
        out = out.transpose(0, 2, 1, 3).reshape(B, S, D)
        return nn.Dense(D, dtype=dt, name="out_proj")(out)


class ClipEncoderLayer(nn.Module):
    width: int
    heads: int
    intermediate_size: int = 0  # 0 -> 4 * width
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, causal_mask):
        dt = self.compute_dtype
        y = nn.LayerNorm(name="layer_norm1", epsilon=1e-5,
                         dtype=dt)(x)
        x = x + ClipAttention(self.width, self.heads, dt,
                              name="self_attn")(y, causal_mask)
        y = nn.LayerNorm(name="layer_norm2", epsilon=1e-5, dtype=dt)(x)
        y = nn.Dense(self.intermediate_size or 4 * self.width,
                     dtype=dt, name="fc1")(y)
        y = quick_gelu(y)
        x = x + nn.Dense(self.width, dtype=dt, name="fc2")(y)
        return x


class ClipTextModel(nn.Module):
    """CLIP text transformer (ViT-L/14 text tower by default).

    `compute_dtype` casts activations for the (frozen) tower — bf16 feeds
    the MXU at full rate; params stay f32 and outputs are returned f32.
    """
    vocab_size: int = CLIP_VOCAB
    width: int = 768
    layers: int = 12
    heads: int = 12
    context_length: int = CLIP_CONTEXT
    projection_dim: int = 768
    intermediate_size: int = 0  # 0 -> 4 * width
    compute_dtype: str = "float32"

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray, mode: str = "pooled"):
        """input_ids: [B, 77] int32. mode: "pooled" | "hidden" | "features".

        "features" = pooled @ text_projection (HF get_text_features);
        "pooled"   = EOS-position hidden state after final LN;
        "hidden"   = full last_hidden_state.
        """
        B, S = input_ids.shape
        tok = self.param("token_embedding", nn.initializers.normal(0.02),
                         (self.vocab_size, self.width))
        pos = self.param("position_embedding", nn.initializers.normal(0.01),
                         (self.context_length, self.width))
        # declared unconditionally so every mode shares one param tree
        proj = self.param("text_projection", nn.initializers.normal(0.02),
                          (self.width, self.projection_dim))
        x = tok[input_ids] + pos[None, :S]
        cdtype = jnp.dtype(self.compute_dtype)
        x = x.astype(cdtype)

        causal = jnp.triu(jnp.full((S, S), -1e9, cdtype), k=1)
        causal = causal[None, None]
        for i in range(self.layers):
            x = ClipEncoderLayer(self.width, self.heads,
                                 self.intermediate_size, cdtype,
                                 name=f"layers_{i}")(x, causal)
        x = x.astype(jnp.float32)
        x = nn.LayerNorm(name="final_layer_norm", epsilon=1e-5)(x)
        if mode == "hidden":
            return x
        # EOS position = argmax of ids (EOS is the largest vocab id)
        eos_idx = jnp.argmax(input_ids, axis=-1)
        pooled = x[jnp.arange(B), eos_idx]
        if mode == "pooled":
            return pooled
        return pooled @ proj


def convert_hf_clip_text(state_dict) -> dict:
    """HF CLIPModel/CLIPTextModel state_dict -> our param tree."""
    import numpy as _np

    def npy(t):
        try:
            return t.detach().cpu().numpy()
        except AttributeError:
            return _np.asarray(t)

    params: dict = {}
    for key, val in state_dict.items():
        k = key
        for prefix in ("text_model.", "model.text_model."):
            if k.startswith(prefix):
                k = k[len(prefix):]
        arr = npy(val)
        if k == "embeddings.token_embedding.weight":
            params["token_embedding"] = arr
        elif k == "embeddings.position_embedding.weight":
            params["position_embedding"] = arr
        elif k == "text_projection.weight":
            params["text_projection"] = arr.T
        elif k.startswith("encoder.layers."):
            parts = k.split(".")
            idx = parts[2]
            node = params.setdefault(f"layers_{idx}", {})
            rest = parts[3:]
            if rest[0] == "self_attn":
                sub = node.setdefault("self_attn", {}).setdefault(rest[1], {})
                if rest[2] == "weight":
                    sub["kernel"] = arr.T
                else:
                    sub["bias"] = arr
            elif rest[0] in ("layer_norm1", "layer_norm2"):
                sub = node.setdefault(rest[0], {})
                sub["scale" if rest[1] == "weight" else "bias"] = arr
            elif rest[0] == "mlp":
                sub = node.setdefault(rest[1], {})
                if rest[2] == "weight":
                    sub["kernel"] = arr.T
                else:
                    sub["bias"] = arr
        elif k.startswith("final_layer_norm."):
            sub = params.setdefault("final_layer_norm", {})
            sub["scale" if k.endswith("weight") else "bias"] = arr
    return params


# ------------------------------------------------------------------ tokenizer
class ClipTokenizer:
    """Host-side tokenizer. Uses the HF tokenizer when a local CLIP clone is
    available; otherwise a deterministic hash fallback (self-consistent for
    from-scratch training, NOT compatible with pretrained CLIP weights).

    The fallback hashes with zlib.crc32, NOT Python's built-in ``hash``:
    str hashing is salted per interpreter (PYTHONHASHSEED), so builtin-hash
    ids silently change between processes — a model trained in one process
    (train.py) would receive scrambled token ids in another (test.py /
    demo.py / study subprocesses), collapsing text conditioning to chance.
    This exact failure invalidated the first r5 precision study (every
    subprocess arm re-rolled the vocabulary). Same pitfall + fix as
    data/word_vectorizer.py's POS one-hot path."""

    def __init__(self, modelpath: Optional[str] = None,
                 context_length: int = CLIP_CONTEXT):
        self.context_length = context_length
        self._hf = None
        if modelpath and os.path.exists(modelpath):
            try:
                from transformers import AutoTokenizer
                self._hf = AutoTokenizer.from_pretrained(modelpath)
            except Exception:
                self._hf = None
        self._word_re = re.compile(r"[a-z0-9]+|[^\sa-z0-9]")

    @property
    def is_exact(self) -> bool:
        return self._hf is not None

    def __call__(self, texts: List[str],
                 buckets: Optional[tuple] = None) -> np.ndarray:
        """-> int32 [B, L], padded (HF pads with EOS for CLIP).

        L is `context_length` (77) by default. With `buckets`, L is the
        smallest bucket that still contains every row's EOT token: under
        causal attention + EOT pooling the trailing pad columns are inert
        (masked to exp(-1e9)=0 in f32 softmax), so cropping is EXACT for
        the pooled/"features" modes while cutting the tower's FLOPs by
        L/77 (attention by (L/77)^2) — the measured serving bottleneck
        (docs/ROOFLINE.md:31-39). Do NOT use buckets for "hidden" mode:
        there the denoiser conditions on all 77 hidden states.
        """
        if self._hf is not None:
            enc = self._hf(texts, padding="max_length", truncation=True,
                           max_length=self.context_length, return_tensors="np")
            out = enc["input_ids"].astype(np.int32)
        else:
            out = np.full((len(texts), self.context_length), CLIP_EOS,
                          np.int32)
            for i, text in enumerate(texts):
                words = self._word_re.findall(
                    text.lower())[: self.context_length - 2]
                ids = [CLIP_BOS] + [
                    (zlib.crc32(w.encode("utf-8")) % (CLIP_BOS - 1)) + 1
                    for w in words] + [CLIP_EOS]
                out[i, : len(ids)] = ids
        if buckets:
            # EOS is the largest vocab id and pad == EOS, so argmax finds
            # the first EOS = the EOT position (same rule the pooling uses)
            eot_max = int(out.argmax(axis=-1).max())
            L = next((b for b in sorted(buckets) if b > eot_max),
                     self.context_length)
            out = out[:, :L]
        return out


def load_hf_clip_weights(modelpath: str) -> dict:
    """Load a local HF CLIP clone's text-tower weights into our param tree.

    Raising variant of MldTextEncoder._try_load — used where a silent
    random-CLIP fallback would invalidate the result (parity drill)."""
    import torch
    for name in ("model.safetensors", "pytorch_model.bin"):
        p = os.path.join(modelpath, name)
        if os.path.exists(p):
            if name.endswith(".bin"):
                sd = torch.load(p, map_location="cpu", weights_only=True)
            else:
                from safetensors.torch import load_file
                sd = load_file(p)
            params = convert_hf_clip_text(sd)
            if "token_embedding" not in params:
                raise ValueError(f"{p} has no CLIP text-tower weights")
            return params
    raise FileNotFoundError(
        f"no pytorch_model.bin / model.safetensors under {modelpath}")


class MldTextEncoder:
    """Frozen text encoder bundle: tokenizer + flax CLIP + params.

    mode "clip" -> [B, 1, width]; "clip_hidden" -> [B, 77, width]
    (mld_clip.py:73-82 behavior).
    """

    def __init__(self, modelpath: Optional[str] = None,
                 last_hidden_state: bool = False, width: int = 768,
                 layers: int = 12, heads: int = 12, seed: int = 0):
        self.tokenizer = ClipTokenizer(modelpath)
        self.model = ClipTextModel(width=width, layers=layers, heads=heads,
                                   projection_dim=width)
        self.mode = "clip_hidden" if last_hidden_state else "clip"
        self.params = None
        if modelpath and os.path.exists(modelpath):
            self.params = self._try_load(modelpath)
        if self.params is None:
            import jax
            dummy = jnp.zeros((1, CLIP_CONTEXT), jnp.int32)
            self.params = self.model.init(
                jax.random.PRNGKey(seed), dummy)["params"]

    @staticmethod
    def _try_load(modelpath: str):
        try:
            import torch
            for name in ("pytorch_model.bin", "model.safetensors"):
                p = os.path.join(modelpath, name)
                if os.path.exists(p):
                    if name.endswith(".bin"):
                        sd = torch.load(p, map_location="cpu",
                                        weights_only=True)
                    else:
                        from safetensors.torch import load_file
                        sd = load_file(p)
                    return convert_hf_clip_text(sd)
        except Exception:
            return None
        return None

    def encode_tokens(self, input_ids: jnp.ndarray) -> jnp.ndarray:
        """Device-side half (jit-able): ids -> text embedding."""
        if self.mode == "clip":
            feats = self.model.apply({"params": self.params}, input_ids,
                                     mode="features")
            return feats[:, None, :]
        return self.model.apply({"params": self.params}, input_ids,
                                mode="hidden")

    def __call__(self, texts: List[str]) -> jnp.ndarray:
        ids = jnp.asarray(self.tokenizer(texts))
        return self.encode_tokens(ids)
