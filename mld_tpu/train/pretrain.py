"""CLIP text-tower pretraining for the synthetic e2e protocol.

The reference conditions its denoiser on a FROZEN *pretrained* CLIP text
encoder (mld/models/architectures/mld_clip.py; weights from OpenAI) — the
text features arriving at the denoiser already encode caption semantics.
The in-repo synthetic e2e protocol (scripts/train_synthetic_e2e.py) has no
such checkpoint: a random-init tower's pooled features separate captions
only by accident, so the denoiser trains against near-noise conditioning
and generated R-precision stays at chance no matter how long stage 2 runs
(measured: 4000 steps, R@1 0.07 vs chance 0.031,
docs/e2e_report_r5_noclip.json).

This module supplies the synthetic analog of "pretrained CLIP": the
caption -> style map of the synthetic corpus is deterministic
(data/synthetic.py `style_vector_from_caption`), so a few hundred steps of
regressing the pooled tower output onto the 11-dim style vector (through a
throwaway linear probe) makes the pooled feature a sufficient statistic of
the caption's motion semantics. The tower is then frozen for both training
stages, exactly mirroring the reference protocol.
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax


def pretrain_clip_text(cfg, dm, mld, params: Dict, steps: int = 800,
                       lr: float = 1e-3, seed: int = 0,
                       log_every: int = 100) -> Tuple[Dict, Dict]:
    """Train params["clip"] so pooled text features encode caption style.

    Returns (params-with-trained-clip, report). Only meaningful on the
    synthetic corpus (captions must parse with style_vector_from_caption);
    real datasets use converted OpenAI CLIP weights instead
    (utils/torch_convert.py).
    """
    from mld_tpu.data.synthetic import style_vector_from_caption

    clip_params = params["clip"]
    text_dim = cfg.model.text_encoded_dim
    k_style = 11
    probe = {
        "w": jnp.asarray(np.random.RandomState(seed).randn(
            text_dim, k_style) * (1.0 / np.sqrt(text_dim)), jnp.float32),
        "b": jnp.zeros((k_style,), jnp.float32),
    }
    train = {"clip": clip_params, "probe": probe}

    sched = optax.warmup_cosine_decay_schedule(
        init_value=lr * 0.05, peak_value=lr,
        warmup_steps=max(20, steps // 10), decay_steps=steps,
        end_value=lr * 0.05)
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(sched))
    opt_state = tx.init(train)

    def loss_fn(p, ids, style):
        feat = mld.clip.apply({"params": p["clip"]}, ids, mode="features")
        pred = feat @ p["probe"]["w"] + p["probe"]["b"]
        return jnp.mean((pred - style) ** 2)

    @jax.jit
    def step(p, o, ids, style):
        loss, grads = jax.value_and_grad(loss_fn)(p, ids, style)
        updates, o = tx.update(grads, o, p)
        return optax.apply_updates(p, updates), o, loss

    loader = dm.loader("train", seed=seed, drop_last=True)
    losses = []
    count = 0
    while count < steps:
        for b in loader:
            ids = jnp.asarray(b["text_ids"])
            style = jnp.asarray(np.stack(
                [style_vector_from_caption(c) for c in b["text"]]))
            train, opt_state, loss, = step(train, opt_state, ids, style)[:3]
            losses.append(float(loss))
            count += 1
            if log_every and count % log_every == 0:
                print(f"clip-pretrain step {count}: "
                      f"style-mse {np.mean(losses[-20:]):.5f}", flush=True)
            if count >= steps:
                break

    report = {
        "steps": count,
        "style_mse_first": float(np.mean(losses[:10])),
        "style_mse_last": float(np.mean(losses[-10:])),
    }
    out = dict(params)
    out["clip"] = jax.device_get(train["clip"])
    return out, report
