"""Contrastive training of the T2M evaluator bundle.

The reference evaluates with FROZEN text/motion matching networks trained
by the upstream text-to-motion project and shipped as
`t2m/.../text_mot_match/model/finest.tar` (loaded in
mld/models/modeltype/mld.py:145-189; the training itself lives outside
the reference repo). Those checkpoints are license-gated in this
environment, and random-init evaluators make R-precision structurally
equal to chance — matched (text, motion) pairs land nowhere special in
embedding space, so no generator quality is measurable.

This module trains the SAME three architectures (t2m_eval.py) in-repo
with a symmetric InfoNCE objective over (caption, motion) pairs, in
evaluator normalization space, exactly the representation the eval
pipeline feeds them (eval/pipeline.py renorm4t2m). On the
caption-conditioned synthetic corpus (data/synthetic.py) a few hundred
steps give GT R-precision far above chance, making the synthetic e2e
protocol able to separate trained generators from random ones.
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from mld_tpu.config import Config
from mld_tpu.eval.pipeline import T2MEvaluatorBundle


def train_t2m_evaluator(cfg: Config, dm, steps: int = 600,
                        lr: float = 5e-4, temperature: float = 0.1,
                        seed: int = 0,
                        batch_size: Optional[int] = None,
                        style_weight: float = 1.0,
                        log_every: int = 100) -> Tuple[Dict, Dict]:
    """Train the evaluator bundle contrastively on `dm`'s train split.

    Returns (params, report): params in T2MEvaluatorBundle layout
    ({"text", "move", "motion"}), report with the loss curve and final
    in-batch retrieval accuracy (top-1 over the contrastive batch).
    """
    bundle = T2MEvaluatorBundle(cfg, params=None, seed=seed)
    params = bundle.params
    unit_len = cfg.dataset.unit_len

    mean = jnp.asarray(dm.mean, jnp.float32)
    std = jnp.asarray(dm.std, jnp.float32)
    mean_e = jnp.asarray(dm.mean_eval, jnp.float32)
    std_e = jnp.asarray(dm.std_eval, jnp.float32)

    # lr is a cliff for the BiGRU towers: 2e-3 saturates the motion GRU
    # into a constant-output fixed point it never escapes (measured:
    # style-mse stuck at the predict-mean baseline for 3000 steps), while
    # 5e-4 fits the same objective to ~6e-3 in 300 steps. Warmup + global
    # norm clip + cosine decay keeps the run finite either way.
    sched = optax.warmup_cosine_decay_schedule(
        init_value=lr * 0.05, peak_value=lr,
        warmup_steps=max(20, steps // 10), decay_steps=steps,
        end_value=lr * 0.1)
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(sched))
    opt_state = tx.init(params)

    def loss_fn(p, batch, style):
        # model-space z-norm -> evaluator norm (datamodule renorm4t2m)
        feats_e = (batch["motion"] * std + mean - mean_e) / std_e
        feats_e = feats_e * batch["mask"][..., None]
        mov = bundle.moveencoder.apply({"params": p["move"]},
                                       feats_e[..., :-4])
        m_emb = bundle.motionencoder.apply(
            {"params": p["motion"]}, mov,
            jnp.maximum(batch["length"] // unit_len, 1))
        t_emb = bundle.textencoder.apply(
            {"params": p["text"]}, batch["word_embs"], batch["pos_ohot"],
            batch["text_len"])
        # R-precision/Matching rank by RAW euclidean distance
        # (metrics/utils.py euclidean_distance_matrix), so the
        # contrastive logits are negative squared distances — training
        # optimizes exactly the quantity the eval protocol sorts.
        # Scale-adaptive: distances from random-init GRUs have arbitrary
        # magnitude (peaked/flat softmax either way -> vanishing
        # gradients), so normalize by the stop-gradient batch mean.
        # (The earlier centered-cosine objective stayed at chance: the
        # common-mode direction it removed is precisely what euclidean
        # ranking is sensitive to.)
        d2 = (jnp.sum(t_emb ** 2, -1)[:, None]
              - 2.0 * t_emb @ m_emb.T
              + jnp.sum(m_emb ** 2, -1)[None])
        scale = jax.lax.stop_gradient(jnp.mean(d2)) + 1e-6
        logits = -(d2 / scale) / temperature
        labels = jnp.arange(logits.shape[0])
        nce = 0.5 * (
            optax.softmax_cross_entropy_with_integer_labels(
                logits, labels).mean()
            + optax.softmax_cross_entropy_with_integer_labels(
                logits.T, labels).mean())
        # supervised anchor: the synthetic caption <-> style map is
        # deterministic, so both towers regress the 11-dim style vector
        # into their first dims — a collapse-proof shared-space signal
        # (the motion tower must EXTRACT the style from the features,
        # which is exactly the text-motion correspondence the evaluator
        # needs to rank by)
        k = style.shape[-1]
        style_mse = (jnp.mean((t_emb[:, :k] - style) ** 2)
                     + jnp.mean((m_emb[:, :k] - style) ** 2))
        loss = nce + style_weight * style_mse
        acc = jnp.mean(jnp.argmax(logits, axis=-1) == labels)
        return loss, (acc, nce, style_mse)

    @jax.jit
    def step(p, o, batch, style):
        (loss, aux), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(p, batch, style)
        updates, o = tx.update(grads, o, p)
        return optax.apply_updates(p, updates), o, loss, aux

    loader = dm.eval_embedding_loader("train", batch_size=batch_size,
                                      seed=seed)
    keys = ("motion", "mask", "length", "word_embs", "pos_ohot",
            "text_len")

    from mld_tpu.data.synthetic import style_vector_from_caption

    losses, accs, mses = [], [], []
    count = 0
    while count < steps:
        for b in loader:
            db = {k: jnp.asarray(b[k]) for k in keys}
            try:
                style = jnp.asarray(np.stack(
                    [style_vector_from_caption(c) for c in b["text"]]))
            except StopIteration:
                raise ValueError(
                    "train_t2m_evaluator targets the synthetic corpus "
                    "(captions must parse to style vectors); for real "
                    "datasets use the released finest.tar evaluators")
            params, opt_state, loss, aux = step(params, opt_state, db,
                                                style)
            acc, nce, mse = aux
            losses.append(float(nce))
            accs.append(float(acc))
            mses.append(float(mse))
            count += 1
            if log_every and count % log_every == 0:
                print(f"t2m-eval step {count}: nce {losses[-1]:.4f} "
                      f"style-mse {mses[-1]:.4f} "
                      f"batch-top1 {np.mean(accs[-20:]):.3f}", flush=True)
            if count >= steps:
                break

    report = {
        "steps": count,
        "loss_first": float(np.mean(losses[:10])),
        "loss_last": float(np.mean(losses[-10:])),
        "style_mse_last": float(np.mean(mses[-10:])),
        "batch_top1_last": float(np.mean(accs[-20:])),
    }
    return jax.device_get(params), report
