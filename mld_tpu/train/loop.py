"""Training driver: epochs, validation, checkpointing, resume.

Replaces pl.Trainer + callbacks (reference train.py:124-200). One jitted
train step over the device mesh; host loop only moves batches and logs.
"""
from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mld_tpu.config import Config
from mld_tpu.data.datamodule import get_datamodule
from mld_tpu.models.mld import MLD
from mld_tpu.parallel.mesh import (
    make_mesh,
    pad_batch_to_devices,
    replicate_tree,
    shard_batch,
)
from mld_tpu.train.steps import (
    create_train_state,
    full_params,
    make_device_train_scan,
    make_eval_step,
    make_train_scan,
    make_train_step,
)
from mld_tpu.utils.checkpoint import CheckpointManager
from mld_tpu.utils.logger import ExperimentLogger, create_experiment_dir


def _device_batch(batch: Dict, mesh=None) -> Dict:
    keys = ("motion", "mask", "text_ids", "action")
    jb = {k: np.asarray(batch[k]) for k in keys if k in batch}
    # row_valid marks real rows; pad-to-device-count below may append ghost
    # rows (all-zero) which must not contribute to averaged losses
    jb["row_valid"] = np.ones(jb["motion"].shape[0], bool)
    if mesh is not None:
        jb = pad_batch_to_devices(jb, mesh)
        return shard_batch(jb, mesh)
    return {k: jnp.asarray(v) for k, v in jb.items()}


def device_prefetch(loader, mesh=None, depth: int = 2, group: int = 1):
    """Iterate device-resident batches, transferring ahead of the loop.

    On a tunneled/remote device, host->device transfers serialize with
    queued compute when issued from the dispatching thread (measured
    +110 ms/step at flagship batch); staging `_device_batch` from a
    daemon thread overlaps the next batch's transfer with the current
    step. Depth 2 = classic double buffering.

    With ``group`` > 1 (single-device only), full groups of ``group``
    consecutive batches are stacked host-side along a new leading step
    axis and transferred as ONE super-batch for `make_train_scan`;
    yields ("scan", batches[K, ...]) for full groups and ("step", batch)
    for the epoch-tail leftovers.
    """
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=max(1, depth))
    _END = object()

    def stage_one(batch):
        return ("step", _device_batch(batch, mesh))

    def stage_group(batches):
        keys = ("motion", "mask", "text_ids", "action")
        jb = {k: np.stack([np.asarray(b[k]) for b in batches])
              for k in keys if k in batches[0]}
        jb["row_valid"] = np.ones(jb["motion"].shape[:2], bool)
        return ("scan", {k: jnp.asarray(v) for k, v in jb.items()})

    def producer():
        try:
            pend = []
            for batch in loader:
                if group <= 1:
                    q.put(stage_one(batch))
                    continue
                pend.append(batch)
                if len(pend) == group:
                    q.put(stage_group(pend))
                    pend = []
            for batch in pend:  # epoch tail: single steps
                q.put(stage_one(batch))
        except BaseException as e:  # surface worker errors in the consumer
            q.put(e)
            return
        finally:
            q.put(_END)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _END:
            break
        if isinstance(item, BaseException):
            raise item
        if group <= 1:
            yield item[1]
        else:
            yield item


def train(cfg: Config, max_steps: Optional[int] = None,
          resume: bool = False) -> Dict:
    """Run one training stage. Returns final params."""
    stage = cfg.train.stage
    exp_dir = create_experiment_dir(cfg.logger.folder, "mld", cfg.name)
    logger = ExperimentLogger(exp_dir, cfg, phase="train",
                              tensorboard=cfg.logger.tensorboard)
    logger.info(f"stage={stage} devices={jax.device_count()} "
                f"backend={jax.default_backend()}")

    mld = MLD(cfg)
    dm = get_datamodule(cfg, tokenizer=getattr(mld, "tokenizer", None))
    mld.mean = jnp.asarray(dm.mean, jnp.float32)
    mld.std = jnp.asarray(dm.std, jnp.float32)
    mld.mean_eval = jnp.asarray(dm.mean_eval, jnp.float32)
    mld.std_eval = jnp.asarray(dm.std_eval, jnp.float32)

    rng = jax.random.PRNGKey(cfg.train.seed)
    rng, init_rng = jax.random.split(rng)
    params = mld.init_params(init_rng)

    # two-stage handoff: load the frozen stage-1 VAE (train.py:165-177)
    if stage == "diffusion" and cfg.train.pretrained_vae:
        params = _load_pretrained(cfg.train.pretrained_vae, params,
                                  only=("vae",))
        logger.info(f"loaded pretrained VAE from {cfg.train.pretrained_vae}")
    if cfg.train.pretrained:
        params = _load_pretrained(cfg.train.pretrained, params)
        logger.info(f"loaded pretrained model from {cfg.train.pretrained}")

    state = create_train_state(mld, params, stage)

    n_data = (cfg.train.data_parallel if cfg.train.data_parallel > 0 else -1)
    # data_parallel=1 is an explicit "no mesh": single-device semantics
    # (K-step scan, device-resident corpus) on a multi-device host
    mesh = (make_mesh(num_data=n_data)
            if jax.device_count() > 1 and n_data != 1 else None)
    if mesh is not None:
        state = state.replace(
            params=replicate_tree(state.params, mesh),
            frozen=replicate_tree(state.frozen, mesh),
            opt_state=replicate_tree(state.opt_state, mesh))

    ckpt = CheckpointManager(os.path.join(exp_dir, "checkpoints"))
    start_epoch = 0
    if resume and ckpt.latest_step() is not None:
        restored = ckpt.restore(like=state.params,
                                like_opt_state=state.opt_state)
        state = state.replace(params={
            k: restored["params"][k] for k in state.params})
        if restored.get("opt_state") is not None:
            state = state.replace(opt_state=restored["opt_state"])
        start_epoch = int(ckpt.latest_step())
        logger.info(f"resumed from epoch {start_epoch}")

    train_step = make_train_step(mld, stage, donate=True)
    eval_step = make_eval_step(mld, stage)
    # multi-step scan program: K optimizer steps per dispatch/transfer
    # (single-device; the mesh path keeps per-step pjit programs)
    spd_cfg = cfg.train.steps_per_dispatch
    if spd_cfg == 0:  # auto: amortize the tunnel's dispatch+H2D latency
        spd_cfg = 8 if jax.default_backend() == "tpu" else 1
    spd = max(1, spd_cfg) if mesh is None else 1
    train_scan = (make_train_scan(mld, stage, donate=True)
                  if spd > 1 else None)

    # device-resident corpus: upload the whole train split to HBM once and
    # fuse batch sampling into the K-step scan (data/device_dataset.py) —
    # the steady-state loop then transfers one PRNG key per dispatch
    device_ds = None
    if (cfg.train.device_data == "on"
            and (mesh is not None
                 or stage not in ("vae", "diffusion", "vae_diffusion"))):
        # an explicit "on" must not silently fall back to the host loader
        raise ValueError(
            "train.device_data='on' is unsupported here (mesh runs keep "
            "per-step pjit programs; stage must be one of "
            "vae/diffusion/vae_diffusion) — use device_data='auto'")
    if (mesh is None and stage in ("vae", "diffusion", "vae_diffusion")
            and cfg.train.device_data != "off"):
        want = cfg.train.device_data == "on"
        auto = (cfg.train.device_data == "auto"
                and jax.default_backend() == "tpu")
        if want or auto:
            try:
                dds = dm.device_dataset("train")
            except (ValueError, KeyError, AttributeError, TypeError) as e:
                if want:
                    raise
                logger.info(f"device_data auto-off: {e}")
            else:
                gb = dds.nbytes / 2**30
                if want or gb <= cfg.train.device_data_max_gb:
                    device_ds = dds
                    logger.info(
                        f"device-resident corpus: {len(dds)} clips, "
                        f"{gb:.2f} GB in HBM, K={max(spd, 1)} "
                        f"steps/dispatch")
                else:
                    logger.info(f"device_data auto-off: corpus {gb:.2f} GB "
                                f"> max {cfg.train.device_data_max_gb} GB")
    device_scan = (make_device_train_scan(mld, stage, cfg.train.batch_size,
                                          donate=True)
                   if device_ds is not None else None)

    loader = dm.loader("train", seed=cfg.train.seed, drop_last=True)
    val_loader = dm.loader("val", shuffle=False)

    # train-time metric validation (the reference runs the full t2m metric
    # suite on the val split during training, mld.py:811-907 — FID during
    # training is the signal users train against, README.md:212)
    evaluator = None
    if cfg.logger.val_metrics and cfg.dataset.name in ("humanml3d", "kit"):
        from mld_tpu.eval.pipeline import Evaluator
        evaluator = Evaluator(cfg, mld, dm)
    best_fid = float("inf")

    step_count = 0
    for epoch in range(start_epoch, cfg.train.end_epoch):
        epoch_logs = []
        if device_ds is not None:
            # iid sampling from HBM: an "epoch" is len(split)//B optimizer
            # steps (same step budget as one host-loader pass)
            steps_left = max(len(device_ds) // cfg.train.batch_size, 1)
            if max_steps is not None:
                steps_left = min(steps_left, max_steps - step_count)
            while steps_left > 0:
                k = min(max(spd, 1), steps_left)
                rng, srng = jax.random.split(rng)
                state, logs = device_scan(state, device_ds.arrays, srng, k)
                epoch_logs.append(logs)
                step_count += k
                steps_left -= k
        else:
            for item in device_prefetch(loader, mesh, group=spd):
                rng, srng = jax.random.split(rng)
                if spd > 1:
                    kind, dbatch = item
                    if kind == "scan":
                        state, logs = train_scan(state, dbatch, srng)
                        step_count += int(
                            jax.tree_util.tree_leaves(dbatch)[0].shape[0]
                        ) - 1
                    else:
                        state, logs = train_step(state, dbatch, srng)
                else:
                    state, logs = train_step(state, item, srng)
                # keep logs as device arrays: float() here would block on
                # the async dispatch every step and serialize host and
                # device work
                epoch_logs.append(logs)
                step_count += 1
                if max_steps is not None and step_count >= max_steps:
                    break
        epoch_logs = jax.device_get(epoch_logs)
        # scan groups log (K,)-shaped entries, tail steps log scalars;
        # ravel before combining (also weights per-step correctly)
        mean_logs = ({k: float(np.concatenate(
                        [np.ravel(d[k]) for d in epoch_logs]).mean())
                      for k in epoch_logs[0]} if epoch_logs else {})
        logger.log_metrics(mean_logs, epoch, "train")
        if epoch % 10 == 0 or epoch == cfg.train.end_epoch - 1:
            logger.epoch_line(epoch, mean_logs, "train")

        if (epoch + 1) % max(cfg.logger.save_checkpoint_epoch, 1) == 0:
            ckpt.save(epoch + 1, state.params, state.opt_state)
            logger.info(f"checkpoint saved at epoch {epoch + 1}")

        if (epoch + 1) % max(cfg.logger.val_every_epochs, 1) == 0:
            val_logs = []
            for batch in val_loader:
                rng, srng = jax.random.split(rng)
                logs = eval_step(state, _device_batch(batch, mesh), srng)
                val_logs.append(logs)
            val_logs = jax.device_get(val_logs)
            if val_logs:
                mean_val = {k: float(np.mean([d[k] for d in val_logs]))
                            for k in val_logs[0]}
                logger.log_metrics(mean_val, epoch, "val")
                logger.epoch_line(epoch, mean_val, "val")

            if (evaluator is not None
                    and len(dm.dataset("val")) > cfg.eval.r_size):
                rng, mrng = jax.random.split(rng)
                eval_stage = "vae" if stage == "vae" else "diffusion"
                metric_loader = dm.loader("val", shuffle=False)
                n_val = len(dm.dataset("val"))
                try:
                    mres = evaluator.run_split(
                        full_params(state), metric_loader, mrng,
                        stage=eval_stage, metrics=tuple(cfg.eval.metrics),
                        diversity_times=min(cfg.eval.diversity_times,
                                            n_val - 1))
                except AssertionError as e:  # val split too small for R/div
                    logger.info(f"val metrics skipped: {e}")
                    mres = {}
                if mres:
                    logger.log_metrics(mres, epoch, "val")
                    logger.epoch_line(epoch, mres, "val-metrics")
                    fid = mres.get("FID")
                    if fid is not None and fid < best_fid:
                        best_fid = fid
                        ckpt.save(epoch + 1, state.params, state.opt_state)
                        _write_best(exp_dir, epoch + 1, mres)
                        logger.info(
                            f"new best FID {fid:.4f} at epoch {epoch + 1}")

        if max_steps is not None and step_count >= max_steps:
            break

    ckpt.save(cfg.train.end_epoch, state.params, state.opt_state)
    return full_params(state)


def _write_best(exp_dir: str, epoch: int, metrics: Dict):
    """Best-FID checkpoint pointer (reference keeps every ckpt and the user
    picks by val FID; we record the pointer explicitly)."""
    import json

    with open(os.path.join(exp_dir, "best_checkpoint.json"), "w") as f:
        json.dump({"epoch": epoch,
                   "checkpoint": os.path.join(exp_dir, "checkpoints",
                                              str(epoch)),
                   "metrics": {k: float(v) for k, v in metrics.items()}},
                  f, indent=2)


def _load_pretrained(path: str, params: Dict, only=None) -> Dict:
    """Load orbax dir / npz / reference torch ckpt into the param tree."""
    from mld_tpu.utils.checkpoint import (
        load_params_npz,
        load_reference_checkpoint,
    )

    if path.endswith(".npz"):
        loaded = {"params": load_params_npz(path)}
    elif path.endswith((".ckpt", ".pt", ".tar")):
        return load_reference_checkpoint(path, params)
    else:
        mgr = CheckpointManager(path)
        loaded = mgr.restore(like=params)
    new = dict(params)
    for k, v in loaded["params"].items():
        if only is None or k in only:
            new[k] = v
    return new
