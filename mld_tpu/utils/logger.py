"""Experiment logging: folder discipline + JSONL + optional TensorBoard.

Parity target: mld/utils/logger.py:9-72 + callback/progress.py:10-55 —
per-experiment folder FOLDER/model_type/NAME with a timestamped log file and
a saved config snapshot; epoch-end metric lines with memory usage.
"""
from __future__ import annotations

import json
import logging
import os
import time
from typing import Dict


def create_experiment_dir(folder: str, model_type: str, name: str,
                          phase: str = "train") -> str:
    exp_dir = os.path.join(folder, model_type, name)
    os.makedirs(exp_dir, exist_ok=True)
    return exp_dir


class ExperimentLogger:
    def __init__(self, exp_dir: str, cfg=None, phase: str = "train",
                 tensorboard: bool = True):
        self.exp_dir = exp_dir
        os.makedirs(exp_dir, exist_ok=True)
        stamp = time.strftime("%Y-%m-%dT%H-%M-%S")
        self.log_path = os.path.join(exp_dir, f"{stamp}_{phase}.log")
        self.metrics_path = os.path.join(exp_dir, "metrics.jsonl")

        self.logger = logging.getLogger(f"mld_tpu.{exp_dir}")
        self.logger.setLevel(logging.INFO)
        self.logger.handlers.clear()
        fmt = logging.Formatter("%(asctime)s %(message)s")
        fh = logging.FileHandler(self.log_path)
        fh.setFormatter(fmt)
        sh = logging.StreamHandler()
        sh.setFormatter(fmt)
        self.logger.addHandler(fh)
        self.logger.addHandler(sh)

        if cfg is not None:
            self._dump_config(cfg, phase)

        self._tb = None
        if tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter
                self._tb = SummaryWriter(os.path.join(exp_dir, "tb"))
            except Exception:
                self._tb = None
        # optional W&B (train.py:63-82 parity); silently off when absent
        self._wandb = None
        if os.environ.get("WANDB_PROJECT"):
            try:
                import wandb
                self._wandb = wandb.init(
                    project=os.environ["WANDB_PROJECT"],
                    dir=exp_dir, resume="allow",
                    id=os.environ.get("WANDB_RESUME_ID"))
            except Exception:
                self._wandb = None

    def _dump_config(self, cfg, phase):
        import dataclasses
        import yaml
        path = os.path.join(self.exp_dir,
                            f"config_{phase}_{int(time.time())}.yaml")
        data = (dataclasses.asdict(cfg) if dataclasses.is_dataclass(cfg)
                else dict(cfg))
        with open(path, "w") as f:
            yaml.safe_dump(data, f)

    def info(self, msg: str):
        self.logger.info(msg)

    def log_metrics(self, metrics: Dict, step: int, split: str = "train"):
        rec = {"step": int(step), "split": split,
               **{k: float(v) for k, v in metrics.items()}}
        with open(self.metrics_path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        if self._tb is not None:
            for k, v in metrics.items():
                self._tb.add_scalar(f"{k}/{split}", float(v), step)
        if self._wandb is not None:
            self._wandb.log({f"{k}/{split}": float(v)
                             for k, v in metrics.items()}, step=step)

    def epoch_line(self, epoch: int, metrics: Dict, split: str = "train"):
        try:
            import psutil
            mem = psutil.Process().memory_info().rss / 2 ** 30
            memline = f" mem={mem:.2f}GiB"
        except Exception:
            memline = ""
        parts = " ".join(f"{k}={float(v):.5f}" for k, v in metrics.items())
        self.info(f"epoch {epoch} [{split}] {parts}{memline}")
