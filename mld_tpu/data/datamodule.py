"""Data modules: dataset wiring + dual normalization + loaders.

Parity target: mld/data/get_data.py:12-142 + mld/data/HumanML3D.py /
mld/data/Kit.py — the model-space Mean/Std vs evaluator-space mean/std
"dual normalization trick", WordVectorizer wiring, per-split loaders, and
the mm_mode sample-list swap for MultiModality evaluation.
"""
from __future__ import annotations

import os
from os.path import join as pjoin
from typing import Optional

import numpy as np

from mld_tpu.config import Config
from .collate import MldCollator
from .dataset import DataLoader, Text2MotionDataset
from .word_vectorizer import WordVectorizer


class HumanML3DDataModule:
    name = "humanml3d"

    def __init__(self, cfg: Config, tokenizer=None,
                 synthesize_if_missing: bool = True):
        self.cfg = cfg
        ds = cfg.dataset
        self.root = ds.root
        self.njoints = ds.njoints

        from .synthetic import SYNTH_VERSION
        stamp = pjoin(self.root, ".synth_version")
        # a stamped tree is an auto-built synthetic corpus; rebuild it when
        # the generator semantics changed (real datasets never carry the
        # stamp and are never touched)
        stale = (os.path.exists(stamp)
                 and open(stamp).read().strip() != str(SYNTH_VERSION))
        if not os.path.exists(pjoin(self.root, "Mean.npy")) or stale:
            if synthesize_if_missing:
                from .synthetic import build_synthetic_dataset
                n = 64 if cfg.debug else 256
                build_synthetic_dataset(self.root, n_samples=n,
                                        dataset=self.name)
            else:
                raise FileNotFoundError(
                    f"dataset not found at {self.root}")

        self.mean = np.load(pjoin(self.root, "Mean.npy"))
        self.std = np.load(pjoin(self.root, "Std.npy"))
        # evaluator-space stats (t2m meta); fall back to model stats
        t2m_meta = pjoin(cfg.model.t2m_path, "t2m", "Comp_v6_KLD01", "meta")
        if os.path.exists(pjoin(t2m_meta, "mean.npy")):
            self.mean_eval = np.load(pjoin(t2m_meta, "mean.npy"))
            self.std_eval = np.load(pjoin(t2m_meta, "std.npy"))
        else:
            self.mean_eval, self.std_eval = self.mean, self.std

        self.w_vectorizer = WordVectorizer(ds.word_vectorizer_path, "our_vab")
        self.use_native = False
        if ds.native_loader:
            try:
                from .collate import NativeMldCollator
                self.collate = NativeMldCollator(
                    ds.max_motion_len, self.mean, self.std, tokenizer)
                self.use_native = True
            except Exception:
                pass
        if not self.use_native:
            self.collate = MldCollator(ds.max_motion_len, tokenizer)
        self._datasets = {}
        self.is_mm = False
        self._mm_backup = None
        self.nfeats = ds.nfeats

    def _make(self, split: str, tiny=False, eval_embeddings=None):
        ds = self.cfg.dataset
        from .dataset import Text2MotionDatasetLazy
        cls = Text2MotionDatasetLazy if self.use_native \
            else Text2MotionDataset
        if eval_embeddings is None:
            # GloVe/POS features feed the t2m evaluators only; the train
            # split skips them (dominant host cost of the training loop)
            eval_embeddings = split != "train"
        return cls(
            self.root, split, self.mean, self.std, self.w_vectorizer,
            max_motion_length=ds.max_motion_len,
            min_motion_length=ds.min_motion_len,
            max_text_len=ds.max_text_len, unit_length=ds.unit_len,
            fps=ds.frame_rate, tiny=tiny, debug=self.cfg.debug,
            with_eval_embeddings=eval_embeddings)

    def eval_embedding_loader(self, split: str = "train",
                              batch_size: Optional[int] = None,
                              seed: int = 0, shuffle: bool = True,
                              drop_last: bool = True) -> "DataLoader":
        """Loader whose items carry GloVe/POS eval embeddings regardless
        of split — used by contrastive t2m-evaluator training
        (eval/t2m_train.py)."""
        if batch_size is None:
            batch_size = self.cfg.train.batch_size
        return DataLoader(self._make(split, eval_embeddings=True),
                          batch_size, self.collate, shuffle=shuffle,
                          seed=seed, drop_last=drop_last)

    def device_dataset(self, split: str = "train", max_captions: int = 8):
        """Whole-split corpus resident in device memory with on-device
        batch sampling (data/device_dataset.py) — the TPU-native
        replacement for the streaming loader on single-device training."""
        from .dataset import Text2MotionDataset
        from .device_dataset import DeviceDataset
        ds = self.cfg.dataset
        host = Text2MotionDataset(
            self.root, split, self.mean, self.std, None,
            max_motion_length=ds.max_motion_len,
            min_motion_length=ds.min_motion_len,
            max_text_len=ds.max_text_len, unit_length=ds.unit_len,
            fps=ds.frame_rate, debug=self.cfg.debug,
            with_eval_embeddings=False)
        return DeviceDataset(host, self.collate.tokenizer,
                             max_len=ds.max_motion_len, unit=ds.unit_len,
                             max_captions=max_captions)

    def dataset(self, split: str):
        if split not in self._datasets:
            self._datasets[split] = self._make(split)
        return self._datasets[split]

    def loader(self, split: str, batch_size: Optional[int] = None,
               shuffle: Optional[bool] = None, seed: int = 0,
               drop_last: bool = False,
               prefetch: Optional[int] = None) -> DataLoader:
        if batch_size is None:
            batch_size = (self.cfg.train.batch_size if split == "train"
                          else self.cfg.eval.batch_size)
        if self.is_mm:
            batch_size = 1  # data/base.py:100-107 mm override
        if shuffle is None:
            shuffle = split == "train"
        if prefetch is None:
            prefetch = 3 if split == "train" else 0
        if prefetch > 0:
            from .dataset import PrefetchDataLoader
            return PrefetchDataLoader(
                self.dataset(split), batch_size, self.collate,
                shuffle=shuffle, seed=seed, drop_last=drop_last,
                prefetch=prefetch)
        return DataLoader(self.dataset(split), batch_size, self.collate,
                          shuffle=shuffle, seed=seed, drop_last=drop_last)

    # ------------------------------------------------------------- transforms
    def feats2joints_np(self, feats: np.ndarray) -> np.ndarray:
        from .humanml.motion_process import recover_from_ric
        import jax.numpy as jnp
        feats = feats * self.std + self.mean
        return np.asarray(recover_from_ric(jnp.asarray(feats, jnp.float32),
                                           self.njoints))

    def renorm4t2m_np(self, feats: np.ndarray) -> np.ndarray:
        feats = feats * self.std + self.mean
        return (feats - self.mean_eval) / self.std_eval

    # ---------------------------------------------------------------- mm mode
    def mm_mode(self, on: bool = True, mm_num_samples: int = 100,
                rng: Optional[np.random.RandomState] = None):
        """Restrict the test set to a random sample subset for MultiModality
        (HumanML3D.py:64-75)."""
        test = self.dataset("test")
        if on:
            rng = rng or np.random.RandomState(0)
            self._mm_backup = list(test.name_list)
            n = min(mm_num_samples, len(test.name_list))
            chosen = rng.choice(len(test.name_list), n, replace=False)
            test.name_list = [self._mm_backup[i] for i in chosen]
            self.is_mm = True
        else:
            if self._mm_backup is not None:
                test.name_list = self._mm_backup
            self.is_mm = False


class KitDataModule(HumanML3DDataModule):
    name = "kit"


def get_datamodule(cfg: Config, tokenizer=None):
    name = cfg.dataset.name.lower()
    if name == "humanml3d":
        return HumanML3DDataModule(cfg, tokenizer)
    if name == "kit":
        return KitDataModule(cfg, tokenizer)
    if name in ("humanact12", "uestc"):
        from .a2m import get_a2m_datamodule
        return get_a2m_datamodule(cfg)
    raise ValueError(f"dataset {name} not supported")
