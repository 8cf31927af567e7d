"""UESTC a2m metrics via the frozen ST-GCN classifier.

Parity target: mld/models/metrics/stgcn.py:13-180 — accuracy + FID +
diversity + per-class multimodality over rot6d rotations [B, 23/24, 6, T].
"""
from __future__ import annotations

from typing import Callable, List, Optional

import numpy as np

from mld_tpu.models.uestc_stgcn import STGCN
from .utils import (
    activation_statistics,
    calculate_diversity,
    calculate_multimodality,
    frechet_distance,
)


class UESTCMetrics:
    def __init__(self, classifier: Optional[STGCN] = None,
                 num_labels: int = 40, diversity_times: int = 200,
                 multimodality_times: int = 20,
                 sync: Optional[Callable] = None):
        self.classifier = classifier or STGCN.init_random(num_labels)
        self.num_labels = num_labels
        self.diversity_times = diversity_times
        self.multimodality_times = multimodality_times
        self.sync = sync
        self.reset()

    @classmethod
    def from_checkpoint(cls, tar_path: str, num_labels: int = 40, **kw):
        from mld_tpu.models.uestc_stgcn import convert_stgcn_checkpoint
        return cls(convert_stgcn_checkpoint(tar_path, num_labels),
                   num_labels, **kw)

    def reset(self):
        self.count = 0
        self.count_seq = 0
        self.confusion = np.zeros((self.num_labels, self.num_labels), int)
        self.gt_confusion = np.zeros((self.num_labels, self.num_labels), int)
        self.labels: List[np.ndarray] = []
        self.rec_feats: List[np.ndarray] = []
        self.gt_feats: List[np.ndarray] = []

    def update(self, labels, rots_rst, rots_ref, lengths):
        """labels [B]; rots_* [B, V, 6, T] rot6d (reference layout)."""
        labels = np.asarray(labels).reshape(-1).astype(int)
        self.count += int(np.sum(lengths))
        self.count_seq += len(labels)
        for rots, conf, cache in ((rots_rst, self.confusion, self.rec_feats),
                                  (rots_ref, self.gt_confusion,
                                   self.gt_feats)):
            feats, logits = self.classifier(np.asarray(rots))
            pred = np.asarray(logits).argmax(-1)
            for y, p in zip(labels, pred):
                conf[y, p] += 1
            cache.append(np.asarray(feats))
        self.labels.append(labels)

    def compute(self, rng: Optional[np.random.RandomState] = None) -> dict:
        rng = rng or np.random.RandomState(0)
        caches = [self.labels, self.rec_feats, self.gt_feats]
        if self.sync is not None:
            caches = [self.sync(c) for c in caches]
        labels = np.concatenate(caches[0])
        gen = np.concatenate(caches[1], 0)
        gt = np.concatenate(caches[2], 0)

        metrics = {
            "accuracy": np.trace(self.confusion) / max(
                self.confusion.sum(), 1),
            "gt_accuracy": np.trace(self.gt_confusion) / max(
                self.gt_confusion.sum(), 1),
        }
        mu, cov = activation_statistics(gen)
        gt_mu, gt_cov = activation_statistics(gt)
        metrics["FID"] = frechet_distance(gt_mu, gt_cov, mu, cov)

        if len(gen) > self.diversity_times:
            metrics["Diversity"] = calculate_diversity(
                gen, self.diversity_times, rng)
            metrics["gt_Diversity"] = calculate_diversity(
                gt, self.diversity_times, rng)
        counts = np.bincount(labels, minlength=self.num_labels)
        min_count = counts[counts > 0].min() if (counts > 0).any() else 0
        if min_count > self.multimodality_times:
            grouped = np.stack([gen[labels == c][:min_count]
                                for c in range(self.num_labels)
                                if counts[c] > 0])
            metrics["Multimodality"] = calculate_multimodality(
                grouped, self.multimodality_times, rng)
        return {k: float(v) for k, v in metrics.items()}
