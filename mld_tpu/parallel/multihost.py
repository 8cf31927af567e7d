"""Multi-host helpers: cross-process metric-cache gather.

The reference syncs metric state with torchmetrics dist_sync (all-gather of
cached embedding lists, tm2t.py:73-75). TPU-native equivalent: gather
per-host numpy caches over DCN with `multihost_utils.process_allgather`
before host-side FID — plug the returned callable into any metric
accumulator's `sync=` hook.
"""
from __future__ import annotations

from typing import List

import jax
import numpy as np


def make_metric_sync():
    """Returns sync(list_of_arrays) -> gathered list across processes.

    Identity on single-process runs (the common single-host case).
    """
    if jax.process_count() == 1:
        return lambda cache: cache

    from jax.experimental import multihost_utils

    def sync(cache: List[np.ndarray]) -> List[np.ndarray]:
        if not cache:
            return cache
        local = np.concatenate([np.asarray(c) for c in cache], axis=0)
        gathered = multihost_utils.process_allgather(local)
        # [n_process, n_local, ...] -> flat list
        return [gathered.reshape((-1,) + gathered.shape[2:])]

    return sync
