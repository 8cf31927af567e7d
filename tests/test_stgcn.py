"""ST-GCN parity vs the reference torch implementation + UESTC metrics."""
import os
import pickle
import tempfile

import numpy as np
import pytest
import jax.numpy as jnp

from conftest import add_reference_to_path, has_reference

import mld_tpu  # noqa: F401
from mld_tpu.metrics.stgcn import UESTCMetrics
from mld_tpu.models.smpl import SMPL_PARENTS
from mld_tpu.models.uestc_stgcn import (
    STGCN,
    build_smpl_graph,
    convert_stgcn_checkpoint,
)


def _kintree_pkl(path):
    """SMPL kintree_table format: row0 = parents, row1 = joint ids."""
    kt = np.stack([np.array([2**32 - 1] + SMPL_PARENTS[1:], dtype=np.int64)
                   * 0 + np.array([0] + SMPL_PARENTS[1:]),
                   np.arange(24)])
    kt[0, 0] = -1
    with open(path, "wb") as f:
        pickle.dump(kt, f)
    return path


@pytest.mark.skipif(not has_reference(), reason="reference not mounted")
class TestSTGCNParity:
    def test_graph_matches_reference(self):
        add_reference_to_path()
        from mld.models.architectures.uestc_stgcn import Graph
        with tempfile.TemporaryDirectory() as td:
            p = _kintree_pkl(os.path.join(td, "kintree_table.pkl"))
            ref = Graph(kintree_path=p, layout="smpl", strategy="spatial")
        ours = build_smpl_graph("spatial")
        np.testing.assert_allclose(ours, ref.A, atol=1e-8)

    def test_forward_parity(self):
        add_reference_to_path()
        import torch
        from mld.models.architectures.uestc_stgcn import STGCN as RefSTGCN

        with tempfile.TemporaryDirectory() as td:
            p = _kintree_pkl(os.path.join(td, "kintree_table.pkl"))
            torch.manual_seed(0)
            ref = RefSTGCN(in_channels=6, num_class=40, kintree_path=p,
                           graph_args={"layout": "smpl",
                                       "strategy": "spatial"},
                           edge_importance_weighting=True).eval()
            ckpt_path = os.path.join(td, "stgcn.tar")
            torch.save(ref.state_dict(), ckpt_path)
            ours = convert_stgcn_checkpoint(ckpt_path, num_class=40)

        rng = np.random.RandomState(0)
        motion = rng.randn(2, 24, 6, 20).astype(np.float32)
        with torch.no_grad():
            out = ref(torch.tensor(motion))
            logits_t = out["yhat"].numpy()
            feats_t = out["features"].numpy()
        feats_j, logits_j = ours(motion)
        np.testing.assert_allclose(np.asarray(feats_j), feats_t, atol=5e-4)
        np.testing.assert_allclose(np.asarray(logits_j), logits_t, atol=5e-4)


class TestUESTCMetrics:
    def test_metrics_run(self):
        m = UESTCMetrics(num_labels=4, diversity_times=3,
                         multimodality_times=1)
        rng = np.random.RandomState(0)
        rots = rng.randn(8, 24, 6, 12).astype(np.float32)
        labels = np.array([0, 1, 2, 3, 0, 1, 2, 3])
        m.update(labels, rots, rots.copy(), [12] * 8)
        out = m.compute()
        assert out["accuracy"] == out["gt_accuracy"]
        assert np.isfinite(out["FID"])
