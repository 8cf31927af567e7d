"""Metric suite tests: analytic properties + reference parity where torch
suffices (torchmetrics isn't installed, so reference Metric classes can't be
instantiated — the math helpers can)."""
import numpy as np
import pytest
import jax.numpy as jnp

from conftest import add_reference_to_path, has_reference

import mld_tpu  # noqa: F401
from mld_tpu.metrics.compute import ComputeMetrics
from mld_tpu.metrics.mm import MMMetrics
from mld_tpu.metrics.mr import MRMetrics
from mld_tpu.metrics.tm2t import TM2TMetrics
from mld_tpu.metrics.uncond import UncondMetrics, calculate_kid
from mld_tpu.metrics.utils import (
    calc_mpjpe,
    calc_pampjpe,
    euclidean_distance_matrix,
    frechet_distance,
)
from mld_tpu.transforms.rifke import Rifke


class TestAnalytic:
    def test_r_precision_perfect_match(self):
        rng = np.random.RandomState(0)
        emb = rng.randn(96, 32).astype(np.float32)
        m = TM2TMetrics(diversity_times=30)
        m.update(emb, emb, emb, np.ones(96, int) * 10)
        out = m.compute()
        assert out["R_precision_top_1"] == 1.0
        assert out["Matching_score"] == pytest.approx(0.0, abs=1e-2)
        assert out["FID"] == pytest.approx(0.0, abs=1e-3)

    def test_fid_shifted_gaussian(self):
        rng = np.random.RandomState(0)
        a = rng.randn(4000, 8)
        b = rng.randn(4000, 8) + 2.0
        mu1, cov1 = a.mean(0), np.cov(a, rowvar=False)
        mu2, cov2 = b.mean(0), np.cov(b, rowvar=False)
        fid = frechet_distance(mu1, cov1, mu2, cov2)
        assert fid == pytest.approx(8 * 4.0, rel=0.1)  # ||mu||^2 = d*2^2

    def test_kid_same_distribution_near_zero(self):
        rng = np.random.RandomState(0)
        a = rng.randn(500, 16)
        b = rng.randn(500, 16)
        mean, _ = calculate_kid(a, b, n_subsets=10, subset_size=100)
        assert abs(mean) < 0.05

    def test_mm_metric(self):
        m = MMMetrics(mm_num_times=5)
        rng = np.random.RandomState(0)
        for _ in range(4):
            m.update(rng.randn(1, 10, 16), [1])
        out = m.compute()
        assert out["MultiModality"] > 0

    def test_uncond_metrics(self):
        rng = np.random.RandomState(0)
        m = UncondMetrics(diversity_times=50)
        m.update(rng.randn(400, 16), np.ones(400, int),
                 rng.randn(400, 16))
        out = m.compute()
        assert np.isfinite(list(out.values())).all()

    def test_mr_metrics_zero_for_identical(self):
        m = MRMetrics()
        joints = np.random.RandomState(0).randn(2, 20, 22, 3)
        m.update(joints, joints.copy(), [20, 15])
        out = m.compute()
        assert out["MPJPE"] == pytest.approx(0.0, abs=1e-6)
        assert out["PAMPJPE"] == pytest.approx(0.0, abs=1e-4)

    def test_temos_metrics_zero_for_identical(self):
        m = ComputeMetrics(njoints=22, jointstype="humanml3d")
        rng = np.random.RandomState(0)
        joints = rng.randn(2, 24, 22, 3) * 0.3
        m.update(joints, joints.copy(), [24, 18])
        out = m.compute()
        for k, v in out.items():
            assert v == pytest.approx(0.0, abs=1e-5), k


@pytest.mark.skipif(not has_reference(), reason="reference not mounted")
class TestReferenceParity:
    def test_mpjpe_pampjpe(self):
        add_reference_to_path()
        import torch
        from mld.models.metrics.utils import calc_mpjpe as ref_mpjpe
        from mld.models.metrics.utils import calc_pampjpe as ref_pampjpe

        rng = np.random.RandomState(0)
        pred = rng.randn(6, 22, 3).astype(np.float32)
        gt = rng.randn(6, 22, 3).astype(np.float32)
        np.testing.assert_allclose(
            calc_mpjpe(pred, gt),
            ref_mpjpe(torch.tensor(pred), torch.tensor(gt)).numpy(),
            atol=1e-5)
        ours = calc_pampjpe(pred, gt)
        theirs = ref_pampjpe(torch.tensor(pred),
                             torch.tensor(gt)).numpy()
        np.testing.assert_allclose(ours.mean(), theirs.mean(), atol=1e-4)

    def test_rifke_parity(self):
        add_reference_to_path()
        import torch
        from mld.transforms.joints2jfeats import Rifke as RefRifke

        rng = np.random.RandomState(1)
        joints = rng.randn(2, 16, 22, 3).astype(np.float32) * 0.4
        ref = RefRifke(jointstype="humanml3d", normalization=False)
        feats_ref = ref(torch.tensor(joints)).numpy()
        feats_j = np.asarray(Rifke("humanml3d")(jnp.asarray(joints)))
        np.testing.assert_allclose(feats_j, feats_ref, atol=2e-5)
        # inverse roundtrip
        back = np.asarray(Rifke("humanml3d").inverse(jnp.asarray(feats_j)))
        back_ref = ref.inverse(torch.tensor(feats_ref)).numpy()
        np.testing.assert_allclose(back, back_ref, atol=2e-4)

    def test_euclidean_distance_matrix_parity(self):
        add_reference_to_path()
        import torch
        from mld.models.metrics.utils import (
            euclidean_distance_matrix as ref_edm)
        rng = np.random.RandomState(0)
        a = rng.randn(10, 8).astype(np.float32)
        b = rng.randn(12, 8).astype(np.float32)
        np.testing.assert_allclose(
            euclidean_distance_matrix(a, b),
            ref_edm(torch.tensor(a), torch.tensor(b)).numpy(), atol=2e-4)
