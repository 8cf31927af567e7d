"""Golden-value tests: quaternion ops, FK, and the 263-dim feature codec.

Where the reference repo is available (read-only mount), its numpy/torch
implementations are imported and used as oracles — our JAX implementations
must match them numerically.
"""
import numpy as np
import pytest
import jax.numpy as jnp

from conftest import add_reference_to_path, has_reference

from mld_tpu.ops import quaternion as q
from mld_tpu.data.humanml import motion_process as mp
from mld_tpu.data.humanml.param_util import (
    T2M_KINEMATIC_CHAIN,
    T2M_RAW_OFFSETS,
)
from mld_tpu.data.humanml.skeleton import Skeleton

RNG = np.random.RandomState(0)


def rand_quat(*shape):
    v = RNG.randn(*shape, 4)
    return (v / np.linalg.norm(v, axis=-1, keepdims=True)).astype(np.float32)


class TestQuaternionOps:
    def test_qmul_qinv_identity(self):
        a = rand_quat(16)
        out = np.asarray(q.qmul(jnp.asarray(a), q.qinv(jnp.asarray(a))))
        expect = np.tile([1.0, 0, 0, 0], (16, 1))
        np.testing.assert_allclose(out, expect, atol=1e-5)

    def test_qrot_matches_matrix(self):
        a = rand_quat(8)
        v = RNG.randn(8, 3).astype(np.float32)
        out = np.asarray(q.qrot(jnp.asarray(a), jnp.asarray(v)))
        mats = np.asarray(q.quaternion_to_matrix(jnp.asarray(a)))
        expect = np.einsum("bij,bj->bi", mats, v)
        np.testing.assert_allclose(out, expect, atol=1e-5)

    def test_cont6d_roundtrip(self):
        a = rand_quat(10)
        c6 = q.quaternion_to_cont6d(jnp.asarray(a))
        m = q.cont6d_to_matrix(c6)
        expect = q.quaternion_to_matrix(jnp.asarray(a))
        np.testing.assert_allclose(np.asarray(m), np.asarray(expect), atol=1e-5)

    def test_qbetween(self):
        v0 = RNG.randn(12, 3).astype(np.float32)
        v1 = RNG.randn(12, 3).astype(np.float32)
        quat = q.qbetween(jnp.asarray(v0), jnp.asarray(v1))
        rotated = np.asarray(q.qrot(quat, jnp.asarray(v0)))
        # rotated v0 should align with v1 direction
        cos = np.sum(rotated * v1, -1) / (
            np.linalg.norm(rotated, axis=-1) * np.linalg.norm(v1, axis=-1))
        np.testing.assert_allclose(cos, 1.0, atol=1e-5)

    @pytest.mark.skipif(not has_reference(), reason="reference not mounted")
    def test_against_reference(self):
        add_reference_to_path()
        from mld.data.humanml.common import quaternion as ref_q
        import torch

        a, b = rand_quat(32), rand_quat(32)
        v = RNG.randn(32, 3).astype(np.float32)
        np.testing.assert_allclose(
            np.asarray(q.qmul(jnp.asarray(a), jnp.asarray(b))),
            ref_q.qmul(torch.tensor(a), torch.tensor(b)).numpy(), atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(q.qrot(jnp.asarray(a), jnp.asarray(v))),
            ref_q.qrot(torch.tensor(a), torch.tensor(v)).numpy(), atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(q.quaternion_to_cont6d(jnp.asarray(a))),
            ref_q.quaternion_to_cont6d(torch.tensor(a)).numpy(), atol=1e-5)
        c6 = np.asarray(q.quaternion_to_cont6d(jnp.asarray(a)))
        np.testing.assert_allclose(
            np.asarray(q.cont6d_to_matrix(jnp.asarray(c6))),
            ref_q.cont6d_to_matrix(torch.tensor(c6)).numpy(), atol=1e-5)


def synthetic_motion(T=32, J=22, seed=3):
    """Plausible joint trajectories on the canonical t2m skeleton via FK."""
    rng = np.random.RandomState(seed)
    skel = Skeleton(T2M_RAW_OFFSETS, T2M_KINEMATIC_CHAIN)
    # bone lengths from a slightly-noised canonical rest pose
    offsets = T2M_RAW_OFFSETS * (0.3 + 0.05 * rng.rand(J, 1))
    skel.set_offsets(offsets)
    # smooth small random joint rotations
    ang = np.cumsum(0.03 * rng.randn(T, J, 3), axis=0)
    half = np.linalg.norm(ang, axis=-1, keepdims=True) / 2 + 1e-8
    axis = ang / (2 * half)
    quat = np.concatenate([np.cos(half), axis * np.sin(half)], -1)
    root = np.cumsum(0.01 * rng.randn(T, 3), axis=0)
    root[:, 1] += 0.9
    joints = skel.forward_kinematics(
        jnp.asarray(quat, jnp.float32), jnp.asarray(root, jnp.float32))
    return np.asarray(joints, dtype=np.float64)


class TestCodec:
    def test_roundtrip_ric(self):
        """process_file -> recover_from_ric reproduces the canonicalized joints."""
        joints = synthetic_motion()
        feats, global_pos, _, _ = mp.process_file(
            joints, 0.002, do_uniform_skeleton=False)
        rec = np.asarray(
            mp.recover_from_ric(jnp.asarray(feats, jnp.float32), 22))
        np.testing.assert_allclose(rec, global_pos[:-1], atol=2e-3)

    def test_recover_batched_equals_single(self):
        joints = synthetic_motion()
        feats, *_ = mp.process_file(joints, 0.002, do_uniform_skeleton=False)
        f = jnp.asarray(feats, jnp.float32)
        single = mp.recover_from_ric(f, 22)
        batched = mp.recover_from_ric(f[None].repeat(3, 0), 22)
        np.testing.assert_allclose(np.asarray(batched[1]), np.asarray(single),
                                   atol=1e-6)

    @pytest.mark.skipif(not has_reference(), reason="reference not mounted")
    def test_recover_from_ric_vs_reference(self):
        add_reference_to_path()
        import torch
        from mld.data.humanml.scripts import motion_process as ref_mp

        joints = synthetic_motion(T=48)
        feats, *_ = mp.process_file(joints, 0.002, do_uniform_skeleton=False)
        ours = np.asarray(
            mp.recover_from_ric(jnp.asarray(feats, jnp.float32), 22))
        theirs = ref_mp.recover_from_ric(
            torch.tensor(feats, dtype=torch.float32), 22).numpy()
        np.testing.assert_allclose(ours, theirs, atol=1e-4)

    @pytest.mark.skipif(not has_reference(), reason="reference not mounted")
    def test_process_file_vs_reference(self):
        """Our encoder matches the reference feature extraction end-to-end."""
        add_reference_to_path()
        import torch
        from mld.data.humanml.scripts import motion_process as ref_mp
        from mld.data.humanml.common.skeleton import Skeleton as RefSkeleton
        from mld.data.humanml.utils import paramUtil

        joints = synthetic_motion(T=40)
        ours, *_ = mp.process_file(joints, 0.002, do_uniform_skeleton=False)

        # reference process_file needs module-level globals; replicate its
        # extract_features entry instead which takes everything explicitly
        theirs = ref_mp.extract_features(
            joints.copy(), 0.002, torch.from_numpy(paramUtil.t2m_raw_offsets),
            paramUtil.t2m_kinematic_chain, [2, 1, 17, 16], [8, 11], [7, 10])
        # extract_features skips canonicalization (floor/origin/Z+): run ours
        # on pre-canonicalized input for comparison
        _, global_pos, _, _ = mp.process_file(joints, 0.002,
                                              do_uniform_skeleton=False)
        ours2 = mp.process_file(global_pos, 0.002,
                                do_uniform_skeleton=False)[0]
        theirs2 = ref_mp.extract_features(
            global_pos.copy(), 0.002,
            torch.from_numpy(paramUtil.t2m_raw_offsets),
            paramUtil.t2m_kinematic_chain, [2, 1, 17, 16], [8, 11], [7, 10])
        np.testing.assert_allclose(ours2, theirs2, atol=2e-3)


class TestSkeletonFK:
    @pytest.mark.skipif(not has_reference(), reason="reference not mounted")
    def test_fk_vs_reference(self):
        add_reference_to_path()
        import torch
        from mld.data.humanml.common.skeleton import Skeleton as RefSkeleton

        quat = rand_quat(6, 22)
        root = RNG.randn(6, 3).astype(np.float32)
        offsets = (T2M_RAW_OFFSETS * 0.3).astype(np.float32)

        ours = Skeleton(T2M_RAW_OFFSETS, T2M_KINEMATIC_CHAIN)
        ours.set_offsets(offsets)
        out = np.asarray(ours.forward_kinematics(
            jnp.asarray(quat), jnp.asarray(root)))

        ref = RefSkeleton(torch.from_numpy(T2M_RAW_OFFSETS),
                          T2M_KINEMATIC_CHAIN, "cpu")
        ref.set_offset(torch.from_numpy(offsets))
        expect = ref.forward_kinematics(torch.tensor(quat),
                                        torch.tensor(root)).numpy()
        np.testing.assert_allclose(out, expect, atol=1e-4)

        c6 = np.asarray(q.quaternion_to_cont6d(jnp.asarray(quat)))
        out6 = np.asarray(ours.forward_kinematics_cont6d(
            jnp.asarray(c6), jnp.asarray(root)))
        expect6 = ref.forward_kinematics_cont6d(torch.tensor(c6),
                                                torch.tensor(root)).numpy()
        np.testing.assert_allclose(out6, expect6, atol=1e-4)
