"""Action-to-motion family: rotation conversions, ActorVae, GRU classifier,
HumanAct12 data + metrics, end-to-end a2m pipeline."""
import os
import types

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from conftest import add_reference_to_path, has_reference

import mld_tpu  # noqa: F401
from mld_tpu.ops import rotation as rot


class TestRotationConversions:
    @pytest.mark.skipif(not has_reference(), reason="reference not mounted")
    def test_vs_reference(self):
        add_reference_to_path()
        import torch
        from mld.utils import rotation_conversions as ref

        rng = np.random.RandomState(0)
        aa = rng.randn(50, 3).astype(np.float32)
        np.testing.assert_allclose(
            np.asarray(rot.axis_angle_to_quaternion(jnp.asarray(aa))),
            ref.axis_angle_to_quaternion(torch.tensor(aa)).numpy(),
            atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(rot.axis_angle_to_matrix(jnp.asarray(aa))),
            ref.axis_angle_to_matrix(torch.tensor(aa)).numpy(), atol=1e-5)
        m = ref.axis_angle_to_matrix(torch.tensor(aa))
        np.testing.assert_allclose(
            np.asarray(rot.matrix_to_rotation_6d(jnp.asarray(m.numpy()))),
            ref.matrix_to_rotation_6d(m).numpy(), atol=1e-6)
        d6 = ref.matrix_to_rotation_6d(m).numpy()
        np.testing.assert_allclose(
            np.asarray(rot.rotation_6d_to_matrix(jnp.asarray(d6))),
            ref.rotation_6d_to_matrix(torch.tensor(d6)).numpy(), atol=1e-5)

    def test_roundtrips(self):
        rng = np.random.RandomState(1)
        aa = rng.randn(30, 3).astype(np.float32)
        q = rot.axis_angle_to_quaternion(jnp.asarray(aa))
        back = rot.quaternion_to_axis_angle(q)
        np.testing.assert_allclose(np.asarray(back), aa, atol=1e-4)
        m = rot.axis_angle_to_matrix(jnp.asarray(aa))
        q2 = rot.matrix_to_quaternion(m)
        np.testing.assert_allclose(np.abs(np.asarray(q2)),
                                   np.abs(np.asarray(q)), atol=1e-4)


@pytest.mark.skipif(not has_reference(), reason="reference not mounted")
class TestActorVaeParity:
    def test_encode_decode(self):
        add_reference_to_path()
        import torch
        from mld.models.architectures.actor_vae import ActorVae as RefVae
        from mld_tpu.models.actor_vae import ActorVae
        from mld_tpu.utils.torch_convert import torch_state_dict_to_flax

        torch.manual_seed(0)
        abl = types.SimpleNamespace(MLP_DIST=False, PE_TYPE="actor")
        NF, D = 24, 32
        ref = RefVae(abl, nfeats=NF, latent_dim=[1, D], ff_size=64,
                     num_layers=2, num_heads=4, dropout=0.0,
                     activation="gelu")
        ref.eval()
        ours = ActorVae(nfeats=NF, latent_size=1, latent_dim=D, ff_size=64,
                        num_layers=2, num_heads=4, dropout=0.0)
        params = torch_state_dict_to_flax(ref.state_dict())

        B, T = 2, 12
        lengths = [12, 7]
        feats = np.random.RandomState(0).randn(B, T, NF).astype(np.float32)
        mask = np.arange(T)[None] < np.asarray(lengths)[:, None]
        feats = feats * mask[..., None]

        with torch.no_grad():
            dist = ref.encoder(torch.tensor(feats), lengths)
            mu_t = dist.loc.numpy()
            z = dist.loc[None]
            out_t = ref.decode(z, lengths).numpy()

        (_, (mu_j, logvar_j)) = ours.apply(
            {"params": params}, jnp.asarray(feats), jnp.asarray(mask),
            method=ours.encode, sample_mean=True)
        np.testing.assert_allclose(np.asarray(mu_j)[:, 0], mu_t, atol=2e-4)

        out_j = ours.apply({"params": params}, jnp.asarray(mu_j),
                           jnp.asarray(mask), method=ours.decode)
        np.testing.assert_allclose(np.asarray(out_j), out_t, atol=2e-4)


@pytest.mark.skipif(not has_reference(), reason="reference not mounted")
class TestHumanActGRUParity:
    def test_classifier(self):
        add_reference_to_path()
        import torch
        from mld.models.architectures.humanact12_gru import (
            MotionDiscriminator as RefDisc)
        from mld_tpu.models.humanact12_gru import (
            MotionDiscriminator,
            convert_humanact12_checkpoint)

        torch.manual_seed(0)
        ref = RefDisc(input_size=72, hidden_size=16, hidden_layer=2,
                      output_size=12).eval()
        B, T = 3, 10
        rng = np.random.RandomState(0)
        motion = rng.randn(B, 24, 3, T).astype(np.float32)
        lengths = torch.tensor([10, 6, 3])
        h0 = torch.zeros(2, B, 16)
        with torch.no_grad():
            out_t = ref(torch.tensor(motion), lengths, h0).numpy()

        state = {"model": ref.state_dict()}
        import tempfile, os
        with tempfile.TemporaryDirectory() as td:
            p = os.path.join(td, "m.tar")
            torch.save(state, p)
            params = convert_humanact12_checkpoint(p)
        ours = MotionDiscriminator(input_size=72, hidden_size=16,
                                   hidden_layers=2, output_size=12)
        # [B, 24, 3, T] -> [B, T, 72]
        motion_j = motion.reshape(B, 72, T).transpose(0, 2, 1)
        out_j = ours.apply({"params": params}, jnp.asarray(motion_j),
                           jnp.asarray([10, 6, 3]))
        np.testing.assert_allclose(np.asarray(out_j), out_t, atol=1e-4)


class TestA2MEndToEnd:
    def test_humanact12_pipeline(self, tmp_path):
        from mld_tpu.config import load_config
        from mld_tpu.data.datamodule import get_datamodule
        from mld_tpu.metrics.gru import HUMANACTMetrics
        from mld_tpu.models.mld import MLD
        from mld_tpu.train.steps import create_train_state, make_train_step

        cfg = load_config(None, {
            "debug": True,
            "model": {"latent_dim": 32, "ff_size": 64, "num_layers": 3,
                      "denoiser_num_layers": 3, "num_heads": 4,
                      "scheduler": {"num_inference_timesteps": 3}},
            "dataset": {"root": str(tmp_path / "ha12"), "num_frames": 16,
                        "max_motion_len": 16},
            "train": {"stage": "diffusion", "batch_size": 4},
        }, preset="mld_humanact12")
        mld = MLD(cfg)
        assert mld.condition == "action"
        params = mld.init_params(jax.random.PRNGKey(0))

        dm = get_datamodule(cfg)
        batch = next(iter(dm.loader("train", batch_size=4)))
        assert batch["motion"].shape == (4, 16, 150)

        # diffusion train step with action conditioning
        state = create_train_state(mld, params, "diffusion")
        step = make_train_step(mld, "diffusion", donate=False)
        jb = {k: jnp.asarray(batch[k]) for k in ("motion", "mask", "action")}
        state, logs = step(state, jb, jax.random.PRNGKey(0))
        assert np.isfinite(float(logs["total"]))

        # generation from action ids
        actions = jnp.asarray([0, 5], jnp.int32)
        mask = jnp.ones((2, 16), bool)
        feats = mld.generate_feats(params, actions, mask,
                                   jax.random.PRNGKey(1))
        assert feats.shape == (2, 16, 150)

        # joints + metrics
        joints = mld.feats2joints(feats, mask)
        assert joints.shape == (2, 16, 24, 3)
        metr = HUMANACTMetrics(num_labels=12, diversity_times=2,
                               multimodality_times=1)
        metr.update(np.asarray([0, 5]), np.asarray(joints),
                    np.asarray(joints), [16, 16])
        out = metr.compute()
        assert out["gt_accuracy"] == out["accuracy"]
        assert np.isfinite(out["FID"])


class TestA2MEvaluation:
    """The a2m evaluation protocol end-to-end (reference test.py:116-139 +
    mld.py:710-770 a2m_eval): CLI-reachable, accuracy/FID through the
    frozen classifiers."""

    def _overrides(self, tmp_path, name="humanact12"):
        return {
            "debug": True,
            "model": {"latent_dim": 32, "ff_size": 64, "num_layers": 3,
                      "denoiser_num_layers": 3, "num_heads": 4,
                      "scheduler": {"num_inference_timesteps": 3}},
            "dataset": {"root": str(tmp_path / name), "num_frames": 16,
                        "max_motion_len": 16},
            "train": {"stage": "diffusion"},
            "eval": {"batch_size": 8, "diversity_times": 4,
                     "mm_num_times": 2},
            "test": {"replication_times": 1},
            "logger": {"folder": str(tmp_path / "exp"),
                       "tensorboard": False},
        }

    def test_evaluator_a2m_humanact12(self, tmp_path):
        from mld_tpu.config import load_config
        from mld_tpu.data.datamodule import get_datamodule
        from mld_tpu.eval.pipeline import Evaluator
        from mld_tpu.models.mld import MLD

        cfg = load_config(None, self._overrides(tmp_path),
                          preset="mld_humanact12")
        mld = MLD(cfg)
        dm = get_datamodule(cfg)
        params = mld.init_params(jax.random.PRNGKey(0))
        ev = Evaluator(cfg, mld, dm)
        assert ev.is_a2m and ev.bundle is None
        res = ev.run(params, jax.random.PRNGKey(0), replication_times=1,
                     stage="diffusion")
        for key in ("accuracy", "gt_accuracy", "FID", "Diversity"):
            assert key in res, f"missing {key}: {sorted(res)}"
            assert np.isfinite(res[key])
        assert 0.0 <= res["accuracy"] <= 1.0
        # vae-stage (reconstruction) protocol also reachable
        res_vae = ev.run(params, jax.random.PRNGKey(1),
                         replication_times=1, stage="vae")
        assert np.isfinite(res_vae["FID"])

    def test_evaluator_a2m_uestc_stgcn(self, tmp_path):
        from mld_tpu.config import load_config
        from mld_tpu.data.datamodule import get_datamodule
        from mld_tpu.eval.pipeline import Evaluator
        from mld_tpu.models.mld import MLD

        over = self._overrides(tmp_path, "uestc")
        cfg = load_config(None, over, preset="mld_uestc")
        mld = MLD(cfg)
        dm = get_datamodule(cfg)
        params = mld.init_params(jax.random.PRNGKey(0))
        ev = Evaluator(cfg, mld, dm)
        res = ev.run(params, jax.random.PRNGKey(0), replication_times=1,
                     stage="diffusion")
        assert "accuracy" in res and np.isfinite(res["FID"])

    def test_a2m_cli(self, tmp_path):
        """`python test.py --preset mld_humanact12` must work (round-3
        verdict: the tokenizer dereference crashed action presets)."""
        import json
        import subprocess
        import sys
        from conftest import REPO_ROOT

        cfg_path = tmp_path / "a2m.yaml"
        out_path = tmp_path / "res.json"
        cfg_path.write_text(json.dumps(self._overrides(tmp_path)))
        env = dict(os.environ, JAX_PLATFORMS="cpu")
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO_ROOT, "test.py"),
             "--preset", "mld_humanact12", "--cfg", str(cfg_path),
             "--replication", "1", "--no_mm", "--out", str(out_path)],
            capture_output=True, text=True, timeout=900, env=env,
            cwd=REPO_ROOT)
        assert proc.returncode == 0, proc.stderr[-2000:]
        res = json.loads(out_path.read_text())
        assert "accuracy" in res and "FID" in res

    def test_demo_action_task(self, tmp_path):
        """demo.py --task action --action 3 7 ergonomics (host path)."""
        from mld_tpu.config import load_config
        from mld_tpu.models.mld import MLD

        cfg = load_config(None, self._overrides(tmp_path),
                          preset="mld_humanact12")
        mld = MLD(cfg)
        params = mld.init_params(jax.random.PRNGKey(0))
        outs = mld.generate_action(params, [3, 7], jax.random.PRNGKey(0))
        assert len(outs) == 2 and outs[0].shape == (16, 24, 3)
        outs2 = mld.generate_action(params, [1], jax.random.PRNGKey(0),
                                    lengths=[12])
        assert outs2[0].shape == (12, 24, 3)
