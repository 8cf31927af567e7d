"""KIT-ML and UESTC dataset-family coverage."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

import mld_tpu  # noqa: F401
from mld_tpu.config import load_config
from mld_tpu.data.datamodule import get_datamodule
from mld_tpu.models.mld import MLD, lengths_to_mask


class TestKit:
    def test_kit_pipeline(self, tmp_path):
        cfg = load_config(None, {
            "debug": True,
            "model": {"latent_dim": 32, "ff_size": 64, "num_layers": 3,
                      "denoiser_num_layers": 3, "num_heads": 4,
                      "text_encoded_dim": 32, "clip_layers": 2,
                      "clip_heads": 2,
                      "scheduler": {"num_inference_timesteps": 3}},
            "dataset": {"root": str(tmp_path / "kit"), "max_motion_len": 48,
                        "min_motion_len": 16},
        }, preset="mld_kit")
        assert cfg.dataset.nfeats == 251 and cfg.dataset.njoints == 21

        mld = MLD(cfg)
        dm = get_datamodule(cfg, tokenizer=mld.tokenizer)
        mld.mean = jnp.asarray(dm.mean, jnp.float32)
        mld.std = jnp.asarray(dm.std, jnp.float32)
        batch = next(iter(dm.loader("train", batch_size=3)))
        assert batch["motion"].shape == (3, 48, 251)

        params = mld.init_params(jax.random.PRNGKey(0))
        mask = lengths_to_mask(jnp.asarray([48, 32, 20]), 48)
        joints = mld.generate_joints(params, jnp.asarray(
            batch["text_ids"][:3]), mask, jax.random.PRNGKey(1))
        assert joints.shape == (3, 48, 21, 3)
        assert np.isfinite(np.asarray(joints)).all()


class TestUestc:
    def test_uestc_metrics_pipeline(self, tmp_path):
        from mld_tpu.metrics.stgcn import UESTCMetrics
        cfg = load_config(None, {
            "debug": True,
            "model": {"latent_dim": 32, "ff_size": 64, "num_layers": 3,
                      "denoiser_num_layers": 3, "num_heads": 4,
                      "scheduler": {"num_inference_timesteps": 2}},
            "dataset": {"root": str(tmp_path / "uestc"), "num_frames": 12,
                        "max_motion_len": 12},
            "train": {"stage": "diffusion", "batch_size": 4},
        }, preset="mld_uestc")
        mld = MLD(cfg)
        dm = get_datamodule(cfg)
        batch = next(iter(dm.loader("train", batch_size=4)))
        assert batch["motion"].shape == (4, 12, 150)

        params = mld.init_params(jax.random.PRNGKey(0))
        actions = jnp.asarray(batch["action"][:2])
        mask = jnp.ones((2, 12), bool)
        feats = mld.generate_feats(params, actions, mask,
                                   jax.random.PRNGKey(0))
        # reference metric layout: [B, 25, 6, T] -> rotations only [:, :-1]
        rots = np.asarray(feats).reshape(2, 12, 25, 6).transpose(
            0, 2, 3, 1)[:, :-1]
        m = UESTCMetrics(num_labels=40, diversity_times=1,
                         multimodality_times=1)
        m.update(np.asarray(actions), rots, rots.copy(), [12, 12])
        out = m.compute()
        assert np.isfinite(out["FID"])
        assert out["accuracy"] == out["gt_accuracy"]
