"""CLI-level integration: train loop + checkpoint/resume + demo + eval."""
import json
import os
import subprocess
import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from conftest import REPO_ROOT

import mld_tpu  # noqa: F401
from mld_tpu.config import load_config
from mld_tpu.data.datamodule import get_datamodule
from mld_tpu.data.synthetic import build_synthetic_dataset
from mld_tpu.eval.pipeline import Evaluator
from mld_tpu.models.mld import MLD
from mld_tpu.train.loop import train
from mld_tpu.utils.checkpoint import (
    CheckpointManager,
    load_params_npz,
    save_params_npz,
)


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth")
    build_synthetic_dataset(str(root), n_samples=48, seed=1)
    return str(root)


def tiny_overrides(synth_root, tmp, stage="vae"):
    return {
        "debug": True,
        "name": f"itest_{stage}",
        "model": {"latent_dim": 32, "ff_size": 64, "num_layers": 3,
                  "denoiser_num_layers": 3, "num_heads": 4,
                  "text_encoded_dim": 32, "clip_layers": 2, "clip_heads": 2,
                  "scheduler": {"num_inference_timesteps": 3}},
        "dataset": {"root": synth_root, "max_motion_len": 64,
                    "min_motion_len": 16},
        "train": {"stage": stage, "batch_size": 4, "end_epoch": 2},
        "eval": {"batch_size": 8, "diversity_times": 4, "r_size": 4,
                 "mm_num_samples": 2, "mm_num_repeats": 4,
                 "mm_num_times": 2},
        "test": {"replication_times": 2},
        "logger": {"folder": str(tmp), "save_checkpoint_epoch": 1,
                   "val_every_epochs": 1, "tensorboard": False},
    }


class TestTrainLoop:
    def test_vae_train_checkpoint_resume(self, synth_root, tmp_path):
        cfg = load_config(None, tiny_overrides(synth_root, tmp_path, "vae"))
        params = train(cfg, max_steps=4)
        assert "vae" in params
        ckpt_dir = os.path.join(str(tmp_path), "mld", cfg.name,
                                "checkpoints")
        mgr = CheckpointManager(ckpt_dir)
        assert mgr.latest_step() is not None
        # resume runs without error
        train(cfg, max_steps=1, resume=True)

    def test_train_loop_scan_dispatch(self, synth_root, tmp_path):
        # spd>1 routes through make_train_scan inside train() — this path
        # only activates on real TPU by default (auto K=8) and a missing
        # import once survived the whole CPU suite; force it here
        over = tiny_overrides(synth_root, tmp_path, "vae")
        over["name"] = "itest_spd"
        over["train"]["steps_per_dispatch"] = 2
        cfg = load_config(None, over)
        params = train(cfg, max_steps=5)
        assert "vae" in params

    def test_train_loop_device_data(self, synth_root, tmp_path):
        # device-resident corpus path: HBM corpus + fused sampling scan
        # replaces the host loader in the steady-state loop
        over = tiny_overrides(synth_root, tmp_path, "vae")
        over["name"] = "itest_devdata"
        over["train"]["device_data"] = "on"
        over["train"]["steps_per_dispatch"] = 2
        # force single-device semantics on the 8-device CPU conftest:
        # an explicit device_data='on' raises under a mesh (loop.py gate)
        over["train"]["data_parallel"] = 1
        cfg = load_config(None, over)
        params = train(cfg, max_steps=5)
        assert "vae" in params
        mpath = os.path.join(str(tmp_path), "mld", "itest_devdata",
                             "metrics.jsonl")
        with open(mpath) as f:
            recs = [json.loads(line) for line in f]
        train_recs = [r for r in recs if r.get("split") == "train"]
        assert train_recs and np.isfinite(train_recs[0]["total"])

    def test_npz_roundtrip(self, synth_root, tmp_path):
        cfg = load_config(None, tiny_overrides(synth_root, tmp_path, "vae"))
        mld = MLD(cfg)
        params = mld.init_params(jax.random.PRNGKey(0))
        path = str(tmp_path / "params.npz")
        save_params_npz(path, params)
        loaded = load_params_npz(path)
        a = jax.tree_util.tree_leaves(params["vae"])
        b = jax.tree_util.tree_leaves(loaded["vae"])
        assert len(a) == len(b)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


class TestEvalPipeline:
    def test_full_eval_protocol(self, synth_root, tmp_path):
        cfg = load_config(None, tiny_overrides(synth_root, tmp_path,
                                               "diffusion"))
        mld = MLD(cfg)
        dm = get_datamodule(cfg, tokenizer=mld.tokenizer)
        mld.mean = jnp.asarray(dm.mean, jnp.float32)
        mld.std = jnp.asarray(dm.std, jnp.float32)
        mld.mean_eval = jnp.asarray(dm.mean_eval, jnp.float32)
        mld.std_eval = jnp.asarray(dm.std_eval, jnp.float32)
        params = mld.init_params(jax.random.PRNGKey(0))
        ev = Evaluator(cfg, mld, dm)
        res = ev.run(params, jax.random.PRNGKey(0), replication_times=2,
                     stage="diffusion", with_mm=True)
        assert "FID" in res and "R_precision_top_1" in res
        assert "MultiModality" in res
        assert "APE_root" in res
        assert all(np.isfinite(v) for v in res.values()), res


class TestDemoCLI:
    def test_demo_generates_npy(self, synth_root, tmp_path):
        example = tmp_path / "example.txt"
        example.write_text("32 a person walks forward\n"
                           "24 someone jumps\n")
        out = tmp_path / "demo_out"
        cfg_yaml = tmp_path / "cfg.yaml"
        import yaml
        cfg_yaml.write_text(yaml.safe_dump(
            tiny_overrides(synth_root, tmp_path, "diffusion")))
        env = dict(os.environ)
        env.pop("PALLAS_AXON_POOL_IPS", None)
        env["JAX_PLATFORMS"] = "cpu"
        env["JAX_COMPILATION_CACHE_DIR"] = "/tmp/jax_test_cache"
        r = subprocess.run(
            [sys.executable, os.path.join(REPO_ROOT, "demo.py"),
             "--cfg", str(cfg_yaml), "--example", str(example),
             "--out", str(out), "--allinone"],
            capture_output=True, text=True, env=env, timeout=560)
        assert r.returncode == 0, r.stderr[-2000:]
        files = sorted(os.listdir(out))
        npys = [f for f in files if f.endswith(".npy")]
        assert len(npys) == 3  # 2 samples + allinone
        a = np.load(out / "text_motion_32_batch0_0.npy")
        assert a.shape == (32, 22, 3)
