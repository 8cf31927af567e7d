"""CLI argument-surface smoke tests (subprocess level)."""
import os
import subprocess
import sys

import numpy as np
import pytest
import yaml

from conftest import REPO_ROOT, has_reference


def _env():
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["JAX_COMPILATION_CACHE_DIR"] = "/tmp/jax_test_cache"
    return env


def tiny_cfg(tmp_path, **extra):
    cfg = {
        "debug": True,
        "name": "cli_surface",
        "model": {"latent_dim": 32, "ff_size": 64, "num_layers": 3,
                  "denoiser_num_layers": 3, "num_heads": 4,
                  "text_encoded_dim": 32, "clip_layers": 2, "clip_heads": 2,
                  "scheduler": {"num_inference_timesteps": 2}},
        "dataset": {"root": str(tmp_path / "data"), "max_motion_len": 32,
                    "min_motion_len": 16},
        "train": {"batch_size": 4, "end_epoch": 1},
        "logger": {"folder": str(tmp_path / "exp"),
                   "save_checkpoint_epoch": 1, "val_every_epochs": 1,
                   "tensorboard": False},
    }
    cfg.update(extra)
    path = tmp_path / "cfg.yaml"
    path.write_text(yaml.safe_dump(cfg))
    return str(path)


def test_train_cli(tmp_path):
    cfg = tiny_cfg(tmp_path)
    r = subprocess.run(
        [sys.executable, os.path.join(REPO_ROOT, "train.py"),
         "--cfg", cfg, "--stage", "vae", "--max_steps", "2"],
        env=_env(), capture_output=True, text=True, timeout=540,
        cwd=REPO_ROOT)
    assert r.returncode == 0, r.stderr[-2000:]
    ckpts = tmp_path / "exp" / "mld" / "cli_surface" / "checkpoints"
    assert ckpts.exists()


@pytest.mark.skipif(not has_reference(), reason="reference not mounted")
def test_convert_checkpoint_cli(tmp_path):
    # fabricate a reference-style ckpt at tiny size matching a tiny config
    import types
    import torch
    sys.path.insert(0, "/root/reference")
    from mld.models.architectures.mld_vae import MldVae as RefVae

    torch.manual_seed(0)
    abl = types.SimpleNamespace(MLP_DIST=False, PE_TYPE="mld")
    vae = RefVae(abl, nfeats=263, latent_dim=[1, 32], ff_size=64,
                 num_layers=3, num_heads=4, dropout=0.0,
                 arch="encoder_decoder", activation="gelu",
                 position_embedding="learned")
    state = {f"vae.{k}": v for k, v in vae.state_dict().items()}
    ckpt = tmp_path / "ref.ckpt"
    torch.save({"state_dict": state}, str(ckpt))

    cfg = tiny_cfg(tmp_path)
    out = tmp_path / "converted.npz"
    r = subprocess.run(
        [sys.executable, os.path.join(REPO_ROOT,
                                      "scripts/convert_checkpoint.py"),
         "--ckpt", str(ckpt), "--cfg", cfg, "--out", str(out)],
        env=_env(), capture_output=True, text=True, timeout=540,
        cwd=REPO_ROOT)
    assert r.returncode == 0, r.stderr[-2000:]
    data = np.load(out)
    assert any(k.startswith("vae/") for k in data.files)
