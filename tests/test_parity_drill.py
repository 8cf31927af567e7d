"""Parity-drill mechanics, proven end-to-end on fabricated full-schema
assets (VERDICT r1 task 3): checkpoint in reference .ckpt format, HF CLIP
clone, t2m evaluator finest.tar, evaluator-space meta stats, HumanML3D-layout
dataset. The drill must convert, validate, evaluate, and emit a verdict
report — the *numbers* only mean something with real release assets."""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

from conftest import add_reference_to_path, has_reference

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.skipif(not has_reference(),
                                reason="reference needed to fabricate ckpts")

TINY = dict(NF=263, D=32, FF=64, LAYERS=3, HEADS=4, TD=32)


def fabricate_assets(root):
    add_reference_to_path()
    import torch
    import types
    from transformers import CLIPTextConfig, CLIPTextModelWithProjection
    from mld.models.architectures.mld_vae import MldVae as RefVae
    from mld.models.architectures.mld_denoiser import (
        MldDenoiser as RefDenoiser)
    from mld.models.architectures.t2m_textenc import TextEncoderBiGRUCo
    from mld.models.architectures.t2m_motionenc import (
        MotionEncoderBiGRUCo,
        MovementConvEncoder,
    )
    from mld_tpu.data.synthetic import build_synthetic_dataset

    t = TINY
    torch.manual_seed(0)
    abl = types.SimpleNamespace(MLP_DIST=False, PE_TYPE="mld",
                                DIFF_PE_TYPE="mld", SKIP_CONNECT=True,
                                VAE_TYPE="mld", PREDICT_EPSILON=True)

    # 1. released-format checkpoint (vae.* + denoiser.* keys, CLIP stripped)
    vae = RefVae(abl, nfeats=t["NF"], latent_dim=[1, t["D"]],
                 ff_size=t["FF"], num_layers=t["LAYERS"],
                 num_heads=t["HEADS"], dropout=0.1, arch="encoder_decoder",
                 normalize_before=False, activation="gelu",
                 position_embedding="learned")
    den = RefDenoiser(abl, nfeats=t["NF"], condition="text",
                      latent_dim=[1, t["D"]], ff_size=t["FF"],
                      num_layers=t["LAYERS"], num_heads=t["HEADS"],
                      dropout=0.1, normalize_before=False,
                      activation="gelu", flip_sin_to_cos=True,
                      position_embedding="learned", arch="trans_enc",
                      freq_shift=0, text_encoded_dim=t["TD"])
    state = {}
    state.update({f"vae.{k}": v for k, v in vae.state_dict().items()})
    state.update({f"denoiser.{k}": v for k, v in den.state_dict().items()})
    ckpt_dir = os.path.join(root, "models", "mld_humanml3d_checkpoint")
    os.makedirs(ckpt_dir, exist_ok=True)
    torch.save({"state_dict": state},
               os.path.join(ckpt_dir, "1222_mld_humanml3d_FID041.ckpt"))

    # 2. HF CLIP clone (tiny text tower, safetensors)
    clip_dir = os.path.join(root, "deps", "clip-vit-large-patch14")
    clip_cfg = CLIPTextConfig(
        vocab_size=49408, hidden_size=t["TD"], num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=4 * t["TD"],
        max_position_embeddings=77, projection_dim=t["TD"],
        hidden_act="quick_gelu", eos_token_id=49407, bos_token_id=49406)
    CLIPTextModelWithProjection(clip_cfg).save_pretrained(clip_dir)

    # 3. t2m evaluators (finest.tar schema, mld.py:171-178)
    text_enc = TextEncoderBiGRUCo(word_size=300, pos_size=15,
                                  hidden_size=512, output_size=512)
    move_enc = MovementConvEncoder(t["NF"] - 4, 512, 512)
    motion_enc = MotionEncoderBiGRUCo(input_size=512, hidden_size=1024,
                                      output_size=512)
    tar_dir = os.path.join(root, "deps", "t2m", "t2m", "text_mot_match",
                           "model")
    os.makedirs(tar_dir, exist_ok=True)
    torch.save({"text_encoder": text_enc.state_dict(),
                "movement_encoder": move_enc.state_dict(),
                "motion_encoder": motion_enc.state_dict()},
               os.path.join(tar_dir, "finest.tar"))

    # 4. evaluator-space meta stats
    meta = os.path.join(root, "deps", "t2m", "t2m", "Comp_v6_KLD01", "meta")
    os.makedirs(meta, exist_ok=True)
    rng = np.random.RandomState(0)
    np.save(os.path.join(meta, "mean.npy"),
            rng.randn(t["NF"]).astype(np.float32) * 0.01)
    np.save(os.path.join(meta, "std.npy"),
            np.ones(t["NF"], np.float32))

    # 5. HumanML3D-layout dataset
    build_synthetic_dataset(os.path.join(root, "datasets", "humanml3d"),
                            n_samples=48, seed=0)


class TestParityDrill:
    def test_drill_end_to_end(self, tmp_path):
        root = str(tmp_path)
        fabricate_assets(root)

        t = TINY
        cfg_path = os.path.join(root, "drill_overrides.yaml")
        with open(cfg_path, "w") as f:
            f.write(f"""
model:
  latent_dim: {t["D"]}
  ff_size: {t["FF"]}
  num_layers: {t["LAYERS"]}
  denoiser_num_layers: {t["LAYERS"]}
  num_heads: {t["HEADS"]}
  text_encoded_dim: {t["TD"]}
  clip_layers: 2
  clip_heads: 4
  clip_compute_dtype: float32
  scheduler:
    num_inference_timesteps: 3
eval:
  batch_size: 8
  r_size: 4
  diversity_times: 6
logger:
  tensorboard: false
""")
        out = os.path.join(root, "drill_report.json")
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, "scripts", "parity_drill.py"),
             "--assets-root", root, "--cfg", cfg_path,
             "--replications", "1", "--no-mm", "--skip-timing",
             "--out", out],
            capture_output=True, text=True, timeout=1200,
            env={**os.environ, "JAX_PLATFORMS": "cpu"})
        assert proc.returncode in (0, 1), proc.stderr[-3000:]
        assert os.path.exists(out), proc.stdout

        report = json.load(open(out))
        # every asset fabricated above was found
        for key in ("ckpt", "clip", "t2m_tar", "t2m_meta", "data"):
            assert report["assets"][key]["present"], key
        steps = {s["step"]: s for s in report["steps"]}
        assert steps["convert+shape-validate"]["ok"], steps
        assert steps["clip-hydrate"]["ok"], steps
        assert steps["t2m-eval-stats"]["ok"], steps
        # evaluation ran and the verdict machinery produced comparisons
        assert "FID" in report["results"]
        assert "FID" in report["comparisons"]
        assert report["verdict"].startswith(("pass", "fail"))
        # random weights must NOT accidentally pass the paper targets
        assert "R_precision_top_1" in report["comparisons"]
