"""CLIP text tower parity vs HuggingFace (random-init, offline) + tokenizer."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

import mld_tpu  # noqa: F401
from mld_tpu.models.clip_text import (
    CLIP_BOS,
    CLIP_EOS,
    ClipTextModel,
    ClipTokenizer,
    convert_hf_clip_text,
)


@pytest.fixture(scope="module")
def hf_pair():
    import torch
    from transformers import CLIPTextConfig, CLIPTextModelWithProjection

    torch.manual_seed(0)
    cfg = CLIPTextConfig(
        vocab_size=1000, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=128,
        max_position_embeddings=77, projection_dim=64,
        hidden_act="quick_gelu", eos_token_id=999, bos_token_id=998)
    hf = CLIPTextModelWithProjection(cfg).eval()
    ours = ClipTextModel(vocab_size=1000, width=64, layers=2, heads=4,
                         projection_dim=64, intermediate_size=128)
    params = convert_hf_clip_text(hf.state_dict())
    return hf, ours, params


def make_ids(B=3, S=77, vocab=1000):
    rng = np.random.RandomState(0)
    ids = rng.randint(1, 900, (B, S)).astype(np.int64)
    ids[:, 0] = 998
    lengths = [5, 20, 77]
    for i, L in enumerate(lengths):
        ids[i, L - 1] = 999  # EOS
        ids[i, L:] = 0       # pad below EOS id so argmax finds EOS
    return ids


class TestClipParity:
    def test_hidden_state(self, hf_pair):
        import torch
        hf, ours, params = hf_pair
        ids = make_ids()
        with torch.no_grad():
            out_t = hf.text_model(torch.tensor(ids)).last_hidden_state.numpy()
        out_j = ours.apply({"params": params}, jnp.asarray(ids, jnp.int32),
                           mode="hidden")
        np.testing.assert_allclose(np.asarray(out_j), out_t, atol=3e-5)

    def test_text_features(self, hf_pair):
        import torch
        hf, ours, params = hf_pair
        ids = make_ids()
        with torch.no_grad():
            out_t = hf(torch.tensor(ids)).text_embeds.numpy()
        out_j = ours.apply({"params": params}, jnp.asarray(ids, jnp.int32),
                           mode="features")
        np.testing.assert_allclose(np.asarray(out_j), out_t, atol=3e-5)


class TestTokenizer:
    def test_hash_fallback_shapes(self):
        tok = ClipTokenizer(None)
        ids = tok(["a person walks forward", ""])
        assert ids.shape == (2, 77)
        assert ids[0, 0] == CLIP_BOS
        assert CLIP_EOS in ids[0]
        # deterministic
        np.testing.assert_array_equal(ids, tok(["a person walks forward", ""]))

    def test_empty_prompt_is_bos_eos(self):
        tok = ClipTokenizer(None)
        ids = tok([""])
        assert ids[0, 0] == CLIP_BOS and ids[0, 1] == CLIP_EOS

    def test_hash_fallback_stable_across_processes(self):
        """Fallback ids must not depend on the interpreter's hash salt.

        Python salts str hashing per process (PYTHONHASHSEED), so a
        builtin-hash tokenizer scrambles the vocabulary between train.py
        and test.py invocations — trained text conditioning collapses to
        chance in any later process. Regression for the crc32 fix."""
        import json
        import os
        import subprocess
        import sys
        code = (
            "import json, sys; sys.path.insert(0, %r); "
            "from mld_tpu.models.clip_text import ClipTokenizer; "
            "print(json.dumps(ClipTokenizer(None)"
            "(['a person walks forward and waves']).tolist()))"
            % os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        rows = []
        for seed in ("0", "12345"):
            env = dict(os.environ)
            env["PYTHONHASHSEED"] = seed
            env["JAX_PLATFORMS"] = "cpu"
            out = subprocess.run([sys.executable, "-c", code], env=env,
                                 capture_output=True, text=True, timeout=120)
            assert out.returncode == 0, out.stderr[-500:]
            rows.append(json.loads(out.stdout.strip().splitlines()[-1]))
        assert rows[0] == rows[1]

    def test_bucketed_crop(self):
        tok = ClipTokenizer(None)
        texts = ["a person walks forward", "spins twice"]
        full = tok(texts)
        ids = tok(texts, buckets=(16, 24, 32, 48, 64))
        assert ids.shape[1] == 16
        np.testing.assert_array_equal(ids, full[:, :16])
        # a long caption overflows the small buckets
        long = ["word " * 60]
        assert tok(long, buckets=(16,)).shape[1] == 77


class TestBucketedServingExactness:
    """EOT-cropped serving ids must give the SAME pooled embedding
    (causal attention + EOT pooling make pad columns inert — the claim
    behind MLD.tokenize / ClipTokenizer buckets)."""

    def test_pooled_matches_full_context(self):
        model = ClipTextModel(vocab_size=1000, width=64, layers=2, heads=4,
                              projection_dim=64, intermediate_size=128)
        rng = np.random.RandomState(1)
        full = np.full((3, 77), 999, np.int64)  # EOS-padded
        for i, L in enumerate((5, 12, 20)):
            full[i, 0] = 998
            full[i, 1:L - 1] = rng.randint(1, 900, L - 2)
        params = model.init(jax.random.PRNGKey(0),
                            jnp.asarray(full, jnp.int32))["params"]
        for mode in ("pooled", "features"):
            out_full = model.apply({"params": params},
                                   jnp.asarray(full, jnp.int32), mode=mode)
            out_crop = model.apply({"params": params},
                                   jnp.asarray(full[:, :24], jnp.int32),
                                   mode=mode)
            np.testing.assert_allclose(np.asarray(out_crop),
                                       np.asarray(out_full),
                                       rtol=0, atol=2e-6)

    def test_mld_generate_bucket_parity(self, monkeypatch):
        """Full pipeline: bucketed ids -> same motions as 77-context ids."""
        from mld_tpu.config import load_config
        from mld_tpu.models.mld import MLD, lengths_to_mask

        cfg = load_config(preset="mld_humanml3d", overrides={
            "model": {"latent_dim": 32, "ff_size": 64, "num_layers": 3,
                      "denoiser_num_layers": 3, "num_heads": 4,
                      "text_encoded_dim": 32, "clip_layers": 2,
                      "clip_heads": 2,
                      "scheduler": {"num_inference_timesteps": 5}},
            "dataset": {"max_motion_len": 48}})
        mld = MLD(cfg)
        assert mld.clip_mode == "features"
        params = mld.init_params(jax.random.PRNGKey(0))
        texts = ["walk", "jump high"]
        mask = lengths_to_mask(jnp.asarray([32, 48]), mld.max_frames)
        rng = jax.random.PRNGKey(3)

        ids_b = mld.tokenize(texts)
        assert ids_b.shape[1] < 77
        out_b = np.asarray(mld.generate_joints(params, ids_b, mask, rng))

        monkeypatch.setenv("MLD_TPU_TEXT_BUCKETS", "0")
        ids_f = mld.tokenize(texts)
        assert ids_f.shape[1] == 77
        out_f = np.asarray(mld.generate_joints(params, ids_f, mask, rng))
        np.testing.assert_allclose(out_b, out_f, rtol=0, atol=2e-5)
