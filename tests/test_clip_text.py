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
