"""Evaluator-network parity: masked-scan GRUs vs torch pack_padded GRUs."""
import numpy as np
import pytest
import jax.numpy as jnp

from conftest import add_reference_to_path, has_reference

import mld_tpu  # noqa: F401
from mld_tpu.models.t2m_eval import (
    MotionEncoderBiGRUCo,
    MovementConvEncoder,
    TextEncoderBiGRUCo,
)
from mld_tpu.ops.gru import BiGRU
from mld_tpu.utils.torch_convert import torch_state_dict_to_flax

pytestmark = pytest.mark.skipif(not has_reference(),
                                reason="reference not mounted")


def _remap_seq(state):
    out = {}
    for k, v in state.items():
        k2 = k
        if k2.startswith("main."):
            k2 = "main_" + k2[len("main."):]
        if k2.startswith("output_net."):
            k2 = "out.output_net_" + k2[len("output_net."):]
        out[k2] = v
    return out


class TestBiGRU:
    def test_masked_scan_vs_pack_padded(self):
        import torch
        torch.manual_seed(0)
        B, T, I, H = 4, 11, 6, 8
        gru_t = torch.nn.GRU(I, H, batch_first=True, bidirectional=True)
        gru_t.eval()
        x = np.random.RandomState(0).randn(B, T, I).astype(np.float32)
        lengths = [11, 8, 5, 2]
        h0 = np.random.RandomState(1).randn(2, B, H).astype(np.float32)

        from torch.nn.utils.rnn import pack_padded_sequence
        with torch.no_grad():
            packed = pack_padded_sequence(torch.tensor(x), lengths,
                                          batch_first=True)
            _, last_t = gru_t(packed, torch.tensor(h0))
        last_t = last_t.numpy()

        params = torch_state_dict_to_flax(gru_t.state_dict())
        gru_j = BiGRU(I, H)
        _, final = gru_j.apply({"params": params}, jnp.asarray(x),
                               jnp.asarray(lengths), jnp.asarray(h0))
        np.testing.assert_allclose(np.asarray(final), last_t, atol=1e-5)


class TestEvaluators:
    def test_text_encoder_parity(self):
        add_reference_to_path()
        import torch
        from mld.models.architectures.t2m_textenc import (
            TextEncoderBiGRUCo as RefText)

        torch.manual_seed(0)
        ref = RefText(word_size=30, pos_size=15, hidden_size=16,
                      output_size=12).eval()
        B, S = 3, 9
        rng = np.random.RandomState(0)
        word_embs = rng.randn(B, S, 30).astype(np.float32)
        pos_ohot = rng.randn(B, S, 15).astype(np.float32)
        cap_lens = [9, 6, 3]
        with torch.no_grad():
            out_t = ref(torch.tensor(word_embs), torch.tensor(pos_ohot),
                        torch.tensor(cap_lens)).numpy()

        params = torch_state_dict_to_flax(_remap_seq(ref.state_dict()))
        ours = TextEncoderBiGRUCo(word_size=30, pos_size=15, hidden_size=16,
                                  output_size=12)
        out_j = ours.apply({"params": params}, jnp.asarray(word_embs),
                           jnp.asarray(pos_ohot), jnp.asarray(cap_lens))
        np.testing.assert_allclose(np.asarray(out_j), out_t, atol=5e-4)

    def test_motion_encoder_parity(self):
        add_reference_to_path()
        import torch
        from mld.models.architectures.t2m_motionenc import (
            MotionEncoderBiGRUCo as RefMotion,
            MovementConvEncoder as RefMove)

        torch.manual_seed(0)
        ref_move = RefMove(input_size=20, hidden_size=16,
                           output_size=12).eval()
        ref_motion = RefMotion(input_size=12, hidden_size=16,
                               output_size=10).eval()
        B, T = 2, 16
        rng = np.random.RandomState(3)
        feats = rng.randn(B, T, 20).astype(np.float32)
        with torch.no_grad():
            mov_t = ref_move(torch.tensor(feats)).numpy()
            m_lens = torch.tensor([4, 3])  # post-downsample lengths
            emb_t = ref_motion(torch.tensor(mov_t), m_lens).numpy()

        move_params = torch_state_dict_to_flax(_remap_seq(
            ref_move.state_dict()))
        ours_move = MovementConvEncoder(input_size=20, hidden_size=16,
                                        output_size=12)
        mov_j = ours_move.apply({"params": move_params}, jnp.asarray(feats))
        np.testing.assert_allclose(np.asarray(mov_j), mov_t, atol=5e-4)

        motion_params = torch_state_dict_to_flax(_remap_seq(
            ref_motion.state_dict()))
        ours_motion = MotionEncoderBiGRUCo(input_size=12, hidden_size=16,
                                           output_size=10)
        emb_j = ours_motion.apply({"params": motion_params},
                                  jnp.asarray(mov_j), jnp.asarray([4, 3]))
        np.testing.assert_allclose(np.asarray(emb_j), emb_t, atol=5e-4)


def test_bundle_loads_trained_params_npz(tmp_path):
    """cfg.eval.t2m_params_path overrides finest.tar/random init: the
    synthetic e2e protocol trains the bundle in-repo (eval/t2m_train.py)
    and every downstream Evaluator (incl. train-loop validation) must
    pick the trained params up from the npz."""
    import jax
    from mld_tpu.config import load_config
    from mld_tpu.eval.pipeline import T2MEvaluatorBundle
    from mld_tpu.utils.checkpoint import load_params_npz, save_params_npz

    cfg = load_config(None, {"debug": True,
                             "dataset": {"root": str(tmp_path)}},
                      preset="mld_humanml3d")
    rnd = T2MEvaluatorBundle(cfg, seed=3)
    path = str(tmp_path / "t2m.npz")
    save_params_npz(path, jax.device_get(rnd.params))
    cfg.eval.t2m_params_path = path
    loaded = T2MEvaluatorBundle(cfg)
    a = jax.tree_util.tree_leaves(rnd.params)
    b = jax.tree_util.tree_leaves(loaded.params)
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
