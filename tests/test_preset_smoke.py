"""Per-preset serving smoke tests.

Round-2 shipped a serving-dispatch regression: the fused VAE decode gate
read `vae.arch`, which ActorVae/VPosert don't define, crashing every
action/vposert generate at HEAD. These tests call the generate path for
EVERY capability preset (reference surface: mld/models/modeltype/mld.py
forward dispatch per config), with the fused Pallas paths both off and
force-enabled (interpret mode on CPU), so a dispatch regression in any
preset can never ship silently again.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mld_tpu.config import load_config
from mld_tpu.models.mld import MLD, lengths_to_mask

TINY = {
    "debug": True,
    "model": {"latent_dim": 32, "ff_size": 64, "num_layers": 3,
              "denoiser_num_layers": 3, "num_heads": 4,
              "text_encoded_dim": 32, "clip_layers": 2, "clip_heads": 2,
              "scheduler": {"num_inference_timesteps": 2}},
    "dataset": {"max_motion_len": 24, "min_motion_len": 8},
}

# preset -> extra overrides (keep every graph tiny + 2 sampler steps)
PRESETS = {
    "mld_humanml3d": {},
    "vae_humanml3d": {},
    "mld_kit": {},
    "novae_humanml3d": {
        "model": {"scheduler": {"kind": "ddpm",
                                "num_inference_timesteps": 2}}},
    "mld_humanact12": {},
    "mld_uestc": {},
}


def _tiny_cfg(preset, tmp_path, extra=None):
    import copy

    from mld_tpu.config.core import merge_dicts
    over = copy.deepcopy(TINY)
    over["dataset"]["root"] = str(tmp_path)
    if extra:
        over = merge_dicts(over, copy.deepcopy(extra))
    over = merge_dicts(over, copy.deepcopy(PRESETS.get(preset, {})))
    return load_config(None, over, preset=preset)


def _generate(mld, params, rng):
    T = mld.max_frames
    mask = lengths_to_mask(jnp.asarray([T, T // 2]), T)
    if mld.condition == "action":
        cond_in = jnp.asarray([0, 1], jnp.int32)
    else:
        cond_in = jnp.asarray(mld.tokenizer(["walk", "jump high"]))
    return mld.generate_feats(params, cond_in, mask, rng), mask


@pytest.mark.parametrize("preset", sorted(PRESETS))
@pytest.mark.parametrize("fused", ["0", "1"])
def test_preset_generate(preset, fused, tmp_path, monkeypatch):
    monkeypatch.setenv("MLD_TPU_FUSED_DECODE", fused)
    monkeypatch.setenv("MLD_TPU_FUSED_DENOISER", fused)
    cfg = _tiny_cfg(preset, tmp_path)
    mld = MLD(cfg)
    params = mld.init_params(jax.random.PRNGKey(0))
    feats, mask = _generate(mld, params, jax.random.PRNGKey(1))
    assert feats.shape == (2, mld.max_frames, mld.nfeats)
    f = np.asarray(feats)
    assert np.isfinite(f).all()
    # padded frames must be zero (mld_vae.py:245 output-zeroing invariant)
    assert np.abs(f[1, mld.max_frames // 2:]).max() == 0.0


def test_vposert_generate(tmp_path, monkeypatch):
    # vposert is a vae_type variant, not a preset — same dispatch surface
    for fused in ("0", "1"):
        monkeypatch.setenv("MLD_TPU_FUSED_DECODE", fused)
        monkeypatch.setenv("MLD_TPU_FUSED_DENOISER", fused)
        cfg = _tiny_cfg("mld_humanml3d", tmp_path,
                        extra={"model": {"vae_type": "vposert"}})
        mld = MLD(cfg)
        params = mld.init_params(jax.random.PRNGKey(0))
        feats, _ = _generate(mld, params, jax.random.PRNGKey(1))
        assert np.isfinite(np.asarray(feats)).all()


def test_vae_diffusion_step_with_fused_serving(tmp_path, monkeypatch):
    """ADVICE r2 (high): the joint-finetune stage traces _generate_impl
    inside value_and_grad; params entering the fused Pallas kernels (no
    JVP rule) must carry zero tangents. Force the fused path and take a
    real gradient step — crashes at trace time if the stop_gradient is
    applied to the output only."""
    monkeypatch.setenv("MLD_TPU_FUSED_DECODE", "1")
    monkeypatch.setenv("MLD_TPU_FUSED_DENOISER", "1")
    from mld_tpu.train.steps import create_train_state, make_train_step

    cfg = _tiny_cfg("mld_humanml3d", tmp_path)
    mld = MLD(cfg)
    params = mld.init_params(jax.random.PRNGKey(0))
    state = create_train_state(mld, params, "vae_diffusion")
    step = make_train_step(mld, "vae_diffusion", donate=False)
    B, T = 2, mld.max_frames
    batch = {
        "motion": jnp.asarray(
            np.random.RandomState(0).randn(B, T, mld.nfeats), jnp.float32),
        "mask": lengths_to_mask(jnp.asarray([T, T // 2]), T),
        "text_ids": jnp.asarray(mld.tokenizer(["walk", "run"])),
    }
    state, logs = step(state, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(logs["total"]))
    assert np.isfinite(float(logs["gen_feature"]))


def test_chunked_decode_bitexact(tmp_path, monkeypatch):
    """Serving-time chunked VAE decode (models/mld.py _decode_chunk) must
    be bit-exact vs the one-call decode: it is pure batch slicing of the
    same program, and the r3 TPU sweep relies on that equivalence
    (docs/bench_decode_chunked_r3.json err 0.0)."""
    monkeypatch.setenv("MLD_TPU_FUSED_DECODE", "0")
    cfg = _tiny_cfg("mld_humanml3d", tmp_path)
    mld = MLD(cfg)
    params = mld.init_params(jax.random.PRNGKey(0))
    B, T = 8, mld.max_frames
    z = jax.random.normal(jax.random.PRNGKey(1),
                          (B, mld.latent_size, mld.latent_dim))
    mask = lengths_to_mask(
        jnp.asarray(np.random.RandomState(0).randint(8, T + 1, B)), T)

    monkeypatch.setenv("MLD_TPU_DECODE_CHUNK", "0")
    ref = np.asarray(jax.jit(mld.decode_latent)(params, z, mask))
    monkeypatch.setenv("MLD_TPU_DECODE_CHUNK", "4")
    out = np.asarray(jax.jit(mld.decode_latent)(params, z, mask))
    assert np.array_equal(out, ref)
    # non-dividing chunk falls back to the one-call path
    monkeypatch.setenv("MLD_TPU_DECODE_CHUNK", "3")
    out = np.asarray(jax.jit(mld.decode_latent)(params, z, mask))
    assert np.array_equal(out, ref)


def test_chunked_clip_bitexact(tmp_path, monkeypatch):
    """Serving-time chunked CLIP pass (models/mld.py _clip_chunk) must be
    bit-exact vs the one-call tower — pure batch slicing of the same
    program (mirrors test_chunked_decode_bitexact)."""
    cfg = _tiny_cfg("mld_humanml3d", tmp_path)
    mld = MLD(cfg)
    params = mld.init_params(jax.random.PRNGKey(0))
    ids = jnp.asarray(mld.tokenizer(
        ["walk", "run", "jump", "sit", "wave", "turn", "kick", "spin"]))

    monkeypatch.setenv("MLD_TPU_CLIP_CHUNK", "0")
    ref = np.asarray(jax.jit(mld.encode_text_tokens)(params, ids))
    monkeypatch.setenv("MLD_TPU_CLIP_CHUNK", "4")
    out = np.asarray(jax.jit(mld.encode_text_tokens)(params, ids))
    assert np.array_equal(out, ref)
    # non-dividing chunk falls back to the one-call path
    monkeypatch.setenv("MLD_TPU_CLIP_CHUNK", "3")
    out = np.asarray(jax.jit(mld.encode_text_tokens)(params, ids))
    assert np.array_equal(out, ref)
