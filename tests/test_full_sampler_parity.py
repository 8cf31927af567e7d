"""END-TO-END sampler parity vs the reference torch inference loop.

Round-1 proved per-module parity (VAE, denoiser, CLIP, MHA). This file
composes the reference torch modules exactly as the reference inference
path does — `MLD.forward` (mld/models/modeltype/mld.py:216-264) driving
`_diffusion_reverse` (mld.py:290-360) with the diffusers DDIM/DDPM update —
and asserts our single jitted `generate_feats` program matches end-to-end
from identical converted weights and identical noise:

  * t2m DDIM-50 + CFG at FLAGSHIP shapes (263 feats, [1,256] latent,
    9-layer VAE + 9-layer denoiser, full 12-layer/768-wide CLIP tower,
    T=196) — the released-checkpoint configuration;
  * no-VAE DDPM-1000 raw-motion path (trans_dec, per-step ancestral noise);
  * action-to-motion path (ActorVae + EmbedAction CFG, DDIM-50).

The diffusers scheduler updates are transcribed in torch below
(TorchDDIM/TorchDDPM) with the exact reference settings
(configs/modules/scheduler.yaml:2-15: scaled_linear 0.00085->0.012,
set_alpha_to_one=false, steps_offset=1, eta=0;
configs/modules_novae/scheduler.yaml:17-29: DDPM fixed_small,
clip_sample=false). Noise is reproduced on the torch side by replaying the
same `jax.random` stream our `diffusion_reverse` consumes
(mld_tpu/models/mld.py:220-252).
"""
import types

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from conftest import add_reference_to_path, has_reference

import mld_tpu  # noqa: F401
from mld_tpu.config.core import config_from_dict, merge_dicts
from mld_tpu.config.presets import get_preset
from mld_tpu.models.clip_text import convert_hf_clip_text
from mld_tpu.models.mld import MLD, lengths_to_mask
from mld_tpu.utils.torch_convert import torch_state_dict_to_flax

pytestmark = pytest.mark.skipif(not has_reference(),
                                reason="reference not mounted")


# ------------------------------------------------------------- torch schedulers
class TorchDDIM:
    """diffusers.DDIMScheduler transcription (eta=0 path), reference params:
    scaled_linear betas, set_alpha_to_one=false, steps_offset=1."""

    def __init__(self, torch, n_train=1000, n_infer=50,
                 beta_start=0.00085, beta_end=0.012, steps_offset=1):
        betas = torch.linspace(beta_start ** 0.5, beta_end ** 0.5, n_train,
                               dtype=torch.float32) ** 2
        self.alphas_cumprod = torch.cumprod(1.0 - betas, dim=0)
        self.final_alpha_cumprod = self.alphas_cumprod[0]  # set_alpha_to_one=F
        self.n_train, self.n_infer = n_train, n_infer
        step_ratio = n_train // n_infer
        self.timesteps = (np.round(np.arange(0, n_infer) * step_ratio)
                          [::-1].copy().astype(np.int64) + steps_offset)
        self.init_noise_sigma = 1.0

    def step(self, eps, t, sample):
        prev_t = t - self.n_train // self.n_infer
        a_t = self.alphas_cumprod[t]
        a_prev = (self.alphas_cumprod[prev_t] if prev_t >= 0
                  else self.final_alpha_cumprod)
        b_t = 1.0 - a_t
        x0 = (sample - b_t ** 0.5 * eps) / a_t ** 0.5   # epsilon prediction
        direction = (1.0 - a_prev) ** 0.5 * eps          # eta = 0
        return a_prev ** 0.5 * x0 + direction


class TorchDDPM:
    """diffusers.DDPMScheduler transcription: variance_type=fixed_small,
    clip_sample=false, num_inference==num_train (novae config)."""

    def __init__(self, torch, n_train=1000, beta_start=0.00085,
                 beta_end=0.012):
        betas = torch.linspace(beta_start ** 0.5, beta_end ** 0.5, n_train,
                               dtype=torch.float32) ** 2
        self.alphas_cumprod = torch.cumprod(1.0 - betas, dim=0)
        self.n_train = n_train
        self.timesteps = np.arange(n_train)[::-1].copy().astype(np.int64)
        self.init_noise_sigma = 1.0

    def step(self, eps, t, sample, noise):
        prev_t = t - 1
        a_t = self.alphas_cumprod[t]
        a_prev = (self.alphas_cumprod[prev_t] if prev_t >= 0
                  else sample.new_tensor(1.0))
        b_t, b_prev = 1.0 - a_t, 1.0 - a_prev
        cur_alpha = a_t / a_prev
        cur_beta = 1.0 - cur_alpha
        x0 = (sample - b_t ** 0.5 * eps) / a_t ** 0.5
        coef_x0 = (a_prev ** 0.5 * cur_beta) / b_t
        coef_xt = (cur_alpha ** 0.5 * b_prev) / b_t
        prev = coef_x0 * x0 + coef_xt * sample
        if t > 0:
            var = torch_clamp_min((b_prev / b_t) * cur_beta, 1e-20)
            prev = prev + var ** 0.5 * noise
        return prev


def torch_clamp_min(x, lo):
    return x if float(x) > lo else x.new_tensor(lo)


# ------------------------------------------------------------------ helpers
def replay_noise(rng, n_steps, shape):
    """Replay the jax.random stream diffusion_reverse consumes
    (mld.py:228-251): split -> init normal; split(n) -> per-step normals."""
    rng, init_rng = jax.random.split(rng)
    init = np.asarray(jax.random.normal(init_rng, shape, jnp.float32))
    step_rngs = jax.random.split(rng, n_steps)
    return init, step_rngs


def make_ablation(vae_type="mld"):
    return types.SimpleNamespace(
        MLP_DIST=False, PE_TYPE="mld", DIFF_PE_TYPE="mld",
        SKIP_CONNECT=True, VAE_TYPE=vae_type, PREDICT_EPSILON=True)


@pytest.fixture(scope="module")
def torch_setup():
    add_reference_to_path()
    import torch
    torch.manual_seed(0)
    return torch


def build_cfg(preset, overlay):
    return config_from_dict(merge_dicts(get_preset(preset), overlay))


# =================================================================== t2m DDIM
class TestT2mFlagship:
    """Flagship HumanML3D DDIM-50+CFG: ref CLIP->denoiser->DDIM->VAE-decode
    vs our jitted generate_feats, identical weights + noise, <=1e-3."""

    def test_end_to_end(self, torch_setup):
        torch = torch_setup
        from transformers import CLIPTextConfig, CLIPTextModelWithProjection
        from mld.models.architectures.mld_vae import MldVae as RefVae
        from mld.models.architectures.mld_denoiser import (
            MldDenoiser as RefDenoiser)

        NF, D, FF, H = 263, 256, 1024, 4
        T = 196
        torch.manual_seed(7)
        ref_vae = RefVae(make_ablation(), nfeats=NF, latent_dim=[1, D],
                         ff_size=FF, num_layers=9, num_heads=H, dropout=0.1,
                         arch="encoder_decoder", normalize_before=False,
                         activation="gelu",
                         position_embedding="learned").eval()
        ref_den = RefDenoiser(make_ablation(), nfeats=NF, condition="text",
                              latent_dim=[1, D], ff_size=FF, num_layers=9,
                              num_heads=H, dropout=0.1,
                              normalize_before=False, activation="gelu",
                              flip_sin_to_cos=True,
                              position_embedding="learned", arch="trans_enc",
                              freq_shift=0, text_encoded_dim=768).eval()
        clip_cfg = CLIPTextConfig(
            vocab_size=49408, hidden_size=768, num_hidden_layers=12,
            num_attention_heads=12, intermediate_size=3072,
            max_position_embeddings=77, projection_dim=768,
            hidden_act="quick_gelu", eos_token_id=49407, bos_token_id=49406)
        hf_clip = CLIPTextModelWithProjection(clip_cfg).eval()

        cfg = build_cfg("mld_humanml3d", {
            "model": {"clip_compute_dtype": "float32"}})
        mld = MLD(cfg)
        assert mld.scheduler.init_noise_sigma == 1.0

        params = {
            "vae": torch_state_dict_to_flax(ref_vae.state_dict()),
            "clip": convert_hf_clip_text(hf_clip.state_dict()),
        }
        den_tree = torch_state_dict_to_flax(ref_den.state_dict())
        den_tree["emb_proj"] = den_tree.pop("emb_proj_1")
        params["denoiser"] = den_tree

        texts = ["a person walks forward and waves",
                 "someone jumps in place twice",
                 "a man crouches and picks something up",
                 "a person runs in a circle"]
        lengths = [196, 120, 64, 196]
        B = len(texts)
        token_ids = mld.tokenizer(texts)
        uncond_ids = mld.tokenizer([""] * B)
        mask_np = np.asarray(lengths_to_mask(lengths, T))

        rng = jax.random.PRNGKey(0)
        feats_j = np.asarray(mld.generate_feats(
            params, jnp.asarray(token_ids), jnp.asarray(mask_np), rng))

        # ---- torch transcription of MLD.forward (mld.py:216-264) ----
        init_lat, _ = replay_noise(rng, 50, (B, 1, D))
        sched = TorchDDIM(torch)
        with torch.no_grad():
            ids_full = torch.tensor(
                np.concatenate([uncond_ids, token_ids], 0).astype(np.int64))
            # uncond FIRST (mld.py:224-230), mode "clip" w/ projection
            text_emb = hf_clip(ids_full).text_embeds.unsqueeze(1)  # [2B,1,768]
            latents = torch.tensor(init_lat) * sched.init_noise_sigma
            for t in sched.timesteps:
                inp = torch.cat([latents] * 2)
                eps = ref_den(sample=inp, timestep=torch.tensor(t),
                              encoder_hidden_states=text_emb,
                              lengths=lengths * 2)[0]
                eps_u, eps_c = eps.chunk(2)
                eps = eps_u + mld.guidance_scale * (eps_c - eps_u)
                latents = sched.step(eps, int(t), latents)
            z = latents.permute(1, 0, 2)        # mld.py:359
            feats_t = ref_vae.decode(z, lengths).numpy()

        scale = np.abs(feats_t).max()
        err = np.abs(feats_j - feats_t).max()
        assert err <= 1e-3 * max(scale, 1.0), (
            f"end-to-end sampler mismatch: max|diff|={err:.2e} "
            f"(scale {scale:.2e})")


# ================================================================ no-VAE DDPM
class TestNoVaeDdpm:
    """Raw-motion DDPM-1000 (trans_dec diffusion_only) with per-step
    ancestral noise replayed on both sides."""

    def test_end_to_end(self, torch_setup):
        torch = torch_setup
        from transformers import CLIPTextConfig, CLIPTextModelWithProjection
        from mld.models.architectures.mld_denoiser import (
            MldDenoiser as RefDenoiser)

        NF, D, FF, H, TD = 32, 64, 128, 4, 48
        T, B = 64, 2
        N_STEPS = 1000
        torch.manual_seed(11)
        ref_den = RefDenoiser(make_ablation("no"), nfeats=NF,
                              condition="text", latent_dim=[1, D],
                              ff_size=FF, num_layers=3, num_heads=H,
                              dropout=0.1, normalize_before=False,
                              activation="gelu", flip_sin_to_cos=True,
                              position_embedding="learned", arch="trans_dec",
                              freq_shift=0, text_encoded_dim=TD).eval()
        clip_cfg = CLIPTextConfig(
            vocab_size=49408, hidden_size=TD, num_hidden_layers=2,
            num_attention_heads=4, intermediate_size=4 * TD,
            max_position_embeddings=77, projection_dim=TD,
            hidden_act="quick_gelu", eos_token_id=49407, bos_token_id=49406)
        hf_clip = CLIPTextModelWithProjection(clip_cfg).eval()

        cfg = build_cfg("novae_humanml3d", {
            "model": {"latent_dim": D, "ff_size": FF,
                      "denoiser_num_layers": 3, "text_encoded_dim": TD,
                      "clip_layers": 2, "clip_heads": 4,
                      "clip_compute_dtype": "float32"},
            "dataset": {"nfeats": NF, "max_motion_len": T}})
        mld = MLD(cfg)
        assert not mld.is_vae

        den_tree = torch_state_dict_to_flax(ref_den.state_dict())
        den_tree["emb_proj"] = den_tree.pop("emb_proj_1")
        params = {"denoiser": den_tree,
                  "clip": convert_hf_clip_text(hf_clip.state_dict())}

        texts = ["a person walks", "a person spins around"]
        lengths = [64, 40]
        token_ids = mld.tokenizer(texts)
        uncond_ids = mld.tokenizer([""] * B)
        mask_np = np.asarray(lengths_to_mask(lengths, T))

        rng = jax.random.PRNGKey(3)
        feats_j = np.asarray(mld.generate_feats(
            params, jnp.asarray(token_ids), jnp.asarray(mask_np), rng))

        init_lat, step_rngs = replay_noise(rng, N_STEPS, (B, T, NF))
        sched = TorchDDPM(torch)
        with torch.no_grad():
            ids_full = torch.tensor(
                np.concatenate([uncond_ids, token_ids], 0).astype(np.int64))
            text_emb = hf_clip(ids_full).text_embeds.unsqueeze(1)
            latents = torch.tensor(init_lat) * sched.init_noise_sigma
            for i, t in enumerate(sched.timesteps):
                inp = torch.cat([latents] * 2)
                eps = ref_den(sample=inp, timestep=torch.tensor(t),
                              encoder_hidden_states=text_emb,
                              lengths=lengths * 2)[0]
                eps_u, eps_c = eps.chunk(2)
                eps = eps_u + mld.guidance_scale * (eps_c - eps_u)
                noise = torch.tensor(np.asarray(jax.random.normal(
                    step_rngs[i], (B, T, NF), jnp.float32)))
                latents = sched.step(eps, int(t), latents, noise)
            feats_t = latents.numpy() * mask_np[..., None]

        scale = np.abs(feats_t).max()
        err = np.abs(feats_j - feats_t).max()
        assert err <= 1e-3 * max(scale, 1.0), (
            f"no-VAE DDPM sampler mismatch: max|diff|={err:.2e} "
            f"(scale {scale:.2e})")


# =============================================================== action DDIM
class TestActionPath:
    """ActorVae + EmbedAction CFG (HumanAct12 configuration) through the
    full DDIM-50 loop (mld.py:710-731 a2m_eval drive)."""

    def test_end_to_end(self, torch_setup):
        torch = torch_setup
        from mld.models.architectures.actor_vae import ActorVae as RefVae
        from mld.models.architectures.mld_denoiser import (
            MldDenoiser as RefDenoiser)

        NF, D, FF, H, NCLS = 150, 256, 1024, 4, 12
        T, B = 60, 4
        torch.manual_seed(13)
        abl = types.SimpleNamespace(MLP_DIST=False, PE_TYPE="actor",
                                    DIFF_PE_TYPE="mld", SKIP_CONNECT=True,
                                    VAE_TYPE="actor", PREDICT_EPSILON=True)
        ref_vae = RefVae(abl, nfeats=NF, latent_dim=[1, D], ff_size=FF,
                         num_layers=9, num_heads=H, dropout=0.1,
                         activation="gelu").eval()
        ref_den = RefDenoiser(abl, nfeats=NF, condition="action",
                              latent_dim=[1, D], ff_size=FF, num_layers=15,
                              num_heads=H, dropout=0.1,
                              normalize_before=False, activation="gelu",
                              flip_sin_to_cos=True,
                              position_embedding="learned", arch="trans_enc",
                              freq_shift=0, nclasses=NCLS,
                              guidance_scale=7.5).eval()

        cfg = build_cfg("mld_humanact12", {
            "dataset": {"num_frames": T, "max_motion_len": T}})
        mld = MLD(cfg)

        params = {"vae": torch_state_dict_to_flax(ref_vae.state_dict())}
        den_tree = torch_state_dict_to_flax(ref_den.state_dict())
        den_tree["emb_proj_action"] = den_tree.pop("emb_proj")
        params["denoiser"] = den_tree

        actions = np.asarray([3, 0, 7, 11], np.int32)
        lengths = [60, 45, 60, 30]
        mask_np = np.asarray(lengths_to_mask(lengths, T))

        rng = jax.random.PRNGKey(5)
        feats_j = np.asarray(mld.generate_feats(
            params, jnp.asarray(actions), jnp.asarray(mask_np), rng))

        init_lat, _ = replay_noise(rng, 50, (B, 1, D))
        sched = TorchDDIM(torch)
        with torch.no_grad():
            acts_t = torch.tensor(actions.astype(np.float32)[:, None])
            cond = torch.cat([torch.zeros_like(acts_t), acts_t])  # mld.py:717
            latents = torch.tensor(init_lat) * sched.init_noise_sigma
            for t in sched.timesteps:
                inp = torch.cat([latents] * 2)
                eps = ref_den(sample=inp, timestep=torch.tensor(t),
                              encoder_hidden_states=cond,
                              lengths=lengths * 2)[0]
                eps_u, eps_c = eps.chunk(2)
                eps = eps_u + mld.guidance_scale * (eps_c - eps_u)
                latents = sched.step(eps, int(t), latents)
            z = latents.permute(1, 0, 2)
            feats_t = ref_vae.decode(z, lengths).numpy()

        scale = np.abs(feats_t).max()
        err = np.abs(feats_j - feats_t).max()
        assert err <= 1e-3 * max(scale, 1.0), (
            f"action sampler mismatch: max|diff|={err:.2e} "
            f"(scale {scale:.2e})")
