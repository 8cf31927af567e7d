"""Stateless, scan-friendly DDIM / DDPM schedulers.

Closed-form reimplementation of the diffusers scheduler semantics used by the
reference (configs/modules/scheduler.yaml:2-43): ``scaled_linear`` betas
0.00085->0.012 over 1000 train steps, DDIM inference with
``set_alpha_to_one=false`` + ``steps_offset=1`` + eta 0, DDPM training noise
with ``fixed_small`` variance. All step functions are pure jnp — the 50-step
sampling loop compiles into a single ``lax.scan``.

Exactness traps matched deliberately (SURVEY.md §7 hard part (e)):
  * final_alpha_cumprod = alphas_cumprod[0]  (set_alpha_to_one=false)
  * inference timesteps = arange(n)*(T//n) reversed, +1 (steps_offset)
  * init_noise_sigma = 1.0 for both schedulers
"""
from __future__ import annotations

import dataclasses
import jax
import jax.numpy as jnp
import numpy as np


def make_beta_schedule(num_train_timesteps: int = 1000,
                       beta_start: float = 0.00085,
                       beta_end: float = 0.012,
                       beta_schedule: str = "scaled_linear") -> np.ndarray:
    if beta_schedule == "linear":
        betas = np.linspace(beta_start, beta_end, num_train_timesteps,
                            dtype=np.float64)
    elif beta_schedule == "scaled_linear":
        betas = np.linspace(beta_start ** 0.5, beta_end ** 0.5,
                            num_train_timesteps, dtype=np.float64) ** 2
    elif beta_schedule == "squaredcos_cap_v2":
        def alpha_bar(t):
            return np.cos((t + 0.008) / 1.008 * np.pi / 2) ** 2
        betas = np.array([
            min(1 - alpha_bar((i + 1) / num_train_timesteps)
                / alpha_bar(i / num_train_timesteps), 0.999)
            for i in range(num_train_timesteps)
        ])
    else:
        raise ValueError(f"unknown beta schedule {beta_schedule}")
    return betas


@dataclasses.dataclass(frozen=True)
class DiffusionSchedule:
    """Shared precomputed tables. Registered as a pytree of jnp arrays."""
    betas: jnp.ndarray
    alphas: jnp.ndarray
    alphas_cumprod: jnp.ndarray
    num_train_timesteps: int
    prediction_type: str  # "epsilon" | "sample"
    clip_sample: bool

    @classmethod
    def create(cls, num_train_timesteps=1000, beta_start=0.00085,
               beta_end=0.012, beta_schedule="scaled_linear",
               prediction_type="epsilon", clip_sample=False):
        betas = make_beta_schedule(num_train_timesteps, beta_start, beta_end,
                                   beta_schedule)
        alphas = 1.0 - betas
        return cls(
            betas=jnp.asarray(betas, jnp.float32),
            alphas=jnp.asarray(alphas, jnp.float32),
            alphas_cumprod=jnp.asarray(np.cumprod(alphas), jnp.float32),
            num_train_timesteps=num_train_timesteps,
            prediction_type=prediction_type,
            clip_sample=clip_sample,
        )

    # ---------------------------------------------------------------- common
    @property
    def init_noise_sigma(self) -> float:
        return 1.0

    def add_noise(self, original: jnp.ndarray, noise: jnp.ndarray,
                  timesteps: jnp.ndarray) -> jnp.ndarray:
        """q(x_t | x_0): timesteps [B] broadcast over trailing dims."""
        ac = self.alphas_cumprod[timesteps]
        shape = ac.shape + (1,) * (original.ndim - ac.ndim)
        sqrt_ac = jnp.sqrt(ac).reshape(shape)
        sqrt_1mac = jnp.sqrt(1.0 - ac).reshape(shape)
        return sqrt_ac * original + sqrt_1mac * noise

    def velocity(self, sample, noise, timesteps):
        """v-prediction target (for completeness)."""
        ac = self.alphas_cumprod[timesteps]
        shape = ac.shape + (1,) * (sample.ndim - ac.ndim)
        s, c = jnp.sqrt(ac).reshape(shape), jnp.sqrt(1 - ac).reshape(shape)
        return s * noise - c * sample

    def _predict_x0_eps(self, model_output, sample, alpha_prod_t):
        beta_prod_t = 1.0 - alpha_prod_t
        if self.prediction_type == "epsilon":
            x0 = (sample - jnp.sqrt(beta_prod_t) * model_output) / jnp.sqrt(
                alpha_prod_t)
            eps = model_output
        elif self.prediction_type == "sample":
            x0 = model_output
            eps = (sample - jnp.sqrt(alpha_prod_t) * x0) / jnp.sqrt(
                beta_prod_t)
        else:
            raise ValueError(self.prediction_type)
        if self.clip_sample:
            x0 = jnp.clip(x0, -1.0, 1.0)
            eps = (sample - jnp.sqrt(alpha_prod_t) * x0) / jnp.sqrt(
                beta_prod_t)
        return x0, eps


jax.tree_util.register_dataclass(
    DiffusionSchedule,
    data_fields=["betas", "alphas", "alphas_cumprod"],
    meta_fields=["num_train_timesteps", "prediction_type", "clip_sample"],
)


# --------------------------------------------------------------------- DDIM
@dataclasses.dataclass(frozen=True)
class DDIMScheduler:
    schedule: DiffusionSchedule
    num_inference_timesteps: int = 50
    eta: float = 0.0
    steps_offset: int = 1
    set_alpha_to_one: bool = False

    @property
    def init_noise_sigma(self) -> float:
        return 1.0

    def timesteps(self) -> np.ndarray:
        """Descending inference timesteps, diffusers-exact."""
        T = self.schedule.num_train_timesteps
        n = self.num_inference_timesteps
        step_ratio = T // n
        ts = (np.arange(0, n) * step_ratio).round()[::-1].copy()
        return (ts + self.steps_offset).astype(np.int64)

    def step(self, model_output: jnp.ndarray, timestep: jnp.ndarray,
             sample: jnp.ndarray,
             noise: jnp.ndarray | None = None) -> jnp.ndarray:
        """One DDIM update x_t -> x_{t-dt}. `timestep` may be traced (scan)."""
        sch = self.schedule
        T = sch.num_train_timesteps
        step_ratio = T // self.num_inference_timesteps
        prev_t = timestep - step_ratio

        alpha_prod_t = sch.alphas_cumprod[timestep]
        final_alpha = (jnp.asarray(1.0, jnp.float32) if self.set_alpha_to_one
                       else sch.alphas_cumprod[0])
        alpha_prod_prev = jnp.where(prev_t >= 0,
                                    sch.alphas_cumprod[jnp.maximum(prev_t, 0)],
                                    final_alpha)

        x0, eps = sch._predict_x0_eps(model_output, sample, alpha_prod_t)

        variance = ((1 - alpha_prod_prev) / (1 - alpha_prod_t)) * (
            1 - alpha_prod_t / alpha_prod_prev)
        std = self.eta * jnp.sqrt(variance)

        pred_dir = jnp.sqrt(1 - alpha_prod_prev - std ** 2) * eps
        prev_sample = jnp.sqrt(alpha_prod_prev) * x0 + pred_dir
        if self.eta > 0 and noise is not None:
            prev_sample = prev_sample + std * noise
        return prev_sample


jax.tree_util.register_dataclass(
    DDIMScheduler,
    data_fields=["schedule"],
    meta_fields=["num_inference_timesteps", "eta", "steps_offset",
                 "set_alpha_to_one"],
)


# --------------------------------------------------------------------- DDPM
@dataclasses.dataclass(frozen=True)
class DDPMScheduler:
    schedule: DiffusionSchedule
    variance_type: str = "fixed_small"

    @property
    def init_noise_sigma(self) -> float:
        return 1.0

    def timesteps(self) -> np.ndarray:
        T = self.schedule.num_train_timesteps
        return np.arange(T - 1, -1, -1, dtype=np.int64)

    def add_noise(self, original, noise, timesteps):
        return self.schedule.add_noise(original, noise, timesteps)

    def step(self, model_output: jnp.ndarray, timestep: jnp.ndarray,
             sample: jnp.ndarray,
             noise: jnp.ndarray | None = None) -> jnp.ndarray:
        """One ancestral DDPM update. `noise` must be provided for t > 0."""
        sch = self.schedule
        t = timestep
        alpha_prod_t = sch.alphas_cumprod[t]
        alpha_prod_prev = jnp.where(t > 0,
                                    sch.alphas_cumprod[jnp.maximum(t - 1, 0)],
                                    jnp.asarray(1.0, jnp.float32))
        beta_t = sch.betas[t]
        alpha_t = sch.alphas[t]

        x0, _ = sch._predict_x0_eps(model_output, sample, alpha_prod_t)

        x0_coeff = jnp.sqrt(alpha_prod_prev) * beta_t / (1 - alpha_prod_t)
        xt_coeff = jnp.sqrt(alpha_t) * (1 - alpha_prod_prev) / (
            1 - alpha_prod_t)
        prev_mean = x0_coeff * x0 + xt_coeff * sample

        if noise is None:
            return prev_mean
        variance = jnp.clip(
            beta_t * (1 - alpha_prod_prev) / (1 - alpha_prod_t), 1e-20, None)
        if self.variance_type == "fixed_large":
            variance = beta_t
        std = jnp.where(t > 0, jnp.sqrt(variance), 0.0)
        return prev_mean + std * noise


jax.tree_util.register_dataclass(
    DDPMScheduler, data_fields=["schedule"], meta_fields=["variance_type"])
