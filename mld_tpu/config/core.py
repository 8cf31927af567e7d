"""Typed configuration system.

Replaces the reference's argparse+OmegaConf 4-way merge
(mld/config.py:7-206) with plain dataclasses + a YAML overlay chain:
defaults -> experiment yaml -> CLI overrides. The four reference capability
configs (config_mld_humanml3d / config_vae_humanml3d / config_novae_humanml3d
/ config_mld_humanact12) map onto the presets in `presets.py`.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional


def merge_dicts(base: Dict, override: Dict) -> Dict:
    """Recursive dict overlay (override wins)."""
    out = dict(base)
    for k, v in override.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = merge_dicts(out[k], v)
        else:
            out[k] = v
    return out


@dataclass
class SchedulerConfig:
    """DDIM/DDPM settings (configs/modules/scheduler.yaml parity)."""
    kind: str = "ddim"                 # inference scheduler: ddim | ddpm
    num_train_timesteps: int = 1000
    num_inference_timesteps: int = 50
    beta_start: float = 0.00085
    beta_end: float = 0.012
    beta_schedule: str = "scaled_linear"
    eta: float = 0.0
    clip_sample: bool = False
    set_alpha_to_one: bool = False
    steps_offset: int = 1
    variance_type: str = "fixed_small"
    prediction_type: str = "epsilon"   # "sample" when PREDICT_EPSILON=False


@dataclass
class ModelConfig:
    vae: bool = True
    vae_type: str = "mld"              # mld | actor | vposert | no
    condition: str = "text"            # text | text_uncond | action
    latent_size: int = 1
    latent_dim: int = 256
    ff_size: int = 1024
    num_layers: int = 9
    num_heads: int = 4
    dropout: float = 0.1
    activation: str = "gelu"
    normalize_before: bool = False
    position_embedding: str = "learned"
    vae_arch: str = "encoder_decoder"  # encoder_decoder | all_encoder
    mlp_dist: bool = False             # ABLATION.MLP_DIST
    denoiser_arch: str = "trans_enc"   # trans_enc | trans_dec
    denoiser_num_layers: int = 9
    skip_connect: bool = True
    guidance_scale: float = 7.5
    guidance_uncondp: float = 0.1
    text_encoded_dim: int = 768
    clip_path: str = "deps/clip-vit-large-patch14"
    clip_last_hidden: bool = False
    clip_layers: int = 12
    clip_heads: int = 12
    # frozen text-tower activation dtype (bf16 feeds the MXU at full rate)
    clip_compute_dtype: str = "bfloat16"
    nclasses: int = 10
    t2m_path: str = "deps/t2m"
    # frozen a2m classifier checkpoints (assets.yaml:30-31); random-init
    # fallback keeps synthetic/offline pipelines runnable
    humanact12_rec_path: str = "deps/actionrecognition"
    uestc_rec_path: str = "deps/actionrecognition"
    scheduler: SchedulerConfig = field(default_factory=SchedulerConfig)
    # compute dtype for the denoiser/vae ("float32" | "bfloat16")
    dtype: str = "float32"


@dataclass
class DatasetConfig:
    name: str = "humanml3d"
    root: str = "datasets/humanml3d"
    njoints: int = 22
    nfeats: int = 263
    max_motion_len: int = 196          # SAMPLER.MAX_LEN
    min_motion_len: int = 40
    max_text_len: int = 20
    unit_len: int = 4
    frame_rate: float = 20.0
    word_vectorizer_path: str = "deps/glove"
    # stream batches through the native C++ loader when available
    # (default on; falls back to the Python path when g++/the .so is
    # unavailable — see data/datamodule.py)
    native_loader: bool = True
    smpl_path: str = "deps/smpl_models/smpl"
    nclasses: int = 10
    num_frames: int = 60               # a2m fixed clip length


@dataclass
class LossConfig:
    lambda_latent: float = 1e-5
    lambda_kl: float = 1e-4
    lambda_rec: float = 1.0
    lambda_joint: float = 1.0
    lambda_gen: float = 1.0
    lambda_cross: float = 1.0
    lambda_cycle: float = 0.0
    lambda_prior: float = 0.0


@dataclass
class TrainConfig:
    stage: str = "diffusion"           # vae | diffusion | vae_diffusion
    batch_size: int = 64
    end_epoch: int = 2000
    lr: float = 1e-4
    predict_epsilon: bool = True
    pretrained_vae: str = ""
    pretrained: str = ""
    resume: str = ""
    num_workers: int = 8
    split: str = "train"
    seed: int = 1234
    # parallelism: devices along the data axis of the mesh (-1 = all,
    # 1 = force single-device: no mesh, unlocking the fused K-step scan
    # and device-resident-corpus paths on multi-device hosts)
    data_parallel: int = -1
    # rematerialize model forwards in the loss (trade FLOPs for memory)
    remat: bool = False
    # optimizer steps fused into one lax.scan program per dispatch
    # (amortizes launch latency; >1 is single-device only). 0 = auto:
    # 8 on single-device TPU (the tunnel's ~100ms dispatch + serialized
    # H2D otherwise dominates the loop), 1 elsewhere
    steps_per_dispatch: int = 0
    # device-resident training corpus: whole split in HBM with on-device
    # batch sampling fused into the train scan (data/device_dataset.py).
    # "auto" = on for single-device TPU runs when the corpus fits
    # (<= device_data_max_gb), "on"/"off" force it. Replaces the host
    # input pipeline in the steady-state loop (one PRNG key per dispatch)
    device_data: str = "auto"
    device_data_max_gb: float = 8.0


@dataclass
class EvalConfig:
    batch_size: int = 32
    split: str = "test"
    replication_times: int = 20
    mm_num_samples: int = 100
    mm_num_repeats: int = 30
    mm_num_times: int = 10
    diversity_times: int = 300
    r_size: int = 32  # R-precision ranking group size
    # npz with trained t2m evaluator params ({text,move,motion} trees);
    # overrides finest.tar lookup. Produced by eval/t2m_train.py for
    # synthetic corpora (random-init evaluators pin R-precision at chance)
    t2m_params_path: str = ""
    metrics: List[str] = field(
        default_factory=lambda: ["TemosMetric", "TM2TMetrics"])


@dataclass
class TestConfig:
    checkpoints: str = ""
    batch_size: int = 1
    split: str = "test"
    mean: bool = False
    fact: float = 1.0
    num_samples: int = 1
    count_time: bool = False
    save_predictions: bool = False
    replication_times: int = 20


@dataclass
class LoggerConfig:
    folder: str = "./experiments"
    save_checkpoint_epoch: int = 200
    log_every_steps: int = 1
    val_every_epochs: int = 200  # validation cadence in epochs (the reference's misnamed VAL_EVERY_STEPS, train.py:152)
    # run the full eval-metric suite (FID/R-precision/...) on the val split
    # at the validation cadence, as the reference does (mld.py:811-907);
    # skipped automatically when the val split is smaller than EVAL.r_size
    val_metrics: bool = True
    tensorboard: bool = True


@dataclass
class Config:
    name: str = "mld_tpu_experiment"
    debug: bool = False
    seed: int = 1234
    accelerator: str = "tpu"
    model: ModelConfig = field(default_factory=ModelConfig)
    dataset: DatasetConfig = field(default_factory=DatasetConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    eval: EvalConfig = field(default_factory=EvalConfig)
    test: TestConfig = field(default_factory=TestConfig)
    loss: LossConfig = field(default_factory=LossConfig)
    logger: LoggerConfig = field(default_factory=LoggerConfig)

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)


def _from_dict(cls, data: Dict[str, Any]):
    if not dataclasses.is_dataclass(cls):
        return data
    fields = {f.name: f for f in dataclasses.fields(cls)}
    kwargs = {}
    for key, val in data.items():
        key_l = key.lower()
        if key_l not in fields:
            raise KeyError(f"unknown config key '{key}' for {cls.__name__}")
        f = fields[key_l]
        if dataclasses.is_dataclass(f.type) or (
                isinstance(f.default_factory, type)
                and dataclasses.is_dataclass(f.default_factory)):
            sub_cls = (f.type if dataclasses.is_dataclass(f.type)
                       else f.default_factory)
            kwargs[key_l] = _from_dict(sub_cls, val)
        elif isinstance(val, dict):
            # nested dataclass referenced via default_factory
            sub = f.default_factory() if f.default_factory is not dataclasses.MISSING else None
            if sub is not None and dataclasses.is_dataclass(sub):
                kwargs[key_l] = _from_dict(type(sub), val)
            else:
                kwargs[key_l] = val
        else:
            kwargs[key_l] = val
    return cls(**kwargs)


def config_from_dict(data: Dict[str, Any]) -> Config:
    return _from_dict(Config, data)


def config_to_dict(cfg) -> Dict[str, Any]:
    return dataclasses.asdict(cfg)


def load_config(path: Optional[str] = None,
                overrides: Optional[Dict[str, Any]] = None,
                preset: Optional[str] = None) -> Config:
    """defaults (or preset) <- yaml file <- overrides."""
    from . import presets

    base = (presets.get_preset(preset) if preset
            else config_to_dict(Config()))
    if path:
        import yaml
        with open(path) as f:
            base = merge_dicts(base, yaml.safe_load(f) or {})
    if overrides:
        base = merge_dicts(base, overrides)
    return config_from_dict(base)
