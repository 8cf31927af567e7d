"""Sharded (multi-device) evaluation produces the same per-batch outputs as
single-device execution. (Aggregate FID over a handful of samples is
numerically chaotic — near-singular covariance + sqrtm — so the comparison
is on the raw evaluator embeddings/joints, max diff ~1e-6.)"""
import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

import mld_tpu  # noqa: F401
from mld_tpu.config import load_config
from mld_tpu.data.datamodule import get_datamodule
from mld_tpu.data.synthetic import build_synthetic_dataset
from mld_tpu.eval.pipeline import Evaluator
from mld_tpu.models.mld import MLD
from mld_tpu.parallel.mesh import make_mesh


def test_sharded_eval_batch_matches_single(tmp_path):
    root = str(tmp_path / "data")
    build_synthetic_dataset(root, n_samples=64, seed=3)
    cfg = load_config(None, {
        "debug": True,
        "model": {"latent_dim": 32, "ff_size": 64, "num_layers": 3,
                  "denoiser_num_layers": 3, "num_heads": 4,
                  "text_encoded_dim": 32, "clip_layers": 2, "clip_heads": 2,
                  "scheduler": {"num_inference_timesteps": 3}},
        "dataset": {"root": root, "max_motion_len": 48,
                    "min_motion_len": 16},
        "eval": {"batch_size": 8, "diversity_times": 4, "r_size": 4},
    }, preset="mld_humanml3d")
    mld = MLD(cfg)
    dm = get_datamodule(cfg, tokenizer=mld.tokenizer)
    mld.mean = jnp.asarray(dm.mean, jnp.float32)
    mld.std = jnp.asarray(dm.std, jnp.float32)
    mld.mean_eval, mld.std_eval = mld.mean, mld.std
    params = mld.init_params(jax.random.PRNGKey(0))
    ev = Evaluator(cfg, mld, dm)

    batch = next(iter(dm.loader("val", shuffle=False, drop_last=True,
                                batch_size=8)))
    args = (jnp.asarray(batch["text_ids"]), jnp.asarray(batch["word_embs"]),
            jnp.asarray(batch["pos_ohot"]), jnp.asarray(batch["text_len"]),
            jnp.asarray(batch["motion"]), jnp.asarray(batch["mask"]),
            jnp.asarray(batch["length"]))
    rng = jax.random.PRNGKey(5)
    out1 = ev._eval_batch_jit(params, *args, rng, stage="diffusion")

    mesh = make_mesh(num_data=8)
    sh = NamedSharding(mesh, P("data"))
    args_sh = tuple(jax.device_put(a, sh) for a in args)
    params_sh = jax.device_put(params, NamedSharding(mesh, P()))
    out2 = ev._eval_batch_jit(params_sh, *args_sh, rng, stage="diffusion")

    for key in ("lat_t", "lat_rm", "lat_m", "joints_rst", "joints_ref"):
        np.testing.assert_allclose(np.asarray(out1[key]),
                                   np.asarray(out2[key]), atol=1e-4,
                                   err_msg=key)

    # the full driver also runs with a mesh (host loop unchanged)
    res = ev.run_split(params, dm.loader("val", shuffle=False,
                                         drop_last=True, batch_size=8),
                       rng, mesh=mesh)
    assert np.isfinite(list(res.values())).all()
