"""Fused Pallas serving kernels under shard_map (VERDICT r4 task 7).

The auto-gate drops the fused denoiser/decoder to the XLA path on >1
device because SPMD cannot auto-partition a pallas_call — but under
shard_map each shard is a single-device program, so forcing
MLD_TPU_FUSED_DENOISER=1 / MLD_TPU_FUSED_DECODE=1 must (a) actually take
the fused path and (b) match the XLA path on the same mesh. On the CPU
test mesh the kernels run in Pallas interpret mode (fused_layer.py
auto-selects it off-TPU); on real multi-chip hardware the same shard_map
program runs the compiled Mosaic kernels per chip.
"""
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from mld_tpu.config import load_config
from mld_tpu.models.mld import MLD
from mld_tpu.parallel.mesh import make_mesh

shard_map = jax.shard_map


def _tiny_mld():
    cfg = load_config(None, {
        "debug": True,
        "model": {"latent_dim": 32, "ff_size": 64, "num_layers": 3,
                  "denoiser_num_layers": 3, "num_heads": 4,
                  "text_encoded_dim": 32, "clip_layers": 2, "clip_heads": 2,
                  "scheduler": {"num_inference_timesteps": 3}},
        "dataset": {"max_motion_len": 32, "min_motion_len": 8},
    }, preset="mld_humanml3d")
    mld = MLD(cfg)
    params = mld.init_params(jax.random.PRNGKey(0))
    return cfg, mld, params


def _sharded_generate(mld, mesh):
    """Fresh shard_map+jit closure (a cached jit would not retrace when
    the fused-path env flags flip between arms)."""
    def gen(p, ids_, mask_, r):
        return mld._generate_impl(p, ids_, mask_, r)

    # check_vma=False: pallas_call does not annotate its out_shape vma and
    # the DDIM scan carry starts replicated (from the broadcast rng) but
    # turns varying once mixed with the data-sharded cond — both are fine
    # without the vma checker, and per-shard numerics are unaffected
    return jax.jit(shard_map(
        gen, mesh=mesh,
        in_specs=(P(), P("data"), P("data"), P()),
        out_specs=P("data"), check_vma=False))


def test_fused_serving_under_shard_map(monkeypatch):
    cfg, mld, params = _tiny_mld()
    B, T = 16, cfg.dataset.max_motion_len
    ids = jnp.asarray(mld.tokenize(["a person walks forward"] * B))
    mask = jnp.arange(T)[None] < jnp.full((B, 1), T)
    rng = jax.random.PRNGKey(3)
    mesh = make_mesh(num_data=8)

    monkeypatch.setenv("MLD_TPU_FUSED_DENOISER", "0")
    monkeypatch.setenv("MLD_TPU_FUSED_DECODE", "0")
    ref = np.asarray(_sharded_generate(mld, mesh)(params, ids, mask, rng))

    monkeypatch.setenv("MLD_TPU_FUSED_DENOISER", "1")
    monkeypatch.setenv("MLD_TPU_FUSED_DECODE", "1")
    # the forced gate must actually be on (not silently auto-disabled by
    # the >1-device check) ...
    assert mld._use_fused_denoiser()
    fused = np.asarray(_sharded_generate(mld, mesh)(params, ids, mask, rng))

    # ... and parity with the XLA path holds per shard
    assert np.isfinite(fused).all()
    np.testing.assert_allclose(fused, ref, atol=2e-4)
    # the two paths are different programs; bit-identical output would
    # mean the fused path silently fell back to XLA
    assert np.abs(fused - ref).max() > 0.0
