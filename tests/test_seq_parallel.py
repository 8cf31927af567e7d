"""Sequence-axis sharding headroom (SURVEY §5): the no-VAE denoiser (the
long-sequence stressor — full attention over 196 frames) runs with its
activations sharded along the TIME axis of the mesh, XLA inserting the
collectives, and matches unsharded execution."""
import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

import mld_tpu  # noqa: F401
from mld_tpu.models.denoiser import MldDenoiser
from mld_tpu.parallel.mesh import make_mesh


def test_novae_denoiser_sequence_sharded():
    T, NF, D = 64, 32, 32
    den = MldDenoiser(nfeats=NF, condition="text", latent_dim=D, ff_size=64,
                      num_layers=3, num_heads=4, dropout=0.0,
                      arch="trans_enc", skip_connect=True,
                      diffusion_only=True, text_encoded_dim=D)
    rngs = jax.random.split(jax.random.PRNGKey(0), 2)
    B = 4
    sample = jax.random.normal(rngs[0], (B, T, NF))
    cond = jax.random.normal(rngs[1], (B, 1, D))
    mask = jnp.ones((B, T), bool)
    params = den.init({"params": jax.random.PRNGKey(1)}, sample,
                      jnp.asarray(0), cond, mask)["params"]

    fn = jax.jit(lambda p, s, c, m: den.apply(
        {"params": p}, s, jnp.asarray(500), c, m))
    ref = np.asarray(fn(params, sample, cond, mask))

    # shard the frame axis over the mesh "model" axis (sequence parallel)
    mesh = make_mesh(num_data=2, num_model=4)
    seq_sh = NamedSharding(mesh, P("data", "model", None))
    sample_sh = jax.device_put(sample, seq_sh)
    mask_sh = jax.device_put(mask, NamedSharding(mesh, P("data", "model")))
    cond_sh = jax.device_put(cond, NamedSharding(mesh, P("data")))
    params_sh = jax.device_put(params, NamedSharding(mesh, P()))

    out = np.asarray(fn(params_sh, sample_sh, cond_sh, mask_sh))
    np.testing.assert_allclose(out, ref, atol=1e-4)
