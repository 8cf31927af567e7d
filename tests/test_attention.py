"""Fused-attention dispatch: pallas/XLA agreement + gradients through the
custom VJP (interpret mode on CPU; the same code path compiles on TPU)."""
import numpy as np
import jax
import jax.numpy as jnp

import mld_tpu  # noqa: F401
from mld_tpu.ops.attention import sdpa, sdpa_pallas, sdpa_xla


def _inputs(B=2, H=2, Sq=24, Sk=24, Dh=16, seed=0):
    rng = np.random.RandomState(seed)
    q = jnp.asarray(rng.randn(B, H, Sq, Dh), jnp.float32)
    k = jnp.asarray(rng.randn(B, H, Sk, Dh), jnp.float32)
    v = jnp.asarray(rng.randn(B, H, Sk, Dh), jnp.float32)
    valid = jnp.asarray(np.arange(Sk)[None] < np.asarray([Sk, Sk // 2])[:, None])
    return q, k, v, valid


def test_pallas_interpret_matches_xla():
    q, k, v, valid = _inputs()
    a = np.asarray(sdpa_pallas(q, k, v, valid, interpret=True))
    b = np.asarray(sdpa_xla(q, k, v, valid))
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_grads_flow_through_pallas_path():
    q, k, v, valid = _inputs()

    def loss_pallas(q, k, v):
        return jnp.sum(sdpa(q, k, v, valid, use_pallas=True) ** 2)

    def loss_xla(q, k, v):
        return jnp.sum(sdpa(q, k, v, valid, use_pallas=False) ** 2)

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gp, gx):
        assert np.isfinite(np.asarray(a)).all()
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_grads_under_jit_and_no_mask():
    q, k, v, _ = _inputs()
    f = jax.jit(jax.grad(
        lambda q: jnp.sum(sdpa(q, k, v, None, use_pallas=True))))
    g = f(q)
    assert np.isfinite(np.asarray(g)).all()
