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


# ---------------------------------------------- fused causal MHA (CLIP)
def test_flash_causal_matches_xla_ref():
    from mld_tpu.ops.attention import sdpa_flash_causal, _xla_causal_ref
    rng = np.random.RandomState(1)
    B, H, S, Dh = 3, 4, 77, 64
    q = jnp.asarray(rng.randn(B, H, S, Dh), jnp.float32)
    k = jnp.asarray(rng.randn(B, H, S, Dh), jnp.float32)
    v = jnp.asarray(rng.randn(B, H, S, Dh), jnp.float32)
    out = sdpa_flash_causal(q, k, v, sm_scale=0.125, interpret=True)
    ref = _xla_causal_ref(q, k, v, 0.125)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_flash_causal_bf16_and_grad():
    from mld_tpu.ops.attention import flash_causal_sdpa, _xla_causal_ref
    rng = np.random.RandomState(2)
    B, H, S, Dh = 2, 2, 33, 16
    mk = lambda: jnp.asarray(rng.randn(B, H, S, Dh), jnp.bfloat16)
    q, k, v = mk(), mk(), mk()
    out = flash_causal_sdpa(q, k, v, 0.25)
    ref = _xla_causal_ref(q, k, v, 0.25)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), atol=2e-2)
    g = jax.grad(lambda q_: jnp.sum(
        flash_causal_sdpa(q_.astype(jnp.bfloat16), k, v, 0.25)
        .astype(jnp.float32)))(q.astype(jnp.float32))
    assert np.isfinite(np.asarray(g)).all()


def test_clip_tower_flash_gate_parity(monkeypatch):
    """Whole CLIP tower: flash path (interpret) == einsum path."""
    from mld_tpu.models.clip_text import ClipTextModel
    model = ClipTextModel(width=64, layers=2, heads=4, projection_dim=64)
    ids = jnp.asarray(np.random.RandomState(0).randint(
        1, 49405, size=(3, 77)), jnp.int32)
    monkeypatch.setenv("MLD_TPU_CLIP_FLASH", "0")
    params = model.init(jax.random.PRNGKey(0), ids)["params"]
    ref = model.apply({"params": params}, ids, mode="hidden")
    monkeypatch.setenv("MLD_TPU_CLIP_FLASH", "1")
    out = model.apply({"params": params}, ids, mode="hidden")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
