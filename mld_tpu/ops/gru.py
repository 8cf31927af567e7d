"""GRU as lax.scan with pack_padded-equivalent masking.

The t2m evaluator networks use torch bidirectional GRUs over
pack_padded_sequence (t2m_textenc.py:42, t2m_motionenc.py:59). On TPU the
equivalent is a masked scan: the hidden state only advances where t < length,
which reproduces packed semantics exactly — forward final state is h[len-1],
backward final state is the state after consuming positions len-1..0.

Weight layout mirrors torch.nn.GRU (gates ordered r|z|n) so evaluator
checkpoints convert directly.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


def _torch_gru_init(hidden_size: int):
    """torch nn.GRU weight init: symmetric U(-1/sqrt(H), +1/sqrt(H))."""
    bound = 1.0 / float(hidden_size) ** 0.5

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def _gru_step(x_t, h, w_ih, w_hh, b_ih, b_hh, hidden_size):
    """One torch-semantics GRU cell step. x_t [B, I], h [B, H]."""
    gi = x_t @ w_ih.T + b_ih
    gh = h @ w_hh.T + b_hh
    i_r, i_z, i_n = jnp.split(gi, 3, axis=-1)
    h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
    r = jax.nn.sigmoid(i_r + h_r)
    z = jax.nn.sigmoid(i_z + h_z)
    n = jnp.tanh(i_n + r * h_n)
    return (1.0 - z) * n + z * h


def gru_scan(x, lengths, h0, w_ih, w_hh, b_ih, b_hh, reverse=False):
    """Masked GRU over [B, T, I]. Returns (outputs [B, T, H], final [B, H]).

    Forward: h advances for t < len; final = h after step len-1.
    Reverse: iterate t = T-1..0, h advances only for t < len; final = h
    after step 0 — identical to packed reverse GRU.
    """
    B, T, _ = x.shape
    H = h0.shape[-1]
    ts = jnp.arange(T)
    if reverse:
        ts = ts[::-1]

    def body(h, t):
        x_t = x[:, t]
        h_new = _gru_step(x_t, h, w_ih, w_hh, b_ih, b_hh, H)
        valid = (t < lengths)[:, None]
        h = jnp.where(valid, h_new, h)
        return h, h

    final, outs = jax.lax.scan(body, h0, ts)
    outs = jnp.swapaxes(outs, 0, 1)  # [B, T, H] in scan order
    if reverse:
        outs = outs[:, ::-1]
    return outs, final


class BiGRU(nn.Module):
    """Single-layer bidirectional GRU, torch-compatible parameters."""
    input_size: int
    hidden_size: int

    @nn.compact
    def __call__(self, x, lengths, h0):
        """x [B, T, I], lengths [B], h0 [2, B, H] ->
        (outputs [B, T, 2H], final [2, B, H])."""
        H, I = self.hidden_size, self.input_size
        # torch nn.GRU reset_parameters: U(-1/sqrt(H), +1/sqrt(H)).
        # flax nn.initializers.uniform is U[0, scale] — all-positive
        # recurrent weights saturate the gates from step 0 (h0 has norm
        # ~sqrt(H)) and freeze the GRU at an input-independent fixed
        # point, which silently killed from-scratch evaluator training.
        init = _torch_gru_init(H)
        w_ih = self.param("weight_ih_l0", init, (3 * H, I))
        w_hh = self.param("weight_hh_l0", init, (3 * H, H))
        b_ih = self.param("bias_ih_l0", init, (3 * H,))
        b_hh = self.param("bias_hh_l0", init, (3 * H,))
        w_ih_r = self.param("weight_ih_l0_reverse", init, (3 * H, I))
        w_hh_r = self.param("weight_hh_l0_reverse", init, (3 * H, H))
        b_ih_r = self.param("bias_ih_l0_reverse", init, (3 * H,))
        b_hh_r = self.param("bias_hh_l0_reverse", init, (3 * H,))

        out_f, fin_f = gru_scan(x, lengths, h0[0], w_ih, w_hh, b_ih, b_hh)
        out_b, fin_b = gru_scan(x, lengths, h0[1], w_ih_r, w_hh_r, b_ih_r,
                                b_hh_r, reverse=True)
        outputs = jnp.concatenate([out_f, out_b], axis=-1)
        final = jnp.stack([fin_f, fin_b], axis=0)
        return outputs, final
