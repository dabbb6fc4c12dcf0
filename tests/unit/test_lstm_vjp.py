"""lstm_recurrence custom VJP vs jax.grad of the identical plain scan.

The custom backward (saved gates + cell sequence, dR hoisted to one GEMM)
must be numerically the same gradient XLA derives from the scan itself —
including the Keras mask pass-through and the final-carry cotangent.
"""

import numpy as np

import jax
import jax.numpy as jnp

from icl.models.rnn import lstm_recurrence


def _plain_scan(x_proj, R2, mask2):
    """The pre-custom-VJP formulation, differentiable by XLA."""
    H = R2.shape[1]
    G, B = x_proj.shape[1], x_proj.shape[2]

    def step(carry, inp):
        h_prev, c_prev = carry
        zx_t, m_t = inp
        z = zx_t + jnp.einsum("gbh,ghk->gbk", h_prev, R2)
        i = jax.nn.sigmoid(z[..., :H])
        f = jax.nn.sigmoid(z[..., H:2 * H])
        g = jnp.tanh(z[..., 2 * H:3 * H])
        o = jax.nn.sigmoid(z[..., 3 * H:])
        c = f * c_prev + i * g
        h = o * jnp.tanh(c)
        m = m_t[..., None].astype(x_proj.dtype)
        h = m * h + (1 - m) * h_prev
        c = m * c + (1 - m) * c_prev
        return (h, c), h

    init = (jnp.zeros((G, B, H), x_proj.dtype),
            jnp.zeros((G, B, H), x_proj.dtype))
    (h_final, _), hs = jax.lax.scan(step, init, (x_proj, mask2))
    return hs, h_final


def _problem(seed=0, L=9, G=2, B=5, H=6):
    rng = np.random.default_rng(seed)
    x_proj = jnp.asarray(rng.normal(size=(L, G, B, 4 * H)).astype(np.float32))
    R2 = jnp.asarray(rng.normal(size=(G, H, 4 * H)).astype(np.float32) * 0.3)
    lengths = rng.integers(1, L + 1, size=(G, B))
    mask2 = jnp.asarray(np.arange(L)[:, None, None] < lengths[None])
    Rh = jnp.asarray(rng.normal(size=(L, G, B, H)).astype(np.float32))
    Rf = jnp.asarray(rng.normal(size=(G, B, H)).astype(np.float32))
    return x_proj, R2, mask2, Rh, Rf


def test_forward_identical():
    x_proj, R2, mask2, _, _ = _problem()
    hs_a, hf_a = lstm_recurrence(x_proj, R2, mask2, 1)
    hs_b, hf_b = _plain_scan(x_proj, R2, mask2)
    np.testing.assert_array_equal(np.asarray(hs_a), np.asarray(hs_b))
    np.testing.assert_array_equal(np.asarray(hf_a), np.asarray(hf_b))


def test_gradients_match_autodiff():
    x_proj, R2, mask2, Rh, Rf = _problem()

    def loss(fn):
        def L(x_proj, R2):
            hs, hf = fn(x_proj, R2)
            # exercise BOTH cotangent paths: sequence and final carry
            return jnp.sum(hs * Rh) + jnp.sum(hf * Rf)
        return L

    g_custom = jax.grad(loss(lambda x, r: lstm_recurrence(x, r, mask2, 1)),
                        argnums=(0, 1))(x_proj, R2)
    g_ref = jax.grad(loss(lambda x, r: _plain_scan(x, r, mask2)),
                     argnums=(0, 1))(x_proj, R2)
    for name, a, b in zip(["dx_proj", "dR2"], g_custom, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5, err_msg=name)


def test_gradients_match_autodiff_seq_only():
    """Relation-model usage: only the sequence output is consumed."""
    x_proj, R2, mask2, Rh, _ = _problem(seed=3)
    g_custom = jax.grad(
        lambda x: jnp.sum(lstm_recurrence(x, R2, mask2, 1)[0] * Rh))(x_proj)
    g_ref = jax.grad(
        lambda x: jnp.sum(_plain_scan(x, R2, mask2)[0] * Rh))(x_proj)
    np.testing.assert_allclose(np.asarray(g_custom), np.asarray(g_ref),
                               atol=1e-5, rtol=1e-5)
