"""Loss/gradient semantics tests (finite differences + closed forms)."""

import math

import numpy as np
import jax.numpy as jnp
import pytest

from tpu_se.losses import (
    beta_norm_grad, ggd_alpha, ggd_grad, ggd_loglik, output_grad_and_alpha,
    ref_gamma,
)


def _num_grad(f, x, eps=1e-4):
    g = np.zeros_like(x)
    it = np.nditer(x, flags=["multi_index"])
    for _ in it:
        idx = it.multi_index
        xp = x.copy(); xp[idx] += eps
        xm = x.copy(); xm[idx] -= eps
        g[idx] = (f(xp) - f(xm)) / (2 * eps)
    return g


@pytest.mark.parametrize("beta", [2.0, 1.0, 1.5, 0.9])
def test_beta_norm_grad_matches_finite_diff(beta):
    rng = np.random.default_rng(0)
    out = rng.normal(size=(4, 3)).astype(np.float64)
    targ = rng.normal(size=(4, 3)).astype(np.float64)

    def loss(o):
        return np.sum(np.abs(targ - o) ** beta)

    got = np.asarray(beta_norm_grad(jnp.asarray(out), jnp.asarray(targ), beta))
    want = _num_grad(loss, out)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_beta_norm_grad_zero_error_branch():
    out = jnp.asarray([[1.0, 2.0]])
    g = beta_norm_grad(out, out, 0.9)  # beta-1 < 0: pow would blow up
    np.testing.assert_array_equal(np.asarray(g), 0.0)
    g2 = beta_norm_grad(out, out, 2.0)
    np.testing.assert_array_equal(np.asarray(g2), 0.0)


def test_beta2_is_mmse():
    rng = np.random.default_rng(1)
    out = jnp.asarray(rng.normal(size=(5, 2)).astype(np.float32))
    targ = jnp.asarray(rng.normal(size=(5, 2)).astype(np.float32))
    np.testing.assert_allclose(np.asarray(beta_norm_grad(out, targ, 2.0)),
                               2.0 * np.asarray(out - targ), rtol=1e-6)


@pytest.mark.parametrize("beta", [2.0, 1.0, 0.9])
def test_ggd_alpha_closed_form(beta):
    rng = np.random.default_rng(2)
    err = rng.normal(size=(64, 5))
    want = (beta * np.mean(np.abs(err) ** beta, axis=0)) ** (1.0 / beta)
    got = np.asarray(ggd_alpha(jnp.asarray(err), beta))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_ggd_grad_matches_finite_diff():
    beta = 1.5
    rng = np.random.default_rng(3)
    out = rng.normal(size=(4, 3))
    targ = rng.normal(size=(4, 3))
    alpha = np.abs(rng.normal(size=3)) + 0.5

    def neg_loglik_term(o):
        # The only out-dependent term of -loglik is sum |e/alpha|^beta.
        return np.sum((np.abs(o - targ) / alpha) ** beta)

    got = np.asarray(ggd_grad(jnp.asarray(out - targ), jnp.asarray(alpha), beta))
    want = _num_grad(neg_loglik_term, out)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_output_grad_includes_loss_side_scaling():
    rng = np.random.default_rng(4)
    out = jnp.asarray(rng.normal(size=(8, 3)).astype(np.float32))
    targ = jnp.asarray(rng.normal(size=(8, 3)).astype(np.float32))
    g_mmse, alpha = output_grad_and_alpha(out, targ, 2.0, ml=False)
    np.testing.assert_allclose(np.asarray(g_mmse),
                               np.asarray(2.0 * (out - targ)) / 8, rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(alpha), 1.0)
    g_ml, alpha_ml = output_grad_and_alpha(out, targ, 1.0, ml=True)
    # alpha for beta=1: mean |e| per dim.
    want_alpha = np.mean(np.abs(np.asarray(out - targ)), axis=0)
    np.testing.assert_allclose(np.asarray(alpha_ml), want_alpha, rtol=1e-5)
    want_g = np.sign(np.asarray(out - targ)) / want_alpha / 8
    np.testing.assert_allclose(np.asarray(g_ml), want_g, rtol=1e-5)


def test_ref_gamma_accuracy():
    for x in [0.5, 1.0 / 0.9, 1.0, 1.5, 2.5, 3.7, 5.25, 10.0 / 3]:
        assert ref_gamma(x) == pytest.approx(math.gamma(x), rel=2e-5)


def test_ggd_loglik_formula():
    rng = np.random.default_rng(5)
    err = rng.normal(size=(16, 4))
    alpha = np.abs(rng.normal(size=4)) + 0.5
    beta = 0.9
    n, d = err.shape
    want = (n * d * math.log(beta / (2 * math.gamma(1 / beta)))
            - n * np.sum(np.log(alpha))
            - np.sum((np.abs(err) / alpha) ** beta))
    got = ggd_loglik(err, alpha, beta, use_ref_gamma=False)
    assert got == pytest.approx(want, rel=1e-6)
    # ref-gamma variant agrees to ~1e-5 relative.
    assert ggd_loglik(err, alpha, beta) == pytest.approx(want, rel=1e-4)
