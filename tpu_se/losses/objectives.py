"""Training objectives: classic beta-norm and the ML-GGD log-likelihood.

Reference semantics (``Train_code_ML_GGD/BP_GPU.cu:396-426``,
``DevFunc.cu:376-398,468-489``, ``README.md:83-107``):

- beta-norm (MLflag=0): loss sum_m sum_d |t - y|^beta; output gradient
  ``beta * sign(y - t) * |y - t|^(beta-1)`` with the e == 0 branch forced to
  0 (``kernSubClean2``).  beta=2 -> MMSE, beta=1 -> LAD.
- ML-GGD (MLflag=1): per-dimension scale factors re-estimated in closed form
  every minibatch from the UNSCALED error,
  ``alpha_d = (beta/M * sum_m |e_md|^beta)^(1/beta)``, then
  gradient ``beta * sign(e) * |e|^(beta-1) / alpha_d^beta`` (``kernfunc2``).

Under data parallelism the alpha statistic is a GLOBAL-batch mean: the mean
over the sharded batch axis lowers to a psum over the `data` mesh axis
(SURVEY.md §2.4) — this is the one collective the loss itself needs.

Both gradients are divided by the bunch size M (``DevVecMulNum``,
``BP_GPU.cu:409,423``); the optimizer divides by M *again*
(``kernUpdatedelta``'s ``gradient/n``) — the reference's documented 1/M^2
quirk (SURVEY.md §3.2).  The division here is the loss-side 1/M only; the
scale mode lives in the optimizer.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def _sign_pow(e: jax.Array, exponent: float) -> jax.Array:
    """sign(e) * |e|^exponent with the e == 0 branch exactly 0.

    Mirrors the three-way branch in ``kernSubClean2``/``kernfunc2``; the
    where-guard also keeps the value finite for exponent < 0 (beta < 1).
    """
    abs_e = jnp.abs(e)
    safe = jnp.where(abs_e == 0.0, 1.0, abs_e)
    return jnp.where(abs_e == 0.0, 0.0, jnp.sign(e) * safe ** exponent)


def beta_norm_grad(out: jax.Array, targ: jax.Array, beta: float) -> jax.Array:
    """d/d_out of sum |targ - out|^beta, elementwise [M, D]."""
    return beta * _sign_pow(out - targ, beta - 1.0)


def ggd_alpha(err: jax.Array, beta: float) -> jax.Array:
    """Closed-form ML scale factors [D] from the raw error [M, D].

    ``alpha = (beta * mean_m |e|^beta)^(1/beta)`` (``BP_GPU.cu:413-420``).
    ``jnp.mean`` over the (possibly sharded) batch axis makes this the
    global-batch statistic under DP.
    """
    mean_pow = jnp.mean(jnp.abs(err) ** beta, axis=0)
    return (beta * mean_pow) ** (1.0 / beta)


def ggd_grad(err: jax.Array, alpha: jax.Array, beta: float) -> jax.Array:
    """ML-GGD output gradient [M, D] given raw error and scale factors.

    alpha_d == 0 (all-zero error in dim d) maps to gradient 0, like the
    reference's e == 0 branch in ``kernfunc2`` — not 0 * inf.
    """
    safe_alpha = jnp.where(alpha == 0.0, 1.0, alpha)
    scale = jnp.where(alpha == 0.0, 0.0, beta / safe_alpha ** beta)
    return _sign_pow(err, beta - 1.0) * scale


def output_grad_and_alpha(out: jax.Array, targ: jax.Array, beta: float,
                          ml: bool) -> tuple[jax.Array, jax.Array]:
    """The reference's full output-layer gradient chain for one bunch.

    Returns (dedx [M, D] including the loss-side 1/M, alpha [D]).
    For ml=False alpha is returned as ones (unused, keeps the step
    signature static for jit).
    """
    m = out.shape[0]
    err = out - targ
    if ml:
        alpha = ggd_alpha(err, beta)
        dedx = ggd_grad(err, alpha, beta) / m
    else:
        alpha = jnp.ones(out.shape[1], dtype=out.dtype)
        dedx = beta_norm_grad(out, targ, beta) / m
    return dedx, alpha


def ggd_loglik(err, alpha, beta: float, use_ref_gamma: bool = True) -> float:
    """GGD log-likelihood of a CV set, as ``CrossValid2`` reports it.

    ``n*D*log(beta/(2*Gamma(1/beta))) - n*sum_d log(alpha_d)
      - sum_{m,d} |e_md / alpha_d|^beta``  (``BP_GPU.cu:254-306``).

    ``use_ref_gamma`` selects the reference's polynomial Gamma
    approximation (parity for logged values); otherwise exact lgamma.
    """
    err = jnp.asarray(err)
    alpha = jnp.asarray(alpha)
    n, d = err.shape
    if use_ref_gamma:
        gamma_val = ref_gamma(1.0 / beta)
    else:
        gamma_val = math.exp(math.lgamma(1.0 / beta))
    t1 = n * d * math.log(beta / (2.0 * gamma_val))
    t2 = float(n * jnp.sum(jnp.log(alpha)))
    t3 = float(jnp.sum((jnp.abs(err) / alpha) ** beta))
    return t1 - t2 - t3


def ref_gamma(x: float) -> float:
    """The reference's polynomial Gamma(x) (``BP_GPU.cu:593-640``).

    Degree-10 polynomial on (2, 3] plus the recurrence Gamma(x+1) = x
    Gamma(x) — accurate to ~1e-7, reproduced so CV log-likelihood values
    match the reference's logs digit-for-digit.
    """
    coeffs = [0.0000677106, -0.0003442342, 0.0015397681, -0.0024467480,
              0.0109736958, -0.0002109075, 0.0742379071, 0.0815782188,
              0.4118402518, 0.4227843370, 1.0000000000]
    if 2.0 < x <= 3.0:
        t = x - 2.0
        acc = 0.0
        for i, c in enumerate(coeffs):
            acc += c * t ** (10 - i)
        return acc
    if 0.0 < x <= 1.0:
        return ref_gamma(x + 2.0) / (x * (x + 1.0))
    if 1.0 < x <= 2.0:
        return ref_gamma(x + 1.0) / x
    if x > 3.0:
        prod = 1.0
        while x > 3.0:
            x -= 1.0
            prod *= x
        return prod * ref_gamma(x)
    return 0.0
