"""Momentum-SGD with weight decay, matching ``kernUpdatedelta`` exactly.

``delta = momentum*delta - lr*(grad/n + weightcost*w);  w += delta``
(``DevFunc.cu:490-507``, applied by ``kernAccSum`` ``:427-443``).

- ``grad`` is the SUM over the bunch of per-sample gradients (the reference's
  ``dedx @ y^T`` GEMM), already carrying the loss-side 1/M in parity mode —
  so the effective step is lr/M^2 on the loss gradient (SURVEY.md §3.2).
- Weight decay is applied to weights only; biases use weightcost=0
  (``BP_GPU.cu:433-435``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sgd_momentum_init(params):
    return jax.tree.map(jnp.zeros_like, params)


def sgd_momentum_update(params, velocity, grads, lr, momentum: float,
                        weightcost: float, n: int):
    """One reference-exact update. grads are bunch-summed; n is the bunch size."""
    def upd(path_is_bias, p, v, g):
        wc = 0.0 if path_is_bias else weightcost
        v_new = momentum * v - lr * (g / n + wc * p)
        return p + v_new, v_new

    new_params, new_velocity = [], []
    for p_l, v_l, g_l in zip(params, velocity, grads):
        w, vw = upd(False, p_l["w"], v_l["w"], g_l["w"])
        b, vb = upd(True, p_l["b"], v_l["b"], g_l["b"])
        new_params.append({"w": w, "b": b})
        new_velocity.append({"w": vw, "b": vb})
    return new_params, new_velocity
