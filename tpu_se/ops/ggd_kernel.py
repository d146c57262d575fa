"""Fused ML-GGD output-layer gradient kernel.

Replaces the reference's 8-kernel device chain (``BP_GPU.cu:408-423``:
Deverror -> Devabsolutevalus -> Devindex2 -> DevSumcol -> DevDivide ->
DevVecMulNum -> Devindex2 -> Devfunc2) with ONE Pallas kernel: for a bunch
(out, targ) it computes the raw error, the per-dimension |e|^beta batch
reduction, the closed-form alpha, and the scaled gradient in a single VMEM
pass.

This is the jnp-equivalent of ``tpu_se.losses.output_grad_and_alpha``
(ml=True); XLA fuses that chain well already.

STATUS: RETIRED from the hot path (round 2, measured on the real v5e —
``benchmarks/pallas.json``, ``tools/bench_pallas.py``).  Non-interpret TPU
run is bitwise-identical to the XLA twin (max_abs_err 0.0) but a
statistical tie standalone (131.5 us vs 130.5 us at the parity bunch
M=128), and inside the fused train step the whole alpha chain is FREE
(fused into adjacent GEMMs — CLAUDE.md stage ablation), which a separate
custom-call can never beat.  At M=4096 the ungridded whole-array kernel
exceeds the 16 MB scoped-VMEM limit (42 MB requested) while XLA runs it in
159 us; gridding it into a two-pass reduction is not worth doing for a
retired kernel.  Kept as a verified Pallas template; use M <= ~1024.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _ggd_kernel(out_ref, targ_ref, beta_ref, dedx_ref, alpha_ref):
    beta = beta_ref[0, 0]
    m = out_ref.shape[0]
    err = out_ref[:] - targ_ref[:]
    abs_e = jnp.abs(err)
    safe = jnp.where(abs_e == 0.0, 1.0, abs_e)
    pow_b = jnp.where(abs_e == 0.0, 0.0, safe ** beta)
    alpha = (beta * jnp.sum(pow_b, axis=0, keepdims=True) / m) ** (1.0 / beta)
    sgn_pow = jnp.where(abs_e == 0.0, 0.0,
                        jnp.sign(err) * safe ** (beta - 1.0))
    safe_alpha = jnp.where(alpha == 0.0, 1.0, alpha)
    scale = jnp.where(alpha == 0.0, 0.0, beta / safe_alpha ** beta)
    dedx_ref[:] = sgn_pow * scale / m
    alpha_ref[:] = alpha


@functools.partial(jax.jit, static_argnames=("interpret",))
def ggd_output_grad_pallas(out: jax.Array, targ: jax.Array, beta,
                           interpret: bool = False
                           ) -> tuple[jax.Array, jax.Array]:
    """(out, targ) [M, D] + beta -> (dedx [M, D] incl. 1/M, alpha [1, D])."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m, d = out.shape
    beta_arr = jnp.full((1, 1), beta, dtype=jnp.float32)
    dedx, alpha = pl.pallas_call(
        _ggd_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((m, d), jnp.float32),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(out.astype(jnp.float32), targ.astype(jnp.float32), beta_arr)
    return dedx, alpha[0]


def ggd_output_grad_reference(out: jax.Array, targ: jax.Array, beta: float
                              ) -> tuple[jax.Array, jax.Array]:
    """jnp twin — identical to losses.output_grad_and_alpha(ml=True)."""
    from tpu_se.losses import output_grad_and_alpha
    return output_grad_and_alpha(out, targ, beta, ml=True)
