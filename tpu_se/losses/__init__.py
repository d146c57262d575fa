from tpu_se.losses.objectives import (
    beta_norm_grad, ggd_alpha, ggd_grad, ggd_loglik, ref_gamma,
    output_grad_and_alpha,
)

__all__ = [
    "beta_norm_grad", "ggd_alpha", "ggd_grad", "ggd_loglik", "ref_gamma",
    "output_grad_and_alpha",
]
