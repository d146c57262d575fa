"""Pallas TPU kernels for the hot ops.

Each kernel has a pure-jnp twin used as the CPU fallback and the
correctness oracle; on non-TPU backends the Pallas path runs in interpret
mode (tests) or falls back to jnp.
"""

from tpu_se.ops.lps_kernel import lps_pallas, lps_reference
from tpu_se.ops.ggd_kernel import ggd_output_grad_pallas, ggd_output_grad_reference

__all__ = [
    "lps_pallas", "lps_reference",
    "ggd_output_grad_pallas", "ggd_output_grad_reference",
]
