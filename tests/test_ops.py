"""Pallas kernel correctness vs the jnp oracles (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from tpu_se.ops import (
    ggd_output_grad_pallas, ggd_output_grad_reference, lps_pallas,
    lps_reference,
)


def test_lps_kernel_matches_reference():
    rng = np.random.default_rng(0)
    frames = (rng.standard_normal((37, 512)) * 1000).astype(np.float32)
    got = np.asarray(lps_pallas(jnp.asarray(frames), interpret=True))
    want = np.asarray(lps_reference(jnp.asarray(frames)))
    assert got.shape == (37, 257)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_lps_kernel_floor_branch():
    frames = np.zeros((8, 512), dtype=np.float32)
    got = np.asarray(lps_pallas(jnp.asarray(frames), interpret=True))
    np.testing.assert_array_equal(got, -50.0)


@pytest.mark.parametrize("beta", [1.0, 0.9, 2.0])
def test_ggd_kernel_matches_reference(beta):
    rng = np.random.default_rng(1)
    out = rng.standard_normal((32, 257)).astype(np.float32)
    targ = rng.standard_normal((32, 257)).astype(np.float32)
    dedx, alpha = ggd_output_grad_pallas(jnp.asarray(out), jnp.asarray(targ),
                                         beta, interpret=True)
    dedx_ref, alpha_ref = ggd_output_grad_reference(
        jnp.asarray(out), jnp.asarray(targ), beta)
    np.testing.assert_allclose(np.asarray(alpha), np.asarray(alpha_ref),
                               rtol=1e-4)
    np.testing.assert_allclose(np.asarray(dedx), np.asarray(dedx_ref),
                               rtol=1e-4, atol=1e-6)


def test_ggd_kernel_zero_error():
    out = jnp.ones((8, 257))
    dedx, alpha = ggd_output_grad_pallas(out, out, 0.9, interpret=True)
    np.testing.assert_array_equal(np.asarray(dedx), 0.0)
    np.testing.assert_array_equal(np.asarray(alpha), 0.0)


def test_kernels_on_real_tpu():
    """Non-interpret correctness on real hardware (TPU-gated).

    The hermetic suite forces CPU (conftest), so this is normally skipped;
    the live proof run is tools/bench_pallas.py, whose committed output
    (benchmarks/pallas.json) records bitwise equality on the v5e.
    """
    import jax
    if jax.devices()[0].platform != "tpu":
        pytest.skip("requires a real TPU backend")
    rng = np.random.default_rng(2)
    frames = (rng.standard_normal((100, 512)) * 1000).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(lps_pallas(jnp.asarray(frames))),
        np.asarray(lps_reference(jnp.asarray(frames))), rtol=1e-4, atol=1e-4)
    out = rng.standard_normal((128, 257)).astype(np.float32)
    targ = rng.standard_normal((128, 257)).astype(np.float32)
    dedx, alpha = ggd_output_grad_pallas(jnp.asarray(out), jnp.asarray(targ),
                                         1.0)
    dedx_r, alpha_r = ggd_output_grad_reference(
        jnp.asarray(out), jnp.asarray(targ), 1.0)
    np.testing.assert_allclose(np.asarray(dedx), np.asarray(dedx_r),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(alpha), np.asarray(alpha_r),
                               rtol=1e-4)
