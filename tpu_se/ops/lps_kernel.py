"""Fused LPS front-end kernel: frames -> log-power spectrum in one pass.

The analysis pipeline (window -> FFT -> power -> floored log,
``Wav2LogSpec_be.c:448-479``) as a single Pallas kernel: one MXU GEMM
against the windowed-DFT basis with the square/add/log epilogue fused in
VMEM — the HBM traffic is exactly one read of the frames and one write of
the 257-dim LPS rows.

Layout: the 2*257 basis columns are padded to 2*384 (lane-aligned 128
multiples); the kernel computes on the padded block and the caller slices
the 257 real bins.

STATUS: RETIRED from the hot path (round 2, measured on the real v5e —
``benchmarks/pallas.json``, ``tools/bench_pallas.py``).  Non-interpret TPU
run is bitwise-identical to the XLA twin (max_abs_err 0.0) but measurably
SLOWER: 127.5 us vs 121.8 us at T=512 frames and 150.1 us vs 133.6 us at
T=4096 (1.05-1.12x).  XLA already fuses the square/add/log epilogue into
the GEMM output, and its fp32 matmul tiling beats the hand block spec, so
``wav_to_lps`` keeps the jnp path.  Kept as a verified Pallas template.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from tpu_se.dsp.analysis import (
    FFT_LENGTH, FRAME_LENGTH, LOG_FLOOR, NUM_BINS, _windowed_dft_basis,
)

PAD_BINS = 384          # 257 -> next multiple of 128
TILE_T = 256            # frames per grid step


@functools.lru_cache(maxsize=None)
def _padded_basis() -> np.ndarray:
    """[512, 2*PAD_BINS]: [Re | 0-pad | Im | 0-pad] windowed DFT columns."""
    basis = _windowed_dft_basis(FRAME_LENGTH, FFT_LENGTH)  # [512, 514]
    out = np.zeros((FRAME_LENGTH, 2 * PAD_BINS), dtype=np.float32)
    out[:, :NUM_BINS] = basis[:, :NUM_BINS]
    out[:, PAD_BINS:PAD_BINS + NUM_BINS] = basis[:, NUM_BINS:]
    return out


def _lps_kernel(frames_ref, basis_ref, out_ref):
    spec = jnp.dot(frames_ref[:], basis_ref[:],
                   preferred_element_type=jnp.float32)
    re = spec[:, :PAD_BINS]
    im = spec[:, PAD_BINS:]
    power = re * re + im * im
    floor = jnp.float32(np.exp(LOG_FLOOR))
    # Padded columns have power 0 -> hit the floor branch; never log(0).
    out_ref[:] = jnp.where(power < floor, jnp.float32(LOG_FLOOR),
                           jnp.log(jnp.maximum(power, floor)))


@functools.partial(jax.jit, static_argnames=("interpret",))
def lps_pallas(frames: jax.Array, interpret: bool = False) -> jax.Array:
    """float32 frames [T, 512] -> LPS [T, 257] via the fused kernel."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    t = frames.shape[0]
    t_pad = -(-t // TILE_T) * TILE_T
    frames_p = jnp.pad(frames.astype(jnp.float32), ((0, t_pad - t), (0, 0)))
    basis = jnp.asarray(_padded_basis())

    out = pl.pallas_call(
        _lps_kernel,
        out_shape=jax.ShapeDtypeStruct((t_pad, PAD_BINS), jnp.float32),
        grid=(t_pad // TILE_T,),
        in_specs=[
            pl.BlockSpec((TILE_T, FRAME_LENGTH), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((FRAME_LENGTH, 2 * PAD_BINS), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE_T, PAD_BINS), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * t_pad * FRAME_LENGTH * 2 * PAD_BINS,
            bytes_accessed=4 * (t_pad * FRAME_LENGTH
                                + FRAME_LENGTH * 2 * PAD_BINS
                                + t_pad * PAD_BINS),
            transcendentals=t_pad * PAD_BINS,
        ),
        interpret=interpret,
    )(frames_p, basis)
    return out[:t, :NUM_BINS]


def lps_reference(frames: jax.Array) -> jax.Array:
    """jnp twin (identical math, XLA-scheduled) — the correctness oracle."""
    from tpu_se.dsp.analysis import lps_from_frames
    return lps_from_frames(frames, method="matmul")
