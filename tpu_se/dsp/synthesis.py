"""Waveform synthesis: enhanced LPS + noisy phase -> time-domain waveform.

Reference semantics (``Test_code/SourceCode_LogSpec2Wav_be/LogSpec2Wav.c``):

- Enhanced LPS is exponentiated with the same -50 floor used at analysis:
  power = LPS < -50 ? e^-50 : exp(LPS)  (``:481-495``).
- Per frame, the *noisy* frame is Hamming-windowed and FFT'd; each complex
  bin is scaled so its magnitude becomes sqrt(power) while keeping the noisy
  phase (``:682-691``).
- The inverse FFT output is windowed AGAIN (OLA_KIND==1, ``:712-713``) and
  overlap-added; the accumulated signal is divided by the accumulated
  squared-window envelope (``:798-827``), then truncated to int16 (``:829``).

The reference's ``rifft`` divides by N (``FEfunc.c:453-455``), so
``jnp.fft.irfft`` is the exact same transform.  Everything is batched: one
rfft/irfft over all frames, OLA as a vectorized two-hop segment sum (frame
length = 2 x shift).  Shapes are bucket-padded with a validity mask so any
utterance length reuses a bounded set of compiled programs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from tpu_se.dsp.analysis import (
    FFT_LENGTH, FRAME_BUCKET, FRAME_LENGTH, FRAME_SHIFT, LOG_FLOOR, NUM_BINS,
    frame_signal, hamming_window,
)


@jax.jit
def _synth_and_ola(lps_enh: jax.Array, noisy_frames: jax.Array,
                   valid: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Padded [T,257] LPS + [T,512] noisy frames + [T] 0/1 mask
    -> (OLA waveform [(T+1)*256], de-windowed recon frames [T,512]).

    Padded rows contribute nothing: their synthesis frames and their
    squared-window weights are masked out of both OLA accumulators.
    """
    win = jnp.asarray(hamming_window())
    spec = jnp.fft.rfft(noisy_frames * win[None, :], n=FFT_LENGTH, axis=-1)
    power = jnp.where(lps_enh < LOG_FLOOR, jnp.float32(np.exp(LOG_FLOOR)),
                      jnp.exp(lps_enh))
    mag = jnp.abs(spec)
    scale = jnp.where(mag > 0.0, jnp.sqrt(power) / jnp.maximum(mag, 1e-30),
                      0.0)
    synth = jnp.fft.irfft(spec * scale, n=FFT_LENGTH, axis=-1)

    # OLA of the re-windowed frames with per-frame validity weights.
    t = synth.shape[0]
    sw = synth * win[None, :] * valid[:, None]
    w2 = win * win
    first, second = sw[:, :FRAME_SHIFT], sw[:, FRAME_SHIFT:]
    acc = jnp.concatenate([first[:1], first[1:] + second[:-1], second[-1:]]
                          ).reshape(-1)
    d_first = w2[None, :FRAME_SHIFT] * valid[:, None]
    d_second = w2[None, FRAME_SHIFT:] * valid[:, None]
    denom = jnp.concatenate(
        [d_first[:1], d_first[1:] + d_second[:-1], d_second[-1:]]).reshape(-1)
    wave = acc / jnp.maximum(denom, 1e-20)
    recon_dewin = synth / win[None, :]
    return wave, recon_dewin


def reconstruct(lps_enh: np.ndarray, noisy_wave: np.ndarray
                ) -> tuple[np.ndarray, np.ndarray]:
    """Enhanced LPS [T,257] + noisy waveform -> (int16 wave, recon frames).

    ``recon frames`` [T,512] is the de-windowed per-frame reconstruction the
    reference uses for SegSNR (``DeWindow``, ``LogSpec2Wav.c:693-698``).
    The output waveform has ``T*256 + 256`` samples (``:798``) and is
    truncated toward zero like the C ``(short)`` cast.
    """
    noisy_frames = frame_signal(noisy_wave)
    t = noisy_frames.shape[0]
    if lps_enh.shape[0] != t:
        raise ValueError(
            f"LPS frames ({lps_enh.shape[0]}) != noisy frames ({t})")
    if lps_enh.shape[1] != NUM_BINS:
        raise ValueError(f"expected {NUM_BINS} bins, got {lps_enh.shape[1]}")
    t_pad = -(-t // FRAME_BUCKET) * FRAME_BUCKET
    lps_p = np.full((t_pad, NUM_BINS), LOG_FLOOR, dtype=np.float32)
    lps_p[:t] = lps_enh
    frames_p = np.zeros((t_pad, FRAME_LENGTH), dtype=np.float32)
    frames_p[:t] = noisy_frames
    valid = np.zeros(t_pad, dtype=np.float32)
    valid[:t] = 1.0
    wave, recon = _synth_and_ola(jnp.asarray(lps_p), jnp.asarray(frames_p),
                                 jnp.asarray(valid))
    wave = np.asarray(wave)[: t * FRAME_SHIFT + FRAME_SHIFT]
    wave_i16 = np.trunc(wave).astype(np.int16)
    return wave_i16, np.asarray(recon)[:t]


def lps_to_wav(lps_enh: np.ndarray, noisy_wave: np.ndarray) -> np.ndarray:
    """Convenience wrapper returning only the int16 waveform."""
    return reconstruct(lps_enh, noisy_wave)[0]
