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
length = 2 x shift).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from tpu_se.dsp.analysis import (
    FFT_LENGTH, FRAME_LENGTH, FRAME_SHIFT, LOG_FLOOR, NUM_BINS,
    frame_signal, hamming_window,
)


@jax.jit
def _synth_frames(lps_enh: jax.Array, noisy_frames: jax.Array) -> jax.Array:
    """[T,257] enhanced LPS + [T,512] raw noisy frames -> [T,512] irfft frames.

    The output is the raw inverse-FFT (analysis-windowed domain); the caller
    de-windows it for SegSNR (``DeWindow``, ``LogSpec2Wav.c:693-698``) and
    re-windows it for OLA (``:712-713``).
    """
    win = jnp.asarray(hamming_window())
    spec = jnp.fft.rfft(noisy_frames * win[None, :], n=FFT_LENGTH, axis=-1)
    power = jnp.where(lps_enh < LOG_FLOOR, jnp.float32(np.exp(LOG_FLOOR)),
                      jnp.exp(lps_enh))
    mag = jnp.abs(spec)
    scale = jnp.sqrt(power) / mag
    return jnp.fft.irfft(spec * scale, n=FFT_LENGTH, axis=-1)


@jax.jit
def _overlap_add(frames_windowed: jax.Array) -> jax.Array:
    """[T,512] synthesis-windowed frames -> [(T+1)*256] OLA / sum(win^2).

    Frame t occupies samples [t*256, t*256+512); with shift = length/2 every
    output hop receives exactly two contributions except the first and last.
    """
    t = frames_windowed.shape[0]
    win = jnp.asarray(hamming_window())
    w2 = win * win
    first, second = frames_windowed[:, :FRAME_SHIFT], frames_windowed[:, FRAME_SHIFT:]
    acc = jnp.concatenate([
        first[:1],
        first[1:] + second[:-1],
        second[-1:],
    ]).reshape(-1)
    denom_mid = w2[:FRAME_SHIFT] + w2[FRAME_SHIFT:]
    denom = jnp.concatenate([
        w2[:FRAME_SHIFT][None],
        jnp.broadcast_to(denom_mid, (t - 1, FRAME_SHIFT)),
        w2[FRAME_SHIFT:][None],
    ]).reshape(-1)
    return acc / denom


def reconstruct(lps_enh: np.ndarray, noisy_wave: np.ndarray
                ) -> tuple[np.ndarray, np.ndarray]:
    """Enhanced LPS [T,257] + noisy waveform -> (int16 wave, recon frames).

    ``recon_frames`` [T,512] is the de-windowed per-frame reconstruction the
    reference uses for SegSNR.  The output waveform has
    ``T*256 + 256`` samples (``LogSpec2Wav.c:798``) and is truncated toward
    zero like the C ``(short)`` cast.
    """
    noisy_frames = frame_signal(noisy_wave)
    t = noisy_frames.shape[0]
    if lps_enh.shape[0] != t:
        raise ValueError(
            f"LPS frames ({lps_enh.shape[0]}) != noisy frames ({t})")
    if lps_enh.shape[1] != NUM_BINS:
        raise ValueError(f"expected {NUM_BINS} bins, got {lps_enh.shape[1]}")
    synth = _synth_frames(jnp.asarray(lps_enh, dtype=jnp.float32),
                          jnp.asarray(noisy_frames))
    win = jnp.asarray(hamming_window())
    wave = np.asarray(_overlap_add(synth * win[None, :]))
    wave_i16 = np.trunc(wave).astype(np.int16)
    recon_dewindowed = np.asarray(synth / win[None, :])
    return wave_i16, recon_dewindowed


def lps_to_wav(lps_enh: np.ndarray, noisy_wave: np.ndarray) -> np.ndarray:
    """Convenience wrapper returning only the int16 waveform."""
    return reconstruct(lps_enh, noisy_wave)[0]
