"""Context splicing: 257-dim frames -> 1799-dim (7-frame) training inputs.

Two edge policies, matching the reference's train/test asymmetry
(SURVEY.md §3.3):

- training drops each sentence's first/last (context-1)/2 frames — windows
  must lie entirely inside a sentence (``Interface.cc:778-785``);
- decode replicates the edge frames so every frame gets a prediction
  (``Test_code/frame_expand.m:4-28``, equivalent to clamping the neighbor
  index into [0, T-1]).

The host variant materializes the spliced matrix (parity tests, small CV
sets).  The training fast path does NOT use it: frames stay [F, 257] in HBM
and the splice is a device-side gather inside the jitted step (7x less
host->device traffic).
"""

from __future__ import annotations

import numpy as np

from tpu_se.data.chunks import ChunkPlan, sentence_windows


def splice_frames(frames: np.ndarray, starts: np.ndarray,
                  context: int = 7) -> np.ndarray:
    """Gather windows: frames [F, D], starts [N] -> [N, context*D]."""
    frames = np.asarray(frames)
    starts = np.asarray(starts, dtype=np.int64)
    idx = starts[:, None] + np.arange(context)[None, :]
    return frames[idx].reshape(len(starts), context * frames.shape[1])


def splice_replicated(frames: np.ndarray, context: int = 7) -> np.ndarray:
    """Decode-style splice with edge replication: [T, D] -> [T, context*D].

    Neighbor indices clamp into [0, T-1] — exactly what
    ``frame_expand.m:7-10,19-22`` does with its 1-based boundary tests.
    """
    frames = np.asarray(frames)
    t_total = frames.shape[0]
    half = (context - 1) // 2
    cols = [frames[np.clip(np.arange(t_total) + c, 0, t_total - 1)]
            for c in range(-half, half + 1)]
    return np.concatenate(cols, axis=1)


def window_starts_for_chunk(plan: ChunkPlan, chunk_idx: int,
                            rng: np.random.Generator | None = None
                            ) -> np.ndarray:
    """Window starts for a chunk, optionally shuffled (training order).

    The reference scatters sequential samples to a Fisher-Yates-shuffled
    order (``Interface.cc:751-753, 975-986``); a permutation of the start
    array is the same distribution with a counter-based RNG instead of
    drand48 (SURVEY.md §7.4: statistical, not bitwise, equivalence).
    """
    starts = sentence_windows(plan, chunk_idx)
    if rng is not None:
        starts = rng.permutation(starts)
    return starts
