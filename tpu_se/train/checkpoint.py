"""Checkpointing: reference-compatible .wts plus a native full-state format.

The reference's per-epoch ``.wts`` file is its only checkpoint — optimizer
momentum is LOST on restart (SURVEY.md §5).  We write both:

- ``mlp.N.wts``  — weights only, byte-compatible with the reference
  (``Interface.cc:484-516``), so reference tooling can consume our models
  and vice versa.
- ``mlp.N.state.npz`` — weights + velocity + alpha, so a resumed run
  continues bit-identically (fixes the reference's momentum-loss quirk;
  loading falls back gracefully to .wts-only).

The sidecar is only written when requested (``with_state``): under the
parity schedule velocity is reset every epoch (``finetune.pl``'s process
model) and alpha is recomputed at the first ML bunch, so epoch-end
sidecars carry no information a resume needs — skipping them halves the
per-epoch checkpoint I/O (the sidecar is ~2x the .wts).  Mid-epoch
partial checkpoints always include it.
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

from tpu_se.io.wts import read_wts, write_wts
from tpu_se.models import params_from_wts, params_to_wts
from tpu_se.train.step import TrainState, make_train_state


def save_checkpoint(path_wts: str, state: TrainState,
                    with_state: bool = True) -> None:
    layers = params_to_wts(state.params)
    write_wts(path_wts, layers)
    if not with_state:
        return
    arrays = {}
    for i, l in enumerate(state.velocity):
        arrays[f"vel_w_{i}"] = np.asarray(l["w"])
        arrays[f"vel_b_{i}"] = np.asarray(l["b"])
    arrays["alpha"] = np.asarray(state.alpha)
    # Atomic like write_wts: a crash mid-write must not leave a truncated
    # sidecar that load_checkpoint would then try to restore.
    from tpu_se.io.atomic import atomic_write

    atomic_write(_state_path(path_wts), lambda f: np.savez(f, **arrays))


def load_checkpoint(path_wts: str) -> TrainState:
    params = params_from_wts(read_wts(path_wts))
    out_dim = params[-1]["b"].shape[0]
    state = make_train_state(params, out_dim)
    spath = _state_path(path_wts)
    if os.path.exists(spath):
        with np.load(spath) as z:
            velocity = [{"w": jnp.asarray(z[f"vel_w_{i}"]),
                         "b": jnp.asarray(z[f"vel_b_{i}"])}
                        for i in range(len(params))]
            state = TrainState(params, velocity, jnp.asarray(z["alpha"]))
    return state


def _state_path(path_wts: str) -> str:
    return path_wts + ".state.npz"
