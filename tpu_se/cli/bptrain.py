"""``tpu_se bptrain key=value ...`` — drop-in ``BPtrain_Sigmoid`` front-end.

The reference trainer is one process per epoch invoked as
``BPtrain_Sigmoid key=value ...`` (parser ``Interface.cc:150-315``; the
driver ``finetune.pl:50-76`` builds those strings).  This shim accepts the
exact same strings, so a ``finetune.pl``-style script drives tpu_se by
swapping only the binary name:

    $exe = "python -m tpu_se bptrain";

Semantics match the reference binary, not the multi-epoch ``train``
command: ONE epoch — load ``initwts_file`` (or random-init from the
``init_randem_*`` ranges, ``Interface.cc:140-143``), train over
``train_sent_range``, write ``outwts_file``, run CV over ``cv_sent_range``
and append the reference's metric lines to ``log_file``
(``BPtrain.cc:105,131-139``).  Skip-if-exists stays in the caller's hands
(``finetune.pl:49`` checks ``-e $outwts_file`` itself; the binary always
trains).

Key handling mirrors ``Interface.cc``: an argument without ``=`` is a
format error; a key it does not know is silently ignored (that is how the
reference swallows ``finetune.pl``'s ``numlayers=`` — the layer count
comes from parsing ``layersizes``).  tpu_se extension keys (grad_scale,
compute_dtype, activation, device_resident, mesh_data, mesh_model) are
accepted the same way.
"""

from __future__ import annotations

import math
import os
import sys
import time

import numpy as np

# Interface.cc string / int / float key sets (:150-315).
_STR_KEYS = {"fea_file", "norm_file", "targ_file", "outwts_file",
             "log_file", "initwts_file", "train_sent_range",
             "cv_sent_range"}
_INT_KEYS = {"fea_dim", "fea_context", "targ_offset", "dropoutflag",
             "MLflag", "traincache", "bunchsize", "gpu_used",
             "init_randem_seed"}
_FLOAT_KEYS = {"momentum", "shapefactor", "weightcost", "lrate",
               "visible_omit", "hid_omit", "init_randem_weight_min",
               "init_randem_weight_max", "init_randem_bias_min",
               "init_randem_bias_max"}
# tpu_se extensions (same key=value surface).
_EXT_STR = {"grad_scale", "compute_dtype", "activation", "device_resident"}
_EXT_INT = {"mesh_data", "mesh_model", "device_resident_max_bytes"}

_DEFAULTS = {
    # Interface.cc:140-148 defaults (only the init ranges have reference
    # defaults; the rest mirror finetune.pl:10-40 so partial commands work).
    "init_randem_weight_min": -0.1, "init_randem_weight_max": 0.1,
    "init_randem_bias_min": -0.1, "init_randem_bias_max": 0.1,
    "fea_dim": 257, "fea_context": 7, "targ_offset": 3,
    "dropoutflag": 0, "MLflag": 1, "traincache": 102400, "bunchsize": 128,
    "gpu_used": 0, "init_randem_seed": 27870775,
    "momentum": 0.9, "shapefactor": 1.0, "weightcost": 1e-5, "lrate": 0.1,
    "visible_omit": 0.1, "hid_omit": 0.1,
    "layersizes": (1799, 2048, 2048, 2048, 257),
    "train_sent_range": "0-7", "cv_sent_range": "8-9",
    "fea_file": "", "norm_file": "", "targ_file": "",
    "outwts_file": "", "log_file": "", "initwts_file": "",
    "grad_scale": "parity", "compute_dtype": "float32",
    "activation": "sigmoid", "device_resident": "auto",
    "device_resident_max_bytes": 0,  # 0 = TrainConfig default
    "mesh_data": 1, "mesh_model": 1,
}


def parse_kv(argv: list[str]) -> dict:
    """``Interface.cc:150-161`` arg loop: '=' required, unknown keys with
    '=' silently ignored."""
    cfg = dict(_DEFAULTS)
    for arg in argv:
        if "=" not in arg:
            # Interface.cc:153-157: "Arg: %s  Format Error" + exit.
            raise SystemExit(f"Arg: {arg}  Format Error")
        key, val = arg.split("=", 1)
        if key in _STR_KEYS or key in _EXT_STR:
            cfg[key] = val
        elif key in _INT_KEYS or key in _EXT_INT:
            cfg[key] = int(float(val)) if val else 0
        elif key in _FLOAT_KEYS:
            cfg[key] = float(val)
        elif key == "layersizes":
            cfg[key] = tuple(int(x) for x in val.split(","))
        # else: silently ignored (numlayers=..., etc.) like the reference.
    return cfg


def _parse_range(text: str) -> tuple[int, int]:
    lo, hi = text.split("-")
    return int(lo), int(hi)


def run_bptrain(cfg: dict, log=print) -> int:
    """One reference-binary epoch: train, write .wts, CV, write log."""
    import jax.numpy as jnp

    from tpu_se.data import PfilePairDataset
    from tpu_se.models import init_params_uniform
    from tpu_se.train.checkpoint import load_checkpoint, save_checkpoint
    from tpu_se.train.loop import (
        evaluate_cv, load_device_frames, train_one_epoch,
    )
    from tpu_se.train.step import TrainHyper, make_train_state

    for req in ("fea_file", "targ_file", "norm_file", "outwts_file"):
        if not cfg[req]:
            raise SystemExit(f"bptrain: {req}= is required")

    hyper = TrainHyper(
        beta=cfg["shapefactor"], ml=bool(cfg["MLflag"]),
        momentum=cfg["momentum"], weightcost=cfg["weightcost"],
        bunchsize=cfg["bunchsize"], context=cfg["fea_context"],
        targ_offset=cfg["targ_offset"], grad_scale=cfg["grad_scale"],
        compute_dtype=(jnp.bfloat16 if cfg["compute_dtype"] == "bfloat16"
                       else jnp.float32),
        activation=cfg["activation"],
        dropout=((cfg["visible_omit"], cfg["hid_omit"])
                 if cfg["dropoutflag"] else None),
    )
    mesh = None
    if cfg["mesh_data"] > 1 or cfg["mesh_model"] > 1:
        from tpu_se.parallel import make_mesh
        mesh = make_mesh(cfg["mesh_data"], cfg["mesh_model"])

    dataset = PfilePairDataset(
        cfg["fea_file"], cfg["targ_file"], cfg["norm_file"],
        _parse_range(cfg["train_sent_range"]), cfg["traincache"],
        cfg["fea_context"], cfg["targ_offset"])
    cv_dataset = PfilePairDataset(
        cfg["fea_file"], cfg["targ_file"], cfg["norm_file"],
        _parse_range(cfg["cv_sent_range"]), cfg["traincache"],
        cfg["fea_context"], cfg["targ_offset"])

    if cfg["initwts_file"]:
        # Reference binary semantics: the .wts carries WEIGHTS ONLY
        # (Interface.cc:429-468); momentum restarts at zero every epoch
        # process.  Rebuild the state from the params so a stray
        # .state.npz sidecar next to initwts_file cannot smuggle velocity
        # across epochs (design invariant: per-epoch momentum reset).
        state = load_checkpoint(cfg["initwts_file"])
        state = make_train_state(state.params, cfg["layersizes"][-1])
    else:
        params = init_params_uniform(
            cfg["init_randem_seed"], cfg["layersizes"],
            cfg["init_randem_weight_min"], cfg["init_randem_weight_max"],
            cfg["init_randem_bias_min"], cfg["init_randem_bias_max"])
        state = make_train_state(params, cfg["layersizes"][-1])

    lines: list[str] = ["parameters input:"]
    for k in sorted(cfg):
        lines.append(f"{k}: {cfg[k]}")
    # Additive to the reference log format: record the execution backend so
    # run artifacts prove which device trained the epoch.
    import jax
    dev0 = jax.devices()[0]
    lines.append(f"jax backend: {dev0.platform} ({dev0.device_kind})")

    from tpu_se.train.loop import TrainConfig
    resident_max = (cfg["device_resident_max_bytes"]
                    or TrainConfig.device_resident_max_bytes)

    def resident(ds):
        if cfg["device_resident"] == "never":
            return None
        if cfg["device_resident"] == "auto" and ds.span_bytes() > resident_max:
            return None
        return load_device_frames(ds, mesh)

    t0 = time.time()
    rng = np.random.default_rng(cfg["init_randem_seed"])
    state = train_one_epoch(state, dataset, hyper, cfg["lrate"], rng,
                            mesh=mesh, device_frames=resident(dataset),
                            log=lines.append)
    lines.append(f"Total cost time: {time.time() - t0:.1f} s.")
    # Weights only (no .state.npz): the reference's per-epoch process writes
    # a bare .wts and the next epoch restarts momentum from zero — a sidecar
    # here would make a finetune.pl-style chain carry velocity across epochs.
    save_checkpoint(cfg["outwts_file"], state, with_state=False)
    log(f"weights -> {cfg['outwts_file']}")

    lines.append("Starting CV.")
    metrics = evaluate_cv(state, cv_dataset, hyper,
                          device_frames=resident(cv_dataset))
    n = max(1, metrics["cv_frames"])
    # Reference per-sample metric lines, BPtrain.cc:131-139.
    lines.append(f"CV over. squared error: "
                 f"{metrics['cv_squared_error'] / n:f}")
    lines.append(f"CV over. square root squared error: "
                 f"{metrics['cv_abs_error'] / n:f}")
    if cfg["MLflag"]:
        lines.append(f"CV2 over. CV log likelihood: "
                     f"{metrics['cv_ggd_loglik'] / n:f}")
    if cfg["log_file"]:
        log_dir = os.path.dirname(cfg["log_file"])
        if log_dir:
            os.makedirs(log_dir, exist_ok=True)
        with open(cfg["log_file"], "w") as f:
            f.write("\n".join(lines) + "\n")
    log(f"CV squared error {metrics['cv_squared_error'] / n:.6f}, "
        f"abs {metrics['cv_abs_error'] / n:.6f}, "
        f"GGD loglik {metrics['cv_ggd_loglik'] / n:.6f}")
    if not math.isfinite(metrics["cv_squared_error"]):
        return 1
    return 0


def main(argv=None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    return run_bptrain(parse_kv(argv))


if __name__ == "__main__":
    sys.exit(main())
