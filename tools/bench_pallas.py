#!/usr/bin/env python
"""Prove-or-retire run for the Pallas kernels on the real backend.

For each kernel (fused LPS front-end `tpu_se.ops.lps_pallas`, fused ML-GGD
output gradient `tpu_se.ops.ggd_output_grad_pallas`) this:

1. runs it NON-interpreted on the current backend and checks it against its
   jnp/XLA twin (correctness on real hardware, not the CPU interpreter);
2. times both paths with an in-jit `lax.scan` loop (K dependent iterations
   per program, one device sync) so per-call relay/dispatch latency is
   amortized out and the numbers are device µs/call.

Emits one JSON line per measurement and, with --out, a combined JSON file
(committed as benchmarks/pallas.json) so round-over-round changes are
visible.  Reference analogues: the 8-kernel GGD chain `BP_GPU.cu:408-423`
and the per-frame window+rfft+log loop `Wav2LogSpec_be.c:448-479` /
`FEfunc.c:146-293`.

Usage: timeout 590 python tools/bench_pallas.py [--out benchmarks/pallas.json]
"""

import argparse
import json
import os
import sys
import time
import traceback

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def timed_loop(fn, x, k, reps=3):
    """Device time per call of fn(x) via a K-step dependent scan.

    fn must map an array to an array (or tuple; first leaf used).  Each
    scan step perturbs the input with the previous output so the compiler
    cannot hoist or CSE the body; the perturbation is +0.0 in fp32.
    """
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(x):
        def body(c, _):
            y = fn(x + c)
            leaf = y[0] if isinstance(y, tuple) else y
            return leaf.ravel()[0] * jnp.float32(1e-30), None
        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=k)
        return c

    float(run(x))                      # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(run(x))
        best = min(best, time.perf_counter() - t0)
    return best / k


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None, help="write combined JSON here")
    ap.add_argument("--loop", type=int, default=200,
                    help="scan iterations per timing program")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from tpu_se.ops import (
        ggd_output_grad_pallas, ggd_output_grad_reference, lps_pallas,
        lps_reference,
    )

    platform = jax.devices()[0].platform
    results = {"platform": platform, "loop": args.loop, "kernels": {}}
    rng = np.random.default_rng(0)

    def emit(name, rec):
        results["kernels"][name] = rec
        print(json.dumps({"kernel": name, **rec}))

    # ---- LPS front-end: pallas vs XLA twin ---------------------------------
    try:
        frames = jnp.asarray(
            (rng.standard_normal((1000, 512)) * 1000).astype(np.float32))
        got = np.asarray(lps_pallas(frames))
        want = np.asarray(lps_reference(frames))
        err = float(np.max(np.abs(got - want)))
        ok = bool(np.allclose(got, want, rtol=1e-4, atol=1e-4))
        emit("lps_correctness", {"ok": ok, "max_abs_err": err,
                                 "shape": [1000, 512]})
    except Exception:
        emit("lps_correctness", {"ok": False,
                                 "error": traceback.format_exc(limit=3)})

    for t in (512, 4096):
        x = jnp.asarray(
            (rng.standard_normal((t, 512)) * 1000).astype(np.float32))
        rec = {"frames": t}
        try:
            rec["pallas_us"] = round(
                timed_loop(lambda a: lps_pallas(a), x, args.loop) * 1e6, 2)
        except Exception:
            rec["pallas_error"] = traceback.format_exc(limit=3)
        try:
            rec["xla_us"] = round(
                timed_loop(lambda a: lps_reference(a), x, args.loop) * 1e6, 2)
        except Exception:
            rec["xla_error"] = traceback.format_exc(limit=3)
        if "pallas_us" in rec and "xla_us" in rec:
            rec["pallas_over_xla"] = round(rec["pallas_us"] / rec["xla_us"], 3)
        emit(f"lps_T{t}", rec)

    # ---- GGD output gradient: pallas vs XLA twin ---------------------------
    try:
        out = jnp.asarray(rng.standard_normal((128, 257)).astype(np.float32))
        targ = jnp.asarray(rng.standard_normal((128, 257)).astype(np.float32))
        dedx, alpha = ggd_output_grad_pallas(out, targ, 1.0)
        dedx_r, alpha_r = ggd_output_grad_reference(out, targ, 1.0)
        ok = (np.allclose(np.asarray(dedx), np.asarray(dedx_r),
                          rtol=1e-4, atol=1e-6)
              and np.allclose(np.asarray(alpha), np.asarray(alpha_r),
                              rtol=1e-4))
        err = float(np.max(np.abs(np.asarray(dedx) - np.asarray(dedx_r))))
        emit("ggd_correctness", {"ok": bool(ok), "max_abs_err": err,
                                 "shape": [128, 257]})
    except Exception:
        emit("ggd_correctness", {"ok": False,
                                 "error": traceback.format_exc(limit=3)})

    for m in (128, 4096):
        o = jnp.asarray(rng.standard_normal((m, 257)).astype(np.float32))
        tg = jnp.asarray(rng.standard_normal((m, 257)).astype(np.float32))
        rec = {"bunch": m}
        try:
            rec["pallas_us"] = round(timed_loop(
                lambda a: ggd_output_grad_pallas(a, tg, 1.0), o,
                args.loop) * 1e6, 2)
        except Exception:
            rec["pallas_error"] = traceback.format_exc(limit=3)
        try:
            rec["xla_us"] = round(timed_loop(
                lambda a: ggd_output_grad_reference(a, tg, 1.0), o,
                args.loop) * 1e6, 2)
        except Exception:
            rec["xla_error"] = traceback.format_exc(limit=3)
        if "pallas_us" in rec and "xla_us" in rec:
            rec["pallas_over_xla"] = round(rec["pallas_us"] / rec["xla_us"], 3)
        emit(f"ggd_M{m}", rec)

    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)
        print(f"# wrote {args.out}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
