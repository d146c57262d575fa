#!/usr/bin/env python
"""Gradient-collective overlap engineering (VERDICT r4 #1).

The round-3/4 finding: GSPMD + the TPU all-reduce combiner emit ONE fused,
fully-synchronous 25.2 MB gradient all-reduce for the sharded natural-config
train step — structurally dependent on the LAST backward GEMM, so no
overlap is possible and the ≥95 % DP crossing sits at M_local ≈ 20k.

This tool sweeps the levers that can change the emitted program, AOT-
compiling the SAME train step for a real v5e-8 topology per combo:

  A. --xla_all_reduce_combine_threshold_bytes: keep per-layer all-reduces
     separate so layer k's psum is dependency-free w.r.t. layers <k
     backward GEMMs (the reference's own compute/update overlap intent,
     BP_GPU.cu:31-50,430-437).
  B. TPU async-collective / latency-hiding-scheduler flags: turn the
     separate collectives into all-reduce-start/done pairs that the
     scheduler can hide behind those GEMMs.

Per combo it records: compile ok, # gradient collectives (>=1 MB),
# async all-reduce pairs, payload bytes, and for async pairs the
schedule distance (instructions between start and done — >0 means the
scheduler actually placed work inside the window).

Writes benchmarks/overlap_sweep.json; saves the winning HLO to
artifacts/hlo/train_step_v5e8_overlap.hlo.txt.

Usage (axon relay, ONE process, under timeout):
  timeout 590 python tools/overlap_sweep.py
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

GRAD_MIN_BYTES = 1 << 20


def _shape_bytes(shape: str) -> int:
    elems = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4, "pred": 1}
    total = 0
    for m in re.finditer(r"(\w+)\[([\d,]*)\]", shape):
        dt, dims = m.group(1), m.group(2)
        if dt not in elems:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * elems[dt]
    return total


_INSTR = re.compile(r"^\s*(?:ROOT\s+)?%?([\w.\-]+) = (.+?) ([\w\-]+)\((.*)$")


def analyze(txt: str) -> dict:
    """Collective census of a scheduled TPU HLO."""
    lines = txt.splitlines()
    grads, asyncs, small = [], [], []
    start_pos = {}
    for i, line in enumerate(lines):
        m = _INSTR.match(line)
        if not m:
            continue
        name, shape, op, _ = m.groups()
        nbytes = _shape_bytes(shape)
        if op == "all-reduce-start":
            start_pos[name] = (i, nbytes)
        elif op == "all-reduce-done":
            ref = re.search(r"all-reduce-done\(%?([\w.\-]+)", line)
            src = ref.group(1) if ref else None
            si, sbytes = start_pos.get(src, (i, nbytes))
            # count real (non-bookkeeping) ops scheduled inside the window
            inner = 0
            inner_fusions = []
            for j in range(si + 1, i):
                mm = _INSTR.match(lines[j])
                if mm and mm.group(3) not in ("get-tuple-element", "bitcast",
                                              "tuple", "parameter",
                                              "constant"):
                    inner += 1
                    if mm.group(3) in ("fusion", "dot", "custom-call",
                                       "convolution"):
                        inner_fusions.append(f"{mm.group(1)}:{mm.group(3)}")
            asyncs.append({"start": src, "bytes": sbytes,
                           "sched_window_ops": inner,
                           "overlapped_compute": inner_fusions[:12]})
        elif op == "all-reduce":
            (grads if nbytes >= GRAD_MIN_BYTES else small).append(
                {"name": name, "bytes": nbytes})
    return {
        "sync_grad_allreduces": grads,
        "sync_small_allreduces": len(small),
        "async_pairs": asyncs,
        "async_grad_pairs": [a for a in asyncs
                             if a["bytes"] >= GRAD_MIN_BYTES],
    }


_ASYNC = {
    "xla_tpu_enable_async_collective_fusion": "true",
    "xla_tpu_enable_async_collective_fusion_fuse_all_reduce": "true",
}
_LHS = {"xla_tpu_enable_latency_hiding_scheduler": "true"}

_TC = {"xla_tpu_overlap_compute_collective_tc": "true"}

COMBOS = [
    ("baseline", {}),
    ("async+lhs", {**_ASYNC, **_LHS}),
    ("sm:baseline", {}),
    ("sm:async", dict(_ASYNC)),
    ("sm:async+lhs", {**_ASYNC, **_LHS}),
    ("sm:lhs", dict(_LHS)),
    ("sm:tc", dict(_TC)),
    ("sm:tc+async+lhs", {**_TC, **_ASYNC, **_LHS}),
    ("sm:megacore", {"xla_tpu_enable_megacore_fusion": "true"}),
    ("sm:sc-offload", {
        "xla_tpu_enable_sparse_core_collective_offload_all_reduce": "true"}),
]


def _build_lowered_overlap(mesh):
    """Abstract-lower the shard_map per-layer-psum step (natural config,
    bf16, global bunch 4096) for AOT compilation on a topology mesh."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from tools.hlo_collectives import GLOBAL_BUNCH, LAYERSIZES
    from tpu_se.parallel.overlap_step import train_chunk_overlap
    from tpu_se.train.step import TrainHyper, TrainState

    hyper = TrainHyper(beta=1.0, ml=True, bunchsize=GLOBAL_BUNCH,
                       context=7, targ_offset=3, grad_scale="natural",
                       compute_dtype=jnp.bfloat16)
    n_frames = 32768
    rep = NamedSharding(mesh, P())

    def sds(shape, dtype, sharding=rep):
        return jax.ShapeDtypeStruct(shape, dtype, sharding=sharding)

    layers = list(zip(LAYERSIZES[:-1], LAYERSIZES[1:]))
    params = [{"w": sds((i, o), jnp.float32), "b": sds((o,), jnp.float32)}
              for i, o in layers]
    velocity = [{"w": sds((i, o), jnp.float32),
                 "b": sds((o,), jnp.float32)} for i, o in layers]
    state = TrainState(params=params, velocity=velocity,
                       alpha=sds((LAYERSIZES[-1],), jnp.float32))
    noisy = sds((n_frames, 257), jnp.float32)
    clean = sds((n_frames, 257), jnp.float32)
    starts = sds((4, GLOBAL_BUNCH), jnp.int32,
                 NamedSharding(mesh, P(None, "data")))
    lr = sds((), jnp.float32)
    return train_chunk_overlap.lower(state, noisy, clean, starts, lr,
                                     hyper, mesh)


def capability_probes(mesh) -> list[dict]:
    """Minimal-case probes: can this compiler emit ANY async collective?

    A single psum / reduce-scatter+all-gather next to two INDEPENDENT
    4096^2 bf16 GEMMs — the ideal overlap case with nothing else in the
    program.  If no flag combination produces a start/done pair here, the
    full train step never will either.
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    rep = NamedSharding(mesh, P())

    def f_ar(g, a, b):
        s = jax.lax.psum(g, "data")
        c = (a @ b) @ b
        return s, c

    def f_rsag(g, a, b):
        part = jax.lax.psum_scatter(g, "data", scatter_dimension=0,
                                    tiled=True)
        s = jax.lax.all_gather(part, "data", axis=0, tiled=True)
        c = (a @ b) @ b
        return s, c

    g = jax.ShapeDtypeStruct((2048, 2048), jnp.float32, sharding=rep)
    a = jax.ShapeDtypeStruct((4096, 4096), jnp.bfloat16, sharding=rep)
    b = jax.ShapeDtypeStruct((4096, 4096), jnp.bfloat16, sharding=rep)

    probes = []
    for fname, fn, flags in [
        ("psum", f_ar, {**_ASYNC, **_LHS, **_TC}),
        ("rs+ag", f_rsag,
         {"xla_tpu_enable_async_collective_fusion": "true",
          "xla_tpu_enable_async_collective_fusion_fuse_all_gather": "true",
          **_LHS}),
    ]:
        sm = jax.shard_map(fn, mesh=mesh, in_specs=(P(), P(), P()),
                           out_specs=(P(), P()), check_vma=False)
        low = jax.jit(sm).lower(g, a, b)
        try:
            txt = low.compile(compiler_options=flags).as_text()
            probes.append({
                "probe": fname, "flags": flags, "ok": True,
                "async_starts": (txt.count("all-reduce-start(")
                                 + txt.count("all-gather-start(")
                                 + txt.count("async-start")),
                "sync_collectives": len(re.findall(
                    r"= .+? (?:all-reduce|all-gather|reduce-scatter)\(",
                    txt)),
            })
        except Exception as e:  # noqa: BLE001
            probes.append({"probe": fname, "flags": flags, "ok": False,
                           "error": f"{type(e).__name__}: {str(e)[:200]}"})
    return probes


def main() -> int:
    from tools.hlo_collectives import _build_lowered

    from jax.experimental import topologies

    topo = topologies.get_topology_desc("v5e:2x4", "tpu")
    mesh = topologies.make_mesh(topo, (8, 1), ("data", "model"))
    lowered_gspmd = _build_lowered(mesh)
    lowered_sm = _build_lowered_overlap(mesh)

    results = []
    best = None
    for tag, flags in COMBOS:
        step_name, lowered = ("shardmap", lowered_sm) \
            if tag.startswith("sm:") else ("gspmd", lowered_gspmd)
        try:
            txt = lowered.compile(compiler_options=flags or None).as_text()
            rec = {"tag": tag, "step": step_name, "flags": flags, "ok": True,
                   **analyze(txt)}
            rec["n_grad_collectives"] = (len(rec["sync_grad_allreduces"])
                                         + len(rec["async_grad_pairs"]))
            hidden = sum(a["sched_window_ops"] > 0
                         for a in rec["async_grad_pairs"])
            rec["n_async_grad_hidden"] = hidden
            if best is None or (
                    (hidden, len(rec["async_grad_pairs"]),
                     rec["n_grad_collectives"])
                    > (best[0]["n_async_grad_hidden"],
                       len(best[0]["async_grad_pairs"]),
                       best[0]["n_grad_collectives"])):
                best = (rec, txt)
        except Exception as e:  # noqa: BLE001 — record and continue sweep
            rec = {"tag": tag, "flags": flags, "ok": False,
                   "error": f"{type(e).__name__}: {str(e)[:300]}"}
        results.append(rec)
        print(json.dumps({k: v for k, v in rec.items()
                          if k not in ("async_pairs",)}, indent=None)[:500])

    probes = capability_probes(mesh)
    for p in probes:
        print(json.dumps(p))

    os.makedirs(os.path.join(REPO, "artifacts", "hlo"), exist_ok=True)
    if best is not None:
        with open(os.path.join(REPO, "artifacts", "hlo",
                               "train_step_v5e8_overlap.hlo.txt"), "w") as f:
            f.write(best[1])
    with open(os.path.join(REPO, "benchmarks", "overlap_sweep.json"),
              "w") as f:
        json.dump({"topology": "v5e:2x4", "results": results,
                   "minimal_probes": probes,
                   "conclusion": (
                       "The chained shard_map per-layer psums split the "
                       "single fused gradient ring into one collective per "
                       "layer (the backend combiner merges unchained ones), "
                       "but every async/overlap flag family accepted by "
                       "this compiler surface -- async_collective_fusion, "
                       "latency_hiding_scheduler, "
                       "overlap_compute_collective_tc, megacore_fusion, "
                       "sparse_core_collective_offload (leaves "
                       "async_collective_name residue, then re-syncs) -- "
                       "still emits only synchronous collectives, "
                       "including in the minimal ideal-overlap probes."),
                   "best": best[0]["tag"] if best else None}, f, indent=1)
    print(f"best: {best[0]['tag'] if best else None}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
