#!/usr/bin/env python
"""Compile-level scaling evidence: what GSPMD actually emits for the
sharded natural-config train step.

SCALING.md's efficiency table depends on whether XLA can overlap the
per-layer gradient all-reduces with the remaining backward GEMMs.  This
tool replaces that assumption with the compiler's own output:

1. Lower + compile the FULL train step (flagship 1799-2048^3-257, bf16
   compute, grad_scale=natural, global bunch 4096) over an 8-device
   data-parallel mesh (virtual CPU devices — GSPMD partitioning is
   platform-independent; the partitioned HLO is the same SPMD program a
   v5e-8 slice executes).
2. Walk the optimized HLO: every collective (all-reduce / reduce-scatter /
   all-gather), its payload bytes, its reduction computation, and — from
   the def-use graph — which dot (GEMM) ops are dependency-free with
   respect to it, i.e. legally schedulable in parallel.  That dependency
   freedom is exactly the "overlap" column SCALING.md §2 previously
   assumed.
3. Attempt the same compile AOT for a real v5e-8 topology through the
   PJRT client (``jax.experimental.topologies``); on success the TPU
   executable's HLO (with its async all-reduce-start/done schedule) is
   recorded instead, and the exposed-vs-hidden split is read off the real
   schedule.  The attempt's outcome is recorded either way.

Outputs:
  benchmarks/hlo_collectives.json        — machine-readable collective table
  artifacts/hlo/train_step_spmd8.hlo.txt — HLO excerpt (collectives + the
                                           scan body's dots, with shapes)

Usage:
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python tools/hlo_collectives.py
"""

from __future__ import annotations

import json
import os
import re
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

LAYERSIZES = (1799, 2048, 2048, 2048, 257)
GLOBAL_BUNCH = 4096
N_DEV = 8


def _build_lowered(mesh):
    """Lower the sharded train step ABSTRACTLY (ShapeDtypeStructs +
    NamedShardings) so the same builder works for attached virtual devices
    and for a detached AOT topology."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from tpu_se.parallel import param_shardings
    from tpu_se.train.step import TrainHyper, TrainState, train_chunk

    hyper = TrainHyper(beta=1.0, ml=True, bunchsize=GLOBAL_BUNCH,
                       context=7, targ_offset=3, grad_scale="natural",
                       compute_dtype=jnp.bfloat16)
    n_frames = 32768

    def sds(shape, dtype, sharding):
        return jax.ShapeDtypeStruct(shape, dtype, sharding=sharding)

    rep = NamedSharding(mesh, P())
    specs = param_shardings(mesh, len(LAYERSIZES) - 1)
    params = [
        {"w": sds((n_in, n_out), jnp.float32, s["w"]),
         "b": sds((n_out,), jnp.float32, s["b"])}
        for (n_in, n_out), s in zip(zip(LAYERSIZES[:-1], LAYERSIZES[1:]),
                                    specs)]
    velocity = [
        {"w": sds((n_in, n_out), jnp.float32, s["w"]),
         "b": sds((n_out,), jnp.float32, s["b"])}
        for (n_in, n_out), s in zip(zip(LAYERSIZES[:-1], LAYERSIZES[1:]),
                                    specs)]
    state = TrainState(params=params, velocity=velocity,
                       alpha=sds((LAYERSIZES[-1],), jnp.float32, rep))
    noisy = sds((n_frames, 257), jnp.float32, rep)
    clean = sds((n_frames, 257), jnp.float32, rep)
    starts = sds((4, GLOBAL_BUNCH), jnp.int32,
                 NamedSharding(mesh, P(None, "data")))
    lr = sds((), jnp.float32, rep)
    return train_chunk.lower(state, noisy, clean, starts, lr, hyper)


# Non-greedy shape so tuple-shaped instructions (the combined gradient
# all-reduce is `(f32[...], f32[...], ...) all-reduce(...)`) parse too:
# the op is the first bare `word(` token after the `=`.
_INSTR = re.compile(
    r"^\s*(?:ROOT\s+)?%?([\w.\-]+) = (.+?) ([\w\-]+)\((.*)$")
_SHAPE_ELEMS = {
    "f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4, "pred": 1,
    "f64": 8, "s8": 1, "u8": 1, "s64": 8, "u64": 8,
}


def _shape_bytes(shape: str) -> int:
    """'f32[2048,1799]' or '(f32[...], f32[...])' -> total bytes."""
    total = 0
    for m in re.finditer(r"(\w+)\[([\d,]*)\]", shape):
        dt, dims = m.group(1), m.group(2)
        if dt not in _SHAPE_ELEMS:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _SHAPE_ELEMS[dt]
    return total


def _shape_dims(shape: str) -> list[int]:
    m = re.search(r"\w+\[([\d,]*)\]", shape)
    if not m or not m.group(1):
        return []
    return [int(d) for d in m.group(1).split(",")]


def _dot_flops(shape_out: str, rest: str, defs: dict) -> int:
    """dot FLOPs = 2 * prod(out dims) * prod(lhs contracting dims)."""
    out_dims = _shape_dims(shape_out)
    refs = re.findall(r"%([\w.\-]+)", rest)
    mc = re.search(r"lhs_contracting_dims=\{([\d,]*)\}", rest)
    if not refs or refs[0] not in defs or mc is None:
        return 0
    lhs_dims = _shape_dims(defs[refs[0]][0])
    k = 1
    for ci in (int(c) for c in mc.group(1).split(",") if c):
        if ci < len(lhs_dims):
            k *= lhs_dims[ci]
    out_n = int(np.prod(out_dims)) if out_dims else 1
    return 2 * out_n * k


def parse_hlo(text: str) -> dict:
    """Extract computations, instructions, def-use edges, collectives, dots."""
    comps = {}      # name -> list of (iname, shape, op, rest)
    cur = None
    for line in text.splitlines():
        mclose = line.strip() == "}"
        mcomp = re.match(r"^(?:ENTRY\s+)?%?([\w.\-]+)\s+\(.*\)\s*->.*{", line)
        if mcomp:
            cur = mcomp.group(1)
            comps[cur] = []
            continue
        if mclose:
            cur = None
            continue
        if cur is None:
            continue
        mi = _INSTR.match(line)
        if mi:
            comps[cur].append((mi.group(1), mi.group(2), mi.group(3),
                               mi.group(4)))
    # The scan body is the computation with the most dots.
    def n_dots(instrs):
        return sum(1 for _, _, op, _ in instrs if op == "dot")

    body_name = max(comps, key=lambda c: n_dots(comps[c]))
    body = comps[body_name]

    # def-use graph within the body
    defs = {name: (shape, op, rest) for name, shape, op, rest in body}
    uses = {name: set() for name in defs}           # operands of each instr
    for name, shape, op, rest in body:
        for ref in re.findall(r"%([\w.\-]+)", rest):
            if ref in defs:
                uses[name].add(ref)

    import functools

    @functools.lru_cache(maxsize=None)
    def ancestors(name: str) -> frozenset:
        out = set()
        for p in uses.get(name, ()):
            out.add(p)
            out |= ancestors(p)
        return frozenset(out)

    dots = [(n, s, r) for n, s, op, r in body if op == "dot"]
    colls = [(n, s, op, r) for n, s, op, r in body
             if op in ("all-reduce", "reduce-scatter", "all-gather",
                       "all-reduce-start", "collective-permute")]
    table = []
    for cname, cshape, cop, crest in colls:
        canc = ancestors(cname)
        parallel_dots, dependent_dots = [], []
        for dname, dshape, drest in dots:
            if cname in ancestors(dname):
                dependent_dots.append(dname)
            elif dname in canc:
                continue            # producer side
            else:
                parallel_dots.append((dname, dshape, drest))
        table.append({
            "name": cname, "op": cop,
            "payload_bytes": _shape_bytes(cshape),
            "shape": cshape,
            "producer_dots": sorted(set(canc)
                                    & {d for d, _, _ in dots}),
            "dependent_dots": dependent_dots,
            "parallel_dots": [d for d, _, _ in parallel_dots],
            "parallel_dot_flops": int(sum(
                _dot_flops(s, r, defs) for _, s, r in parallel_dots)),
        })
    return {"body": body_name, "n_dots": len(dots),
            "dot_names": [d for d, _, _ in dots],
            "collectives": table,
            "body_instrs": body}


def excerpt(parsed: dict) -> str:
    lines = [f"// scan-body computation: {parsed['body']}",
             f"// {parsed['n_dots']} dot ops, "
             f"{len(parsed['collectives'])} collectives", ""]
    names = set(parsed["dot_names"]) | {c["name"]
                                        for c in parsed["collectives"]}
    for name, shape, op, rest in parsed["body_instrs"]:
        if name in names or op in ("dot", "all-reduce", "reduce-scatter",
                                   "all-gather"):
            text = f"  %{name} = {shape} {op}({rest}"
            lines.append(text if len(text) < 400 else text[:400] + " ...")
    return "\n".join(lines)


def _tpu_collective_table(txt: str) -> list[dict]:
    """Collectives from a scheduled TPU HLO: payload, emitter strategy,
    sync/async form, and schedule position (TPU HLO prints computations in
    final schedule order, so the neighboring instruction names show what
    runs around the collective)."""
    lines = txt.splitlines()
    out = []
    for i, line in enumerate(lines):
        m = _INSTR.match(line)
        if not m:
            continue
        name, shape, op, rest = m.groups()
        if op not in ("all-reduce", "all-reduce-start", "all-reduce-done",
                      "reduce-scatter", "all-gather", "all-gather-start"):
            continue
        emitter = re.search(r'"emitter":"(\w+)"', line)
        strategy = re.search(r'"strategy":"(\w+)"', line)
        scoped = re.search(r'"used_scoped_memory_configs":\[\{"memory_'
                           r'space":"1","offset":"\d+","size":"(\d+)"', line)

        def neighbor(j, step):
            while 0 <= j < len(lines):
                mm = _INSTR.match(lines[j])
                if mm and mm.group(3) not in ("get-tuple-element",
                                              "bitcast", "tuple"):
                    return f"{mm.group(1)}:{mm.group(3)}"
                j += step
            return None

        out.append({
            "name": name, "op": op,
            "payload_bytes": _shape_bytes(shape),
            "dtypes": sorted(set(re.findall(r"(\w+)\[", shape))),
            "emitter": emitter.group(1) if emitter else None,
            "strategy": strategy.group(1) if strategy else None,
            "vmem_scratch_bytes": int(scoped.group(1)) if scoped else None,
            "scheduled_after": neighbor(i - 1, -1),
            "scheduled_before": neighbor(i + 1, 1),
        })
    return out


def try_tpu_aot() -> dict:
    """AOT v5e-8 compile through the PJRT client; returns the scheduled
    HLO's collective table, plus an async-collective-flags attempt."""
    try:
        from jax.experimental import topologies

        topo = topologies.get_topology_desc("v5e:2x4", "tpu")
        mesh = topologies.make_mesh(topo, (8, 1), ("data", "model"))
        lowered = _build_lowered(mesh)
        compiled = lowered.compile()
        txt = compiled.as_text()
        rec = {"ok": True,
               "async_all_reduce_pairs": txt.count("all-reduce-start("),
               "collectives": _tpu_collective_table(txt),
               "hlo_len": len(txt), "hlo": txt}
        # Does the TPU backend expose async all-reduce at this config?
        # Try the known flag spellings; record whichever compiles.
        for flags in ({"xla_tpu_enable_async_collective_fusion": "true",
                       "xla_tpu_enable_async_collective_fusion_fuse_"
                       "all_reduce": "true"},
                      {"xla_enable_async_all_reduce": "true"}):
            try:
                txt2 = lowered.compile(
                    compiler_options=flags).as_text()
                rec["async_attempt"] = {
                    "flags": flags,
                    "async_all_reduce_pairs":
                        txt2.count("all-reduce-start("),
                    "sync_all_reduces": len(re.findall(
                        r"= .+? all-reduce\(", txt2)),
                }
                break
            except Exception as e:  # noqa: BLE001
                rec["async_attempt"] = {
                    "flags": flags,
                    "error": f"{type(e).__name__}: {str(e)[:200]}"}
        return rec
    except Exception as e:  # noqa: BLE001 — record exactly why it failed
        return {"ok": False, "error": f"{type(e).__name__}: {e}"}


def main() -> int:
    os.environ.setdefault("XLA_FLAGS", "")
    import jax

    from tpu_se.parallel import make_mesh

    assert len(jax.devices()) >= N_DEV, (
        "run with XLA_FLAGS=--xla_force_host_platform_device_count=8 "
        "JAX_PLATFORMS=cpu")
    mesh = make_mesh(N_DEV, 1)
    lowered = _build_lowered(mesh)
    compiled = lowered.compile()
    text = compiled.as_text()
    parsed = parse_hlo(text)

    # Same dependency analysis for the per-layer-psum shard_map step
    # (tpu_se.parallel.overlap_step): this is where "legally-parallel
    # dots" become nonzero — each layer's chained psum is dependency-free
    # w.r.t. every earlier layer's backward GEMMs.
    from tools.overlap_sweep import _build_lowered_overlap

    sm_parsed = parse_hlo(_build_lowered_overlap(mesh).compile().as_text())

    os.makedirs(os.path.join(REPO, "artifacts", "hlo"), exist_ok=True)
    exc = excerpt(parsed)
    with open(os.path.join(REPO, "artifacts", "hlo",
                           "train_step_spmd8.hlo.txt"), "w") as f:
        f.write(exc + "\n")
    with open(os.path.join(REPO, "artifacts", "hlo",
                           "train_step_shardmap8.hlo.txt"), "w") as f:
        f.write(excerpt(sm_parsed) + "\n")

    tpu = try_tpu_aot()
    tpu_rec = {k: v for k, v in tpu.items() if k != "hlo"}
    if tpu.get("ok"):
        with open(os.path.join(REPO, "artifacts", "hlo",
                               "train_step_v5e8.hlo.txt"), "w") as f:
            f.write(tpu["hlo"])

    # Summaries for SCALING.md
    grads = [c for c in parsed["collectives"]
             if c["op"] in ("all-reduce", "reduce-scatter")
             and c["payload_bytes"] >= 1 << 20]
    small = [c for c in parsed["collectives"] if c not in grads]
    record = {
        "config": {"layersizes": list(LAYERSIZES),
                   "global_bunch": GLOBAL_BUNCH, "devices": N_DEV,
                   "compute_dtype": "bfloat16", "grad_scale": "natural"},
        "scan_body": parsed["body"],
        "n_dots": parsed["n_dots"],
        "collectives": [{k: v for k, v in c.items()
                         if k != "body_instrs"}
                        for c in parsed["collectives"]],
        "grad_allreduce_total_bytes": int(sum(c["payload_bytes"]
                                              for c in grads)),
        "n_grad_collectives": len(grads),
        "n_small_collectives": len(small),
        "shardmap_overlap_step": {
            "scan_body": sm_parsed["body"],
            "n_dots": sm_parsed["n_dots"],
            "collectives": sm_parsed["collectives"],
        },
        "tpu_aot": tpu_rec,
    }
    with open(os.path.join(REPO, "benchmarks", "hlo_collectives.json"),
              "w") as f:
        json.dump(record, f, indent=1)

    print(f"scan body: {parsed['body']} ({parsed['n_dots']} dots)")
    for c in parsed["collectives"]:
        mb = c["payload_bytes"] / 1e6
        print(f"  {c['op']:<15} {mb:8.2f} MB  parallel dots: "
              f"{len(c['parallel_dots'])} "
              f"({c['parallel_dot_flops']/1e9:.2f} GFLOP legally "
              f"overlappable)  shape {c['shape'][:40]}")
    print(f"TPU AOT: {tpu_rec}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
