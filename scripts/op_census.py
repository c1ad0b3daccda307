"""Op census of the compiled engine step + runtime cost-model calibration.

VERDICT r03 demanded: (a) publish an op census of the compiled step (how
many HLO ops actually execute per dispatch), (b) reconcile the ~22-25 ms
REAL per-frame marginal cost seen in batch mode (batch8 204 ms/trip vs scan
31 ms/trip) against flops/bytes — is the step bound by the runtime's fixed
per-op overhead, by per-byte buffer handling, or by real HBM traffic?

Two parts:

1. CENSUS: lower+compile the pinned step on the attached backend, walk the
   optimized HLO module, and count the ops that the runtime actually
   executes (fusions count as ONE op; called computations inside
   fusions/maps/reduces do not execute standalone). Reports per-opcode
   histogram and the top ops by output size.

2. CALIBRATION (TPU only): fetch-forced timing of synthetic programs that
   isolate the two candidate cost terms:
     - N chained small ops (8x128 f32)   -> fixed per-op overhead
     - N chained image-size ops (480x768)-> per-op + per-byte term
   Fitting time vs N gives ms/op at each operand size; comparing sizes
   splits the fixed and per-byte components.

Usage: python scripts/op_census.py [--cpu] [--no-calib] [--default]
"""

from __future__ import annotations

import argparse
import collections
import json
import os
import re
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _setup(cpu: bool):
    import jax

    if cpu:
        jax.config.update("jax_platforms", "cpu")
    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


_SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")

_DTYPE_BYTES = {
    "f32": 4, "f16": 2, "bf16": 2, "f64": 8, "s32": 4, "u32": 4,
    "s8": 1, "u8": 1, "pred": 1, "s64": 8, "u64": 8, "s16": 2, "u16": 2,
}


def _shape_bytes(shape_str: str) -> int:
    """Total bytes of an HLO result type string (handles tuples)."""
    total = 0
    for m in _SHAPE_RE.finditer(shape_str):
        dt, dims = m.groups()
        n = 1
        if dims:
            for d in dims.split(","):
                if d:
                    n *= int(d)
        total += n * _DTYPE_BYTES.get(dt, 4)
    return total


def census(default_frontend: bool = False, slam: bool = False):
    """Compile the pinned step; count executed ops in the optimized HLO."""
    import jax
    import jax.numpy as jnp

    from bench import _make_frames, _pinned_cfg
    from vislam_tpu.engine import VIOEngine

    seq = _make_frames(8)
    eng = VIOEngine(seq["calib"],
                    _pinned_cfg(slam=slam, default_frontend=default_frontend))
    s0 = eng.initialize(seq["images"][0], q_wb0=seq["gt_quat"][0],
                        v_w0=seq["gt_vel"][0], p_w0=seq["gt_pos"][0])
    imu = jnp.zeros((16, 6), jnp.float32)
    dt = jnp.zeros(16, jnp.float32)
    comp = eng._step.lower(
        s0, jnp.asarray(seq["images"][1], jnp.float32), imu, dt,
        jnp.asarray(0.05, jnp.float32), jax.random.PRNGKey(0)).compile()
    txt = comp.as_text()

    # Parse the optimized HLO: ops inside ENTRY + non-fusion computations
    # called by while/cond bodies execute; computations used only as
    # fusion/reduce/map/sort subcomputations do not execute standalone.
    # Heuristic that matches XLA's structure: count instructions in every
    # computation EXCEPT those referenced as a fused_computation / %region
    # used by fusion kernels, reduce, sort, scatter, select-and-scatter.
    lines = txt.splitlines()
    computations = {}  # name -> list of (opcode, result_shape, line)
    cur = None
    for ln in lines:
        m = re.match(r"\s*(?:ENTRY\s+)?%?([\w.\-]+)\s+\([^)]*\)\s*->", ln)
        if m and ("{" in ln or ln.rstrip().endswith("{")):
            cur = m.group(1)
            computations[cur] = []
            continue
        if cur is None:
            continue
        if ln.strip() == "}":
            cur = None
            continue
        m = re.match(r"\s*(?:ROOT\s+)?%?[\w.\-]+\s*=\s*(\S+?)\s+(\S+)\(", ln)
        if m:
            shape, opcode = m.group(1), m.group(2)
            computations[cur].append((opcode, shape, ln.strip()))

    # Find subcomputation names referenced by fusion/reduce/etc. calls.
    sub_refs = set()
    for ln in lines:
        for key in ("calls=", "to_apply=", "comparator=", "body=",
                    "condition=", "branch_computations=",
                    "select=", "scatter="):
            for m in re.finditer(key + r"\{?%?([\w.\-]+)", ln):
                sub_refs.add(m.group(1))
        for m in re.finditer(r"(?:fusion|reduce|sort|map|scatter)"
                             r".*?(%[\w.\-]+)", ln):
            pass

    # Executed computations: ENTRY + while-bodies/conds + cond branches.
    # These are exactly the computations referenced via body=/condition=/
    # branch_computations=; fusion subcomputations are referenced via
    # calls= but their instructions run INSIDE the fusion op (1 op).
    exec_names = set()
    entry_name = None
    for ln in lines:
        m = re.match(r"ENTRY\s+%?([\w.\-]+)", ln)
        if m:
            entry_name = m.group(1)
    control_refs = set()
    for ln in lines:
        for key in ("body=", "condition=", "branch_computations="):
            if key in ln:
                seg = ln.split(key, 1)[1]
                for m in re.finditer(r"%?([\w.\-]+)", seg.split(")", 1)[0]):
                    if m.group(1) in computations:
                        control_refs.add(m.group(1))
    exec_names = {entry_name} | control_refs
    exec_names.discard(None)

    op_hist = collections.Counter()
    big_ops = []
    total_ops = 0
    for name in exec_names:
        for opcode, shape, ln in computations.get(name, []):
            if opcode in ("parameter", "constant"):
                continue
            total_ops += 1
            op_hist[opcode] += 1
            b = _shape_bytes(shape)
            big_ops.append((b, opcode, name, ln[:160]))
    big_ops.sort(reverse=True)
    return {
        "total_executed_ops": total_ops,
        "computations_counted": sorted(exec_names),
        "op_histogram": dict(op_hist.most_common()),
        "top_ops_by_output_bytes": [
            {"bytes": b, "opcode": op, "computation": nm, "hlo": ln}
            for b, op, nm, ln in big_ops[:25]
        ],
        "n_computations_total": len(computations),
        "hlo_chars": len(txt),
    }


def calibrate(max_n: int = 256):
    """Fetch-forced cost of N chained ops at two operand sizes.

    Chains alternate x = x * c + s so XLA cannot fuse across the chain?
    It CAN fuse elementwise chains — so to pin op COUNT we interleave
    non-fusable ops: x = transpose(x) each step forces a materialized op on
    TPU?  Transposes can also fuse.  The robust trick: run the chain inside
    lax.scan with trip count N and a 2-op body (the forensics measured
    ~90 us/trip for this) AND as an unrolled chain of N reduce ops
    (reductions break elementwise fusion chains).
    """
    import jax
    import jax.numpy as jnp
    from functools import partial

    results = {}

    @partial(jax.jit, static_argnames=("n", "h", "w"))
    def chain_reduce(x, n, h, w):
        # Each iteration: broadcast a row-reduction back (2 unfused ops).
        def body(c, _):
            s = jnp.sum(c, axis=0, keepdims=True)      # reduce: own kernel
            return c * 0.999 + s * 1e-6, None
        y, _ = jax.lax.scan(body, x, None, length=n)
        return y[0, :2]

    for (h, w, label) in ((8, 128, "small_8x128"), (480, 768, "image_480x768")):
        x = jnp.ones((h, w), jnp.float32) * 0.5
        ts = {}
        for n in (16, max_n):
            np.asarray(chain_reduce(x, n=n, h=h, w=w))
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                np.asarray(chain_reduce(x, n=n, h=h, w=w))
                best = min(best, time.perf_counter() - t0)
            ts[n] = best
        dt = ts[max_n] - ts[16]
        per_trip_ms = dt / (max_n - 16) * 1000.0
        results[label] = {
            "t16_s": round(ts[16], 4), f"t{max_n}_s": round(ts[max_n], 4),
            "marginal_ms_per_trip": round(per_trip_ms, 4),
            "bytes_per_trip": h * w * 4 * 3,  # read x, write x, small reduce
        }
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--no-calib", action="store_true")
    ap.add_argument("--default", action="store_true",
                    help="census the default (multi-scale) frontend")
    ap.add_argument("--slam", action="store_true",
                    help="census the slam_scan step (refine_in_step)")
    args = ap.parse_args()
    _setup(args.cpu)

    out = {"census": census(default_frontend=args.default, slam=args.slam)}
    if not args.no_calib and not args.cpu:
        out["calibration"] = calibrate()
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
