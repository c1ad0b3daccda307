"""Honest utilization roofline of the engine step — FETCH-FORCED (round 4).

The round-3 version of this script used `jax.block_until_ready` as its
completion barrier — the exact no-op the round-3 forensics invalidated —
and claimed the step was "matmul-dominated ... a large fraction of MXU
peak", contradicted by the honest JSON (0.01% MFU at the time). This
rewrite times every point dispatch -> host fetch (the only barrier this
backend honors), amortized inside lax.scan, and reconciles the measured
per-frame time against the XLA cost analysis (flops + bytes upper bound).

Sweeps:
  - K (keypoint capacity) at B=1 scan
  - B (sequence batch) at pinned K=512
and prints achieved GFLOP/s + GB/s against the chip probes, plus the
per-frame MARGINAL cost of batching (the round-3 "undiagnosed ~22 ms"
question — answered: it was the serialized gathers/convs the round-4
frontend rewrite removed; re-measured numbers below should show batch
scaling near-flat per trip).

Run on the real chip: python scripts/bench_roofline.py

ROUND-5 CAVEAT: the "%HBM (ub)" column this prints uses the XLA
cost-analysis BYTES UPPER BOUND (no fusion dedup). The MEASURED traffic
story (scripts/bench_hbm_traffic.py, BENCH_NOTES round 5) supersedes it:
the step's time is flat across a 16x image-size range and identical in
f32 vs bf16, i.e. the step is NOT bandwidth-bound — image traffic is ~3%
of the frame, and the r04 "65-91% of HBM roof" reading of this script's
output is retired.
"""

from __future__ import annotations

import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

HBM_PEAK_GBS = 819.0   # v5e spec
MXU_PEAK_TFS = 197.0   # v5e bf16 spec


def _cfg(kp_per_cell=8):
    from vislam_tpu.utils.config import FrontendConfig, SystemConfig

    c = SystemConfig()
    return dataclasses.replace(
        c, frontend=dataclasses.replace(
            c.frontend, levels_used=1, kp_per_cell=kp_per_cell))


def _mk_engine(seq, kp_per_cell=8):
    from vislam_tpu.engine import VIOEngine

    return VIOEngine(seq["calib"], _cfg(kp_per_cell))


def step_cost(eng, seq):
    """(flops, bytes-upper-bound) of one compiled step (see bench.step_cost
    caveats: cond branches both counted; bytes ignore fusion dedup)."""
    s0 = eng.initialize(seq["images"][0], q_wb0=seq["gt_quat"][0],
                        v_w0=seq["gt_vel"][0], p_w0=seq["gt_pos"][0])
    imu = jnp.zeros((16, 6), jnp.float32)
    dt = jnp.zeros(16, jnp.float32)
    comp = eng._step.lower(
        s0, jnp.asarray(seq["images"][1], jnp.float32), imu, dt,
        jnp.asarray(0.05, jnp.float32), jax.random.PRNGKey(0)).compile()
    ca = comp.cost_analysis()
    d = ca[0] if isinstance(ca, (list, tuple)) else ca
    return float(d.get("flops", 0.0)), float(d.get("bytes accessed", 0.0))


def time_scan(eng, seq, n_frames):
    """Fetch-forced seconds/frame of the scan mode (min of 3 reps)."""
    from vislam_tpu.engine import make_sequence_inputs, run_sequence_scan

    s0 = eng.initialize(seq["images"][0], q_wb0=seq["gt_quat"][0],
                        v_w0=seq["gt_vel"][0], p_w0=seq["gt_pos"][0])
    inputs = make_sequence_inputs(seq)
    kf0 = seq["gt_pos"][0]

    def run():
        _f, results = run_sequence_scan(eng, s0, inputs, kf_gt_pos0=kf0)
        return results.p_wc

    np.asarray(run())
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(run())
        best = min(best, time.perf_counter() - t0)
    return best / (n_frames - 1)


def time_batch(B, seq_len=24):
    """Fetch-forced seconds/TRIP of the batched scan (B sequences)."""
    from vislam_tpu.data import SyntheticConfig, make_synthetic_sequence
    from vislam_tpu.engine import (VIOEngine, make_sequence_inputs,
                                   run_batch_scan)

    seqs = [make_synthetic_sequence(
        SyntheticConfig(n_frames=seq_len, n_landmarks=250, seed=s))
        for s in range(B)]
    eng = VIOEngine(seqs[0]["calib"], _cfg())
    states = jax.tree.map(
        lambda *xs: jnp.stack(xs),
        *[eng.initialize(s["images"][0], q_wb0=s["gt_quat"][0],
                         v_w0=s["gt_vel"][0], p_w0=s["gt_pos"][0])
          for s in seqs])
    inps = [make_sequence_inputs(s) for s in seqs]
    inputs = jax.tree.map(
        lambda *xs: jnp.stack(xs) if xs[0].ndim > 0 else xs[0], *inps)
    kf0 = jnp.stack([jnp.asarray(s["gt_pos"][0], jnp.float32) for s in seqs])

    def run():
        _f, r = run_batch_scan(eng, states, inputs, kf0)
        return r.p_wc

    np.asarray(run())
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(run())
        best = min(best, time.perf_counter() - t0)
    return best / (seq_len - 1)  # seconds per scan trip (B frames/trip)


def main():
    from vislam_tpu.data import SyntheticConfig, make_synthetic_sequence

    print("backend:", jax.default_backend())
    n_frames = 96
    seq = make_synthetic_sequence(
        SyntheticConfig(n_frames=n_frames, n_landmarks=300, seed=0))

    print("\n== K sweep (B=1 scan, fetch-forced, min of 3) ==")
    print(f"{'K':>6} {'ms/frame':>9} {'MFLOP/fr':>9} {'GB/fr(ub)':>10} "
          f"{'GFLOP/s':>8} {'GB/s(ub)':>9} {'%MXU':>6} {'%HBM(ub)':>8}")
    for kpc, K in ((4, 256), (8, 512), (16, 1024)):
        eng = _mk_engine(seq, kpc)
        spf = time_scan(eng, seq, n_frames)
        fl, by = step_cost(eng, seq)
        gfs = fl / spf / 1e9
        gbs = by / spf / 1e9
        print(f"{K:>6} {spf*1e3:>9.2f} {fl/1e6:>9.0f} {by/1e9:>10.2f} "
              f"{gfs:>8.1f} {gbs:>9.1f} {gfs/1e3/MXU_PEAK_TFS*100:>6.2f} "
              f"{gbs/HBM_PEAK_GBS*100:>8.1f}")

    print("\n== B sweep (24-frame seqs, K=512, fetch-forced, min of 3) ==")
    print(f"{'B':>4} {'ms/trip':>9} {'ms/frame':>9} {'frames/s':>9} "
          f"{'marginal ms/frame':>18}")
    base_trip = None
    for B in (1, 8, 32):
        spt = time_batch(B)
        if base_trip is None:
            base_trip = spt
            marg = float("nan")
        else:
            marg = (spt - base_trip) / (B - 1) * 1e3
        print(f"{B:>4} {spt*1e3:>9.2f} {spt/B*1e3:>9.2f} {B/spt:>9.1f} "
              f"{marg:>18.2f}")

    print("\nNotes: GB/fr is the XLA cost-analysis UPPER BOUND (no fusion "
          "dedup); %HBM(ub) likewise. The marginal ms/frame column is the "
          "honest per-frame device cost of batching — round 3 measured "
          "~19-25 ms here (serialized gathers + single-channel convs); the "
          "round-4 frontend rewrite (Pallas response+NMS, patch-based "
          "descriptors) is expected to collapse it.")


if __name__ == "__main__":
    main()
