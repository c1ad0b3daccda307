"""Benchmark: frames/sec/chip of the full jitted VIO frame step.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

The reference publishes no numbers (BASELINE.md), so the baseline is
established here by running the reference's algorithmics — OpenCV SIFT
detect+describe, bidirectional 2-NN BF matching with ratio+symmetry filters,
essential-matrix RANSAC — in optimized OpenCV C++ on the same frames on this
host's CPU (the reference is a single-threaded CPU pipeline). vs_baseline is
our TPU frames/sec divided by that number.

Timing methodology (round-3 FORENSIC REWRITE — see BENCH_NOTES "The
enqueue illusion"): on this backend `jax.block_until_ready` returns WITHOUT
waiting (measured: a dispatch "completes" in 0.006 s whose real execution,
verified by sleeping then fetching, takes 2.9 s). Every previously recorded
fps number (r01 138k, r02 63k, this round's earlier 156k) measured the
ENQUEUE rate, not execution. The only reliable completion barrier is a
host fetch (np.asarray) of an output, which costs ~25 ms RTT. Every rep
here is therefore timed dispatch -> fetch (RTT <= 1%% of real exec times);
chained-execution linearity was verified (M=1/2/4/8 chained scans: 2.930/
2.914/2.907/2.903 s per scan — execution time is real and constant).

The headline workload stays PINNED to the r01/r02 configuration
(single-scale K=512 frontend) for longitudinal comparability; the framework
DEFAULT (multi-scale K=768 since round 3) is reported as `scan_default_fps`.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


def _enable_compile_cache():
    """Persistent XLA compilation cache: first bench run pays compile, later
    runs (and rounds) start hot."""
    import jax

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def _make_frames(n_frames: int = 96):
    from vislam_tpu.data.synthetic import SyntheticConfig, make_synthetic_sequence

    seq = make_synthetic_sequence(
        SyntheticConfig(n_frames=n_frames, n_landmarks=300, seed=0)
    )
    return seq


def _pinned_cfg(slam: bool = False, default_frontend: bool = False):
    """The pinned headline config: r01/r02's single-scale K=512 frontend
    (longitudinal comparability). default_frontend=True keeps the current
    framework defaults instead (reported as separate JSON fields)."""
    import dataclasses

    from vislam_tpu.utils.config import SystemConfig

    c = SystemConfig()
    if not default_frontend:
        c = dataclasses.replace(
            c, frontend=dataclasses.replace(c.frontend, levels_used=1))
    if slam:
        c = dataclasses.replace(
            c, backend=dataclasses.replace(c.backend, vi_factors=True,
                                           refine_in_step=True))
    return c


def make_scan_candidate(seq, slam: bool = False,
                        default_frontend: bool = False):
    """Offline throughput: whole sequence as one on-device lax.scan.

    slam=True fuses the visual-inertial window BA into the scanned step
    (cfg.backend.refine_in_step + vi_factors): the full-SLAM offline mode.
    Returns (run_fn, n_frames); run_fn executes one rep and blocks.
    """
    import jax

    from vislam_tpu.engine import VIOEngine, make_sequence_inputs, run_sequence_scan

    eng = VIOEngine(seq["calib"], _pinned_cfg(slam, default_frontend))
    state0 = eng.initialize(
        seq["images"][0], q_wb0=seq["gt_quat"][0],
        v_w0=seq["gt_vel"][0], p_w0=seq["gt_pos"][0],
    )
    inputs = make_sequence_inputs(seq)
    n = int(inputs.images.shape[0])
    kf0 = seq["gt_pos"][0]

    def run():
        final, results = run_sequence_scan(eng, state0, inputs, kf_gt_pos0=kf0)
        return results.p_wc

    return run, n


def make_stream_candidate(seq, n_steps: int = 60):
    """Online mode: one dispatch per frame (tunnel-latency bound)."""
    import jax
    import jax.numpy as jnp

    from vislam_tpu.engine import VIOEngine

    eng = VIOEngine(seq["calib"], _pinned_cfg())
    state = eng.initialize(
        seq["images"][0], q_wb0=seq["gt_quat"][0],
        v_w0=seq["gt_vel"][0], p_w0=seq["gt_pos"][0],
    )
    imu = np.zeros((16, 6), np.float32)
    imu[:10] = np.concatenate([seq["imu_gyro"][:10], seq["imu_accel"][:10]], -1)
    dt = np.zeros(16, np.float32)
    dt[:10] = 1 / 200.0
    imu_j = jnp.asarray(imu)
    dt_j = jnp.asarray(dt)
    images = [jnp.asarray(img, jnp.float32) for img in seq["images"][1:]]
    gt = jnp.asarray(0.05, jnp.float32)
    key = jax.random.PRNGKey(0)

    def run():
        s = state
        r = None
        for i in range(n_steps):
            img = images[i % len(images)]
            s, r = eng._step(s, img, imu_j, dt_j, gt, key)
        # The per-step state chain is a real data dependency: fetching the
        # final pose forces every step to have executed.
        return r.p_wc

    return run, n_steps


def make_batch_candidate(seq_len: int = 24, B: int = 8):
    """Batched multi-sequence throughput (vmap over B sequences, one chip)."""
    import jax
    import jax.numpy as jnp

    from vislam_tpu.data.synthetic import SyntheticConfig, make_synthetic_sequence
    from vislam_tpu.engine import VIOEngine, make_sequence_inputs, run_batch_scan

    seqs = [make_synthetic_sequence(
        SyntheticConfig(n_frames=seq_len, n_landmarks=250, seed=s))
        for s in range(B)]
    eng = VIOEngine(seqs[0]["calib"], _pinned_cfg())
    states = jax.tree.map(
        lambda *xs: jnp.stack(xs),
        *[eng.initialize(s["images"][0], q_wb0=s["gt_quat"][0],
                         v_w0=s["gt_vel"][0], p_w0=s["gt_pos"][0])
          for s in seqs],
    )
    inps = [make_sequence_inputs(s) for s in seqs]
    inputs = jax.tree.map(
        lambda *xs: jnp.stack(xs) if xs[0].ndim > 0 else xs[0], *inps)
    kf0 = jnp.stack([jnp.asarray(s["gt_pos"][0], jnp.float32) for s in seqs])

    def run():
        f, r = run_batch_scan(eng, states, inputs, kf0)
        return r.p_wc

    return run, B * (seq_len - 1)


def bench_interleaved(candidates: dict, reps: int = 3, warmups: int = 1):
    """Time all candidates interleaved with FETCH-FORCED completion; return
    {name: (fps_best, fps_median)}.

    run() must return a SMALL device output whose value depends on the whole
    computation; each rep is timed dispatch -> np.asarray(output) — the only
    barrier this backend honors (block_until_ready is a no-op here; see
    module docstring). The ~25 ms fetch RTT is <= 1% of real execution
    times. Candidates are interleaved so a degraded-tunnel episode hits all
    of them equally.
    """
    times = {name: [] for name in candidates}
    for name, (run, _n) in candidates.items():
        for _ in range(warmups):
            np.asarray(run())  # compile + settle
    for _ in range(reps):
        for name, (run, _n) in candidates.items():
            t0 = time.perf_counter()
            np.asarray(run())
            times[name].append(time.perf_counter() - t0)
    out = {}
    for name, (_run, n) in candidates.items():
        t = np.asarray(times[name])
        out[name] = (n / float(t.min()), n / float(np.median(t)))
    return out


def bench_host_loop(seq, n_steps: int = 48, reps: int = 2) -> float:
    """ONLINE host-loop throughput (round 4): one engine dispatch per frame
    with native-uint8 image upload, packed 37-float results fetched in
    4-frame one-RPC bursts (the CLI's pipelined loop). This is the mode a
    live camera feeds — the VERDICT r03 criterion is >= 20 fps (the EUROC
    camera rate, /root/reference/calibration/calibrationEUROC.xml:44);
    r03 measured 3.5 fps (one fetch per FrameResult leaf)."""
    import jax
    import jax.numpy as jnp

    from vislam_tpu.engine import VIOEngine

    eng = VIOEngine(seq["calib"], _pinned_cfg())
    state0 = eng.initialize(
        seq["images"][0], q_wb0=seq["gt_quat"][0],
        v_w0=seq["gt_vel"][0], p_w0=seq["gt_pos"][0],
    )
    imu = np.zeros((16, 6), np.float32)
    imu[:10] = np.concatenate([seq["imu_gyro"][:10], seq["imu_accel"][:10]], -1)
    dt = np.zeros(16, np.float32)
    dt[:10] = 1 / 200.0
    kf0 = np.asarray(seq["gt_pos"][0], np.float32)
    imgs = [np.asarray(im) for im in seq["images"][1:]]

    best = 0.0
    for _ in range(reps + 1):  # first rep is the warmup/compile
        s, kf = state0, kf0
        pending = []
        t0 = time.perf_counter()
        for j in range(n_steps):
            img = imgs[j % len(imgs)]
            s, kf, flat = eng.step_pipelined(
                s, kf, img, imu, dt, seq["gt_pos"][(j + 1) % len(imgs)], 1.0)
            pending.append(flat)
            if len(pending) >= 4:
                np.asarray(jnp.stack(pending))
                pending = []
        if pending:
            np.asarray(jnp.stack(pending))
        best = max(best, n_steps / (time.perf_counter() - t0))
    return best


def bench_reference_cpu(seq, n_steps: int = 12) -> float:
    """Reference algorithmics (SIFT + BF 2NN x2 + ratio + symmetry + RANSAC)
    on this host CPU via OpenCV — the stand-in for the reference's unpublished
    numbers, per BASELINE.md."""
    import cv2

    try:
        det = cv2.SIFT_create(nfeatures=512)
        norm = cv2.NORM_L2
    except AttributeError:
        det = cv2.ORB_create(nfeatures=512)
        norm = cv2.NORM_HAMMING
    bf = cv2.BFMatcher(norm)
    K = np.array(
        [[seq["calib"].fx, 0, seq["calib"].cx],
         [0, seq["calib"].fy, seq["calib"].cy], [0, 0, 1.0]]
    )
    imgs = [np.asarray(im) for im in seq["images"]]

    # Warm caches.
    det.detectAndCompute(imgs[0], None)

    def ratio_ok(pairs):
        out = {}
        for p in pairs:
            if len(p) == 2 and p[0].distance < 0.8 * p[1].distance:
                out[p[0].queryIdx] = p[0].trainIdx
        return out

    # Per-frame timing, median (host contention resistance; favors the
    # baseline, which keeps vs_baseline honest).
    per_frame = []
    prev_kp, prev_desc = None, None
    for i in range(n_steps + 1):
        img = imgs[i % len(imgs)]
        t0 = time.perf_counter()
        kp, desc = det.detectAndCompute(img, None)
        if prev_desc is not None and desc is not None and len(desc) > 8:
            m_ab = bf.knnMatch(prev_desc, desc, k=2)
            m_ba = bf.knnMatch(desc, prev_desc, k=2)
            fwd = ratio_ok(m_ab)
            bwd = ratio_ok(m_ba)
            sym = [(q, t) for q, t in fwd.items() if bwd.get(t) == q]
            if len(sym) >= 8:
                p1 = np.float32([prev_kp[q].pt for q, _ in sym])
                p2 = np.float32([kp[t].pt for _, t in sym])
                cv2.findEssentialMat(p1, p2, K, method=cv2.RANSAC,
                                     prob=0.999, threshold=1.0)
            per_frame.append(time.perf_counter() - t0)
        prev_kp, prev_desc = kp, desc
    return 1.0 / float(np.median(per_frame))


def step_cost(seq, default_frontend: bool = False):
    """XLA cost analysis of ONE compiled frame step: (flops, bytes accessed)
    per frame.

    Round-3 correction: cost analysis of a lax.scan counts the loop body
    ONCE (verified: identical flops for 11- and 23-trip scans), so the old
    scan-total/n accounting under-reported per-frame FLOPs (and MFU) by the
    trip count (~95x). Lowering the single step gives the honest per-frame
    number. Caveats: both branches of lax.cond are counted (the rescue
    fallback's second match/solve inflates ~15-30%) and "bytes accessed"
    counts every HLO operand without fusion/VMEM dedup — treat both as
    upper bounds.
    """
    import jax
    import jax.numpy as jnp

    from vislam_tpu.engine import VIOEngine

    eng = VIOEngine(seq["calib"], _pinned_cfg(default_frontend=default_frontend))
    s0 = eng.initialize(
        seq["images"][0], q_wb0=seq["gt_quat"][0],
        v_w0=seq["gt_vel"][0], p_w0=seq["gt_pos"][0],
    )
    imu = jnp.zeros((16, 6), jnp.float32)
    dt = jnp.zeros(16, jnp.float32)
    comp = eng._step.lower(
        s0, jnp.asarray(seq["images"][1], jnp.float32), imu, dt,
        jnp.asarray(0.05, jnp.float32), jax.random.PRNGKey(0)).compile()
    ca = comp.cost_analysis()
    d = ca[0] if isinstance(ca, (list, tuple)) else ca
    return (float(d.get("flops", 0.0)), float(d.get("bytes accessed", 0.0)))


def _peak_flops() -> float:
    """Per-chip peak (bf16 matmul) for the MFU denominator."""
    import jax

    kind = jax.devices()[0].device_kind.lower()
    table = {
        "v5 lite": 197e12, "v5e": 197e12, "v5p": 459e12,
        "v4": 275e12, "v6": 918e12, "trillium": 918e12,
    }
    for k, v in table.items():
        if k in kind:
            return v
    return 197e12


def chip_peak_probe() -> float:
    """Measured marginal matmul throughput of the chip itself (TFLOP/s):
    a bf16 2048^3 matmul chain inside one program, trip-count differential
    (R=512 vs R=64), fetch-forced. Separates the CHIP (fast) from the
    runtime's per-op overhead (the bottleneck for op-rich programs) —
    measured 187 TFLOP/s = 95% of the v5e bf16 peak."""
    import time as _time
    from functools import partial as _partial

    import jax
    import jax.numpy as jnp

    @_partial(jax.jit, static_argnames=("r",))
    def burner(x, r):
        def body(c, _):
            return jnp.tanh(c @ c), None
        y, _ = jax.lax.scan(body, x, None, length=r)
        return y[0, :4]

    A = jnp.ones((2048, 2048), jnp.bfloat16) * 0.001
    ts = {}
    for r in (64, 512):
        np.asarray(burner(A, r=r))  # compile + settle
        best = float("inf")
        for _ in range(2):
            t0 = _time.perf_counter()
            np.asarray(burner(A, r=r))
            best = min(best, _time.perf_counter() - t0)
        ts[r] = best
    dt = max(ts[512] - ts[64], 1e-9)
    return (512 - 64) * 2 * 2048**3 / dt / 1e12


def main():
    _enable_compile_cache()
    seq = _make_frames()
    candidates = {
        "scan": make_scan_candidate(seq),
        "scan_default": make_scan_candidate(seq, default_frontend=True),
        "slam_scan": make_scan_candidate(seq, slam=True),
        "stream": make_stream_candidate(seq),
        "batch8": make_batch_candidate(B=8),
        "batch32": make_batch_candidate(B=32),
        # Round 5 (informational, does not replace the pinned 96-frame
        # headline): a 4x-longer scan amortizes the fixed ~40 ms
        # dispatch+fetch floor 4x further, exposing the true per-frame
        # MARGINAL rate (the trip-differential scan marginal measures
        # ~1.8 ms/frame vs the floor-inclusive ~2.1 of the 96-frame scan).
        "scan_long": make_scan_candidate(_make_frames(384)),
    }
    fps = bench_interleaved(candidates)
    host_fps = bench_host_loop(seq)
    base = bench_reference_cpu(seq)
    flops_frame, bytes_frame = step_cost(seq)
    flops_def, _bytes_def = step_cost(seq, default_frontend=True)
    peak_probe = chip_peak_probe()
    fps_scan, fps_scan_med = fps["scan"]
    print(
        json.dumps(
            {
                "metric": "vio_frames_per_sec_per_chip",
                "value": round(fps_scan, 2),
                "unit": "frames/s",
                "vs_baseline": round(fps_scan / base, 3),
                "value_median": round(fps_scan_med, 2),
                # Current framework default (multi-scale K=768 since round
                # 3) vs the pinned headline workload (single-scale K=512).
                "scan_default_fps": round(fps["scan_default"][0], 2),
                "streaming_fps": round(fps["stream"][0], 2),
                "slam_scan_fps": round(fps["slam_scan"][0], 2),
                "batch8_fps": round(fps["batch8"][0], 2),
                "batch32_fps": round(fps["batch32"][0], 2),
                "scan_long_fps": round(fps["scan_long"][0], 2),
                # Online (one dispatch/frame, burst-fetched results) — the
                # live-camera mode; >= 20 keeps up with the EUROC rate.
                "host_loop_fps": round(host_fps, 2),
                "baseline_cpu_fps": round(base, 2),
                # HONESTY NOTE (round 3): these are fetch-forced REAL
                # execution rates. All previously recorded values (r01
                # 138k, r02 63k) measured the async ENQUEUE rate — this
                # backend's block_until_ready does not wait (forensics in
                # BENCH_NOTES). The chip itself is fast
                # (chip_peak_probe_tflops); op-rich programs are bound by
                # the runtime's per-op execution overhead.
                "device_ms_per_frame": round(1000.0 / fps_scan, 5),
                "flops_per_frame": round(flops_frame, 0),
                "flops_per_frame_default": round(flops_def, 0),
                "bytes_per_frame_upperbound": round(bytes_frame, 0),
                "chip_peak_probe_tflops": round(peak_probe, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
