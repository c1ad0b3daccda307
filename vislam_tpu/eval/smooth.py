"""Retroactive bootstrap smoothing of a GT-free trajectory (round 5,
VERDICT #8).

A cold start (wrong v0) corrupts the trajectory until the linear VI
alignment latches; the live estimate is then re-anchored, but the ALREADY
EMITTED prefix keeps the corrupt positions, and that prefix dominates the
unaligned ATE (round-4 tail analysis: the permanent 1.0-1.4 m offset;
round-5 measurement: the post-two-phase cold floor of 0.74-0.84 m is
almost entirely the ~13 pre-apply frames). The engine cannot rewrite
history causally — but the SHADOW trajectory (engine/state.py) is
continuous from the origin and consistently scaled, so once the metric
scale is known the prefix has a well-defined correction:

    p_corrected(t) = origin + s * (shadow(t) - shadow_origin)

This is the bootstrap analog of what loop closure already does for the
keyframe archive (backend/trajectory_opt.py rewrites past keyframes): a
smoothing pass over the published trajectory, applied only to runs where a
re-anchor actually fired (state.bootstrap_applies > 0) — warm runs are
untouched by construction.

Reference role: the reference sidesteps initialization entirely by
bootstrapping from ground truth (/root/reference/src/Imu.cpp:41-90,
src/VISystem.cpp:415); GT-free recovery of the full trajectory including
the bootstrap segment is strictly new capability.
"""

from __future__ import annotations

import numpy as np


def smooth_bootstrap_prefix(poses, shadows, applies, origin, shadow_origin,
                            min_fit_frames: int = 6):
    """Correct the pre-alignment prefix of an emitted trajectory.

    poses:   (N, 3) per-frame live position estimates, as published.
    shadows: (N, 3) per-frame shadow positions (state.shadow_p_wc).
    applies: (N,) int — state.bootstrap_applies after each frame.
    origin / shadow_origin: (3,) state anchors (equal at initialization).

    Returns (N, 3): frames before the LAST re-anchor replaced by the
    scaled shadow; everything from the re-anchor on is already the live
    corrected estimate and passes through unchanged. If no re-anchor ever
    fired (warm run), returns poses unchanged.
    """
    poses = np.asarray(poses, np.float64)
    shadows = np.asarray(shadows, np.float64)
    applies = np.asarray(applies)
    if applies.size == 0 or int(applies[-1]) == 0:
        return poses
    # Boundary: the last frame whose step incremented the apply counter.
    prev = np.concatenate([[0], applies[:-1]])
    bounds = np.nonzero(applies > prev)[0]
    b = int(bounds[-1])
    origin = np.asarray(origin, np.float64)
    sh0 = np.asarray(shadow_origin, np.float64)

    # Metric scale: least-squares fit of the POST-boundary (trusted,
    # re-anchored) segment against the shadow. Falls back to the boundary
    # frame's own ratio when the tail is too short for a stable fit.
    p_c = poses[b:] - origin
    s_c = shadows[b:] - sh0
    den = float(np.sum(s_c * s_c))
    if poses.shape[0] - b >= min_fit_frames and den > 1e-12:
        s = float(np.sum(p_c * s_c)) / den
    else:
        d = float(np.linalg.norm(shadows[b] - sh0))
        s = float(np.linalg.norm(poses[b] - origin)) / max(d, 1e-9)
    out = poses.copy()
    out[:b] = origin + s * (shadows[:b] - sh0)
    return out
