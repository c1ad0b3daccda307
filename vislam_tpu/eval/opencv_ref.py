"""Reference algorithmics in OpenCV — the head-to-head comparison baseline.

Faithfully reproduces the reference frontend pipeline semantics
(/root/reference/src/Camera.cpp:84-138 detect+describe,
/root/reference/src/Matcher.cpp:83-169 bidirectional 2-NN brute force +
Lowe ratio 0.8 + symmetry check, /root/reference/src/VISystem.cpp:1655-1794
essential-matrix RANSAC pose with GT-scale injection per setGtRes,
:415-419,523-527) using OpenCV — the same library the reference builds on —
so the TPU frontend's match quality and trajectory accuracy can be scored
against reference-grade classical vision ON THE SAME FRAMES.

Detector note: SURF (the reference's default) lives in opencv-contrib
xfeatures2d, absent here; SIFT (reference option 3, src/Camera.cpp:118-124)
is the stand-in float-descriptor baseline and ORB (option 2) the binary one.

Host-side only (numpy + cv2); never imported by the compute path.
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def detect_describe(img: np.ndarray, kind: str = "sift", max_kp: int = 512):
    """OpenCV detect+describe. Returns (uv (K,2) float32, desc (K,D))."""
    import cv2

    if kind == "sift":
        det = cv2.SIFT_create(nfeatures=max_kp)
    elif kind == "orb":
        det = cv2.ORB_create(nfeatures=max_kp)
    else:
        raise ValueError(kind)
    kps, desc = det.detectAndCompute(np.ascontiguousarray(img), None)
    if desc is None or len(kps) == 0:
        return np.zeros((0, 2), np.float32), np.zeros((0, 128), np.float32)
    uv = np.array([kp.pt for kp in kps], np.float32)
    return uv, desc


def match_reference(desc_a, desc_b, ratio: float = 0.8,
                    binary: bool = False) -> np.ndarray:
    """Bidirectional 2-NN + Lowe ratio + symmetry (Matcher.cpp semantics).

    Returns (M, 2) int array of (idx_a, idx_b) surviving matches.
    """
    import cv2

    if len(desc_a) < 2 or len(desc_b) < 2:
        return np.zeros((0, 2), np.int64)
    bf = cv2.BFMatcher(cv2.NORM_HAMMING if binary else cv2.NORM_L2)

    def nn(c, d):
        out = {}
        for pair in bf.knnMatch(c, d, k=2):
            if len(pair) == 2:
                m, n2 = pair
                if m.distance < ratio * max(n2.distance, 1e-12):
                    out[m.queryIdx] = m.trainIdx
            elif len(pair) == 1:
                out[pair[0].queryIdx] = pair[0].trainIdx
        return out

    fwd = nn(desc_a, desc_b)
    bwd = nn(desc_b, desc_a)
    pairs = [(i, j) for i, j in fwd.items() if bwd.get(j) == i]
    return np.array(pairs, np.int64).reshape(-1, 2)


def reference_trajectory(seq: Dict, kind: str = "sift", max_kp: int = 512,
                         ransac_px: float = 1.0) -> np.ndarray:
    """Full reference-pipeline odometry: per consecutive pair, match ->
    essential-matrix RANSAC -> recoverPose -> GT-scaled composition.

    This is the reference's GT-scale evaluation mode (setGtRes,
    src/VISystem.cpp:415-419; translation scaled by ||t_GT||, :523-527) run
    with OpenCV's own solvers. Returns (N, 3) estimated positions, first row
    anchored to GT.
    """
    import cv2

    calib = seq["calib"]
    K = np.array([[calib.fx, 0, calib.cx],
                  [0, calib.fy, calib.cy],
                  [0, 0, 1.0]])
    images = seq["images"]
    gt = seq["gt_pos"]
    n = len(images)

    feats = [detect_describe(images[i], kind, max_kp) for i in range(n)]
    binary = kind == "orb"

    pos = np.zeros((n, 3))
    pos[0] = gt[0]
    from scipy.spatial.transform import Rotation as _Rot

    R_w = _Rot.from_quat(np.roll(seq["gt_quat"][0], -1)).as_matrix()
    p_w = gt[0].copy()
    for j in range(1, n):
        (uv_a, da), (uv_b, db) = feats[j - 1], feats[j]
        pairs = match_reference(da, db, binary=binary)
        scale = np.linalg.norm(gt[j] - gt[j - 1])
        moved = False
        if len(pairs) >= 8:
            p1 = uv_a[pairs[:, 0]].astype(np.float64)
            p2 = uv_b[pairs[:, 1]].astype(np.float64)
            E, inl = cv2.findEssentialMat(
                p1, p2, K, method=cv2.RANSAC, prob=0.999, threshold=ransac_px
            )
            if E is not None and E.shape == (3, 3):
                _, R, t, _ = cv2.recoverPose(E, p1, p2, K, mask=inl)
                # recoverPose: x2 = R x1 + t  =>  camera-2-in-camera-1 pose
                # is (R^T, -R^T t); ||t|| = 1, scaled by the GT step length.
                R_rel = R.T
                t_rel = (-R.T @ t).reshape(3)
                p_w = p_w + R_w @ (scale * t_rel)
                R_w = R_w @ R_rel
                moved = True
        if not moved:
            # Degenerate pair: hold orientation, dead-reckon along the last
            # direction (the reference would skip the frame).
            pass
        pos[j] = p_w
    return pos
