"""Distributed-BA scaling measurement on the virtual CPU mesh.

Weak scaling: fix landmarks-per-device, grow the mesh; the psum'd camera
system is O(W^2) independent of L, so efficiency should stay high. Reports
per-mesh-size time per LM iteration and parallel efficiency vs 1 device.

(Real multi-chip ICI runs use the same code path; this CPU-mesh measurement
validates the communication structure, not ICI bandwidth.)
"""

import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from vislam_tpu.backend import BAProblem, BAState
from vislam_tpu.parallel import dist_bundle_adjust, make_mesh, shard_problem


def make_problem(rng, W, L):
    X = np.stack(
        [rng.uniform(-4, 4, L), rng.uniform(-3, 3, L), rng.uniform(6, 14, L)], -1
    )
    fx = fy = 400.0
    cx, cy = 376.0, 240.0
    R_cw = np.tile(np.eye(3, dtype=np.float32), (W, 1, 1))
    t_cw = np.zeros((W, 3), np.float32)
    t_cw[:, 0] = -0.3 * np.arange(W)
    obs = np.zeros((W, L, 2), np.float32)
    for k in range(W):
        Xc = X @ R_cw[k].T + t_cw[k]
        obs[k, :, 0] = fx * Xc[:, 0] / Xc[:, 2] + cx + 0.3 * rng.standard_normal(L)
        obs[k, :, 1] = fy * Xc[:, 1] / Xc[:, 2] + cy + 0.3 * rng.standard_normal(L)
    state = BAState(
        R=jnp.asarray(R_cw), t=jnp.asarray(t_cw),
        X=jnp.asarray(X + rng.normal(scale=0.1, size=X.shape), jnp.float32),
    )
    prob = BAProblem(jnp.asarray(obs), jnp.ones((W, L), bool), fx, fy, cx, cy)
    return state, prob


def run(n_dev, L, iters=6, reps=3):
    rng = np.random.default_rng(0)
    state, prob = make_problem(rng, W=10, L=L)
    mesh = make_mesh(n_dev)
    st, pr = shard_problem(state, prob, mesh)
    s, info = dist_bundle_adjust(st, pr, mesh, iters=iters)  # compile
    np.asarray(s.X)  # host-fetch barrier (block_until_ready is unreliable
    # on the axon TPU backend; the CPU mesh honors it, but keep one honest
    # methodology everywhere)
    t0 = time.perf_counter()
    for _ in range(reps):
        s, info = dist_bundle_adjust(st, pr, mesh, iters=iters)
        np.asarray(s.X)
    return (time.perf_counter() - t0) / reps / iters * 1000


def make_vi_problem(rng, W, L):
    """9-DoF VI window: poses+velocities+preintegrated IMU factors, from the
    oracle generator the equivalence tests use (tests/test_vi_ba._window)."""
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))))
    from tests.test_vi_ba import G, _window

    R_cw, t_cw, v, p, X, fac, prob = _window(rng, W=W, L=L)
    state = BAState(R=jnp.asarray(R_cw), t=jnp.asarray(t_cw),
                    X=jnp.asarray(X) + 0.05 * rng.standard_normal(
                        (L, 3)).astype(np.float32))
    return state, prob, jnp.asarray(v), fac, np.asarray(G, np.float32)


def run_vi(n_dev, L, iters=6, reps=3):
    """Weak-scaling point for the DISTRIBUTED VI-BA (9-DoF + online bias)."""
    from vislam_tpu.parallel import dist_vi_bundle_adjust

    rng = np.random.default_rng(0)
    state, prob, v, fac, g_w = make_vi_problem(rng, W=10, L=L)
    mesh = make_mesh(n_dev)
    st, pr = shard_problem(state, prob, mesh)
    R_bc = np.eye(3, dtype=np.float32)
    kw = dict(bg0=np.zeros(3, np.float32), ba0=np.zeros(3, np.float32))

    def once():
        out, info = dist_vi_bundle_adjust(
            st, pr, v, fac, g_w, R_bc, mesh, iters=iters, **kw)
        np.asarray(out[0].X)  # fetch barrier
    once()  # compile
    t0 = time.perf_counter()
    for _ in range(reps):
        once()
    return (time.perf_counter() - t0) / reps / iters * 1000


def main():
    L_per_dev = 512
    print("== vision-only dist_bundle_adjust (weak scaling, W=10) ==")
    base = run(1, L_per_dev)
    print(f"n_dev=1  L={L_per_dev:5d}  {base:8.2f} ms/iter  eff=100%")
    for n in (2, 4, 8):
        t = run(n, L_per_dev * n)
        eff = base / t * 100.0
        print(f"n_dev={n}  L={L_per_dev*n:5d}  {t:8.2f} ms/iter  eff={eff:5.1f}%")

    print("== VISUAL-INERTIAL dist_vi_bundle_adjust "
          "(9-DoF + online bias, weak scaling, W=10) ==")
    base = run_vi(1, L_per_dev)
    print(f"n_dev=1  L={L_per_dev:5d}  {base:8.2f} ms/iter  eff=100%")
    for n in (2, 4, 8):
        t = run_vi(n, L_per_dev * n)
        eff = base / t * 100.0
        print(f"n_dev={n}  L={L_per_dev*n:5d}  {t:8.2f} ms/iter  eff={eff:5.1f}%")


if __name__ == "__main__":
    main()
