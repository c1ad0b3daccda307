"""Config-3 (aggressive motion) refinement-variant comparison."""
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from eval_configs import run_vio
from vislam_tpu.data import SyntheticConfig, make_synthetic_sequence
from vislam_tpu.eval import ate_rmse

seq3 = make_synthetic_sequence(SyntheticConfig(
    n_frames=60, n_landmarks=350, seed=1,
    trans_amp=(2.0, 1.4, 0.7), rot_amp=(0.12, 0.15, 0.3),
))
for name, kw in [("plain", {}), ("ba_ends_gauge", {"ba": True})]:
    r = run_vio(seq3, gt_scale=True, **kw)
    print(f"{name}: ATE={ate_rmse(r['poses'], r['gt'], align=False):.4f}", flush=True)
