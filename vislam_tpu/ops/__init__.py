"""Pallas TPU kernels for the frontend hot paths.

Each kernel has a reference jnp implementation elsewhere in the package;
kernels are validated against those in tests/test_ops.py and are enabled by
config. CPU test runs use interpret mode automatically.
"""

from vislam_tpu.ops.match_kernel import match_top2_pallas
from vislam_tpu.ops.harris_kernel import harris_nms_auto, harris_nms_pallas

__all__ = ["match_top2_pallas", "harris_nms_pallas", "harris_nms_auto"]
