from vislam_tpu.inertial.filters import (
    madgwick_step,
    madgwick_scan,
    complementary_step,
    complementary_scan,
    orientation_from_accel,
)
from vislam_tpu.inertial.bias import (
    static_mask,
    calibrate_gyro_bias,
    calibrate_accel_bias,
)
from vislam_tpu.inertial.preintegration import (
    Preintegrated,
    preintegrate,
    dead_reckon,
)
from vislam_tpu.inertial.vi_align import VIAlignment, vi_align, refine_gravity

__all__ = [
    "madgwick_step",
    "madgwick_scan",
    "complementary_step",
    "complementary_scan",
    "orientation_from_accel",
    "static_mask",
    "calibrate_gyro_bias",
    "calibrate_accel_bias",
    "Preintegrated",
    "preintegrate",
    "dead_reckon",
    "VIAlignment",
    "vi_align",
    "refine_gravity",
]
