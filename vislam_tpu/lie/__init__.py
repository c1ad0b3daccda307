"""Lie-group math on jnp arrays (role of reference src/Plus.cpp + thirdparty/sophus).

All functions are pure, broadcast over leading batch dimensions, and are safe
under jit/vmap/grad. Quaternions are Hamilton convention, [w, x, y, z].
Rotation matrices act on column vectors: ``v_world = R @ v_body``.
"""

from vislam_tpu.lie.quat import (
    quat_identity,
    quat_mul,
    quat_conj,
    quat_normalize,
    quat_rotate,
    quat_to_mat,
    mat_to_quat,
    quat_slerp,
    quat_from_axis_angle,
    quat_canonical,
)
from vislam_tpu.lie.so3 import (
    so3_hat,
    so3_vee,
    so3_exp,
    so3_log,
    so3_left_jacobian,
    so3_left_jacobian_inv,
    orthonormalize,
)
from vislam_tpu.lie.se3 import (
    se3_identity,
    se3_exp,
    se3_log,
    se3_compose,
    se3_inverse,
    se3_apply,
    se3_matrix,
    se3_from_matrix,
    se3_adjoint,
)
from vislam_tpu.lie.sim3 import (
    sim3_identity,
    sim3_exp,
    sim3_log,
    sim3_compose,
    sim3_inverse,
    sim3_apply,
)
from vislam_tpu.lie.euler import (
    rpy_to_quat,
    quat_to_rpy,
    rpy_to_mat,
    mat_to_rpy,
    wrap_angle,
    angle_diff,
)

__all__ = [k for k in dir() if not k.startswith("_")]
