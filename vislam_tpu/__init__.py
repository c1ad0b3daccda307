"""vislam_tpu — a TPU-native visual-inertial SLAM framework.

Built from scratch in JAX/XLA/Pallas with the capability surface of the
reference OpenCV/ROS pipeline (MecatronicaUSB/vi-slam, see SURVEY.md), but
designed TPU-first: fixed-shape masked geometry, batched MXU matching,
lax.scan inertial filters, and a sliding-window bundle-adjustment backend
shardable over a jax device mesh.

Subpackages
-----------
lie       SO3/SE3/quaternion math on jnp arrays (role of Plus.cpp + Sophus)
calib     camera models / calibration presets (role of CameraModel)
data      dataset ingestion + 3-stream time sync (role of DataReader et al.)
inertial  orientation filters, bias calibration, preintegration (role of Imu)
frontend  detection, description, matching, 2-view pose (Camera/Matcher/F2FRansac)
backend   triangulation + sliding-window bundle adjustment (EstimatePoseFeatures→BA)
engine    the jitted per-frame VIO engine + keyframe window (VISystem)
ops       Pallas TPU kernels for the hot paths
parallel  mesh / sharding / distributed BA (new; reference has none)
eval      ATE/RPE metrics, CSV trajectory IO (tools/plot parity)
utils     config, timing stats, checkpointing
viz       offline plotting (tools/plot parity)
"""

__version__ = "0.1.0"
