from vislam_tpu.frontend.pyramid import build_pyramid, scharr_gradients, gaussian_blur
from vislam_tpu.frontend.detect import detect_keypoints, harris_response, Keypoints
from vislam_tpu.frontend.descriptor import describe_keypoints
from vislam_tpu.frontend.match import match_descriptors, Matches
from vislam_tpu.frontend.pose import (
    rotation_compensated_disparity,
    ransac_translation,
    epipolar_inlier_mask,
)
from vislam_tpu.frontend.features import Features, extract_features

__all__ = [
    "build_pyramid",
    "scharr_gradients",
    "gaussian_blur",
    "detect_keypoints",
    "harris_response",
    "Keypoints",
    "describe_keypoints",
    "match_descriptors",
    "Matches",
    "rotation_compensated_disparity",
    "ransac_translation",
    "epipolar_inlier_mask",
    "Features",
    "extract_features",
]
