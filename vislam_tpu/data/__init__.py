from vislam_tpu.data.euroc import EurocDataset, FrameWindow
from vislam_tpu.data.kitti import KittiDataset
from vislam_tpu.data.tum import TumDataset
from vislam_tpu.data.loader import PrefetchLoader
from vislam_tpu.data.synthetic import (
    SyntheticConfig,
    make_synthetic_sequence,
    write_euroc_fixture,
    synthetic_calib,
)

__all__ = [
    "EurocDataset",
    "KittiDataset",
    "TumDataset",
    "FrameWindow",
    "PrefetchLoader",
    "SyntheticConfig",
    "make_synthetic_sequence",
    "write_euroc_fixture",
    "synthetic_calib",
]
