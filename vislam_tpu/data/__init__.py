from vislam_tpu.data.euroc import EurocDataset, FrameWindow
from vislam_tpu.data.loader import PrefetchLoader
from vislam_tpu.data.synthetic import (
    SyntheticConfig,
    make_synthetic_sequence,
    write_euroc_fixture,
    synthetic_calib,
)

__all__ = [
    "EurocDataset",
    "FrameWindow",
    "PrefetchLoader",
    "SyntheticConfig",
    "make_synthetic_sequence",
    "write_euroc_fixture",
    "synthetic_calib",
]
