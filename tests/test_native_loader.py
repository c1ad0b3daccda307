"""Native C++ loader tests: build, CSV/PNG parity with Python/cv2 readers,
prefetch ring ordering."""

import numpy as np
import pytest

from vislam_tpu.data import SyntheticConfig, write_euroc_fixture
from vislam_tpu.data.native_loader import (
    NativePrefetcher,
    load_csv,
    load_png_gray,
    native_available,
)

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native toolchain unavailable"
)


@pytest.fixture(scope="module")
def fixture(tmp_path_factory):
    path = tmp_path_factory.mktemp("native_fix")
    seq = write_euroc_fixture(
        str(path), SyntheticConfig(n_frames=16, n_landmarks=80, seed=13)
    )
    return str(path), seq


def test_native_csv_matches_python(fixture):
    import os

    path, _ = fixture
    csv = os.path.join(path, "mav0", "imu0", "data.csv")
    ours = load_csv(csv)
    ref = np.genfromtxt(csv, delimiter=",", comments="#")
    np.testing.assert_allclose(ours, ref, rtol=1e-12)


def test_native_png_matches_cv2(fixture):
    import glob
    import os

    import cv2

    path, seq = fixture
    pngs = sorted(glob.glob(os.path.join(path, "mav0", "cam0", "data", "*.png")))
    img_native = load_png_gray(pngs[3])
    img_cv = cv2.imread(pngs[3], cv2.IMREAD_GRAYSCALE)
    np.testing.assert_array_equal(img_native, img_cv)
    np.testing.assert_array_equal(img_native, seq["images"][3])


def test_prefetcher_sequential(fixture):
    import glob
    import os

    path, seq = fixture
    pngs = sorted(glob.glob(os.path.join(path, "mav0", "cam0", "data", "*.png")))
    pf = NativePrefetcher(pngs, depth=4, threads=2)
    try:
        for i in range(len(pngs)):
            img = pf.get(i)
            np.testing.assert_array_equal(img, seq["images"][i])
    finally:
        pf.close()


def test_prefetcher_seek(fixture):
    import glob
    import os

    path, seq = fixture
    pngs = sorted(glob.glob(os.path.join(path, "mav0", "cam0", "data", "*.png")))
    pf = NativePrefetcher(pngs, depth=3, threads=2)
    try:
        np.testing.assert_array_equal(pf.get(0), seq["images"][0])
        # Forward seek past the prefetch depth.
        np.testing.assert_array_equal(pf.get(10), seq["images"][10])
        np.testing.assert_array_equal(pf.get(11), seq["images"][11])
    finally:
        pf.close()
