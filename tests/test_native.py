"""Native C++ host-pipeline kernels vs numpy references."""

import numpy as np
import pytest

from bem_tpu import native
from bem_tpu.utils.histogram import _compute_histograms_np

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable (no g++)"
)


def test_native_kde_matches_numpy(rng):
    img = rng.random((24, 36, 3)).astype(np.float32)
    ref = _compute_histograms_np(img, patch_size=8, bin_count=32)
    got = native.kde_histograms(img, 8, 32)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-6)


def test_native_kde_ragged_reflect(rng):
    # non-multiple sizes exercise the reflect padding path
    img = rng.random((19, 21, 3)).astype(np.float32)
    ref = _compute_histograms_np(img, patch_size=8, bin_count=16)
    got = native.kde_histograms(img, 8, 16)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-6)


@pytest.mark.parametrize("mode", range(8))
def test_native_crop_augment_matches_numpy(rng, mode):
    from bem_tpu.data.transforms import data_augmentation

    lq = rng.random((16, 20, 3)).astype(np.float32)
    gt = rng.random((16, 20, 3)).astype(np.float32)
    top, left, P = 3, 5, 8
    out = native.paired_crop_augment(lq, gt, top, left, P, mode)
    got_gt, got_lq = out
    ref_gt = data_augmentation(gt[top : top + P, left : left + P], mode)
    ref_lq = data_augmentation(lq[top : top + P, left : left + P], mode)
    np.testing.assert_allclose(got_gt, ref_gt, atol=0)
    np.testing.assert_allclose(got_lq, ref_lq, atol=0)
