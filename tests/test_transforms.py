"""Direct unit tests for the host-side transforms (`data/transforms.py`)
— paired-crop alignment and pairwise-consistent augmentation are silent
quality killers if they drift (misaligned lq/gt trains to a blur), so
they get explicit checks beyond the dataset-level smoke coverage.

Reference semantics: `Deraining/basicsr/data/transforms.py:19-275`.
"""

import random

import numpy as np
import pytest

from vmambair_tpu.data.transforms import (
    augment,
    data_augmentation,
    mod_crop,
    paired_random_crop,
    random_augmentation,
)


def _coord_image(h, w, scale=1):
    """Image whose value at (y, x) encodes the ORIGINAL full-res coords —
    alignment-checkable after any crop."""
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    return np.stack([ys * scale, xs * scale, np.zeros_like(ys)], axis=-1)


def test_mod_crop():
    img = np.zeros((13, 18, 3), np.float32)
    assert mod_crop(img, 4).shape == (12, 16, 3)
    assert mod_crop(img, 1).shape == (13, 18, 3)


@pytest.mark.parametrize("scale", [1, 2, 4])
def test_paired_random_crop_alignment(scale):
    h_lq, w_lq, gt_patch = 24, 32, 16
    lq = _coord_image(h_lq, w_lq, scale)
    gt = _coord_image(h_lq * scale, w_lq * scale, 1)
    rng = random.Random(3)
    for _ in range(8):
        gt_c, lq_c = paired_random_crop(gt.copy(), lq.copy(),
                                        gt_patch, scale, rng=rng)
        assert lq_c.shape[:2] == (gt_patch // scale, gt_patch // scale)
        assert gt_c.shape[:2] == (gt_patch, gt_patch)
        # the gt crop's top-left full-res coords must equal scale x the
        # lq crop's encoded full-res coords
        np.testing.assert_allclose(gt_c[0, 0, :2], lq_c[0, 0, :2])
        np.testing.assert_allclose(
            gt_c[-1, -1, :2] - gt_c[0, 0, :2],
            [gt_patch - 1, gt_patch - 1],
        )


def test_augment_pairwise_consistent():
    rng = random.Random(0)
    a = _coord_image(8, 10)
    b = a.copy()
    for _ in range(12):
        out = augment([a.copy(), b.copy()], hflip=True, rotation=True,
                      rng=rng)
        np.testing.assert_array_equal(out[0], out[1])


def test_augment_identity_when_disabled():
    img = _coord_image(6, 7)
    out = augment(img.copy(), hflip=False, rotation=False,
                  rng=random.Random(0))
    np.testing.assert_array_equal(out, img)


def test_data_augmentation_modes_are_d8():
    """The 8 modes are the dihedral group: each must be undone by one of
    the 8 (closure + invertibility), and all 8 outputs distinct on an
    asymmetric image."""
    img = _coord_image(5, 7)[..., :2]
    outs = [data_augmentation(img, m) for m in range(8)]
    # all distinct
    for i in range(8):
        for j in range(i + 1, 8):
            assert outs[i].shape != outs[j].shape or not np.array_equal(
                outs[i], outs[j]
            ), (i, j)
    # each mode invertible by some mode
    for m in range(8):
        assert any(
            np.array_equal(data_augmentation(outs[m], inv), img)
            for inv in range(8)
            if data_augmentation(outs[m], inv).shape == img.shape
        ), m


def test_random_augmentation_applies_same_mode_to_all():
    rng = random.Random(5)
    a = _coord_image(6, 6)
    for _ in range(10):
        out_a, out_b = random_augmentation(a.copy(), a.copy(), rng=rng)
        np.testing.assert_array_equal(out_a, out_b)
