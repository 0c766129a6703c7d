"""Degradation pipeline tests: kernel synthesis stats, on-device ops shape/
range sanity, full two-order synthesis graph, dataset output contract."""

import random

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_kernel_synthesis_normalized():
    from vmambair_tpu.data.degradations import (
        circular_lowpass_kernel,
        random_mixed_kernels,
    )

    rng = np.random.RandomState(0)
    for _ in range(5):
        k = random_mixed_kernels(
            ["iso", "aniso", "generalized_iso", "generalized_aniso",
             "plateau_iso", "plateau_aniso"],
            [0.45, 0.25, 0.12, 0.03, 0.12, 0.03],
            21, (0.2, 3), (0.2, 3), rng=rng,
        )
        assert k.shape == (21, 21)
        assert abs(k.sum() - 1.0) < 1e-6
    sinc = circular_lowpass_kernel(np.pi / 2, 13, pad_to=21)
    assert sinc.shape == (21, 21)
    assert abs(sinc.sum() - 1.0) < 1e-6


def test_filter2d_identity():
    from vmambair_tpu.ops.degradation import filter2d

    img = jnp.asarray(np.random.RandomState(0).rand(2, 16, 16, 3),
                      jnp.float32)
    ident = np.zeros((2, 5, 5), np.float32)
    ident[:, 2, 2] = 1.0
    out = filter2d(img, jnp.asarray(ident))
    assert np.allclose(out, img, atol=1e-5)


def test_jpeg_quality_ordering():
    from vmambair_tpu.ops.degradation import jpeg_compress_padded

    img = jnp.asarray(np.random.RandomState(0).rand(1, 32, 32, 3),
                      jnp.float32)
    hi = jpeg_compress_padded(img, jnp.asarray([95.0]))
    lo = jpeg_compress_padded(img, jnp.asarray([10.0]))
    err_hi = float(jnp.mean((hi - img) ** 2))
    err_lo = float(jnp.mean((lo - img) ** 2))
    assert err_lo > err_hi  # lower quality = more distortion
    assert float(hi.min()) >= 0 and float(hi.max()) <= 1


def test_usm_sharp_shapes():
    from vmambair_tpu.ops.degradation import usm_sharp

    img = jnp.asarray(np.random.RandomState(1).rand(2, 24, 24, 3),
                      jnp.float32)
    out = usm_sharp(img)
    assert out.shape == img.shape
    assert float(out.min()) >= 0 and float(out.max()) <= 1


def test_synthesis_graph_shapes():
    from vmambair_tpu.train.realesrgan_model import make_synthesis_fn

    opt = dict(
        resize_prob=[0.2, 0.7, 0.1], resize_range=[0.15, 1.5],
        gaussian_noise_prob=0.5, noise_range=[1, 30],
        poisson_scale_range=[0.05, 3], gray_noise_prob=0.4,
        jpeg_range=[30, 95], second_blur_prob=0.8,
        resize_prob2=[0.3, 0.4, 0.3], resize_range2=[0.3, 1.2],
        gaussian_noise_prob2=0.5, noise_range2=[1, 25],
        poisson_scale_range2=[0.05, 2.5], gray_noise_prob2=0.4,
        jpeg_range2=[30, 95],
    )
    scale, gt_size = 4, 32
    synth = make_synthesis_fn(opt, scale, gt_size)
    rng = np.random.RandomState(0)
    b, s = 2, 64
    gt = jnp.asarray(rng.rand(b, s, s, 3), jnp.float32)
    k1 = jnp.asarray(np.tile(np.eye(21)[None] / 21, (b, 1, 1)), jnp.float32)
    k2, sinc = k1, k1
    gt_c, gt_usm_c, lq = synth(jax.random.PRNGKey(0), gt, k1, k2, sinc)
    assert gt_c.shape == (b, gt_size, gt_size, 3)
    assert gt_usm_c.shape == (b, gt_size, gt_size, 3)
    assert lq.shape == (b, gt_size // scale, gt_size // scale, 3)
    assert np.isfinite(np.asarray(lq)).all()
    assert float(lq.min()) >= 0 and float(lq.max()) <= 1


def test_realesrgan_dataset_contract(tmp_path):
    import cv2

    from vmambair_tpu.data.realesrgan_dataset import RealESRGANDataset

    gt_dir = tmp_path / "gt"
    gt_dir.mkdir()
    rng = np.random.RandomState(0)
    for i in range(3):
        cv2.imwrite(str(gt_dir / f"{i}.png"),
                    (rng.rand(50, 40, 3) * 255).astype(np.uint8))
    opt = dict(
        dataroot_gt=str(gt_dir), io_backend={"type": "disk"},
        crop_pad_size=64,
        blur_kernel_size=21,
        kernel_list=["iso", "aniso"], kernel_prob=[0.6, 0.4],
        blur_sigma=[0.2, 3], betag_range=[0.5, 4], betap_range=[1, 2],
        sinc_prob=0.1,
        blur_kernel_size2=21,
        kernel_list2=["iso", "aniso"], kernel_prob2=[0.6, 0.4],
        blur_sigma2=[0.2, 1.5], betag_range2=[0.5, 4], betap_range2=[1, 2],
        sinc_prob2=0.1, final_sinc_prob=0.8,
    )
    ds = RealESRGANDataset(opt)
    assert len(ds) == 3
    s = ds.__getitem__(0, rng=random.Random(0))
    assert s["gt"].shape == (64, 64, 3)  # crop/pad to crop_pad_size
    assert s["kernel1"].shape == (21, 21)
    assert s["kernel2"].shape == (21, 21)
    assert s["sinc_kernel"].shape == (21, 21)
    assert s["gt"].dtype == np.float32


def test_matlab_imresize_and_ycbcr():
    """MATLAB-protocol helpers: imresize antialias + Y-channel conversion
    ranges (metric parity critical, `matlab_functions.py`)."""
    from vmambair_tpu.utils.matlab import bgr2ycbcr, imresize

    img = np.random.RandomState(0).rand(17, 13, 3)
    small = imresize(img, 0.5)
    assert small.shape[:2] == (9, 7)
    y = bgr2ycbcr(img.astype(np.float32), y_only=True)
    # MATLAB Y range is [16/255, 235/255] for [0,1] inputs
    assert y.min() >= 16 / 255 - 1e-6 and y.max() <= 235 / 255 + 1e-6


def test_poisson_levels_match_basicsr_rule():
    """Per-image photon levels must equal basicsr's
    `2^ceil(log2(len(unique(rounded_img))))` exactly (computed here with the
    numpy unique formula, `generate_poisson_noise_pt`)."""
    import jax.numpy as jnp

    from vmambair_tpu.ops.degradation import _poisson_levels

    rng = np.random.RandomState(0)
    imgs = [
        rng.rand(8, 8, 3).astype(np.float32),                 # dense levels
        (rng.randint(0, 4, (8, 8, 3)) / 255.0).astype(np.float32),  # few
        np.zeros((8, 8, 3), np.float32),                      # single value
        (rng.randint(0, 200, (8, 8, 3)) / 255.0).astype(np.float32),
    ]
    batch = np.stack(imgs)
    q = np.clip((batch * 255.0).round(), 0, 255)
    expected = np.array(
        [2.0 ** np.ceil(np.log2(len(np.unique(qi)))) for qi in q],
        np.float32,
    )
    got = np.asarray(
        _poisson_levels(jnp.asarray(q, jnp.int32))
    )
    np.testing.assert_array_equal(got, expected)


def test_poisson_noise_statistics_match_formula():
    """Noise variance of poisson(q*vals)/vals - q is q/vals per pixel;
    check the batch-mean variance against the analytic value (the same
    check applied to the torch reference formula gives the same number)."""
    import jax
    import jax.numpy as jnp

    from vmambair_tpu.ops.degradation import add_poisson_noise

    rng = np.random.RandomState(1)
    img = jnp.asarray(rng.rand(2, 64, 64, 3) * 0.5 + 0.25, jnp.float32)
    scale = jnp.ones((2,), jnp.float32)
    gray = jnp.zeros((2,), bool)
    out = add_poisson_noise(jax.random.PRNGKey(0), img, scale, gray)
    noise = np.asarray(out - img)
    q = np.clip((np.asarray(img) * 255.0).round(), 0, 255) / 255.0
    vals = np.array(
        [2.0 ** np.ceil(np.log2(len(np.unique((qi * 255).round()))))
         for qi in q]
    )
    analytic_var = (q / vals[:, None, None, None]).mean()
    meas_var = noise.var()
    # clipping at [0,1] trims tails slightly; 15% tolerance
    assert abs(meas_var - analytic_var) / analytic_var < 0.15
    assert abs(noise.mean()) < 5e-4
