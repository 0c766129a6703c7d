"""Video/face dataset tests (D11: REDS / Vimeo90K / VideoTest / FFHQ).

Mirrors the reference test style (`RealSR/tests/test_dataset.py`): tiny
on-disk fixtures, assert returned keys/shapes/temporal semantics.
"""

import os

import cv2
import numpy as np
import pytest

from vmambair_tpu.data.video_datasets import (
    FFHQDataset,
    REDSDataset,
    VideoTestDataset,
    Vimeo90KDataset,
    generate_frame_indices,
)


def _write(path, h=16, w=16, seed=0):
    rng = np.random.RandomState(seed)
    os.makedirs(os.path.dirname(str(path)), exist_ok=True)
    cv2.imwrite(str(path), (rng.rand(h, w, 3) * 255).astype(np.uint8))


def test_generate_frame_indices_padding_modes():
    # reference semantics (`data_util.py generate_frame_indices`)
    assert generate_frame_indices(0, 100, 5, "replicate") == [0, 0, 0, 1, 2]
    assert generate_frame_indices(0, 100, 5, "reflection") == [2, 1, 0, 1, 2]
    assert generate_frame_indices(0, 100, 5, "reflection_circle") == [
        4, 3, 0, 1, 2]
    assert generate_frame_indices(0, 100, 5, "circle") == [3, 4, 0, 1, 2]
    assert generate_frame_indices(99, 100, 5, "replicate") == [
        97, 98, 99, 99, 99]
    assert generate_frame_indices(99, 100, 5, "reflection") == [
        97, 98, 99, 98, 97]
    assert generate_frame_indices(50, 100, 3) == [49, 50, 51]


def test_reds_dataset(tmp_path):
    gt, lq = tmp_path / "gt", tmp_path / "lq"
    # clip '025' (not in REDS4 val partition), 12 frames
    for i in range(12):
        _write(gt / "025" / f"{i:08d}.png", 32, 32, i)
        _write(lq / "025" / f"{i:08d}.png", 8, 8, 100 + i)
    meta = tmp_path / "meta.txt"
    meta.write_text("".join(f"025/{i:08d} (32,32,3)\n" for i in range(12)))
    ds = REDSDataset(dict(
        dataroot_gt=str(gt), dataroot_lq=str(lq),
        meta_info_file=str(meta), val_partition="REDS4",
        num_frame=5, gt_size=16, scale=4, interval_list=[1],
        random_reverse=False, use_flip=False, use_rot=False,
        io_backend={"type": "disk"}, frames_per_clip=12,
    ))
    assert len(ds) == 12
    s = ds[6]
    assert s["lq"].shape == (5, 4, 4, 3)
    assert s["gt"].shape == (16, 16, 3)
    assert s["key"] == "025/00000006"
    assert s["lq"].dtype == np.float32 and s["lq"].max() <= 1.0


def test_reds_val_partition_split(tmp_path):
    meta = tmp_path / "meta.txt"
    meta.write_text("000/00000000 x\n011/00000000 x\n025/00000000 x\n")
    common = dict(
        dataroot_gt="g", dataroot_lq="l", meta_info_file=str(meta),
        num_frame=3, gt_size=8, scale=4, io_backend={"type": "disk"},
    )
    train = REDSDataset(dict(common, val_partition="REDS4"))
    assert [k.split("/")[0] for k in train.keys] == ["025"]
    val = REDSDataset(dict(common, val_partition="REDS4", test_mode=True))
    assert sorted(k.split("/")[0] for k in val.keys) == ["000", "011"]


def test_vimeo90k_dataset(tmp_path):
    gt, lq = tmp_path / "gt", tmp_path / "lq"
    for n in range(1, 8):
        _write(gt / "00001" / "0266" / f"im{n}.png", 32, 32, n)
        _write(lq / "00001" / "0266" / f"im{n}.png", 8, 8, 10 + n)
    meta = tmp_path / "meta.txt"
    meta.write_text("00001/0266 (256,448,3)\n")
    ds = Vimeo90KDataset(dict(
        dataroot_gt=str(gt), dataroot_lq=str(lq), meta_info_file=str(meta),
        num_frame=7, gt_size=16, scale=4, random_reverse=False,
        use_flip=False, use_rot=False, io_backend={"type": "disk"},
    ))
    assert len(ds) == 1
    s = ds[0]
    assert s["lq"].shape == (7, 4, 4, 3)
    assert s["gt"].shape == (16, 16, 3)
    # num_frame=5 -> frame list [2..6] centered on im4 (ref :26-33)
    ds5 = Vimeo90KDataset(dict(
        dataroot_gt=str(gt), dataroot_lq=str(lq), meta_info_file=str(meta),
        num_frame=5, gt_size=16, scale=4, io_backend={"type": "disk"},
    ))
    assert ds5.neighbor_list == [2, 3, 4, 5, 6]


def test_video_test_dataset(tmp_path):
    gt, lq = tmp_path / "gt", tmp_path / "lq"
    for i in range(4):
        _write(gt / "clipA" / f"{i:08d}.png", 16, 16, i)
        _write(lq / "clipA" / f"{i:08d}.png", 16, 16, 50 + i)
    ds = VideoTestDataset(dict(
        dataroot_gt=str(gt), dataroot_lq=str(lq), num_frame=3,
        padding="reflection", io_backend={"type": "disk"},
    ))
    assert len(ds) == 4
    s0 = ds[0]
    assert s0["lq"].shape == (3, 16, 16, 3)
    assert s0["border"] == 1 and s0["folder"] == "clipA"
    # frame 0 with reflection padding reads frames [1, 0, 1]
    assert np.allclose(s0["lq"][0], s0["lq"][2])
    s_mid = ds[1]
    assert s_mid["border"] == 0
    assert not np.allclose(s_mid["lq"][0], s_mid["lq"][2])


def test_ffhq_dataset(tmp_path):
    d = tmp_path / "faces"
    for i in range(3):
        _write(d / f"{i:08d}.png", 16, 16, i)
    ds = FFHQDataset(dict(
        dataroot_gt=str(d), num_images=3, use_hflip=False,
        mean=[0.5, 0.5, 0.5], std=[0.5, 0.5, 0.5],
        io_backend={"type": "disk"},
    ))
    assert len(ds) == 3
    s = ds[1]
    assert s["gt"].shape == (16, 16, 3)
    # normalized to [-1, 1]
    assert s["gt"].min() >= -1.0 - 1e-6 and s["gt"].max() <= 1.0 + 1e-6
    assert s["gt"].min() < 0


def test_video_datasets_registered():
    from vmambair_tpu.data import build_dataset  # noqa: F401
    from vmambair_tpu.utils.registry import DATASET_REGISTRY

    for name in ("REDSDataset", "Vimeo90KDataset", "VideoTestDataset",
                 "FFHQDataset"):
        assert name in DATASET_REGISTRY
