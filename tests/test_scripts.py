"""Smoke tests for the offline script CLIs (`scripts/`) — the reference
ships the same tool surface (`SRGAN/scripts/*`, `RealSR/scripts/*`,
`Metric/*`), and these are the first things a migrating user runs, so
each must work end-to-end on tiny fixtures, not just import.

Each test drives the script's argparse `main()` in-process via sys.argv.
"""

import json
import os
import sys

import numpy as np
import pytest


@pytest.fixture
def img_dir(tmp_path):
    from vmambair_tpu.utils.img_util import imwrite

    d = tmp_path / "imgs"
    d.mkdir()
    rng = np.random.RandomState(7)
    for i in range(3):
        img = (rng.rand(24, 20, 3) * 255).astype(np.uint8)
        imwrite(img, str(d / f"img{i}.png"))
    return str(d)


SCRIPTS_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"
)


def _run(script, argv, monkeypatch):
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        f"_script_{script}", os.path.join(SCRIPTS_DIR, f"{script}.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    monkeypatch.setattr(sys, "argv", [f"{script}.py"] + argv)
    mod.main()


def test_extract_subimages(img_dir, tmp_path, monkeypatch):
    out = str(tmp_path / "subs")
    _run("extract_subimages",
         ["--input", img_dir, "--output", out, "--crop_size", "12",
          "--step", "8", "--thresh_size", "0", "--n_thread", "2"],
         monkeypatch)
    subs = sorted(os.listdir(out))
    assert len(subs) > 3  # each image yields multiple crops
    import cv2

    sub = cv2.imread(os.path.join(out, subs[0]))
    assert sub.shape[:2] == (12, 12)


def test_generate_meta_info(img_dir, tmp_path, monkeypatch):
    out = str(tmp_path / "meta.txt")
    _run("generate_meta_info",
         ["--input", img_dir, "--output", out], monkeypatch)
    lines = open(out).read().strip().splitlines()
    assert len(lines) == 3
    assert lines[0].endswith("img0.png")


def test_generate_multiscale(img_dir, tmp_path, monkeypatch):
    out = str(tmp_path / "multi")
    _run("generate_multiscale",
         ["--input", img_dir, "--output", out, "--scales", "0.5"],
         monkeypatch)
    import cv2

    files = sorted(os.listdir(out))
    assert files, "no multiscale outputs"
    img = cv2.imread(os.path.join(out, files[0]))
    assert img.shape[0] <= 24


def test_create_packfile_roundtrip(img_dir, tmp_path, monkeypatch):
    out = str(tmp_path / "data.pack")
    _run("create_packfile",
         ["--input", img_dir, "--output", out], monkeypatch)
    assert os.path.exists(out)
    from vmambair_tpu.data.packfile import PackReader

    buf = PackReader(out).get("img1")
    import cv2

    img = cv2.imdecode(np.frombuffer(buf, np.uint8), cv2.IMREAD_COLOR)
    assert img is not None and img.shape == (24, 20, 3)


def test_export_model_stablehlo(tmp_path, monkeypatch):
    out = str(tmp_path / "ossnet.shlo")
    _run("export_model",
         ["--arch", "OSSNet", "--network_opt",
          json.dumps({"dim": 8, "num_blocks": [1, 1, 1, 1],
                      "num_refinement_blocks": 1, "scale": 4,
                      "scan_impl": "xla"}),
          "--hw", "16", "16", "--output", out],
         monkeypatch)
    blob = open(out, "rb").read()
    assert len(blob) > 1000
    # the serialized artifact must round-trip and carry the right signature
    from jax import export as jexport

    rebuilt = jexport.deserialize(blob)
    (spec,) = rebuilt.in_avals
    assert tuple(spec.shape) == (1, 16, 16, 3)
    (out_spec,) = rebuilt.out_avals
    assert tuple(out_spec.shape) == (1, 64, 64, 3)


def test_metric_psnr_ssim_cli(img_dir, tmp_path, monkeypatch, capsys):
    _run("metric_psnr_ssim",
         ["--gt", img_dir, "--sr", img_dir, "--crop_border", "2"],
         monkeypatch)
    text = capsys.readouterr().out
    assert "psnr" in text.lower()
    # identical folders: PSNR is inf/very large, SSIM ~ 1
    assert "ssim" in text.lower()


def _avg_score(text, name):
    import re

    m = re.search(rf"average: {name} ([-0-9.]+)", text)
    assert m, text
    return float(m.group(1))


def test_metric_lpips_cli(img_dir, tmp_path, monkeypatch, capsys):
    _run("metric_lpips", ["--gt", img_dir, "--sr", img_dir], monkeypatch)
    text = capsys.readouterr().out.lower()
    # identical folders: the distance must be ~0 whatever the backbone
    assert abs(_avg_score(text, "lpips")) < 1e-4, text


def test_metric_dists_cli(img_dir, tmp_path, monkeypatch, capsys):
    _run("metric_dists", ["--gt", img_dir, "--sr", img_dir], monkeypatch)
    text = capsys.readouterr().out.lower()
    assert abs(_avg_score(text, "dists")) < 1e-4, text


@pytest.mark.skipif(
    not os.path.exists(
        "/root/reference/SRGAN/Metric/DISTS/DISTS_pytorch/weights.pt"
    ),
    reason="reference snapshot not present",
)
def test_convert_metric_weights_dists(tmp_path, monkeypatch):
    """The converter that produced the vendored DISTS alpha/beta asset
    (`metrics/assets/`): reference weights.pt -> npz with the published
    calibration values (`DISTS_pt.py:20-35`)."""
    out = str(tmp_path / "dists.npz")
    _run("convert_metric_weights",
         ["--dists",
          "/root/reference/SRGAN/Metric/DISTS/DISTS_pytorch/weights.pt",
          "-o", out],
         monkeypatch)
    data = np.load(out)
    assert "alpha" in data and "beta" in data
    total = data["alpha"].sum() + data["beta"].sum()
    assert np.isfinite(total) and data["alpha"].size > 1000


def test_create_lmdb_pack_path_and_meta(tmp_path, monkeypatch):
    """create_lmdb: meta_info lines follow the reference's
    `name.png (h,w,c) level` convention (`lmdb_util.py`), keys are
    extension-less, and the --format pack path round-trips through the
    native packfile backend. The lmdb branch itself needs the optional
    lmdb package (absent here) and must fail with the documented message."""
    import sys

    import numpy as np
    import pytest

    sys.path.insert(0, "scripts")
    import create_lmdb as cl

    from vmambair_tpu.utils.img_util import imwrite

    src = tmp_path / "imgs"
    src.mkdir()
    rng = np.random.RandomState(0)
    for i in range(3):
        imwrite((rng.rand(6 + i, 5, 3) * 255).astype(np.uint8),
                str(src / f"im{i}.png"))

    items = cl.gather_images(str(src))
    assert items == [(f"im{i}.png", f"im{i}") for i in range(3)]
    assert cl.meta_line("im0.png", (6, 5, 3), 1) == "im0.png (6,5,3) 1"

    pack = str(tmp_path / "imgs.pack")
    n = cl.write_pack(str(src), pack, compress_level=1)
    assert n == 3
    meta = open(pack + ".meta_info.txt").read().strip().splitlines()
    assert meta[0] == "im0.png (6,5,3) 1"
    assert meta[2] == "im2.png (8,5,3) 1"

    from vmambair_tpu.data.packfile import PackReader

    rd = PackReader(pack)
    assert sorted(rd.keys()) == ["im0", "im1", "im2"]
    import cv2

    img = cv2.imdecode(
        np.frombuffer(rd.get("im1"), np.uint8), cv2.IMREAD_UNCHANGED
    )
    assert img.shape == (7, 5, 3)
    rd.close()

    # lmdb branch: optional dep absent -> documented SystemExit
    if not _has_lmdb():
        with pytest.raises(SystemExit, match="lmdb"):
            monkeypatch.setattr(
                sys, "argv",
                ["create_lmdb.py", "--input", str(src), "--output",
                 str(tmp_path / "imgs.lmdb")],
            )
            cl.main()


def _has_lmdb():
    try:
        import lmdb  # noqa: F401
        return True
    except ImportError:
        return False
