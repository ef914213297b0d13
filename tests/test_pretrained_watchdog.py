"""Offline-path tests for scripts/run_pretrained_parity.py (VERDICT r4 #9):
the watchdog must exit 2 with a precise inventory while the artifacts are
missing, detect each artifact the moment it exists, and format the
BASELINE.md row correctly."""

import importlib.util
import os

import numpy as np
import pytest

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def watchdog():
    spec = importlib.util.spec_from_file_location(
        "run_pretrained_parity",
        os.path.join(HERE, "scripts", "run_pretrained_parity.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_still_offline_exit_code(watchdog, tmp_path, capsys):
    rc = watchdog.main(["--no_download",
                        "--models_dir", str(tmp_path / "models"),
                        "--data_path", str(tmp_path / "kitti"),
                        "--baseline_md", str(tmp_path / "BASELINE.md"),
                        "--out", str(tmp_path / "out.json")])
    assert rc == 2
    out = capsys.readouterr().out
    assert "still offline" in out
    assert "monodepth2 checkpoint : MISSING" in out
    assert "KITTI data + GT       : MISSING" in out
    # nothing written on the offline path
    assert not os.path.exists(tmp_path / "BASELINE.md")
    assert not os.path.exists(tmp_path / "out.json")


def test_probe_monodepth2_finds_extracted_checkpoint(watchdog, tmp_path):
    folder = tmp_path / "models" / "mono_640x192"
    folder.mkdir(parents=True)
    (folder / "encoder.pth").write_bytes(b"\x00")
    path, why = watchdog.probe_monodepth2(
        str(tmp_path / "models"), "mono_640x192",
        allow_download=False, net_timeout=1.0)
    assert path == str(folder) and "found" in why


def test_probe_imagenet_explicit_flag(watchdog, tmp_path):
    pth = tmp_path / "resnet18.pth"
    pth.write_bytes(b"\x00")
    path, _ = watchdog.probe_imagenet(18, str(pth), allow_download=False,
                                      net_timeout=1.0)
    assert path == str(pth)
    missing, why = watchdog.probe_imagenet(
        18, str(tmp_path / "nope.pth"), allow_download=False,
        net_timeout=1.0)
    assert missing is None and "does not exist" in why


def test_probe_kitti_stages(watchdog, tmp_path):
    from PIL import Image

    data = tmp_path / "kitti"
    ok, why = watchdog.probe_kitti(str(data), "eigen")
    assert not ok and "no KITTI tree" in why

    # first eigen test line: folder + frame idx from the vendored split
    from unsupervised_pose_estimation_tpu.data.split import (
        readlines, resolve_split_file)
    first = readlines(resolve_split_file(
        os.path.join(HERE, "splits"), "eigen"))[0]
    folder, frame = first.split()[0], int(first.split()[1])
    img_dir = data / folder / "image_02" / "data"
    img_dir.mkdir(parents=True)
    ok, why = watchdog.probe_kitti(str(data), "eigen")
    assert not ok and "first split frame missing" in why

    Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(
        img_dir / f"{frame:010d}.png")
    ok, why = watchdog.probe_kitti(str(data), "eigen")
    assert not ok and "gt_depths.npz" in why  # frame there, GT not exported


def test_format_and_append_baseline_row(watchdog, tmp_path):
    metrics = {"abs_rel": 0.116, "sq_rel": 0.9, "rmse": 4.9,
               "rmse_log": 0.19, "a1": 0.88, "a2": 0.96, "a3": 0.98}
    row = watchdog.format_baseline_row(metrics, "mono_640x192",
                                       "eval of imported checkpoint")
    assert row.startswith("| Quality row: pretrained parity")
    assert "abs_rel 0.116" in row
    assert "delta +0.001" in row  # vs published 0.115
    md = tmp_path / "BASELINE.md"
    md.write_text("# header\n")
    watchdog.append_baseline_row(str(md), row)
    assert md.read_text().endswith(row + "\n")
