"""Tests for SCARED/KITTI dataset path logic, the velodyne depth projection,
and the split writer."""

import os

import numpy as np
import pytest
from PIL import Image

from unsupervised_pose_estimation_tpu.data.datasets import (
    KITTIOdomDataset, KITTIRAWDataset, SCAREDRAWDataset)
from unsupervised_pose_estimation_tpu.data.make_splits import (scan_sequences,
                                                               write_split)
from unsupervised_pose_estimation_tpu.eval.kitti_depth import (
    generate_depth_map, load_velodyne_points, read_calib_file)


def test_scared_paths_and_crop(tmp_path):
    seq = tmp_path / "d1" / "image_02" / "data"
    seq.mkdir(parents=True)
    rng = np.random.default_rng(0)
    for i in range(5):
        arr = rng.integers(0, 255, (128, 96, 3), dtype=np.uint8)
        Image.fromarray(arr).save(seq / f"{i:010d}.png")
    ds = SCAREDRAWDataset(str(tmp_path), ["d1 2 l"], height=32, width=32,
                          frame_idxs=[0, -1, 1], is_train=False)
    assert ds.get_image_path("d1", 2, "l").endswith(
        "d1/image_02/data/0000000002.png")
    # bottom 64 px cropped before resize (scared_dataset.py:33-45)
    frame = ds.load_frame("d1", 2, "l")
    assert frame.size == (96, 64)
    item = ds.get_item(0)
    assert item["color"].shape == (3, 32, 32, 3)
    np.testing.assert_allclose(item["K_norm"][0, 0], 0.82)


def test_kitti_odom_paths():
    ds = KITTIOdomDataset("/data", ["9 100 l"], height=32, width=32,
                          frame_idxs=[0], is_train=False)
    assert ds.get_image_path("9", 100, "l") == \
        "/data/sequences/09/image_2/000100.png"


def test_kitti_raw_paths():
    ds = KITTIRAWDataset("/data", ["2011_09_26/d1 7 r"], height=32, width=32,
                         frame_idxs=[0], is_train=False)
    assert ds.get_image_path("2011_09_26/d1", 7, "r") == \
        "/data/2011_09_26/d1/image_03/data/0000000007.png"


@pytest.fixture
def kitti_calib(tmp_path):
    """Fabricated KITTI calib + velodyne scan with known geometry."""
    w, h = 40, 12
    fx = fy = 20.0
    cx, cy = w / 2, h / 2
    with open(tmp_path / "calib_cam_to_cam.txt", "w") as f:
        f.write(f"S_rect_02: {w} {h}\n")
        f.write("R_rect_00: 1 0 0 0 1 0 0 0 1\n")
        f.write(f"P_rect_02: {fx} 0 {cx} 0 0 {fy} {cy} 0 0 0 1 0\n")
    with open(tmp_path / "calib_velo_to_cam.txt", "w") as f:
        # velodyne x-forward -> camera z-forward
        f.write("R: 0 -1 0 0 0 -1 1 0 0\n")
        f.write("T: 0 0 0\n")
    # points straight ahead at depths 5 and 10 (same pixel; min wins)
    pts = np.array([[5, 0, 0, 1], [10, 0, 0, 1], [7, -1, 0, 1]],
                   dtype=np.float32)
    pts.tofile(tmp_path / "scan.bin")
    return tmp_path, (w, h), fx


def test_generate_depth_map_projects_and_dedupes(kitti_calib):
    tmp_path, (w, h), fx = kitti_calib
    depth = generate_depth_map(str(tmp_path), str(tmp_path / "scan.bin"), 2)
    assert depth.shape == (h, w)
    # center pixel: two returns at depths 5 and 10 -> min kept
    cy, cx = h // 2 - 1, w // 2 - 1
    assert depth[cy, cx] == pytest.approx(5.0)
    # the offset point: x_img = fx * (1/7) + cx
    x_off = int(round(fx * (1.0 / 7.0) + w / 2)) - 1
    assert depth[cy, x_off] == pytest.approx(7.0)
    assert (depth > 0).sum() == 2


def test_load_velodyne_points(kitti_calib):
    tmp_path, _, _ = kitti_calib
    pts = load_velodyne_points(str(tmp_path / "scan.bin"))
    assert pts.shape == (3, 4)
    np.testing.assert_allclose(pts[:, 3], 1.0)


def test_read_calib_file(kitti_calib):
    tmp_path, (w, h), _ = kitti_calib
    calib = read_calib_file(str(tmp_path / "calib_cam_to_cam.txt"))
    np.testing.assert_allclose(calib["S_rect_02"], [w, h])


def test_write_split(tmp_path):
    for folder, n in (("seqA", 12), ("seqB", 8)):
        d = tmp_path / "data" / folder
        d.mkdir(parents=True)
        for i in range(n):
            Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(
                d / f"{i:010d}.png")
    seqs = scan_sequences(str(tmp_path / "data"))
    assert [(f, len(fr)) for f, fr in seqs] == [("seqA", 12), ("seqB", 8)]

    train_p, val_p = write_split(str(tmp_path / "data"),
                                 str(tmp_path / "splits"), val_fraction=0.25,
                                 margin=2)
    train = open(train_p).read().splitlines()
    val = open(val_p).read().splitlines()
    total = (12 - 4) + (8 - 4)
    assert len(train) + len(val) == total
    assert len(val) == max(1, int(total * 0.25))
    # boundary frames excluded
    assert not any(line.endswith(" 0 l") or " 11 " in line for line in train)
    # format parses
    from unsupervised_pose_estimation_tpu.data.split import parse_split_line
    folder, idx, side = parse_split_line(train[0])
    assert side == "l" and isinstance(idx, int)
