"""Offline KITTI GT depth exporter.

Mirrors `/root/reference/export_gt_depth.py:19-61`: for the eigen split
project velodyne scans, for eigen_benchmark read the png/256 annotated maps;
write ``splits/<split>/gt_depths.npz``.
"""

from __future__ import annotations

import argparse
import os

import numpy as np
from PIL import Image

from ..data.split import readlines
from ..eval.kitti_depth import generate_depth_map


def export_gt_depths_kitti(opt):
    split_folder = os.path.join(os.path.dirname(__file__), "..", "..",
                                "splits", opt.split)
    lines = readlines(os.path.join(split_folder, "test_files.txt"))

    print(f"Exporting ground truth depths for {opt.split}")

    gt_depths = []
    for line in lines:
        folder, frame_id, _ = line.split()
        frame_id = int(frame_id)

        if opt.split == "eigen":
            calib_dir = os.path.join(opt.data_path, folder.split("/")[0])
            velo = os.path.join(opt.data_path, folder,
                                f"velodyne_points/data/{frame_id:010d}.bin")
            gt_depth = generate_depth_map(calib_dir, velo, 2, True)
        elif opt.split == "eigen_benchmark":
            gt_path = os.path.join(
                opt.data_path, folder, "proj_depth", "groundtruth",
                "image_02", f"{frame_id:010d}.png")
            gt_depth = np.asarray(Image.open(gt_path), np.float32) / 256.0
        else:
            raise ValueError(f"unsupported split {opt.split}")
        gt_depths.append(gt_depth.astype(np.float32))

    output_path = os.path.join(split_folder, "gt_depths.npz")
    print(f"Saving to {opt.split}")
    np.savez_compressed(output_path,
                        data=np.array(gt_depths, dtype="object"))


def main(argv=None):
    parser = argparse.ArgumentParser(description="export_gt_depth")
    parser.add_argument("--data_path", required=True,
                        help="path to the root of the KITTI data")
    parser.add_argument("--split", required=True,
                        choices=["eigen", "eigen_benchmark"])
    export_gt_depths_kitti(parser.parse_args(argv))


if __name__ == "__main__":
    main()
