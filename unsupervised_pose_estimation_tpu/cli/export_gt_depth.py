"""Export ground-truth depth for a KITTI eval split to ``gt_depths.npz``.

Counterpart of `/root/reference/export_gt_depth.py:19-61` (same npz format so
``evaluate_depth`` can consume either tool's output): the eigen split projects
raw velodyne scans (velodyne-x as depth), eigen_benchmark reads the annotated
uint16 png/256 maps. Output is an object array because KITTI GT frames have
per-drive resolutions.
"""

from __future__ import annotations

import argparse
import os

import numpy as np
from PIL import Image

from ..data.split import parse_split_line, readlines
from ..eval.kitti_depth import generate_depth_map


def _gt_for_line(split: str, data_path: str, line: str) -> np.ndarray:
    folder, frame_index, _ = parse_split_line(line)
    if split == "eigen":
        drive_day = folder.split("/")[0]
        scan = os.path.join(data_path, folder, "velodyne_points", "data",
                            f"{frame_index:010d}.bin")
        return generate_depth_map(os.path.join(data_path, drive_day), scan,
                                  cam=2, vel_depth=True)
    if split == "eigen_benchmark":
        png = os.path.join(data_path, folder, "proj_depth", "groundtruth",
                           "image_02", f"{frame_index:010d}.png")
        return np.asarray(Image.open(png), np.float32) / 256.0
    raise ValueError(f"no GT recipe for split '{split}' "
                     "(expected eigen or eigen_benchmark)")


def export_gt_depths_kitti(opt) -> str:
    """Write <splits>/<split>/gt_depths.npz; returns the output path."""
    split_dir = getattr(opt, "split_dir", None) or os.path.join(
        os.path.dirname(__file__), "..", "..", "splits")
    split_folder = os.path.join(split_dir, opt.split)
    lines = readlines(os.path.join(split_folder, "test_files.txt"))

    print(f"-> Exporting {len(lines)} GT depth maps for the "
          f"'{opt.split}' split")
    maps = [_gt_for_line(opt.split, opt.data_path, line).astype(np.float32)
            for line in lines]

    out_path = os.path.join(split_folder, "gt_depths.npz")
    np.savez_compressed(out_path, data=np.array(maps, dtype="object"))
    print(f"-> Wrote {out_path}")
    return out_path


def main(argv=None):
    parser = argparse.ArgumentParser(description="export_gt_depth")
    parser.add_argument("--data_path", required=True,
                        help="root of the KITTI data tree")
    parser.add_argument("--split", required=True,
                        choices=["eigen", "eigen_benchmark"])
    parser.add_argument("--split_dir", default=None,
                        help="override the repo splits/ root")
    export_gt_depths_kitti(parser.parse_args(argv))


if __name__ == "__main__":
    main()
