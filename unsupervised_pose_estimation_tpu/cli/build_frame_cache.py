"""Build the pre-decoded uint8 frame cache for a (dataset, split, feed size).

Offline counterpart of the runtime auto-build (`--frame_cache` on the train
CLI): decodes every frame the train/val splits can reference at feed
resolution into memory-mapped shards (data/cache.py), so training items cost
a memcpy instead of a PNG decode + LANCZOS resize (~10x per host core;
BASELINE.md "input pipeline" row). No reference counterpart — the reference
re-decodes every image every epoch (`/root/reference/datasets/
mono_dataset2.py:160-165`).

Usage:
  python -m unsupervised_pose_estimation_tpu.cli.build_frame_cache \
      --dataset endovis --split endovis --data_path <frames> \
      --height 192 --width 640 --frame_cache <cache_dir>
"""

from __future__ import annotations

import os

from ..config import parse_options
from ..data.datasets import make_dataset
from ..data.split import readlines, resolve_split_file
from ..data.cache import build_frame_cache


def main(argv=None):
    cfg = parse_options(argv, description=__doc__).validate()
    if not cfg.frame_cache:
        raise SystemExit("--frame_cache <dir> is required")
    split_root = cfg.split_dir or os.path.join(
        os.path.dirname(__file__), "..", "..", "splits")
    frame_ids = list(cfg.frame_ids) + (["s"] if cfg.use_stereo else [])
    for mode in ("train", "val"):
        files = readlines(resolve_split_file(split_root, cfg.split, mode))
        sf = cfg.sampling_frequency
        ds = make_dataset(cfg.dataset, data_path=cfg.data_path,
                          filenames=files[sf:-sf], height=cfg.height,
                          width=cfg.width, frame_idxs=frame_ids,
                          is_train=(mode == "train"), img_ext=".png",
                          sampling_frequency=sf)
        stats = build_frame_cache(ds, os.path.join(cfg.frame_cache, mode),
                                  log=print)
        print(f"{mode}: {stats['rows']} frames cached, "
              f"{stats['skipped']} missing")


if __name__ == "__main__":
    main()
