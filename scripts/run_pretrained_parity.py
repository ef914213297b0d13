"""Pretrained-parity watchdog: fire the north-star quality row the moment
pretrained weights become reachable (VERDICT r4 missing #1 / next #9).

The one capability row this framework has never demonstrated is
"pretrained-init, real-data AbsRel within 1% of the reference" — blocked in
this container solely on offline weights (`/root/reference/utils.py:62-125`
downloads them; `/root/reference/options.py:149-153` defaults
weights_init=pretrained). Every prerequisite exists and is tested
(train/checkpoint.py import shims incl. multi-image conv1 averaging; the
full eval protocol of `/root/reference/evaluate_depth.py:181-224`). This
script probes for the artifacts and, when they appear, runs the whole
pipeline in one command and appends the BASELINE.md row.

Probe inventory (all best-effort, short network timeouts):
  A. a monodepth2 pretrained checkpoint (default mono_640x192): an already-
     extracted `<models_dir>/<name>/encoder.pth`, a verified local zip, or
     the reference's own download table (utils.DOWNLOAD_MODELS).
  B. torchvision ImageNet resnet weights for pretrained-INIT training:
     --imagenet_weights, the torch hub cache, or a download.
  C. a KITTI raw tree (first test-split frame readable) + the exported
     `gt_depths.npz` for the eigen eval protocol
     (`/root/reference/export_gt_depth.py`).

Paths, in preference order:
  1. A + C  ->  import the .pth checkpoint and run the full 7-metric eval
     directly (no training): immediate AbsRel parity vs the published
     monodepth2 row (mono_640x192: abs_rel 0.115).
  2. B + C  ->  pretrained-init training (--steps optimizer steps on the
     eigen_zhou split at 640x192) then the same eval.
Either path prints the row, appends it to BASELINE.md, and writes
--out JSON. If no path is runnable, exits 2 with the precise missing-
artifact inventory ("still offline").
"""

from __future__ import annotations

import argparse
import json
import os
import socket
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PUBLISHED = {
    # monodepth2 paper table 1 (KITTI eigen, mono 640x192) — the parity bar.
    "mono_640x192": {"abs_rel": 0.115, "sq_rel": 0.903, "rmse": 4.863,
                     "rmse_log": 0.193, "a1": 0.877, "a2": 0.959,
                     "a3": 0.981},
}

METRIC_NAMES = ("abs_rel", "sq_rel", "rmse", "rmse_log", "a1", "a2", "a3")


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--model_name", default="mono_640x192",
                   help="pretrained monodepth2 checkpoint to probe for")
    p.add_argument("--models_dir", default=os.path.join(REPO, "models"))
    p.add_argument("--imagenet_weights", default=None,
                   help="explicit torchvision resnet .pth for path 2")
    p.add_argument("--data_path", default=os.path.join(REPO, "kitti_data"))
    p.add_argument("--eval_split", default="eigen")
    p.add_argument("--train_split", default="eigen_zhou")
    p.add_argument("--num_layers", type=int, default=18)
    p.add_argument("--steps", type=int, default=20000,
                   help="optimizer steps for the path-2 training run")
    p.add_argument("--batch_size", type=int, default=12)
    p.add_argument("--log_dir", default="/tmp/pretrained_parity")
    p.add_argument("--out", default=os.path.join(
        REPO, "docs", "quality", "pretrained_parity.json"))
    p.add_argument("--net_timeout", type=float, default=20.0,
                   help="seconds before a download probe gives up")
    p.add_argument("--allow_download", action="store_true", default=True)
    p.add_argument("--no_download", dest="allow_download",
                   action="store_false")
    p.add_argument("--baseline_md", default=os.path.join(REPO, "BASELINE.md"))
    p.add_argument("--probe_only", action="store_true",
                   help="print the inventory and exit (no run)")
    return p.parse_args(argv)


# ---------------------------------------------------------------------------
# probes
# ---------------------------------------------------------------------------


def probe_monodepth2(models_dir: str, name: str, allow_download: bool,
                     net_timeout: float):
    """-> (path-to-extracted-checkpoint-folder | None, reason str)."""
    folder = os.path.join(models_dir, name)
    if os.path.isfile(os.path.join(folder, "encoder.pth")):
        return folder, f"found extracted checkpoint {folder}"
    from unsupervised_pose_estimation_tpu.utils import (
        DOWNLOAD_MODELS, download_model_if_doesnt_exist)

    if name not in DOWNLOAD_MODELS:
        return None, f"unknown model name {name}"
    if not allow_download and not os.path.exists(folder + ".zip"):
        return None, f"no {folder}/encoder.pth and downloads disabled"
    old = socket.getdefaulttimeout()
    socket.setdefaulttimeout(net_timeout)
    try:
        download_model_if_doesnt_exist(name, models_dir)
        return folder, "downloaded + verified"
    except Exception as err:
        return None, f"download unavailable ({type(err).__name__}: {err})"
    finally:
        socket.setdefaulttimeout(old)


def probe_imagenet(num_layers: int, explicit, allow_download: bool,
                   net_timeout: float):
    """-> (path-to-resnet-pth | None, reason str)."""
    from unsupervised_pose_estimation_tpu.train.checkpoint import \
        locate_imagenet_weights

    old = socket.getdefaulttimeout()
    socket.setdefaulttimeout(net_timeout)
    try:
        path = locate_imagenet_weights(num_layers, explicit)
        return path, f"found {path}"
    except (FileNotFoundError, ValueError) as err:
        return None, str(err).split(". ")[0]
    finally:
        socket.setdefaulttimeout(old)


def probe_kitti(data_path: str, eval_split: str):
    """-> (ok: bool, reason str). Checks the first eval-split frame is
    readable on disk and gt_depths.npz has been exported."""
    from unsupervised_pose_estimation_tpu.data.split import \
        resolve_split_file

    sd = os.path.join(REPO, "splits")
    gt = os.path.join(sd, eval_split, "gt_depths.npz")
    if not os.path.isdir(data_path):
        return False, f"no KITTI tree at {data_path}"
    try:
        from unsupervised_pose_estimation_tpu.data.split import readlines

        first = readlines(resolve_split_file(sd, eval_split))[0]
        folder, frame = first.split()[0], int(first.split()[1])
    except Exception as err:
        return False, f"cannot parse split {eval_split}: {err}"
    img = os.path.join(data_path, folder,
                       "image_02", "data", f"{frame:010d}.png")
    img_jpg = img[:-4] + ".jpg"
    if not (os.path.isfile(img) or os.path.isfile(img_jpg)):
        return False, f"first split frame missing ({img})"
    if not os.path.isfile(gt):
        return False, (f"no {gt} — run "
                       f"`python export_gt_depth.py --data_path {data_path} "
                       f"--split {eval_split}` first")
    return True, "KITTI frames + gt_depths.npz present"


# ---------------------------------------------------------------------------
# run paths
# ---------------------------------------------------------------------------


def run_eval(ckpt_folder: str, args) -> dict:
    from unsupervised_pose_estimation_tpu.config import Options
    from unsupervised_pose_estimation_tpu.eval.evaluate_depth import evaluate

    h, w = (320, 1024) if "1024x320" in ckpt_folder else (192, 640)
    opt = Options(load_weights_folder=ckpt_folder, eval_mono=True,
                  eval_split=args.eval_split, data_path=args.data_path,
                  dataset="kitti", height=h, width=w,
                  num_layers=args.num_layers, min_depth=0.1, max_depth=100.0,
                  batch_size=args.batch_size)
    return evaluate(opt)


def run_training(imagenet_path: str, args) -> str:
    """Pretrained-init training on the eigen_zhou split; returns the orbax
    checkpoint dir."""
    from unsupervised_pose_estimation_tpu.config import Options
    from unsupervised_pose_estimation_tpu.train.loop import Trainer

    steps_per_epoch = args.steps  # single "epoch" of exactly --steps steps
    cfg = Options(data_path=args.data_path, dataset="kitti",
                  split=args.train_split, preset="kitti_upstream",
                  height=192, width=640, batch_size=args.batch_size,
                  num_layers=args.num_layers, weights_init="pretrained",
                  imagenet_weights=imagenet_path, num_epochs=1,
                  steps_per_epoch=steps_per_epoch, log_dir=args.log_dir,
                  model_name="pretrained_parity").validate()
    Trainer(cfg).train()
    return os.path.join(args.log_dir, "pretrained_parity", "models", "orbax")


def format_baseline_row(metrics: dict, source: str, mode: str) -> str:
    cells = ", ".join(f"{k} {metrics[k]:.3f}" for k in METRIC_NAMES)
    pub = PUBLISHED.get("mono_640x192")
    delta = ""
    if pub:
        delta = (f"; published monodepth2 mono_640x192 abs_rel "
                 f"{pub['abs_rel']:.3f} -> delta "
                 f"{(metrics['abs_rel'] - pub['abs_rel']):+.3f}")
    return (f"| Quality row: pretrained parity ({mode}) | {cells}{delta} | "
            f"1x TPU (this machine) | `scripts/run_pretrained_parity.py` "
            f"({source}, {time.strftime('%Y-%m-%d')}) |")


def append_baseline_row(baseline_md: str, row: str):
    with open(baseline_md, "a") as fh:
        fh.write(row + "\n")


def main(argv=None) -> int:
    args = parse_args(argv)

    md2, md2_why = probe_monodepth2(args.models_dir, args.model_name,
                                    args.allow_download, args.net_timeout)
    imnet, imnet_why = probe_imagenet(args.num_layers, args.imagenet_weights,
                                      args.allow_download, args.net_timeout)
    kitti_ok, kitti_why = probe_kitti(args.data_path, args.eval_split)

    print("probe inventory:")
    print(f"  monodepth2 checkpoint : "
          f"{'OK' if md2 else 'MISSING'} — {md2_why}")
    print(f"  ImageNet resnet{args.num_layers}      : "
          f"{'OK' if imnet else 'MISSING'} — {imnet_why}")
    print(f"  KITTI data + GT       : "
          f"{'OK' if kitti_ok else 'MISSING'} — {kitti_why}")
    if args.probe_only:
        return 0 if (kitti_ok and (md2 or imnet)) else 2

    if not kitti_ok or not (md2 or imnet):
        print("\nstill offline: the pretrained-parity row cannot run yet. "
              "Missing:")
        if not (md2 or imnet):
            print("  - weights: neither a monodepth2 checkpoint nor "
                  "ImageNet resnet weights are reachable")
        if not kitti_ok:
            print(f"  - data: {kitti_why}")
        print("Re-run this script unchanged once the artifacts exist; it "
              "will train/evaluate and append the BASELINE.md row itself.")
        return 2

    if md2:
        mode, source = "eval of imported checkpoint", args.model_name
        print(f"\n-> running the 7-metric eval on imported {md2}")
        metrics = run_eval(md2, args)
    else:
        mode, source = f"{args.steps}-step pretrained-init training", \
            f"imagenet resnet{args.num_layers}"
        print(f"\n-> pretrained-init training ({args.steps} steps) then eval")
        ckpt = run_training(imnet, args)
        metrics = run_eval(ckpt, args)

    row = format_baseline_row(metrics, source, mode)
    append_baseline_row(args.baseline_md, row)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as fh:
        json.dump({"metrics": metrics, "mode": mode, "source": source,
                   "published": PUBLISHED.get("mono_640x192"),
                   "ts": time.time()}, fh, indent=1)
    print(f"\n{row}")
    print(f"record -> {args.out}; row appended to {args.baseline_md}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
