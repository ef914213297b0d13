"""Depth evaluation CLI (`python evaluate_depth.py --eval_mono ...`),
mirroring `/root/reference/evaluate_depth.py:229-230`."""

from __future__ import annotations

from ..config import parse_options
from ..eval.evaluate_depth import evaluate


def main(argv=None):
    opt = parse_options(argv, description="TPU monodepth depth evaluation")
    evaluate(opt)


if __name__ == "__main__":
    main()
