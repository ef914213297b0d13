"""Pose evaluation CLI (`python evaluate_pose.py`), mirroring
`/root/reference/evaluate_pose.py:231-233` — with the missing options module
defect fixed (SURVEY.md §8.2)."""

from __future__ import annotations

from ..config import parse_options
from ..eval.evaluate_pose import evaluate


def main(argv=None):
    opt = parse_options(argv, description="TPU monodepth pose evaluation")
    evaluate(opt)


if __name__ == "__main__":
    main()
