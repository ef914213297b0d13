"""AOT model export CLI: checkpoint -> serialized StableHLO artifact.

    python export_model.py --load_weights_folder <ckpt> \
        --out model.stablehlo [--max_batch 8]

The artifact (plus its .json sidecar with feed metadata) reloads with
`unsupervised_pose_estimation_tpu.serve.load_artifact` and executes without
the model definitions — suitable for a lean serving container.
"""

from __future__ import annotations

import argparse

from ..config import parse_options
from ..serve import export_artifact


def main(argv=None):
    extra = argparse.ArgumentParser(add_help=False)
    extra.add_argument("--out", default="model.stablehlo")
    extra.add_argument("--max_batch", type=int, default=8)
    ns, rest = extra.parse_known_args(argv)
    opt = parse_options(rest, description="Export depth model")
    path = export_artifact(opt, ns.out, max_batch=ns.max_batch)
    print(f"exported {path} (+ {path}.json)")


if __name__ == "__main__":
    main()
