#!/usr/bin/env python
"""Vision-query bank extraction orchestrator.

Capability twin of tools/extract_vision_query.py: per-dataset presets that
invoke the extraction pipeline (tools/train.py --extract-query) with the
right FEW_SHOT / MAX_QUERY_NUMBER / save-path settings.

Usage:
  python tools/extract_queries.py --config-file configs/pretrain/mq-glip-t.yaml \
      --dataset lvis --num_vision_queries 5 [--add_name tiny]
"""
from __future__ import annotations

import argparse
import os
import subprocess
import sys

PRESETS = {
    # dataset -> (extra overrides, default save name pattern)
    "objects365": ["DATASETS.FEW_SHOT", "0"],
    "lvis": ["DATASETS.FEW_SHOT", "{k}"],
    "coco": ["DATASETS.FEW_SHOT", "{k}"],
    "odinw": ["DATASETS.FEW_SHOT", "{k}"],
}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config-file", required=True)
    p.add_argument("--dataset", default="lvis", choices=sorted(PRESETS))
    p.add_argument("--num_vision_queries", type=int, default=5)
    p.add_argument("--add_name", default="")
    p.add_argument("--save_path", default="")
    p.add_argument("opts", nargs=argparse.REMAINDER, default=[])
    args = p.parse_args()

    k = args.num_vision_queries
    save = args.save_path or f"MODEL/{args.dataset}_query_{k}_pool7_sel{args.add_name}.npz"
    extra = [s.format(k=k) for s in PRESETS[args.dataset]]

    cmd = [
        sys.executable, os.path.join(os.path.dirname(__file__), "train.py"),
        "--config-file", args.config_file,
        "--extract-query",
        "VISION_QUERY.QUERY_BANK_SAVE_PATH", save,
        "VISION_QUERY.MAX_QUERY_NUMBER", str(k if args.dataset != "objects365" else 5000),
        *extra,
        *args.opts,
    ]
    print(" ".join(cmd))
    raise SystemExit(subprocess.call(cmd))


if __name__ == "__main__":
    main()
