#!/usr/bin/env python
"""Generate ODinW-13/35 task configs in this repo's schema.

The per-task FACTS (dataset paths, few-shot split registry, corrected
category lists, caption prompts, epoch counts) are data, extracted from the
reference task configs (reference: configs/odinw_13/*.yaml,
configs/odinw_35/*.yaml) when available; the emitted YAML uses THIS repo's
config tree (mqdet_tpu/core/config.py), not the reference's.

Usage:
  python tools/gen_odinw_configs.py [--reference /root/reference/configs] \
      [--out configs]
"""
from __future__ import annotations

import argparse
import glob
import json
import os

import yaml


def convert(ref: dict, suite: str) -> dict:
    """Map a reference task config onto this repo's schema."""
    rd = ref.get("DATASETS", {})
    out = {
        "DATASETS": {
            "REGISTER": {
                name: {
                    "img_dir": spec["img_dir"],
                    "ann_file": spec["ann_file"],
                }
                for name, spec in rd.get("REGISTER", {}).items()
            },
            "TRAIN": ["train"],
            "TEST": ["val"],
        },
        "SOLVER": {
            "USE_AUTOSTEP": True,
            "TEST_WITH_INFERENCE": True,
            "AUTOTERMINATE_PATIENCE": 8,
            "MAX_EPOCH": int(ref.get("SOLVER", {}).get("MAX_EPOCH", 12)),
        },
        "VISION_QUERY": {
            "ENABLED": True,
            "NUM_QUERY_PER_CLASS": 5,
        },
    }
    if rd.get("GENERAL_COPY", -1) != -1:
        out["DATASETS"]["GENERAL_COPY"] = int(rd["GENERAL_COPY"])
    if rd.get("OVERRIDE_CATEGORY"):
        # keep as the same JSON string format the loaders parse (a few
        # reference configs use python-literal quoting instead of JSON)
        try:
            cats = json.loads(rd["OVERRIDE_CATEGORY"])
        except json.JSONDecodeError:
            import ast

            cats = ast.literal_eval(rd["OVERRIDE_CATEGORY"])
        out["DATASETS"]["OVERRIDE_CATEGORY"] = json.dumps(cats)
        out["DATASETS"]["USE_OVERRIDE_CATEGORY"] = True
        ncls = len(cats) + 1
        out["MODEL"] = {
            "ATSS": {"NUM_CLASSES": ncls},
            "DYHEAD": {"NUM_CLASSES": ncls},
        }
    if rd.get("CAPTION_PROMPT"):
        out["DATASETS"]["CAPTION_PROMPT"] = rd["CAPTION_PROMPT"]
    if rd.get("PREDEFINED_TEXT"):
        out["DATASETS"]["PREDEFINED_TEXT"] = rd["PREDEFINED_TEXT"]
    vq = ref.get("VISION_QUERY", {})
    if vq.get("DATASET_NAME"):
        out["VISION_QUERY"]["DATASET_NAME"] = vq["DATASET_NAME"]
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--reference", default="/root/reference/configs")
    p.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "configs"))
    args = p.parse_args()

    for suite in ("odinw_13", "odinw_35"):
        src = os.path.join(args.reference, suite)
        dst = os.path.join(args.out, suite)
        os.makedirs(dst, exist_ok=True)
        n = 0
        for f in sorted(glob.glob(os.path.join(src, "*.yaml"))):
            ref = yaml.safe_load(open(f))
            task = os.path.splitext(os.path.basename(f))[0]
            cfg = convert(ref, suite)
            header = (
                f"# ODinW task {task} ({suite}); facts extracted from the "
                f"reference config\n# (reference: configs/{suite}/{task}.yaml)"
                ", schema is mqdet_tpu's.\n"
            )
            with open(os.path.join(dst, f"{task}.yaml"), "w") as out:
                out.write(header)
                yaml.safe_dump(cfg, out, sort_keys=True, width=100)
            n += 1
        print(f"{suite}: wrote {n} configs -> {dst}")


if __name__ == "__main__":
    main()
