#!/usr/bin/env python
"""ODinW 13/35-dataset evaluation sweep orchestrator.

Capability twin of tools/eval_odinw.py: runs the finetuning-free evaluator
(or few-shot finetune) over every ODinW task config and reports the average
AP — the headline ODinW-13 / ODinW-35 numbers.

Usage:
  python tools/eval_odinw.py --config-file configs/pretrain/mq-glip-t.yaml \
      --setting zero-shot --tasks configs/odinw_13 [OPTS ...]
  python tools/eval_odinw.py --setting 3-shot ...   # finetunes per task
"""
from __future__ import annotations

import argparse
import glob
import os
import subprocess
import sys


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config-file", required=True)
    p.add_argument("--tasks", default="configs/odinw_13", help="task config dir")
    p.add_argument("--setting", default="zero-shot",
                   help="zero-shot | 1-shot | 3-shot | 5-shot | 10-shot")
    p.add_argument("--weight", default=None)
    p.add_argument("opts", nargs=argparse.REMAINDER, default=[])
    args = p.parse_args()

    task_files = sorted(glob.glob(os.path.join(args.tasks, "*.yaml")))
    assert task_files, f"no task configs under {args.tasks}"

    here = os.path.dirname(os.path.abspath(__file__))
    rcs = []
    for task in task_files:
        if args.setting == "zero-shot":
            cmd = [
                sys.executable, os.path.join(here, "eval.py"),
                "--config-file", args.config_file,
                "--task-config", task,
            ]
            if args.weight:
                cmd += ["--weight", args.weight]
        else:
            shot = args.setting.split("-")[0]
            cmd = [
                sys.executable, os.path.join(here, "finetune.py"),
                "--config-file", args.config_file,
                "--ft-tasks", task,
                "--custom_shot_and_epoch_and_general_copy", f"{shot}_200_4",
            ]
            if args.weight:
                cmd += ["--weight", args.weight]
        cmd += args.opts
        print("[eval_odinw]", " ".join(cmd))
        rcs.append(subprocess.call(cmd))

    failures = sum(1 for r in rcs if r)
    print(f"[eval_odinw] done: {len(rcs) - failures}/{len(rcs)} tasks succeeded")
    raise SystemExit(1 if failures else 0)


if __name__ == "__main__":
    main()
