#!/usr/bin/env python
"""Convert a reference GLIPKNOW knowledge yaml into this repo's
caption-prompt artifact.

The reference ships encyclopedic class descriptions
(knowledge/*.yaml: {class_name: {clean_name, def_wiki, def_wn, gpt3: [..]}}
consumed inside the forward pass,
maskrcnn_benchmark/modeling/detector/generalized_vl_rcnn_new.py:521-666 with
the GLIPKNOW config block, config/defaults.py:887-894). This build expresses
the same expansion through the prompt pipeline instead: the positive-map
span stays on the clean class name and the knowledge text rides in the
caption suffix (mqdet_tpu/data/knowledge.py). Two ways to use it:

  * point GLIPKNOW.KNOWLEDGE_FILE at the reference yaml directly (the
    loader reads that format as-is), or
  * convert once with this tool into a caption-prompt JSON
    ({class_name: {prefix, name, suffix}}) and pass it via
    DATASETS.CAPTION_PROMPT — inspectable, editable, and independent of the
    reference tree.

Usage:
  python tools/convert_knowledge.py --input knowledge/odinw_knowledge.yaml \
      --output odinw_prompts.json [--knowledge-type def_wiki] \
      [--gpt3-num 5] [--wiki-and-gpt3]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def convert(
    input_path: str,
    knowledge_type: str = "def_wiki",
    gpt3_num: int = 5,
    wiki_and_gpt3: bool = False,
) -> dict:
    from mqdet_tpu.data.knowledge import (
        _knowledge_sequence,
        load_knowledge_file,
    )

    know = load_knowledge_file(input_path)
    out = {}
    for name, info in (know or {}).items():
        if not isinstance(info, dict):
            continue
        disp = info.get("clean_name") or str(name)
        seq = _knowledge_sequence(info, knowledge_type, gpt3_num, wiki_and_gpt3)
        out[str(name)] = {
            "prefix": "",
            "name": disp,
            "suffix": (": " + seq) if seq else "",
        }
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True, help="reference knowledge yaml")
    p.add_argument("--output", required=True, help="caption-prompt json")
    p.add_argument(
        "--knowledge-type", default="def_wiki",
        choices=["def_wiki", "def_wn", "gpt3", ""],
        help="GLIPKNOW.KNOWLEDGE_TYPE (config/defaults.py:889)",
    )
    p.add_argument("--gpt3-num", type=int, default=5)
    p.add_argument(
        "--wiki-and-gpt3", action="store_true",
        help="GLIPKNOW.WIKI_AND_GPT3: wiki definition + first N gpt3 lines",
    )
    args = p.parse_args()

    out = convert(
        args.input, args.knowledge_type, args.gpt3_num, args.wiki_and_gpt3
    )
    with open(args.output, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    n_k = sum(1 for v in out.values() if v["suffix"])
    print(f"wrote {len(out)} classes ({n_k} with knowledge) to {args.output}")


if __name__ == "__main__":
    main()
