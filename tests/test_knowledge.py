"""GLIPKNOW knowledge caption construction."""
from mqdet_tpu.data.knowledge import construct_knowledge_captions


KNOW = {
    "cat": {"clean_name": "cat", "def_wiki": "a small domesticated felid.",
            "gpt3": ["cats have whiskers.", "cats purr.", "cats climb."]},
    "dog": {"clean_name": "dog", "def_wiki": "a domesticated canid."},
}


def test_wiki_type():
    caps = construct_knowledge_captions(["cat", "dog", "zebra"], KNOW, "def_wiki")
    assert caps[0] == "cat: a small domesticated felid."
    assert caps[1] == "dog: a domesticated canid."
    assert caps[2] == "zebra"  # no knowledge entry -> raw name


def test_gpt3_type_truncates():
    caps = construct_knowledge_captions(["cat"], KNOW, "gpt3", gpt3_num=2)
    assert caps[0] == "cat: cats have whiskers. cats purr."


def test_wiki_and_gpt3():
    caps = construct_knowledge_captions(["cat"], KNOW, wiki_and_gpt3=True, gpt3_num=1)
    assert caps[0].startswith("cat: a small domesticated felid.")
    assert "whiskers" in caps[0]


def test_no_knowledge_passthrough():
    assert construct_knowledge_captions(["a", "b"], None) == ["a", "b"]


def test_glipknow_expands_eval_prompts(tmp_path):
    """GLIPKNOW.KNOWLEDGE_FILE must reach the eval prompt pipeline: the
    ChunkedEvaluationPlan caption carries the knowledge suffix while the
    positive-map span stays on the clean class name (reference forward path
    generalized_vl_rcnn_new.py:521-666)."""
    import yaml

    from mqdet_tpu.data.tokenizer import get_tokenizer
    from mqdet_tpu.engine.inference import ChunkedEvaluationPlan
    from mqdet_tpu.utils.builders import tiny_test_config

    (tmp_path / "know.yaml").write_text(yaml.safe_dump(KNOW))
    cfg = tiny_test_config()
    cfg.GLIPKNOW.KNOWLEDGE_FILE = str(tmp_path / "know.yaml")
    cfg.GLIPKNOW.KNOWLEDGE_TYPE = "def_wiki"
    cfg.MODEL.LANGUAGE_BACKBONE.MAX_QUERY_LEN = 64

    class DS:
        ind_to_class = {1: "cat", 2: "dog"}

    plan = ChunkedEvaluationPlan(cfg, DS(), get_tokenizer(), selector=None)
    cap = plan.bundles[0].caption
    assert "a small domesticated felid." in cap
    assert "a domesticated canid." in cap
    # the span (all_map support) covers only the class-name tokens, not the
    # knowledge suffix: "cat" is 1 wordpiece vs the long suffix
    row = plan.bundles[0].all_map[0]
    assert 0 < (row > 0).sum() <= 2

    # without a knowledge file the caption is the plain class list
    cfg2 = tiny_test_config()
    plan2 = ChunkedEvaluationPlan(cfg2, DS(), get_tokenizer(), selector=None)
    assert "felid" not in plan2.bundles[0].caption


def test_convert_knowledge_on_reference_yaml(tmp_path):
    """tools/convert_knowledge.py converts the ACTUAL reference knowledge
    content (knowledge/odinw_knowledge.yaml) into the caption-prompt
    artifact, making GLIPKNOW runnable end-to-end without the reference
    tree at eval time."""
    import json
    import os
    import subprocess
    import sys

    import pytest

    src = "/root/reference/knowledge/odinw_knowledge.yaml"
    if not os.path.exists(src):
        pytest.skip("reference knowledge file not mounted")
    out = tmp_path / "odinw_prompts.json"
    r = subprocess.run(
        [sys.executable, "tools/convert_knowledge.py", "--input", src,
         "--output", str(out), "--knowledge-type", "def_wiki"],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    prompts = json.loads(out.read_text())
    assert "Ambulance" in prompts
    amb = prompts["Ambulance"]
    assert amb["name"] == "Ambulance"
    assert "emergency vehicle" in amb["suffix"]
    # every converted entry keeps the span on the clean name
    assert all(set(v) == {"prefix", "name", "suffix"} for v in prompts.values())


def test_converted_prompts_flow_through_eval_plan(tmp_path):
    """The converted artifact drives the eval captions via
    DATASETS.CAPTION_PROMPT (dict keyed by class name), end to end through
    ChunkedEvaluationPlan."""
    import json
    import os

    import pytest

    src = "/root/reference/knowledge/odinw_knowledge.yaml"
    if not os.path.exists(src):
        pytest.skip("reference knowledge file not mounted")

    from tools.convert_knowledge import convert

    prompts = convert(src, "def_wiki")

    from mqdet_tpu.data.tokenizer import get_tokenizer
    from mqdet_tpu.engine.inference import ChunkedEvaluationPlan
    from mqdet_tpu.utils.builders import tiny_test_config

    cfg = tiny_test_config()
    cfg.MODEL.LANGUAGE_BACKBONE.MAX_QUERY_LEN = 128
    cfg.DATASETS.CAPTION_PROMPT = json.dumps(prompts)

    class DS:
        ind_to_class = {1: "Ambulance", 2: "Bus", 3: "unknown_class"}

    plan = ChunkedEvaluationPlan(cfg, DS(), get_tokenizer(), selector=None)
    cap = plan.bundles[0].caption
    assert "emergency vehicle" in cap          # Ambulance knowledge suffix
    assert "unknown class" in cap  # uncovered class: raw (cleaned) name
    # span stays on the class-name tokens, not the suffix
    row = plan.bundles[0].all_map[0]
    assert 0 < (row > 0).sum() <= 3
