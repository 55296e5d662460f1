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
