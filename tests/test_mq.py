"""MQ layer tests: bank, selector, grounding maps, extraction."""
import random

import numpy as np
import jax.numpy as jnp
import pytest

from mqdet_tpu.data import grounding as G
from mqdet_tpu.mq.bank import QueryBank
from mqdet_tpu.mq.selector import QuerySelector


def make_bank(channels=8, labels=(1, 2, 5), n=6):
    bank = QueryBank(channels=channels, num_scales=1)
    r = np.random.default_rng(0)
    for lab in labels:
        bank.add(lab, r.standard_normal((n, 1, channels)).astype(np.float32))
    return bank


def test_bank_roundtrip(tmp_path):
    bank = make_bank()
    p = str(tmp_path / "bank.npz")
    bank.save(p)
    loaded = QueryBank.load(p)
    assert loaded.labels == bank.labels
    np.testing.assert_allclose(loaded.get(1), bank.get(1))


def test_bank_capacity_and_dedup():
    bank = QueryBank(channels=4)
    feats = np.ones((3, 1, 4), np.float32)
    added = bank.add(7, feats, capacity=2)
    assert added == 2 and bank.count(7) == 2
    # identical feature rejected by dedup
    added = bank.add(8, np.ones((1, 1, 4), np.float32))
    added = bank.add(8, np.ones((1, 1, 4), np.float32), exclude_similar=True)
    assert bank.count(8) == 1
    # orthogonal feature accepted
    other = np.zeros((1, 1, 4), np.float32)
    other[..., 0] = 1.0
    other[..., 1] = -1.0
    added = bank.add(8, other, exclude_similar=True)
    assert bank.count(8) == 2


def test_bank_torch_import(tmp_path):
    import torch

    raw = {3: torch.randn(4, 1, 8), 9: torch.randn(2, 1, 8)}
    p = str(tmp_path / "bank.pth")
    torch.save(raw, p)
    bank = QueryBank.from_torch_pth(p)
    assert bank.labels == [3, 9]
    np.testing.assert_allclose(bank.get(3), raw[3].numpy(), rtol=1e-6)


def test_bank_merge():
    a = make_bank(labels=(1,))
    b = make_bank(labels=(2,))
    a.merge(b)
    assert a.labels == [1, 2]


def test_selector_shapes_and_masks():
    bank = make_bank(channels=8, labels=(1, 2), n=6)
    sel = QuerySelector(bank, num_query_per_class=3, max_labels=4)
    loc_map = np.zeros((2, 16), np.float32)
    loc_map[0, 1:3] = 0.5
    loc_map[1, 4:5] = 1.0
    q, m, hq = sel.select([1, 2], loc_map, training=False)
    assert q.shape == (4 * 3 * 1, 8)
    assert m.shape == (12, 16)
    # first 3 rows attend to label-0 span, binarized
    np.testing.assert_allclose(m[0], (loc_map[0] != 0).astype(np.float32))
    np.testing.assert_allclose(m[3], (loc_map[1] != 0).astype(np.float32))
    assert m[6:].sum() == 0  # padded slots masked out
    assert list(hq) == [1, 1, 0, 0]


def test_selector_eval_deterministic_when_bank_small():
    bank = make_bank(channels=8, labels=(1,), n=2)
    sel = QuerySelector(bank, num_query_per_class=5, max_labels=1)
    loc_map = np.ones((1, 8), np.float32)
    q1, _, _ = sel.select([1], loc_map, training=False, rng=random.Random(0))
    q2, _, _ = sel.select([1], loc_map, training=False, rng=random.Random(42))
    np.testing.assert_allclose(q1, q2)  # all 2 queries used, sorted order


def test_selector_pure_text_rate():
    bank = make_bank(channels=8, labels=(1,))
    sel = QuerySelector(bank, num_query_per_class=3, pure_text_rate=1.0, max_labels=1)
    q, m, hq = sel.select([1], np.ones((1, 8), np.float32), training=True)
    assert q.sum() == 0 and hq[0] == 0


def test_clean_name():
    assert G.clean_name("hot_dog (food)") == "hot dog "


def test_build_caption_and_positive_map():
    from mqdet_tpu.data.tokenizer import get_tokenizer

    tok = get_tokenizer("bert-base-uncased")
    ind_to_class = {1: "person", 2: "hot_dog", 3: "traffic light"}
    caption, pos = G.build_caption([1, 2, 3], ind_to_class)
    assert caption == "person. hot dog. traffic light"
    pm = G.create_positive_map(
        tok(caption, max_length=32, padding="max_length", truncation=True,
            return_tensors="np"),
        [[pos[1]], [pos[2]], [pos[3]]],
        max_text_len=32,
    )
    assert pm.shape == (3, 32)
    # each row normalized
    np.testing.assert_allclose(pm.sum(-1), 1.0, atol=1e-4)
    # 'hot dog' spans two word tokens
    assert (pm[1] > 0).sum() == 2


def test_build_prompt_bundle():
    from mqdet_tpu.data.tokenizer import get_tokenizer

    tok = get_tokenizer("bert-base-uncased")
    ind_to_class = {i: f"class{i}" for i in range(1, 8)}
    chunks = G.chunk_classes(list(range(1, 8)), 3)
    assert [len(c) for c in chunks] == [3, 3, 1]
    b = G.build_prompt(chunks[0], ind_to_class, tok, max_text_len=32)
    assert b.input_ids.shape == (32,)
    assert b.num_labels == 3
    am, gm, pc = G.pad_prompt_maps(b, 5)
    assert am.shape == (5, 32)
    assert (pc[3:] == 0).all()


def test_check_for_positive_overflow():
    from mqdet_tpu.data.tokenizer import get_tokenizer

    tok = get_tokenizer("bert-base-uncased")
    ind_to_class = {i: "someverylongcategoryname" + str(i) for i in range(50)}
    kept = G.check_for_positive_overflow(
        list(range(50)), ind_to_class, tok, max_seq_length=40
    )
    assert 0 < len(kept) < 50


def test_wordpiece_tokenizer_offsets():
    from mqdet_tpu.data.tokenizer import WordPieceTokenizer, CLS_ID, SEP_ID, PAD_ID

    vocab = {"[PAD]": 0, "[UNK]": 100, "[CLS]": 101, "[SEP]": 102,
             "person": 5, "hot": 6, "dog": 7, ".": 8, "un": 9, "##able": 10}
    vocab = {k: v for k, v in vocab.items()}
    tok = WordPieceTokenizer(vocab, vocab_size=200)
    enc = tok("person. unable", max_length=12)
    ids = enc["input_ids"][0]
    assert ids[0] == CLS_ID
    assert list(ids[1:6]) == [5, 8, 9, 10, SEP_ID]
    assert ids[-1] == PAD_ID
    # char_to_token: 'person' at chars 0..5 -> token 1
    assert enc.char_to_token(0) == 1
    assert enc.char_to_token(5) == 1
    assert enc.char_to_token(6) == 2  # '.'
    assert enc.char_to_token(8) == 3  # 'un'
    assert enc.char_to_token(10) == 4  # '##able'
    assert enc.char_to_token(7) is None  # whitespace


def test_wordpiece_fallback_hash_vocab_stable():
    from mqdet_tpu.data.tokenizer import WordPieceTokenizer

    tok = WordPieceTokenizer()
    a = tok("a cat sat", max_length=8)["input_ids"]
    b = tok("a cat sat", max_length=8)["input_ids"]
    np.testing.assert_array_equal(a, b)


@pytest.mark.slow  # ~18s, non-default GCP knobs
def test_gcp_block_variant_knobs(rng):
    """VISION_QUERY knob variants of the GCP stack (modeling_bert_new.py):
    NO_CAT=False cat-gate, FIX_ATTN_GATE const, ADD_ADAPT_LAYER, SHARE_KV,
    AUGMENT_IMAGE_WITH_QUERY, NEW_MASK_TOKEN."""
    import jax
    import jax.numpy as jnp

    from mqdet_tpu.models.bert import (
        GatedCrossAttentionBlock,
        PreSelectModule,
        QVBertModel,
    )

    x = jnp.asarray(rng.standard_normal((2, 6, 32)).astype(np.float32))
    vis = jnp.asarray(rng.standard_normal((2, 4, 32)).astype(np.float32))
    mask = jnp.ones((2, 4, 6), jnp.float32)

    for kw in (
        dict(no_cat=False),
        dict(fix_attn_gate=0.25),
        dict(add_adapt_layer=True),
        dict(share_kv=True),
    ):
        blk = GatedCrossAttentionBlock(dim=32, dim_head=8, heads=4, **kw)
        p = blk.init(jax.random.PRNGKey(0), x, vis, mask)
        out = blk.apply(p, x, vis, mask)
        assert out.shape == x.shape
        assert np.isfinite(np.asarray(out)).all()
        if "fix_attn_gate" in kw:
            # constant gates -> no gate parameters exist
            flat = jax.tree_util.tree_leaves_with_path(p)
            names = ["/".join(str(getattr(k, "key", k)) for k in pth) for pth, _ in flat]
            assert not any("gate" in n for n in names)

    # zero-init gates: the block must be an identity for every variant that
    # keeps learned gates
    blk = GatedCrossAttentionBlock(dim=32, dim_head=8, heads=4, no_cat=False)
    p = blk.init(jax.random.PRNGKey(1), x, vis, mask)
    np.testing.assert_allclose(
        np.asarray(blk.apply(p, x, vis, mask)), np.asarray(x), atol=1e-5
    )

    ps = PreSelectModule(dim=32, out_dim=48, num_layers=2,
                         augment_image_with_query=True)
    img = jnp.asarray(rng.standard_normal((2, 10, 32)).astype(np.float32))
    p = ps.init(jax.random.PRNGKey(2), vis, img)
    out = ps.apply(p, vis, img)
    assert out.shape == (2, 4, 48)

    ids = jnp.asarray([[101, 103, 150, 103, 102, 0]], jnp.int32)
    am = jnp.asarray([[1, 1, 1, 1, 1, 0]], jnp.int32)
    m = QVBertModel(num_layers=2, hidden_size=32, num_heads=4,
                    intermediate_size=64, vocab_size=200, start_qv_layer=1,
                    vision_dim=32, new_mask_token=True, mask_token_id=103)
    q = jnp.asarray(rng.standard_normal((1, 4, 32)).astype(np.float32))
    qm = jnp.ones((1, 4, 6), jnp.float32)
    p = m.init(jax.random.PRNGKey(3), ids, am, q, qm)
    names = ["/".join(str(getattr(k, "key", k)) for k in pth)
             for pth, _ in jax.tree_util.tree_leaves_with_path(p)]
    assert any("mask_token" in n for n in names)
    out = m.apply(p, ids, am, q, qm)
    assert np.isfinite(np.asarray(out["last_hidden"])).all()


@pytest.mark.slow
def test_learnable_bank_param_and_gradient(rng):
    """VISION_QUERY.LEARNABLE_BANK (query_selector.py:14-24): selector emits
    (row, slot) indices, the model gathers from a trainable bank param, and
    gradients reach exactly the selected entries once gates are non-zero."""
    import jax
    import jax.numpy as jnp

    from mqdet_tpu.mq.bank import QueryBank
    from mqdet_tpu.mq.selector import QuerySelector
    from mqdet_tpu.utils.builders import (
        build_model,
        install_learnable_bank,
        synthetic_batch,
        tiny_test_config,
    )

    bank = QueryBank(channels=16, num_scales=1, capacity=6)
    for lab in (3, 7, 9):
        for _ in range(4):
            bank.add(lab, rng.standard_normal((1, 1, 16)).astype(np.float32))
    sel = QuerySelector(bank, num_query_per_class=2, max_labels=4,
                        emit_indices=True)
    assert sel.bank_table_shape() == (3, 4, 16)

    cfg = tiny_test_config()
    cfg.VISION_QUERY.LEARNABLE_BANK = True
    model = build_model(cfg, bank_shape=sel.bank_table_shape())
    b = synthetic_batch(cfg, batch=1, image_hw=tuple(cfg.TPU.IMAGE_BUCKETS[0]),
                        num_labels=3, k_shot=2)
    loc = np.zeros((4, b["input_ids"].shape[1]), np.float32)
    loc[:3, 1:4] = 1
    q, qm, hq = sel.select([3, 7, 9], loc, training=False)
    assert q.dtype == np.int32 and q.shape[-1] == 2

    import jax.numpy as jnp
    args = (jnp.asarray(b["images"]), jnp.asarray(b["input_ids"]),
            jnp.asarray(b["attention_mask"]), jnp.asarray(q[None]),
            jnp.asarray(qm[None]))
    params = model.init(jax.random.PRNGKey(0), *args)
    params = install_learnable_bank(params, sel)
    np.testing.assert_allclose(
        np.asarray(params["params"]["qv_layer_learnable_bank"][0, 0]),
        np.asarray(bank.get(3)[0, 0]), atol=1e-6,
    )
    out = model.apply(params, *args, deterministic=True)
    assert np.isfinite(np.asarray(out["dot_product_logits"][0], np.float32)).all()

    # zero-init gates make the GCP block an identity, so bank grads are
    # exactly zero at step 0 (reference property); nudge every gate and the
    # selected entries must receive gradient
    def nudge(path, v):
        name = "/".join(str(getattr(k, "key", k)) for k in path)
        if "gate" in name:
            return v + 0.3
        return v
    params2 = jax.tree_util.tree_map_with_path(nudge, params)

    def loss(p):
        o = model.apply(p, *args, deterministic=True)
        return jnp.sum(jnp.abs(o["dot_product_logits"][0].astype(jnp.float32)))

    g = jax.grad(loss)(params2)
    gb = np.asarray(g["params"]["qv_layer_learnable_bank"], np.float32)
    per_entry = np.abs(gb).sum(-1)  # (rows, slots)
    assert (per_entry > 0).any(), "no gradient reached the learnable bank"
