"""Numerical parity vs the ACTUAL reference torch modules (CPU oracle).

Imports the reference GCP implementation
(/root/reference/maskrcnn_benchmark/modeling/language_backbone/
modeling_bert_new.py) directly via importlib — with lightweight stubs for
its missing deps (einops_exts, legacy transformers doc symbols) — runs it on
random inputs, copies its weights into the flax twins, and asserts the
outputs agree. This is the strongest evidence the TPU rebuild reproduces the
reference math (SURVEY §4 test-strategy item (b)).
"""
import importlib.util
import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference/maskrcnn_benchmark/modeling/language_backbone/modeling_bert_new.py"

torch = pytest.importorskip("torch")
pytestmark = pytest.mark.skipif(
    not os.path.isfile(REF), reason="reference tree not mounted"
)


def _load_reference_module():
    # stub einops_exts.rearrange_many
    if "einops_exts" not in sys.modules:
        import einops

        ee = types.ModuleType("einops_exts")
        ee.rearrange_many = lambda xs, pattern, **kw: [
            einops.rearrange(x, pattern, **kw) for x in xs
        ]
        sys.modules["einops_exts"] = ee

    # legacy transformers doc symbols removed in newer versions
    import transformers.models.bert.modeling_bert as hf_bert

    for name, val in [
        ("BERT_INPUTS_DOCSTRING", ""),
        ("_CHECKPOINT_FOR_DOC", ""),
        ("_CONFIG_FOR_DOC", ""),
        ("add_start_docstrings_to_model_forward", lambda *a, **k: (lambda f: f)),
        ("add_code_sample_docstrings", lambda *a, **k: (lambda f: f)),
    ]:
        if not hasattr(hf_bert, name):
            setattr(hf_bert, name, val)
    if not hasattr(hf_bert, "logger"):
        import logging

        hf_bert.logger = logging.getLogger("hf_bert_stub")

    # fake maskrcnn_benchmark.utils.torch_dropout package chain
    if "maskrcnn_benchmark" not in sys.modules:
        for name in ("maskrcnn_benchmark", "maskrcnn_benchmark.utils"):
            sys.modules.setdefault(name, types.ModuleType(name))
        td = types.ModuleType("maskrcnn_benchmark.utils.torch_dropout")
        td.Dropout1d = torch.nn.Dropout1d
        sys.modules["maskrcnn_benchmark.utils.torch_dropout"] = td

    spec = importlib.util.spec_from_file_location("ref_bert_new", REF)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class _VQ:
    FIX_ATTN_GATE = -1.0
    CONDITION_GATE = True
    NONLINEAR_GATE = True
    NO_CAT = True
    RETURN_ATTN_GATE_VALUE = False
    ADD_ADAPT_LAYER = False
    TEXT_DROPOUT = 0.0


class _Cfg:
    VISION_QUERY = _VQ()


def _t2j(w):
    return np.asarray(w.detach().numpy())


def _linear_kernel(linear):
    return _t2j(linear.weight).T


def _ln(ln):
    return {"scale": _t2j(ln.weight), "bias": _t2j(ln.bias)}


def _mca_params(ref_attn):
    return {
        "norm": _ln(ref_attn.norm),
        "norm_kv_ln": _ln(ref_attn.norm_kv),
        "to_q": {"kernel": _linear_kernel(ref_attn.to_q)},
        "to_kv": {"kernel": _linear_kernel(ref_attn.to_kv)},
        "to_out": {"kernel": _linear_kernel(ref_attn.to_out)},
    }


def _ffw_params(ff):
    return {
        "norm": _ln(ff.norm),
        "linear1": {"kernel": _linear_kernel(ff.linear1)},
        "linear2": {"kernel": _linear_kernel(ff.linear2)},
    }


def test_masked_cross_attention_parity():
    import jax.numpy as jnp

    from mqdet_tpu.models.bert import MaskedCrossAttention

    ref = _load_reference_module()
    torch.manual_seed(0)
    rng = np.random.default_rng(0)
    B, T, V, D = 2, 7, 10, 64

    r = ref.MaskedCrossAttention(
        input_dim=D, dim_head=16, heads=4, norm_kv=True, spase_forward=False
    ).eval()
    x = rng.standard_normal((B, T, D)).astype(np.float32)
    vis = rng.standard_normal((B, V, D)).astype(np.float32)
    mask = (rng.random((B, V, T)) > 0.4).astype(np.float32)
    mask[:, :, 0] = 0.0  # a token with no queries -> exact zero output

    with torch.no_grad():
        want = r(
            torch.from_numpy(x), torch.from_numpy(vis),
            attention_mask=torch.from_numpy(mask),
        ).numpy()

    ours = MaskedCrossAttention(input_dim=D, dim_head=16, heads=4, norm_kv=True)
    params = {"params": _mca_params(r)}
    got = np.asarray(
        ours.apply(params, jnp.asarray(x), jnp.asarray(vis), jnp.asarray(mask))
    )
    np.testing.assert_allclose(got, want, atol=2e-5)
    assert np.abs(got[:, 0]).max() < 1e-6  # hard-zero for no-query tokens


def test_gated_cross_attention_block_parity():
    import jax.numpy as jnp

    from mqdet_tpu.models.bert import GatedCrossAttentionBlock

    ref = _load_reference_module()
    torch.manual_seed(1)
    rng = np.random.default_rng(1)
    B, T, V, D = 2, 6, 8, 64

    r = ref.GatedCrossAttentionBlock(dim=D, dim_head=16, heads=4, cfg=_Cfg()).eval()
    # gates init to zero (identity block) — randomize to exercise the path
    with torch.no_grad():
        r.attn_gate.linear2.weight.normal_(std=0.5)
        r.ff_gate.fill_(0.3)

    x = rng.standard_normal((B, T, D)).astype(np.float32)
    vis = rng.standard_normal((B, V, D)).astype(np.float32)
    mask = (rng.random((B, V, T)) > 0.3).astype(np.float32)

    with torch.no_grad():
        want = r(
            torch.from_numpy(x), torch.from_numpy(vis),
            attention_mask=torch.from_numpy(mask),
        ).numpy()

    ours = GatedCrossAttentionBlock(dim=D, dim_head=16, heads=4)
    params = {
        "params": {
            "attn": _mca_params(r.attn.attn) if hasattr(r.attn, "attn") else _mca_params(r.attn),
            "attn_gate": _ffw_params(r.attn_gate),
            "ff": _ffw_params(r.ff),
            "ff_gate": np.asarray(_t2j(r.ff_gate).reshape(())),
        }
    }
    got = np.asarray(
        ours.apply(params, jnp.asarray(x), jnp.asarray(vis), jnp.asarray(mask))
    )
    np.testing.assert_allclose(got, want, atol=2e-4)


def _load_fuse_helper():
    _load_reference_module()  # installs shared stubs
    if "timm" not in sys.modules:
        timm = types.ModuleType("timm")
        tm = types.ModuleType("timm.models")
        tl = types.ModuleType("timm.models.layers")

        class DropPath(torch.nn.Module):
            def __init__(self, p=0.0):
                super().__init__()

            def forward(self, x):
                return x

        tl.DropPath = DropPath
        sys.modules["timm"] = timm
        sys.modules["timm.models"] = tm
        sys.modules["timm.models.layers"] = tl
    if "maskrcnn_benchmark.modeling" not in sys.modules:
        m = types.ModuleType("maskrcnn_benchmark.modeling")
        mu = types.ModuleType("maskrcnn_benchmark.modeling.utils")
        mu.cat = torch.cat
        mu.concat_box_prediction_layers = None
        mu.permute_and_flatten = None
        sys.modules["maskrcnn_benchmark.modeling"] = m
        sys.modules["maskrcnn_benchmark.modeling.utils"] = mu
    spec = importlib.util.spec_from_file_location(
        "ref_fuse_helper", "/root/reference/maskrcnn_benchmark/utils/fuse_helper.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class _FuseCfgNode:
    STABLE_SOFTMAX_2D = False
    CLAMP_MIN_FOR_UNDERFLOW = True
    CLAMP_MAX_FOR_OVERFLOW = True


class _FuseCfg:
    class MODEL:
        class DYHEAD:
            FUSE_CONFIG = _FuseCfgNode()


def test_bi_multihead_attention_parity():
    """Our BiMultiHeadAttention vs the reference fuse_helper (GLIP-T config:
    clamps on, stable_softmax_2d off)."""
    import jax.numpy as jnp

    from mqdet_tpu.models.fusion import BiMultiHeadAttention

    fh = _load_fuse_helper()
    torch.manual_seed(2)
    rng = np.random.default_rng(2)
    B, N, T = 2, 40, 12
    v_dim, l_dim, embed_dim, heads = 32, 48, 64, 4

    r = fh.BiMultiHeadAttention(v_dim, l_dim, embed_dim, heads, dropout=0.0,
                                cfg=_FuseCfg()).eval()
    v = rng.standard_normal((B, N, v_dim)).astype(np.float32)
    l = rng.standard_normal((B, T, l_dim)).astype(np.float32)
    mask = np.ones((B, T), np.float32)
    mask[0, 8:] = 0.0

    with torch.no_grad():
        want_v, want_l = r(
            torch.from_numpy(v), torch.from_numpy(l),
            attention_mask_l=torch.from_numpy(mask),
        )

    ours = BiMultiHeadAttention(v_dim=v_dim, l_dim=l_dim, embed_dim=embed_dim,
                                num_heads=heads, dropout=0.0)

    def lin(m):
        return {"kernel": _linear_kernel(m), "bias": _t2j(m.bias)}

    params = {"params": {
        "v_proj": lin(r.v_proj), "l_proj": lin(r.l_proj),
        "values_v_proj": lin(r.values_v_proj), "values_l_proj": lin(r.values_l_proj),
        "out_v_proj": lin(r.out_v_proj), "out_l_proj": lin(r.out_l_proj),
    }}
    got_v, got_l = ours.apply(
        params, jnp.asarray(v), jnp.asarray(l), jnp.asarray(mask),
        deterministic=True,
    )
    np.testing.assert_allclose(np.asarray(got_v), want_v.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(got_l), want_l.numpy(), atol=2e-4)
