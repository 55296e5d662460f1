"""GroundingDINO deformable-transformer parity vs the ACTUAL reference
modules (CPU oracle).

Loads /root/reference/groundingdino_new/models/GroundingDINO/{ms_deform_attn,
utils,transformer_vanilla,fuse_modules,transformer}.py via importlib under a
synthetic package (stubbing timm.DropPath and util.misc.inverse_sigmoid),
copies the torch weights into our flax twins, and asserts outputs agree —
the VERDICT round-1 ask: "one deformable encoder layer parity test, oracle =
the pure-torch multi_scale_deformable_attn_pytorch (ms_deform_attn.py:93-134)".
"""
import importlib.util
import math
import os
import sys
import types

import numpy as np
import pytest

GD = "/root/reference/groundingdino_new/models/GroundingDINO"

torch = pytest.importorskip("torch")
pytestmark = pytest.mark.skipif(
    not os.path.isdir(GD), reason="reference tree not mounted"
)

import jax
import jax.numpy as jnp


def _load_ref_transformer():
    pkg_name = "refgd"
    if pkg_name + ".transformer" in sys.modules:
        return sys.modules[pkg_name + ".transformer"]

    # stub timm DropPath (p=0 == identity in eval) for fuse_modules
    if "timm.models.layers" not in sys.modules:
        timm = types.ModuleType("timm")
        models = types.ModuleType("timm.models")
        layers = types.ModuleType("timm.models.layers")

        class DropPath(torch.nn.Module):
            def __init__(self, drop_prob=0.0):
                super().__init__()

            def forward(self, x):
                return x

        layers.DropPath = DropPath
        sys.modules["timm"] = timm
        sys.modules["timm.models"] = models
        sys.modules["timm.models.layers"] = layers

    # stub groundingdino_new.util.misc.inverse_sigmoid (util/misc.py:634-638)
    if "groundingdino_new.util.misc" not in sys.modules:
        for name in ("groundingdino_new", "groundingdino_new.util"):
            sys.modules.setdefault(name, types.ModuleType(name))
        misc = types.ModuleType("groundingdino_new.util.misc")

        def inverse_sigmoid(x, eps=1e-3):
            x = x.clamp(min=0, max=1)
            x1 = x.clamp(min=eps)
            x2 = (1 - x).clamp(min=eps)
            return torch.log(x1 / x2)

        misc.inverse_sigmoid = inverse_sigmoid
        sys.modules["groundingdino_new.util.misc"] = misc

    pkg = types.ModuleType(pkg_name)
    pkg.__path__ = [GD]
    sys.modules[pkg_name] = pkg
    for sub in ("utils", "ms_deform_attn", "transformer_vanilla",
                "fuse_modules", "transformer"):
        spec = importlib.util.spec_from_file_location(
            f"{pkg_name}.{sub}", os.path.join(GD, sub + ".py")
        )
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"{pkg_name}.{sub}"] = mod
        spec.loader.exec_module(mod)
        setattr(pkg, sub, mod)
    return sys.modules[pkg_name + ".transformer"]


def _t2j_linear(params, ref_linear):
    params["kernel"] = jnp.asarray(
        ref_linear.weight.detach().numpy().T.astype(np.float32)
    )
    params["bias"] = jnp.asarray(
        ref_linear.bias.detach().numpy().astype(np.float32)
    )


def _t2j_ln(params, ref_ln):
    params["scale"] = jnp.asarray(ref_ln.weight.detach().numpy())
    params["bias"] = jnp.asarray(ref_ln.bias.detach().numpy())


def _copy_msda(dst, ref_attn):
    for name in ("sampling_offsets", "attention_weights", "value_proj",
                 "output_proj"):
        _t2j_linear(dst[name], getattr(ref_attn, name))


def test_msda_module_parity():
    """Our MSDeformAttn flax module vs the reference
    MultiScaleDeformableAttention (pure-torch fallback path)."""
    T = _load_ref_transformer()
    msda_mod = sys.modules["refgd.ms_deform_attn"]
    rng = np.random.default_rng(0)

    d, nh, nl, npt = 32, 4, 2, 4
    shapes = [(6, 8), (3, 4)]
    s = sum(h * w for h, w in shapes)
    b, q = 2, s  # encoder self-attention: queries == flattened tokens

    ref = msda_mod.MultiScaleDeformableAttention(
        embed_dim=d, num_heads=nh, num_levels=nl, num_points=npt,
        batch_first=True,
    ).eval()
    # randomize the zero-init projections so the test has teeth
    with torch.no_grad():
        for lin in (ref.sampling_offsets, ref.attention_weights):
            lin.weight.normal_(0, 0.02)
            lin.bias.normal_(0, 0.5)

    src = rng.standard_normal((b, s, d)).astype(np.float32)
    refpts = rng.uniform(0.1, 0.9, (b, q, nl, 2)).astype(np.float32)
    t_shapes = torch.as_tensor(shapes, dtype=torch.long)

    with torch.no_grad():
        want = ref(
            query=torch.from_numpy(src), value=torch.from_numpy(src),
            reference_points=torch.from_numpy(refpts),
            spatial_shapes=t_shapes,
            level_start_index=torch.as_tensor([0, 48]),
        ).numpy()

    from mqdet_tpu.models.gdino import MSDeformAttn

    ours = MSDeformAttn(embed_dim=d, num_heads=nh, num_levels=nl,
                        num_points=npt)
    params = ours.init(
        jax.random.PRNGKey(0), jnp.asarray(src), jnp.asarray(src),
        jnp.asarray(refpts), shapes,
    )
    p = params["params"]
    _copy_msda(p, ref)
    got = np.asarray(
        ours.apply(params, jnp.asarray(src), jnp.asarray(src),
                   jnp.asarray(refpts), shapes)
    )
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_deformable_encoder_layer_parity():
    """Full encoder layer: MSDeformAttn + residual/LN + FFN
    (transformer.py:738-799) vs our DeformableEncoderLayer."""
    T = _load_ref_transformer()
    rng = np.random.default_rng(1)

    d, ffn, nh, nl, npt = 32, 64, 4, 2, 4
    shapes = [(6, 8), (3, 4)]
    s = sum(h * w for h, w in shapes)
    b = 2

    ref = T.DeformableTransformerEncoderLayer(
        d_model=d, d_ffn=ffn, dropout=0.0, activation="relu",
        n_levels=nl, n_heads=nh, n_points=npt,
    ).eval()
    with torch.no_grad():
        for lin in (ref.self_attn.sampling_offsets,
                    ref.self_attn.attention_weights):
            lin.weight.normal_(0, 0.02)
            lin.bias.normal_(0, 0.5)

    src = rng.standard_normal((b, s, d)).astype(np.float32)
    pos = rng.standard_normal((b, s, d)).astype(np.float32)
    refpts = rng.uniform(0.1, 0.9, (b, s, nl, 2)).astype(np.float32)
    t_shapes = torch.as_tensor(shapes, dtype=torch.long)

    with torch.no_grad():
        want = ref(
            src=torch.from_numpy(src), pos=torch.from_numpy(pos),
            reference_points=torch.from_numpy(refpts),
            spatial_shapes=t_shapes,
            level_start_index=torch.as_tensor([0, 48]),
        ).numpy()

    from mqdet_tpu.models.gdino import DeformableEncoderLayer

    ours = DeformableEncoderLayer(
        d_model=d, d_ffn=ffn, n_heads=nh, n_levels=nl, n_points=npt
    )
    params = ours.init(
        jax.random.PRNGKey(0), jnp.asarray(src), jnp.asarray(pos),
        jnp.asarray(refpts), shapes,
    )
    p = params["params"]
    _copy_msda(p["self_attn"], ref.self_attn)
    _t2j_ln(p["norm1"], ref.norm1)
    _t2j_ln(p["norm2"], ref.norm2)
    _t2j_linear(p["linear1"], ref.linear1)
    _t2j_linear(p["linear2"], ref.linear2)

    got = np.asarray(
        ours.apply(params, jnp.asarray(src), jnp.asarray(pos),
                   jnp.asarray(refpts), shapes)
    )
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)


def _t2j_mha(p, ref_mha, prefix):
    """torch nn.MultiheadAttention (packed qkv) -> our q/k/v/out Dense."""
    c = ref_mha.embed_dim
    w = ref_mha.in_proj_weight.detach().numpy()
    b = ref_mha.in_proj_bias.detach().numpy()
    for i, name in enumerate(("q", "k", "v")):
        p[prefix + name]["kernel"] = jnp.asarray(w[i * c:(i + 1) * c].T)
        p[prefix + name]["bias"] = jnp.asarray(b[i * c:(i + 1) * c])
    p[prefix + "out"]["kernel"] = jnp.asarray(
        ref_mha.out_proj.weight.detach().numpy().T
    )
    p[prefix + "out"]["bias"] = jnp.asarray(
        ref_mha.out_proj.bias.detach().numpy()
    )


def test_text_enhancer_layer_parity():
    """transformer_vanilla.py TransformerEncoderLayer (sub-sentence attn
    matrix, sine pos) vs our TextEnhancerLayer. Reference masks with
    src_mask=~allowed (transformer.py:569)."""
    _load_ref_transformer()
    tv = sys.modules["refgd.transformer_vanilla"]
    rng = np.random.default_rng(2)

    d, nh, ffn, b, t = 32, 4, 64, 2, 10
    ref = tv.TransformerEncoderLayer(
        d_model=d, nhead=nh, dim_feedforward=ffn, dropout=0.0
    ).eval()

    text = rng.standard_normal((b, t, d)).astype(np.float32)
    pos = rng.standard_normal((b, t, d)).astype(np.float32)
    # block-diagonal sub-sentence mask incl. self
    allowed = np.zeros((b, t, t), bool)
    for i in range(t):
        allowed[:, i, i] = True
    allowed[:, 1:4, 1:4] = True
    allowed[:, 5:9, 5:9] = True

    with torch.no_grad():
        # reference layer is sequence-first
        want = ref(
            src=torch.from_numpy(text).transpose(0, 1),
            src_mask=~torch.from_numpy(allowed),
            pos=torch.from_numpy(pos).transpose(0, 1),
        ).transpose(0, 1).numpy()

    from mqdet_tpu.models.gdino import TextEnhancerLayer

    ours = TextEnhancerLayer(d_model=d, n_heads=nh, d_ffn=ffn)
    params = ours.init(
        jax.random.PRNGKey(0), jnp.asarray(text), jnp.asarray(allowed),
        jnp.asarray(pos),
    )
    p = params["params"]
    _t2j_mha(p, ref.self_attn, "")
    _t2j_ln(p["norm1"], ref.norm1)
    _t2j_ln(p["norm2"], ref.norm2)
    _t2j_linear(p["linear1"], ref.linear1)
    _t2j_linear(p["linear2"], ref.linear2)

    got = np.asarray(
        ours.apply(params, jnp.asarray(text), jnp.asarray(allowed),
                   jnp.asarray(pos))
    )
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)


def test_fusion_layer_parity():
    """fuse_modules.py BiAttentionBlock (pre-LN, layer scale, residual on the
    NORMALIZED features) vs our FusionLayer."""
    _load_ref_transformer()
    fm = sys.modules["refgd.fuse_modules"]
    rng = np.random.default_rng(3)

    vd, ld, ed, nh = 32, 24, 64, 4
    b, n, t = 2, 12, 7
    ref = fm.BiAttentionBlock(
        v_dim=vd, l_dim=ld, embed_dim=ed, num_heads=nh, dropout=0.0,
        init_values=1e-4,
    ).eval()
    with torch.no_grad():
        ref.gamma_v.normal_(0.5, 0.1)
        ref.gamma_l.normal_(0.5, 0.1)

    v = rng.standard_normal((b, n, vd)).astype(np.float32)
    l = rng.standard_normal((b, t, ld)).astype(np.float32)
    mask_valid = np.ones((b, t), bool)
    mask_valid[:, 5:] = False

    with torch.no_grad():
        want_v, want_l = ref(
            torch.from_numpy(v), torch.from_numpy(l),
            attention_mask_l=~torch.from_numpy(mask_valid),
        )
        want_v, want_l = want_v.numpy(), want_l.numpy()

    from mqdet_tpu.models.gdino import FusionLayer

    ours = FusionLayer(v_dim=vd, l_dim=ld, embed_dim=ed, num_heads=nh)
    params = ours.init(
        jax.random.PRNGKey(0), jnp.asarray(v), jnp.asarray(l),
        jnp.asarray(mask_valid.astype(np.float32)),
    )
    p = params["params"]
    _t2j_ln(p["layer_norm_v"], ref.layer_norm_v)
    _t2j_ln(p["layer_norm_l"], ref.layer_norm_l)
    p["gamma_v"] = jnp.asarray(ref.gamma_v.detach().numpy())
    p["gamma_l"] = jnp.asarray(ref.gamma_l.detach().numpy())
    for name in ("v_proj", "l_proj", "values_v_proj", "values_l_proj",
                 "out_v_proj", "out_l_proj"):
        _t2j_linear(p["attn"][name], getattr(ref.attn, name))

    got_v, got_l = ours.apply(
        params, jnp.asarray(v), jnp.asarray(l),
        jnp.asarray(mask_valid.astype(np.float32)),
    )
    np.testing.assert_allclose(np.asarray(got_v), want_v, rtol=3e-4, atol=3e-4)
    np.testing.assert_allclose(np.asarray(got_l), want_l, rtol=3e-4, atol=3e-4)


@pytest.mark.slow  # ~11s; nightly tier
def test_decoder_layer_parity():
    """transformer.py:801-931 DeformableTransformerDecoderLayer
    (self-attn -> text cross-attn -> deformable cross-attn -> FFN) vs our
    DecoderLayer."""
    T = _load_ref_transformer()
    rng = np.random.default_rng(4)

    d, ffn, nh, nl, npt = 32, 64, 4, 2, 4
    shapes = [(6, 8), (3, 4)]
    s = sum(h * w for h, w in shapes)
    b, q, t = 2, 6, 7

    ref = T.DeformableTransformerDecoderLayer(
        d_model=d, d_ffn=ffn, dropout=0.0, activation="relu",
        n_levels=nl, n_heads=nh, n_points=npt,
        use_text_cross_attention=True,
    ).eval()
    with torch.no_grad():
        for lin in (ref.cross_attn.sampling_offsets,
                    ref.cross_attn.attention_weights):
            lin.weight.normal_(0, 0.02)
            lin.bias.normal_(0, 0.5)

    tgt = rng.standard_normal((b, q, d)).astype(np.float32)
    qpos = rng.standard_normal((b, q, d)).astype(np.float32)
    memory = rng.standard_normal((b, s, d)).astype(np.float32)
    text = rng.standard_normal((b, t, d)).astype(np.float32)
    refpts = rng.uniform(0.1, 0.9, (b, q, nl, 4)).astype(np.float32)
    text_valid = np.ones((b, t), bool)
    text_valid[:, 5:] = False

    with torch.no_grad():
        want = ref(
            tgt=torch.from_numpy(tgt).transpose(0, 1),
            tgt_query_pos=torch.from_numpy(qpos).transpose(0, 1),
            tgt_reference_points=torch.from_numpy(refpts).transpose(0, 1),
            memory_text=torch.from_numpy(text),
            text_attention_mask=~torch.from_numpy(text_valid),
            memory=torch.from_numpy(memory).transpose(0, 1),
            memory_spatial_shapes=torch.as_tensor(shapes, dtype=torch.long),
            memory_level_start_index=torch.as_tensor([0, 48]),
        ).transpose(0, 1).numpy()

    from mqdet_tpu.models.gdino import DecoderLayer

    ours = DecoderLayer(d_model=d, d_ffn=ffn, n_heads=nh, n_levels=nl,
                        n_points=npt)
    params = ours.init(
        jax.random.PRNGKey(0), jnp.asarray(tgt), jnp.asarray(qpos),
        jnp.asarray(refpts), jnp.asarray(memory), shapes,
        jnp.asarray(text), jnp.asarray(text_valid.astype(np.float32)),
    )
    p = params["params"]
    _t2j_mha(p, ref.self_attn, "sa_")
    _t2j_mha(p, ref.ca_text, "ca_text_")
    _t2j_ln(p["catext_norm"], ref.catext_norm)
    _copy_msda(p["cross_attn"], ref.cross_attn)
    _t2j_ln(p["norm1"], ref.norm1)
    _t2j_ln(p["norm2"], ref.norm2)
    _t2j_ln(p["norm3"], ref.norm3)
    _t2j_linear(p["linear1"], ref.linear1)
    _t2j_linear(p["linear2"], ref.linear2)

    got = np.asarray(
        ours.apply(params, jnp.asarray(tgt), jnp.asarray(qpos),
                   jnp.asarray(refpts), jnp.asarray(memory), shapes,
                   jnp.asarray(text),
                   jnp.asarray(text_valid.astype(np.float32)))
    )
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)


# ---------------------------------------------------------------------------
# Criterion / matcher VALUE parity vs the actual reference modules
# (loss.py:18-180, matcher.py:8-181) — VERDICT round-2 ask #8.
# ---------------------------------------------------------------------------

def _load_ref_criterion():
    """Load reference matcher.py + loss.py under their canonical names.

    Repairs any minimal package stubs left by _load_ref_transformer (they
    lack __path__ / misc symbols), then imports via the normal machinery so
    loss.py's absolute imports resolve."""
    from tests.ref_harness import REF_ROOT, install_stubs

    install_stubs()
    pkg_paths = {
        "groundingdino_new": [os.path.join(REF_ROOT, "groundingdino_new")],
        "groundingdino_new.util": [
            os.path.join(REF_ROOT, "groundingdino_new", "util")
        ],
        "groundingdino_new.models": [
            os.path.join(REF_ROOT, "groundingdino_new", "models")
        ],
        "groundingdino_new.models.GroundingDINO": [GD],
    }
    for name, path in pkg_paths.items():
        mod = sys.modules.get(name)
        if mod is None:
            mod = types.ModuleType(name)
            sys.modules[name] = mod
        if not hasattr(mod, "__path__"):
            mod.__path__ = path

    # box_ops (only needs torchvision box_area, stubbed)
    import importlib

    if "groundingdino_new.util.box_ops" not in sys.modules:
        spec = importlib.util.spec_from_file_location(
            "groundingdino_new.util.box_ops",
            os.path.join(REF_ROOT, "groundingdino_new", "util", "box_ops.py"),
        )
        m = importlib.util.module_from_spec(spec)
        sys.modules["groundingdino_new.util.box_ops"] = m
        spec.loader.exec_module(m)

    # misc: a minimal stub may be installed by _load_ref_transformer; give it
    # every symbol loss.py names in its import
    misc = sys.modules.get("groundingdino_new.util.misc")
    if misc is None:
        misc = types.ModuleType("groundingdino_new.util.misc")
        sys.modules["groundingdino_new.util.misc"] = misc
    defaults = dict(
        NestedTensor=object,
        nested_tensor_from_tensor_list=lambda *a, **k: None,
        accuracy=lambda *a, **k: None,
        get_world_size=lambda: 1,
        interpolate=lambda *a, **k: None,
        is_dist_avail_and_initialized=lambda: False,
    )
    for k, v in defaults.items():
        if not hasattr(misc, k):
            setattr(misc, k, v)
    if not hasattr(misc, "inverse_sigmoid"):
        def inverse_sigmoid(x, eps=1e-3):
            x = x.clamp(min=0, max=1)
            return torch.log(x.clamp(min=eps) / (1 - x).clamp(min=eps))

        misc.inverse_sigmoid = inverse_sigmoid

    for sub in ("utils", "matcher", "loss"):
        name = f"groundingdino_new.models.GroundingDINO.{sub}"
        if name not in sys.modules:
            spec = importlib.util.spec_from_file_location(
                name, os.path.join(GD, sub + ".py")
            )
            m = importlib.util.module_from_spec(spec)
            sys.modules[name] = m
            spec.loader.exec_module(m)
    return (
        sys.modules["groundingdino_new.models.GroundingDINO.matcher"],
        sys.modules["groundingdino_new.models.GroundingDINO.loss"],
    )


class _FakeTarget:
    def __init__(self, boxes):
        self._boxes = boxes

    def get_field(self, k):
        assert k == "normed_cxcy_boxes"
        return self._boxes

    def __len__(self):
        return len(self._boxes)


def _make_criterion_case(seed=0, b=2, q=20, t_real=12, max_len=16):
    rng = np.random.default_rng(seed)
    logits = rng.standard_normal((b, q, max_len)).astype(np.float32)
    logits[:, :, t_real:] = -np.inf  # ContrastiveEmbed -inf padding
    cxy = rng.uniform(0.25, 0.75, (b, q, 2)).astype(np.float32)
    wh = rng.uniform(0.05, 0.4, (b, q, 2)).astype(np.float32)
    boxes = np.concatenate([cxy, wh], -1)
    # aux layer
    logits_a = rng.standard_normal((b, q, max_len)).astype(np.float32)
    logits_a[:, :, t_real:] = -np.inf
    cxy_a = rng.uniform(0.25, 0.75, (b, q, 2)).astype(np.float32)
    wh_a = rng.uniform(0.05, 0.4, (b, q, 2)).astype(np.float32)
    boxes_a = np.concatenate([cxy_a, wh_a], -1)

    sizes = [2, 3]  # ragged per-image gt counts (reference) -> ours padded
    g_max = max(sizes)
    gt_boxes, gt_maps = [], []
    for gi, n in enumerate(sizes):
        c = rng.uniform(0.3, 0.7, (n, 2)).astype(np.float32)
        s = rng.uniform(0.1, 0.3, (n, 2)).astype(np.float32)
        gt_boxes.append(np.concatenate([c, s], -1))
        m = np.zeros((n, max_len), np.float32)
        for j in range(n):
            a0 = 1 + (2 * j) % (t_real - 3)
            m[j, a0 : a0 + 2] = 1.0
        gt_maps.append(m)
    text_mask = np.zeros((b, max_len), bool)
    text_mask[:, :t_real] = True
    return dict(
        logits=logits, boxes=boxes, logits_a=logits_a, boxes_a=boxes_a,
        gt_boxes=gt_boxes, gt_maps=gt_maps, sizes=sizes, g_max=g_max,
        text_mask=text_mask,
    )


def test_matcher_indices_parity():
    matcher_mod, _ = _load_ref_criterion()
    from mqdet_tpu.engine.gdino_losses import hungarian_match

    case = _make_criterion_case()
    m = matcher_mod.HungarianMatcher(
        cost_class=1.0, cost_bbox=5.0, cost_giou=2.0, focal_alpha=0.25
    )
    outputs = {
        "pred_logits": torch.from_numpy(case["logits"]),
        "pred_boxes": torch.from_numpy(case["boxes"]),
    }
    targets = [_FakeTarget(torch.from_numpy(x)) for x in case["gt_boxes"]]
    positive_map = torch.from_numpy(np.concatenate(case["gt_maps"]))
    ref_idx = m(outputs, targets, positive_map)

    for i in range(len(targets)):
        n = case["sizes"][i]
        g_max = case["g_max"]
        gtm = np.zeros((g_max, case["logits"].shape[-1]), np.float32)
        gbx = np.zeros((g_max, 4), np.float32)
        gtm[:n] = case["gt_maps"][i]
        gbx[:n] = case["gt_boxes"][i]
        valid = np.zeros((g_max,), bool)
        valid[:n] = True
        q_ind, _ = hungarian_match(
            jnp.asarray(case["logits"][i]), jnp.asarray(case["boxes"][i]),
            jnp.asarray(gtm), jnp.asarray(gbx), jnp.asarray(valid),
            cost_class=1.0, cost_bbox=5.0, cost_giou=2.0,
        )
        ref_q_of_gt = np.zeros((n,), np.int64)
        ri, rj = ref_idx[i]
        ref_q_of_gt[rj.numpy()] = ri.numpy()
        np.testing.assert_array_equal(np.asarray(q_ind)[:n], ref_q_of_gt)


@pytest.mark.slow  # ~14s; nightly tier
def test_criterion_value_parity():
    """Same predictions/targets through the reference SetCriterion and our
    gdino_set_loss: every (weighted) loss value agrees to 1e-5, including
    the aux decoder layer (loss.py:150-177)."""
    matcher_mod, loss_mod = _load_ref_criterion()
    from tests.ref_harness import ref_config

    from mqdet_tpu.engine.gdino_losses import gdino_set_loss

    case = _make_criterion_case(seed=3)
    cfg = ref_config()

    m = matcher_mod.HungarianMatcher(
        cost_class=1.0, cost_bbox=5.0, cost_giou=2.0, focal_alpha=0.25
    )
    crit = loss_mod.SetCriterion(m, cfg)
    outputs = {
        "pred_logits": torch.from_numpy(case["logits"]),
        "pred_boxes": torch.from_numpy(case["boxes"]),
        "aux_outputs": [{
            "pred_logits": torch.from_numpy(case["logits_a"]),
            "pred_boxes": torch.from_numpy(case["boxes_a"]),
        }],
    }
    targets = [_FakeTarget(torch.from_numpy(x)) for x in case["gt_boxes"]]
    positive_map = torch.from_numpy(np.concatenate(case["gt_maps"]))
    ref = crit(
        outputs, targets,
        text_mask=torch.from_numpy(case["text_mask"]),
        positive_map=positive_map,
    )

    b = len(case["sizes"])
    g_max = case["g_max"]
    t = case["logits"].shape[-1]
    gtm = np.zeros((b, g_max, t), np.float32)
    gbx = np.zeros((b, g_max, 4), np.float32)
    valid = np.zeros((b, g_max), bool)
    for i, n in enumerate(case["sizes"]):
        gtm[i, :n] = case["gt_maps"][i]
        gbx[i, :n] = case["gt_boxes"][i]
        valid[i, :n] = True
    ours = gdino_set_loss(
        {
            "pred_logits": jnp.asarray(case["logits"]),
            "pred_boxes": jnp.asarray(case["boxes"]),
            "aux_logits": [jnp.asarray(case["logits_a"])],
            "aux_boxes": [jnp.asarray(case["boxes_a"])],
        },
        jnp.asarray(gbx), jnp.asarray(valid), jnp.asarray(gtm),
        jnp.asarray(case["text_mask"].astype(np.float32)),
        cost_class=1.0, cost_bbox=5.0, cost_giou=2.0,
        loss_ce_coef=cfg.GROUNDINGDINO.loss_ce_coef,
        loss_bbox_coef=cfg.GROUNDINGDINO.loss_bbox_coef,
        loss_giou_coef=cfg.GROUNDINGDINO.loss_giou_coef,
        alpha=cfg.MODEL.DYHEAD.FUSE_CONFIG.TOKEN_ALPHA,
        gamma=cfg.MODEL.DYHEAD.FUSE_CONFIG.TOKEN_GAMMA,
    )
    for k in ("loss_ce", "loss_bbox", "loss_giou",
              "loss_ce_0", "loss_bbox_0", "loss_giou_0"):
        assert k in ref and k in ours, (k, sorted(ref), sorted(ours))
        np.testing.assert_allclose(
            float(ours[k]), float(ref[k]), rtol=1e-5, atol=1e-6, err_msg=k
        )
