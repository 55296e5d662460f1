"""Harness for importing the ACTUAL reference package as a CPU oracle.

`/root/reference` (YifanXu74/MQ-Det) is torch+CUDA code whose Python model
stack runs fine on CPU once its missing third-party deps are stubbed:

  yacs, timm (DropPath only), einops_exts, ftfy, pycocotools, torchvision
  (nms/datasets/transforms surface), addict/yapf (GDINO slconfig),
  supervision, prettytable, and the compiled `maskrcnn_benchmark._C`
  kernels (pure-torch greedy NMS stand-ins).

This lets parity tests instantiate the reference `GeneralizedVLRCNN_New`
(maskrcnn_benchmark/modeling/detector/generalized_vl_rcnn_new.py:90-519) at
a tiny config, copy its weights into our flax tree via
mqdet_tpu.io.torch_import, and compare outputs end to end — the strongest
evidence that this rebuild reproduces the reference math.

No reference CODE is copied here; we import and execute it read-only.
"""
from __future__ import annotations

import copy
import importlib.machinery
import os
import sys
import types

REF_ROOT = "/root/reference"

_installed = False


def _stub(name, **attrs):
    m = types.ModuleType(name)
    m.__spec__ = importlib.machinery.ModuleSpec(name, None)
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m
    return m


class CfgNode(dict):
    """Minimal yacs.config.CfgNode stand-in (attribute access + clone)."""

    def __init__(self, d=None, **kw):
        super().__init__()
        if d:
            for k, v in d.items():
                self[k] = CfgNode(v) if isinstance(v, dict) else v

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:
            raise AttributeError(k) from e

    def __setattr__(self, k, v):
        self[k] = v

    def clone(self):
        return copy.deepcopy(self)

    def freeze(self):
        pass

    def defrost(self):
        pass

    def merge_from_list(self, opts):
        for k, v in zip(opts[::2], opts[1::2]):
            node = self
            parts = k.split(".")
            for p in parts[:-1]:
                node = node[p]
            node[parts[-1]] = v


def _torch_nms(boxes, scores, thresh):
    """Greedy hard NMS, torchvision convention (no +1)."""
    import torch

    order = torch.argsort(scores, descending=True)
    keep = []
    suppressed = torch.zeros(len(boxes), dtype=torch.bool)
    areas = (boxes[:, 2] - boxes[:, 0]).clamp(min=0) * (
        boxes[:, 3] - boxes[:, 1]
    ).clamp(min=0)
    for idx in order.tolist():
        if suppressed[idx]:
            continue
        keep.append(idx)
        xx1 = torch.maximum(boxes[idx, 0], boxes[:, 0])
        yy1 = torch.maximum(boxes[idx, 1], boxes[:, 1])
        xx2 = torch.minimum(boxes[idx, 2], boxes[:, 2])
        yy2 = torch.minimum(boxes[idx, 3], boxes[:, 3])
        inter = (xx2 - xx1).clamp(min=0) * (yy2 - yy1).clamp(min=0)
        iou = inter / (areas[idx] + areas - inter + 1e-12)
        suppressed |= iou > thresh
    return torch.as_tensor(keep, dtype=torch.int64)


def _torch_ml_nms(dets, thresh):
    """Exact pure-torch twin of the reference CUDA kernel
    (csrc/cuda/ml_nms.cu:15-26): greedy over score-descending order,
    IoU with the +1 (Detectron) convention, IoU across labels == 0."""
    import torch

    boxes, scores, labels = dets[:, :4], dets[:, 4], dets[:, 5]
    if boxes.numel() == 0:
        return torch.zeros(0, dtype=torch.int64)
    order = torch.argsort(scores, descending=True)
    keep = []
    suppressed = torch.zeros(len(boxes), dtype=torch.bool)
    areas = (boxes[:, 2] - boxes[:, 0] + 1) * (boxes[:, 3] - boxes[:, 1] + 1)
    for idx in order.tolist():
        if suppressed[idx]:
            continue
        keep.append(idx)
        xx1 = torch.maximum(boxes[idx, 0], boxes[:, 0])
        yy1 = torch.maximum(boxes[idx, 1], boxes[:, 1])
        xx2 = torch.minimum(boxes[idx, 2], boxes[:, 2])
        yy2 = torch.minimum(boxes[idx, 3], boxes[:, 3])
        inter = (xx2 - xx1 + 1).clamp(min=0) * (yy2 - yy1 + 1).clamp(min=0)
        iou = inter / (areas[idx] + areas - inter)
        suppressed |= (iou > thresh) & (labels == labels[idx])
    return torch.as_tensor(keep, dtype=torch.int64)


def _torch_modulated_deform_conv(
    input, offset, mask, weight, bias=None, stride=1, padding=0, dilation=1,
    groups=1, deformable_groups=1,
):
    """Pure-torch twin of the reference CUDA DCNv2
    (csrc/cuda/deform_conv_kernel_cuda.cu modulated_deformable_im2col,
    :578-638): 4-corner bilinear sampling, zero outside (-1, H) strict,
    modulation multiply, then the (K*C, Cout) matmul.

    CRITICAL parity detail: the CUDA kernel indexes the offset/mask buffers
    with strides derived from the OUTPUT size (:607-617). VLDyHead's DyConv
    applies level-L offsets to the conv over level L+1 (vldyhead.py:224),
    whose output is smaller — the kernel then reinterprets the flat buffer
    with the wrong strides. That reinterpretation is replicated here (flat
    view, first B*C*Ho*Wo elements) because the released checkpoints were
    trained with it.
    """
    import torch

    assert groups == 1 and deformable_groups == 1 and dilation == 1
    b, c, h, w = input.shape
    cout, _, kh, kw = weight.shape
    k = kh * kw
    ho = (h + 2 * padding - kh) // stride + 1
    wo = (w + 2 * padding - kw) // stride + 1
    if offset.shape[2:] != (ho, wo):
        offset = offset.reshape(-1)[: b * 2 * k * ho * wo].reshape(
            b, 2 * k, ho, wo
        )
        mask = mask.reshape(-1)[: b * k * ho * wo].reshape(b, k, ho, wo)

    ys = torch.arange(ho, dtype=input.dtype) * stride - padding
    xs = torch.arange(wo, dtype=input.dtype) * stride - padding
    tap_y = torch.arange(kh, dtype=input.dtype)
    tap_x = torch.arange(kw, dtype=input.dtype)
    # (K, Ho, Wo) base positions; offset channels interleave (dy, dx) per tap
    base_y = (ys[None, :, None] + tap_y.repeat_interleave(kw)[:, None, None])
    base_x = (xs[None, None, :] + tap_x.repeat(kh)[:, None, None])
    off = offset.reshape(b, k, 2, ho, wo)
    sy = base_y[None] + off[:, :, 0]
    sx = base_x[None] + off[:, :, 1]

    inb = (sy > -1) & (sy < h) & (sx > -1) & (sx < w)
    y0 = torch.floor(sy)
    x0 = torch.floor(sx)
    ly, lx = sy - y0, x0.neg().add_(sx)  # sx - x0

    flat = input.reshape(b, c, h * w)

    def corner(yy, xx):
        ok = (yy >= 0) & (yy <= h - 1) & (xx >= 0) & (xx <= w - 1)
        yc = yy.clamp(0, h - 1).long()
        xc = xx.clamp(0, w - 1).long()
        idx = (yc * w + xc).reshape(b, 1, -1).expand(b, c, -1)
        v = flat.gather(2, idx).reshape(b, c, k, ho, wo)
        return v * ok[:, None]

    val = (
        corner(y0, x0) * ((1 - ly) * (1 - lx))[:, None]
        + corner(y0, x0 + 1) * ((1 - ly) * lx)[:, None]
        + corner(y0 + 1, x0) * (ly * (1 - lx))[:, None]
        + corner(y0 + 1, x0 + 1) * (ly * lx)[:, None]
    )
    val = val * inb[:, None] * mask[:, None]  # (B, C, K, Ho, Wo)
    out = torch.einsum("bckn,ock->bon", val.reshape(b, c, k, ho * wo),
                       weight.reshape(cout, c, k))
    out = out.reshape(b, cout, ho, wo)
    if bias is not None:
        out = out + bias[None, :, None, None]
    return out


def torch_mdconv_apply(input, offset, mask, weight, bias=None, stride=1,
                       padding=0, dilation=1, groups=1, deformable_groups=1):
    """Signature-compatible stand-in for ModulatedDeformConvFunction.apply
    (layers/deform_conv.py:264)."""
    return _torch_modulated_deform_conv(
        input, offset, mask, weight, bias, stride, padding, dilation, groups,
        deformable_groups,
    )


def install_stubs():
    """Idempotently install every stub the reference import graph needs."""
    global _installed
    if _installed:
        return
    import torch

    # yacs
    _stub("yacs")
    _stub("yacs.config", CfgNode=CfgNode)

    # timm (swint.py uses DropPath only; identity is exact at eval)
    class DropPath(torch.nn.Module):
        def __init__(self, drop_prob=0.0, *a, **k):
            super().__init__()

        def forward(self, x):
            return x

    _stub("timm")
    _stub("timm.models")
    _stub(
        "timm.models.layers",
        DropPath=DropPath,
        trunc_normal_=lambda t, *a, **k: t,
        to_2tuple=lambda x: x if isinstance(x, tuple) else (x, x),
    )

    # einops_exts.rearrange_many
    import einops

    _stub(
        "einops_exts",
        rearrange_many=lambda xs, pattern, **kw: [
            einops.rearrange(x, pattern, **kw) for x in xs
        ],
    )

    _stub("ftfy", fix_text=lambda s: s)
    _stub("pycocotools")
    _stub("pycocotools.coco", COCO=object)
    _stub("pycocotools.cocoeval", COCOeval=object)
    _stub("pycocotools.mask", encode=None, decode=None)
    _stub("prettytable", PrettyTable=object)

    class _AddictDict(dict):
        def __getattr__(self, k):
            try:
                return self[k]
            except KeyError as e:
                raise AttributeError(k) from e

        def __setattr__(self, k, v):
            self[k] = v

    _stub("addict", Dict=_AddictDict)
    _stub("yapf")
    _stub("yapf.yapflib")
    _stub("yapf.yapflib.yapf_api", FormatCode=lambda s, **k: (s, True))
    _stub("supervision", Detections=object, BoxAnnotator=object)

    # torchvision surface (not installed in this env)
    def _box_convert(boxes, in_fmt, out_fmt):
        if in_fmt == "cxcywh" and out_fmt == "xyxy":
            cx, cy, w, h = boxes.unbind(-1)
            return torch.stack(
                [cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1
            )
        if in_fmt == "xyxy" and out_fmt == "cxcywh":
            x1, y1, x2, y2 = boxes.unbind(-1)
            return torch.stack(
                [(x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1], -1
            )
        raise NotImplementedError((in_fmt, out_fmt))

    def _box_area(boxes):
        return (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])

    class _CocoDetection(torch.utils.data.Dataset):
        pass

    class _VisionDataset(torch.utils.data.Dataset):
        pass

    tv = _stub("torchvision")
    tv.__version__ = "0.15.2"
    tv.ops = _stub(
        "torchvision.ops", nms=_torch_nms, box_convert=_box_convert,
        box_area=_box_area,
    )
    _stub("torchvision.ops.boxes", box_area=_box_area, nms=_torch_nms)
    tv.datasets = _stub(
        "torchvision.datasets",
        CocoDetection=_CocoDetection,
        VisionDataset=_VisionDataset,
    )
    _stub("torchvision.datasets.vision", VisionDataset=_VisionDataset)
    tvf = _stub("torchvision.transforms.functional")
    tv.transforms = _stub(
        "torchvision.transforms", functional=tvf, ColorJitter=object
    )
    tv.models = _stub("torchvision.models")
    _stub("torchvision.models._utils", IntermediateLayerGetter=object)

    # transformers: legacy doc symbols modeling_bert_new.py expects
    import logging

    import transformers.models.bert.modeling_bert as hf_bert

    for name, val in [
        ("BERT_INPUTS_DOCSTRING", ""),
        ("_CHECKPOINT_FOR_DOC", ""),
        ("_CONFIG_FOR_DOC", ""),
        (
            "add_start_docstrings_to_model_forward",
            lambda *a, **k: (lambda f: f),
        ),
        ("add_code_sample_docstrings", lambda *a, **k: (lambda f: f)),
    ]:
        if not hasattr(hf_bert, name):
            setattr(hf_bert, name, val)
    if not hasattr(hf_bert, "logger"):
        hf_bert.logger = logging.getLogger("hf_bert_stub")

    # symbols relocated to transformers.pytorch_utils in newer versions
    import transformers.modeling_utils as hf_mu

    for sym in (
        "apply_chunking_to_forward",
        "find_pruneable_heads_and_indices",
        "prune_linear_layer",
    ):
        if not hasattr(hf_mu, sym):
            import transformers.pytorch_utils as hf_pu

            setattr(hf_mu, sym, getattr(hf_pu, sym))

    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)

    import maskrcnn_benchmark

    _C = _stub(
        "maskrcnn_benchmark._C",
        ml_nms=_torch_ml_nms,
        nms=_torch_nms,
        soft_nms=None,
    )
    maskrcnn_benchmark._C = _C

    # The reference boxlist_ml_nms CPU fallback (boxlist_ops.py:55-66) is
    # BUGGY: `keep += keep_j` collects per-label LOCAL indices without
    # remapping through `inds`, misindexing the global boxlist (duplicate /
    # wrong detections). The published results come from the GPU branch
    # (`_C.ml_nms`). Force that branch's semantics on CPU so the oracle
    # reflects the real model behavior.
    import maskrcnn_benchmark.structures.boxlist_ops as blo

    def _fixed_boxlist_ml_nms(
        boxlist, nms_thresh, max_proposals=-1, score_field="scores",
        label_field="labels",
    ):
        if nms_thresh <= 0:
            return boxlist
        mode = boxlist.mode
        boxlist = boxlist.convert("xyxy")
        dets = torch.cat(
            [
                boxlist.bbox,
                boxlist.get_field(score_field)[:, None],
                boxlist.get_field(label_field).float()[:, None],
            ],
            dim=1,
        )
        keep = _torch_ml_nms(dets, nms_thresh)
        if max_proposals > 0:
            keep = keep[:max_proposals]
        return boxlist[keep].convert(mode)

    blo.boxlist_ml_nms = _fixed_boxlist_ml_nms

    # CPU stand-in for the CUDA DCNv2 (ModulatedDeformConv.forward calls the
    # module-global `modulated_deform_conv`, layers/deform_conv.py:379-382)
    import maskrcnn_benchmark.layers.deform_conv as mdc

    mdc.modulated_deform_conv = torch_mdconv_apply
    _installed = True


def purge_partial_ref_modules():
    """Remove synthetic package shells under the reference namespaces.

    The module-level loaders in the parity tests (e.g. test_gdino_parity's
    _load_ref_transformer/_load_ref_criterion) register bare ModuleType
    parents like `groundingdino_new.models` so spec-loaded leaves resolve.
    Those shells never execute the real __init__.py, so a LATER full import
    (`from groundingdino_new.models import build_model`) fails with
    "unknown location". Purge anything spec-less and file-less under the two
    reference namespaces — except the intentional compiled-extension stubs
    (*._C) — so real imports re-execute the genuine packages. Spec-loaded
    leaves are kept; re-imported parents re-adopt them lazily."""
    for name in list(sys.modules):
        if not (
            name.split(".")[0] in ("maskrcnn_benchmark", "groundingdino_new")
        ):
            continue
        if name.endswith("._C"):
            continue
        m = sys.modules[name]
        if (
            getattr(m, "__spec__", None) is None
            and getattr(m, "__file__", None) is None
        ):
            del sys.modules[name]


def ref_config():
    """A fresh clone of the reference default config tree."""
    install_stubs()
    purge_partial_ref_modules()
    from maskrcnn_benchmark.config import cfg

    return cfg.clone()


def ref_import(modname):
    """Import a reference module (after stubs)."""
    install_stubs()
    purge_partial_ref_modules()
    import importlib

    return importlib.import_module(modname)


# ---------------------------------------------------------------------------
# tiny offline HF-BERT assets + tiny reference config
# ---------------------------------------------------------------------------

TINY_WORDS = [
    "cat", "dog", "zebra", "person", "bicycle", "car", "bird", "horse",
    "sheep", "cow", "elephant", "bear", "giraffe", "umbrella", "pie",
    "apple", "banana", "chair", "couch", "table", "tv", "laptop", "mouse",
    "remote", "keyboard", "phone", "book", "clock", "vase", "toy", "ball",
    "hot", "cold", "big", "small", "a", "an", "the", "of", ".", ",",
]


def make_bert_assets(
    dirpath,
    hidden_size=128,
    num_layers=8,
    num_heads=4,
    intermediate_size=256,
    seed=0,
):
    """Create a local `bert-base-uncased` directory (config + vocab +
    random-init weights) loadable fully offline by HF from_pretrained.

    The directory BASENAME must be 'bert-base-uncased' because the reference
    dispatches on os.path.basename (bert_model_new.py:20).
    """
    import json

    import torch
    from transformers import BertConfig, BertModel

    d = os.path.join(str(dirpath), "bert-base-uncased")
    os.makedirs(d, exist_ok=True)

    # vocab with the real bert-base-uncased special-token layout
    vocab = ["[PAD]"]
    vocab += [f"[unused{i}]" for i in range(99)]
    vocab += ["[UNK]", "[CLS]", "[SEP]", "[MASK]"]
    vocab += TINY_WORDS
    vocab += ["##" + w for w in TINY_WORDS]
    # punctuation (GDINO's sub-sentence specials: ". ?" — bertwarper.py)
    vocab += [".", "?", ","]
    with open(os.path.join(d, "vocab.txt"), "w") as f:
        f.write("\n".join(vocab) + "\n")

    cfg = BertConfig(
        vocab_size=len(vocab),
        hidden_size=hidden_size,
        num_hidden_layers=num_layers,
        num_attention_heads=num_heads,
        intermediate_size=intermediate_size,
        max_position_embeddings=512,
    )
    cfg.save_pretrained(d)
    with open(os.path.join(d, "tokenizer_config.json"), "w") as f:
        json.dump(
            {"do_lower_case": True, "tokenizer_class": "BertTokenizer"}, f
        )

    torch.manual_seed(seed)
    model = BertModel(cfg, add_pooling_layer=False)
    torch.save(model.state_dict(), os.path.join(d, "pytorch_model.bin"))
    return d


def make_tiny_bank(path, labels=(1, 2, 3), n_queries=3, channels=64, seed=0):
    """torch.save a reference-format query bank
    (dict label -> (num_queries, num_scales=1, C) tensor)."""
    import numpy as np
    import torch

    rng = np.random.default_rng(seed)
    bank = {
        int(l): torch.from_numpy(
            rng.standard_normal((n_queries, 1, channels)).astype(np.float32)
        )
        for l in labels
    }
    torch.save(bank, str(path))
    return bank


def tiny_ref_cfg(bert_dir, bank_path="", image_size=224):
    """Reference cfg tuned to a tiny-but-real MQ-GLIP
    (mirrors configs/pretrain/mq-glip-t.yaml with small dims; USE_DFCONV off
    because the CUDA deform-conv kernel is unavailable on CPU — DCN parity
    is covered by the dedicated module tests)."""
    c = ref_config()
    M = c.MODEL
    M.DEVICE = "cpu"
    M.META_ARCHITECTURE = "GeneralizedVLRCNN_New"
    M.RPN_ONLY = True
    M.RPN_ARCHITECTURE = "VLDYHEAD"
    M.BACKBONE.CONV_BODY = "SWINT-FPN-RETINANET"
    M.BACKBONE.OUT_CHANNELS = 64
    M.SWINT.EMBED_DIM = 32
    M.SWINT.DEPTHS = (1, 1, 1, 1)
    M.SWINT.NUM_HEADS = (1, 2, 4, 8)
    M.SWINT.WINDOW_SIZE = 7
    M.SWINT.OUT_CHANNELS = (32, 64, 128, 256)
    M.SWINT.DROP_PATH_RATE = 0.0
    M.LANGUAGE_BACKBONE.TOKENIZER_TYPE = bert_dir
    M.LANGUAGE_BACKBONE.MODEL_TYPE = bert_dir
    M.LANGUAGE_BACKBONE.MASK_SPECIAL = False
    M.LANGUAGE_BACKBONE.HIDDEN_LAYERS = 8
    M.LANGUAGE_BACKBONE.LANG_DIM = 128
    M.LANGUAGE_BACKBONE.MAX_QUERY_LEN = 48
    M.RPN.USE_FPN = True
    M.RPN.ANCHOR_SIZES = (64, 128, 256, 512, 1024)
    M.RPN.ANCHOR_STRIDE = (8, 16, 32, 64, 128)
    M.RPN.ASPECT_RATIOS = (1.0,)
    M.RPN.SCALES_PER_OCTAVE = 1
    M.DYHEAD.CHANNELS = 64
    M.DYHEAD.NUM_CONVS = 2
    M.DYHEAD.USE_GN = True
    M.DYHEAD.USE_DYRELU = True
    M.DYHEAD.USE_DFCONV = False
    M.DYHEAD.USE_DYFUSE = True
    M.DYHEAD.TOPK = 9
    M.DYHEAD.SCORE_AGG = "MEAN"
    M.DYHEAD.LOG_SCALE = 0.0
    # VLFuse v_dim comes from JOINT_EMB_SIZE (vldyhead.py:440), which the
    # real configs keep == BACKBONE.OUT_CHANNELS (256); mirror that here.
    M.DYHEAD.FUSE_CONFIG.JOINT_EMB_SIZE = 64
    M.DYHEAD.FUSE_CONFIG.EARLY_FUSE_ON = True
    M.DYHEAD.FUSE_CONFIG.TYPE = "MHA-B"
    M.DYHEAD.FUSE_CONFIG.USE_DOT_PRODUCT_TOKEN_LOSS = True
    M.DYHEAD.FUSE_CONFIG.USE_FUSED_FEATURES_DOT_PRODUCT = True
    M.DYHEAD.FUSE_CONFIG.USE_LAYER_SCALE = True
    M.DYHEAD.FUSE_CONFIG.CLAMP_MIN_FOR_UNDERFLOW = True
    M.DYHEAD.FUSE_CONFIG.CLAMP_MAX_FOR_OVERFLOW = True
    M.DYHEAD.FUSE_CONFIG.CLAMP_BERTATTN_MIN_FOR_UNDERFLOW = True
    M.DYHEAD.FUSE_CONFIG.CLAMP_BERTATTN_MAX_FOR_OVERFLOW = True
    M.DYHEAD.FUSE_CONFIG.CLAMP_DOT_PRODUCT = True
    M.ATSS.INFERENCE_TH = 0.01
    M.ATSS.PRE_NMS_TOP_N = 200
    M.ATSS.NMS_TH = 0.6
    M.ATSS.DETECTIONS_PER_IMG = 20
    c.INPUT.MIN_SIZE_TEST = image_size
    c.INPUT.MAX_SIZE_TEST = image_size
    c.DATALOADER.SIZE_DIVISIBILITY = 32
    c.DATASETS.SEPARATION_TOKENS = ". "
    V = c.VISION_QUERY
    V.ENABLED = bool(bank_path)
    V.QUERY_BANK_PATH = str(bank_path)
    V.PURE_TEXT_RATE = 0.0
    V.TEXT_DROPOUT = 0.0
    V.VISION_SCALE = 1.0
    V.NUM_QUERY_PER_CLASS = 3
    V.RANDOM_KSHOT = False
    V.ADD_ADAPT_LAYER = False
    V.CONDITION_GATE = True
    V.NONLINEAR_GATE = True
    V.NO_CAT = True
    return c


def build_ref_model(cfg, seed=0, excite_gates=True):
    """Instantiate the reference detector at `cfg` on CPU in eval mode.

    excite_gates: the GCP gates init to zero (identity blocks); randomize
    them so vision queries actually influence the output."""
    install_stubs()
    purge_partial_ref_modules()
    import torch

    torch.manual_seed(seed)
    from maskrcnn_benchmark.modeling.detector import build_detection_model

    model = build_detection_model(cfg)
    model.eval()
    if excite_gates:
        with torch.no_grad():
            for name, p in model.named_parameters():
                if "attn_gate" in name and "linear2.weight" in name:
                    p.normal_(std=0.5)
                elif name.endswith("ff_gate"):
                    p.fill_(0.3)
    return model
