"""Config tree for mqdet_tpu.

Mirrors the *surface* of the reference's yacs config
(/root/reference/maskrcnn_benchmark/config/defaults.py:20-1001): yaml files,
dotted KEY VALUE override lists, and named high-level tuning recipes
(tools/train_net.py:41-59, tools/finetune.py:319-478) — implemented with a
small self-contained node class instead of yacs.
"""
from __future__ import annotations

import ast
import copy
from typing import Any, Dict, List, Optional


class CfgNode(dict):
    """Dict with attribute access, recursive merge, and dotted overrides."""

    def __init__(self, init: Optional[Dict[str, Any]] = None):
        super().__init__()
        if init:
            for k, v in init.items():
                self[k] = CfgNode(v) if isinstance(v, dict) else v

    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = CfgNode(value) if isinstance(value, dict) else value

    def clone(self) -> "CfgNode":
        return copy.deepcopy(self)

    # subtrees that accept arbitrary new keys (dataset registry etc.)
    _OPEN_SUBTREES = ("DATASETS.REGISTER",)

    def merge_from_other(self, other: Dict[str, Any], _path: str = "") -> None:
        for k, v in other.items():
            full = f"{_path}.{k}" if _path else k
            open_subtree = any(
                full == o or full.startswith(o + ".") for o in self._OPEN_SUBTREES
            )
            if isinstance(v, dict) and isinstance(self.get(k), CfgNode) and not open_subtree:
                self[k].merge_from_other(v, full)
            else:
                if k not in self and not open_subtree:
                    raise KeyError(f"Unknown config key: {full}")
                self[k] = _coerce(v, self.get(k), full)

    def merge_from_file(self, path: str) -> None:
        import yaml

        with open(path) as f:
            data = yaml.safe_load(f) or {}
        self.merge_from_other(data)

    def merge_from_list(self, opts: List[Any]) -> None:
        """Dotted KEY VALUE pairs, e.g. ['SOLVER.BASE_LR', '1e-4']."""
        assert len(opts) % 2 == 0, f"override list must be even: {opts}"
        for key, value in zip(opts[0::2], opts[1::2]):
            parts = key.split(".")
            node = self
            for p in parts[:-1]:
                node = node[p]
            leaf = parts[-1]
            if leaf not in node:
                raise KeyError(f"Unknown config key: {key}")
            node[leaf] = _coerce(value, node[leaf], key)

    def dump_yaml(self) -> str:
        import yaml

        def plain(n):
            return {k: plain(v) if isinstance(v, dict) else _yamlable(v) for k, v in n.items()}

        return yaml.safe_dump(plain(self), sort_keys=False)


def _yamlable(v):
    return list(v) if isinstance(v, tuple) else v


def _coerce(value: Any, old: Any, key: str) -> Any:
    """Coerce a yaml/string value to the type of the default it replaces."""
    if isinstance(value, str) and not isinstance(old, str):
        try:
            value = ast.literal_eval(value)
        except (ValueError, SyntaxError):
            pass
    if old is None or value is None:
        return value
    if isinstance(old, bool):
        if isinstance(value, str):
            return value.lower() in ("true", "1", "yes")
        return bool(value)
    if isinstance(old, tuple) and isinstance(value, list):
        return tuple(value)
    if isinstance(old, float) and isinstance(value, int):
        return float(value)
    if isinstance(old, dict) and isinstance(value, dict):
        return CfgNode(value)
    if type(old) is not type(value) and not isinstance(old, (list, tuple)):
        try:
            return type(old)(value)
        except (TypeError, ValueError):
            pass
    return value


# Compatibility-only knobs. The tree keeps the reference's full key surface
# so its yaml configs load unchanged, but a few keys are intentionally inert
# here because the TPU design subsumes them:
#   * DATALOADER.* — the host pipeline is synchronous numpy (no torch
#     workers); SIZE_DIVISIBILITY is replaced by static TPU.IMAGE_BUCKETS.
#   * SOLVER.USE_AMP + FUSE_CONFIG.CLAMP_* / STABLE_SOFTMAX_2D — bf16
#     compute has no fp16 range problem; the +-50000 dot-product clamps are
#     always on (vldyhead.py), the attention-score clamps are unnecessary.
#   * TEST.DURING_TRAINING — duplicate of SOLVER.TEST_WITH_INFERENCE (the
#     knob the reference trainer actually reads), which is implemented.
#   * MODEL.DYHEAD.USE_GN — GLIP's head is always GroupNorm-normed; the
#     reference has no non-GN head path either.
#   * VISION_QUERY.QUERY_ADDITION_NUM, FUSE_CONFIG.USE_TOKEN_LOSS /
#     USE_CLASSIFICATION_LOSS / USE_CONTRASTIVE_ALIGN_LOSS / SEPARATE_
#     BIDIRECTIONAL / DO_LANG_PROJ_OUTSIDE_CHECKPOINT — dead or
#     experiment-only in the reference (never set by any shipped config).
#   * MODEL.SWINT.APE — absolute position embedding; False in every GLIP /
#     MQ-Det config, so only the relative-bias path is built.
def default_config() -> CfgNode:
    """The full default tree (knobs the TPU build implements or honors)."""
    c = CfgNode()

    c.MODEL = CfgNode()
    c.MODEL.META_ARCHITECTURE = "MQGLIP"  # MQGLIP | MQGroundingDINO
    c.MODEL.WEIGHT = ""
    c.MODEL.RPN_ONLY = True
    c.MODEL.RPN_ARCHITECTURE = "VLDYHEAD"

    c.MODEL.BACKBONE = CfgNode()
    c.MODEL.BACKBONE.CONV_BODY = "SWINT-FPN-RETINANET"
    c.MODEL.BACKBONE.OUT_CHANNELS = 256
    c.MODEL.BACKBONE.FREEZE = False
    c.MODEL.BACKBONE.FREEZE_CONV_BODY_AT = -1
    # EfficientDet backbone knobs (reference: config/defaults.py:260-262)
    c.MODEL.BACKBONE.EFFICIENT_DET_START_FROM = 3
    c.MODEL.BACKBONE.EFFICIENT_DET_COMPOUND = 0

    # BiFPN options (reference: config/defaults.py:304-308)
    c.MODEL.BIFPN = CfgNode()
    c.MODEL.BIFPN.NUM_REPEATS = 1
    c.MODEL.BIFPN.USE_ATTENTION = True

    # Swin transformer (reference: config/defaults.py:721-731, SWINT block)
    c.MODEL.SWINT = CfgNode()
    c.MODEL.SWINT.EMBED_DIM = 96
    c.MODEL.SWINT.OUT_CHANNELS = (96, 192, 384, 768)
    c.MODEL.SWINT.DEPTHS = (2, 2, 6, 2)
    c.MODEL.SWINT.NUM_HEADS = (3, 6, 12, 24)
    c.MODEL.SWINT.WINDOW_SIZE = 7
    c.MODEL.SWINT.MLP_RATIO = 4.0
    c.MODEL.SWINT.DROP_PATH_RATE = 0.2
    c.MODEL.SWINT.APE = False
    c.MODEL.SWINT.VERSION = "v1"
    c.MODEL.SWINT.OUT_NORM = True

    c.MODEL.FPN = CfgNode()
    c.MODEL.FPN.USE_GN = False
    c.MODEL.FPN.USE_RELU = False

    c.MODEL.GROUP_NORM = CfgNode()
    c.MODEL.GROUP_NORM.NUM_GROUPS = 16

    # Language backbone (reference: config/defaults.py:258-280)
    c.MODEL.LANGUAGE_BACKBONE = CfgNode()
    c.MODEL.LANGUAGE_BACKBONE.FREEZE = False
    c.MODEL.LANGUAGE_BACKBONE.TOKENIZER_TYPE = "bert-base-uncased"
    c.MODEL.LANGUAGE_BACKBONE.MODEL_TYPE = "bert-base-uncased"
    c.MODEL.LANGUAGE_BACKBONE.LANG_DIM = 768
    c.MODEL.LANGUAGE_BACKBONE.MAX_QUERY_LEN = 256
    c.MODEL.LANGUAGE_BACKBONE.N_LAYERS = 1
    c.MODEL.LANGUAGE_BACKBONE.PAD_MAX = True
    c.MODEL.LANGUAGE_BACKBONE.MASK_SPECIAL = False
    c.MODEL.LANGUAGE_BACKBONE.USE_CHECKPOINT = False
    # BERT architecture (bert-base-uncased)
    c.MODEL.LANGUAGE_BACKBONE.HIDDEN_LAYERS = 12
    c.MODEL.LANGUAGE_BACKBONE.HIDDEN_SIZE = 768
    c.MODEL.LANGUAGE_BACKBONE.NUM_HEADS = 12
    c.MODEL.LANGUAGE_BACKBONE.INTERMEDIATE_SIZE = 3072
    c.MODEL.LANGUAGE_BACKBONE.VOCAB_SIZE = 30522

    c.MODEL.RPN = CfgNode()
    c.MODEL.RPN.USE_FPN = True
    c.MODEL.RPN.ANCHOR_SIZES = (64, 128, 256, 512, 1024)
    c.MODEL.RPN.ANCHOR_STRIDE = (8, 16, 32, 64, 128)
    c.MODEL.RPN.ASPECT_RATIOS = (1.0,)
    c.MODEL.RPN.SCALES_PER_OCTAVE = 1
    c.MODEL.RPN.STRADDLE_THRESH = 0

    # ATSS head thresholds (reference: config/defaults.py:408-436)
    c.MODEL.ATSS = CfgNode()
    c.MODEL.ATSS.NUM_CLASSES = 81
    c.MODEL.ATSS.PRIOR_PROB = 0.01
    c.MODEL.ATSS.INFERENCE_TH = 0.05
    c.MODEL.ATSS.INFERENCE_TH_TRAIN = 0.0
    c.MODEL.ATSS.NMS_TH = 0.6
    c.MODEL.ATSS.PRE_NMS_TOP_N = 1000
    c.MODEL.ATSS.PRE_NMS_TOP_N_TRAIN = 3000
    c.MODEL.ATSS.POST_NMS_TOP_N_TRAIN = 1000
    c.MODEL.ATSS.TOPK = 9
    c.MODEL.ATSS.DETECTIONS_PER_IMG = 100
    c.MODEL.ATSS.REG_LOSS_WEIGHT = 2.0

    # VLDyHead (reference: config/defaults.py:438-530 DYHEAD block)
    c.MODEL.DYHEAD = CfgNode()
    c.MODEL.DYHEAD.NUM_CLASSES = 81
    c.MODEL.DYHEAD.CHANNELS = 256
    c.MODEL.DYHEAD.NUM_CONVS = 6
    c.MODEL.DYHEAD.USE_GN = True
    c.MODEL.DYHEAD.USE_DYRELU = True
    c.MODEL.DYHEAD.USE_DFCONV = True
    c.MODEL.DYHEAD.USE_DYFUSE = True
    c.MODEL.DYHEAD.TOPK = 9
    c.MODEL.DYHEAD.SCORE_AGG = "MEAN"
    c.MODEL.DYHEAD.LOG_SCALE = 0.0
    c.MODEL.DYHEAD.PRIOR_PROB = 0.01
    c.MODEL.DYHEAD.USE_CHECKPOINT = False

    c.MODEL.DYHEAD.FUSE_CONFIG = CfgNode()
    c.MODEL.DYHEAD.FUSE_CONFIG.EARLY_FUSE_ON = True
    c.MODEL.DYHEAD.FUSE_CONFIG.TYPE = "MHA-B"
    c.MODEL.DYHEAD.FUSE_CONFIG.JOINT_EMB_SIZE = 256
    c.MODEL.DYHEAD.FUSE_CONFIG.JOINT_EMB_DROPOUT = 0.1
    c.MODEL.DYHEAD.FUSE_CONFIG.ADD_LINEAR_LAYER = False
    c.MODEL.DYHEAD.FUSE_CONFIG.USE_DOT_PRODUCT_TOKEN_LOSS = True
    c.MODEL.DYHEAD.FUSE_CONFIG.USE_TOKEN_LOSS = False
    c.MODEL.DYHEAD.FUSE_CONFIG.USE_CLASSIFICATION_LOSS = False
    c.MODEL.DYHEAD.FUSE_CONFIG.USE_CONTRASTIVE_ALIGN_LOSS = False
    c.MODEL.DYHEAD.FUSE_CONFIG.CONTRASTIVE_HIDDEN_DIM = 64
    c.MODEL.DYHEAD.FUSE_CONFIG.USE_FUSED_FEATURES_DOT_PRODUCT = True
    c.MODEL.DYHEAD.FUSE_CONFIG.USE_LAYER_SCALE = True
    c.MODEL.DYHEAD.FUSE_CONFIG.SEPARATE_BIDIRECTIONAL = False
    c.MODEL.DYHEAD.FUSE_CONFIG.STABLE_SOFTMAX_2D = False
    c.MODEL.DYHEAD.FUSE_CONFIG.DO_LANG_PROJ_OUTSIDE_CHECKPOINT = False
    c.MODEL.DYHEAD.FUSE_CONFIG.MLM_LOSS = False
    c.MODEL.DYHEAD.FUSE_CONFIG.MLM_LOSS_COEF = 1.0
    c.MODEL.DYHEAD.FUSE_CONFIG.MLM_LOSS_FOR_ONLY_POSITIVES = True
    # fp16 clamps in the reference (fuse_helper.py:242-256) are unnecessary in
    # bf16; kept as no-op flags for config parity.
    c.MODEL.DYHEAD.FUSE_CONFIG.CLAMP_MIN_FOR_UNDERFLOW = True
    c.MODEL.DYHEAD.FUSE_CONFIG.CLAMP_MAX_FOR_OVERFLOW = True
    c.MODEL.DYHEAD.FUSE_CONFIG.CLAMP_BERTATTN_MIN_FOR_UNDERFLOW = True
    c.MODEL.DYHEAD.FUSE_CONFIG.CLAMP_BERTATTN_MAX_FOR_OVERFLOW = True
    c.MODEL.DYHEAD.FUSE_CONFIG.CLAMP_DOT_PRODUCT = True

    c.MODEL.ROI_BOX_HEAD = CfgNode()
    c.MODEL.ROI_BOX_HEAD.POOLER_RESOLUTION = 7
    c.MODEL.ROI_BOX_HEAD.POOLER_SCALES = (0.125, 0.0625, 0.03125, 0.015625, 0.0078125)
    c.MODEL.ROI_BOX_HEAD.POOLER_SAMPLING_RATIO = 0

    # ---- input pipeline --------------------------------------------------
    c.INPUT = CfgNode()
    c.INPUT.MIN_SIZE_TRAIN = 800
    c.INPUT.MAX_SIZE_TRAIN = 1333
    c.INPUT.MIN_SIZE_TEST = 800
    c.INPUT.MAX_SIZE_TEST = 1333
    c.INPUT.PIXEL_MEAN = (103.530, 116.280, 123.675)
    c.INPUT.PIXEL_STD = (57.375, 57.120, 58.395)
    c.INPUT.TO_BGR255 = True
    c.INPUT.FORMAT = ""
    c.INPUT.FIX_RES = False

    c.AUGMENT = CfgNode()
    c.AUGMENT.MULT_MIN_SIZE_TRAIN = ()
    c.AUGMENT.FLIP_PROB_TRAIN = 0.5
    c.AUGMENT.BRIGHTNESS = 0.0
    c.AUGMENT.CONTRAST = 0.0
    c.AUGMENT.SATURATION = 0.0
    c.AUGMENT.HUE = 0.0

    c.DATASETS = CfgNode()
    c.DATASETS.TRAIN = ()
    c.DATASETS.TEST = ()
    c.DATASETS.REGISTER = CfgNode()
    c.DATASETS.DATA_ROOT = "DATASET"
    c.DATASETS.FEW_SHOT = 0
    c.DATASETS.SHUFFLE_SEED = 0
    c.DATASETS.DISABLE_SHUFFLE = False
    c.DATASETS.RANDOM_SAMPLE_NEG = -1
    c.DATASETS.CONTROL_PROB = ()
    c.DATASETS.ADD_DET_PROMPT = False
    c.DATASETS.USE_OVERRIDE_CATEGORY = False
    c.DATASETS.SEPARATION_TOKENS = ". "
    c.DATASETS.EXCLUDE_CROWD = True
    c.DATASETS.MAX_BOX = -1
    c.DATASETS.ONE_HOT = False
    c.DATASETS.GENERAL_COPY = -1
    c.DATASETS.OVERRIDE_CATEGORY = ""
    c.DATASETS.CAPTION_PROMPT = ""
    c.DATASETS.PREDEFINED_TEXT = ""
    c.DATASETS.SPECIAL_SAFEGUARD_FOR_COCO_GROUNDING = False

    c.DATALOADER = CfgNode()
    c.DATALOADER.SIZE_DIVISIBILITY = 32
    c.DATALOADER.NUM_WORKERS = 0
    c.DATALOADER.ASPECT_RATIO_GROUPING = False

    # ---- solver ----------------------------------------------------------
    c.SOLVER = CfgNode()
    c.SOLVER.OPTIMIZER = "ADAMW"
    c.SOLVER.BASE_LR = 1e-4
    c.SOLVER.LANG_LR = 1e-5
    c.SOLVER.GATE_LR = 5e-3
    c.SOLVER.QUERY_LR = 1e-5
    c.SOLVER.BIAS_LR_FACTOR = 2.0
    c.SOLVER.WEIGHT_DECAY = 1e-4
    c.SOLVER.WEIGHT_DECAY_NORM_FACTOR = 1.0
    c.SOLVER.WEIGHT_DECAY_SCHEDULE = False
    c.SOLVER.WEIGHT_DECAY_SCHEDULE_RATIO = 0.667
    c.SOLVER.STEPS = (0.95,)
    c.SOLVER.MAX_ITER = 0
    c.SOLVER.MAX_EPOCH = 1
    c.SOLVER.IMS_PER_BATCH = 16
    c.SOLVER.WARMUP_ITERS = 2000
    c.SOLVER.WARMUP_FACTOR = 1e-3
    c.SOLVER.GAMMA = 0.1
    c.SOLVER.USE_AMP = True  # bf16 on TPU
    c.SOLVER.MODEL_EMA = 0.0
    c.SOLVER.CHECKPOINT_PERIOD = 99999999
    c.SOLVER.CHECKPOINT_PER_EPOCH = -1.0
    c.SOLVER.MAX_TO_KEEP = 4
    c.SOLVER.TEST_WITH_INFERENCE = False
    c.SOLVER.USE_AUTOSTEP = False
    c.SOLVER.AUTOTERMINATE_PATIENCE = -1
    c.SOLVER.MAX_NEG_PER_BATCH = 0.1
    c.SOLVER.SEED = 0
    c.SOLVER.TUNING_HIGHLEVEL_OVERRIDE = ""
    c.SOLVER.CLIP_GRADIENTS = CfgNode()
    c.SOLVER.CLIP_GRADIENTS.ENABLED = True
    c.SOLVER.CLIP_GRADIENTS.CLIP_TYPE = "full_model"
    c.SOLVER.CLIP_GRADIENTS.CLIP_VALUE = 1.0
    c.SOLVER.CLIP_GRADIENTS.NORM_TYPE = 2.0

    c.TEST = CfgNode()
    c.TEST.EVAL_TASK = "detection"
    c.TEST.IMS_PER_BATCH = 1
    c.TEST.DURING_TRAINING = False
    c.TEST.CHUNKED_EVALUATION = -1
    c.TEST.CHUNK_PARALLELISM = 4  # TPU addition: chunks batched per forward
    c.TEST.MDETR_STYLE_AGGREGATE_CLASS_NUM = -1
    c.TEST.EXPECTED_RESULTS = ()
    c.TEST.EXPECTED_RESULTS_SIGMA_TOL = 4
    c.TEST.USE_MULTISCALE = False
    # TTA knobs (box_aug.py im_detect_bbox_aug; defaults.py TEST block)
    c.TEST.SCALES = (400, 500, 600, 700, 900, 1000, 1100, 1200)
    c.TEST.RANGES = ()
    c.TEST.MAX_SIZE = 2000
    c.TEST.FLIP = True
    c.TEST.SPECIAL_NMS = "none"
    c.TEST.TH = 0.6
    c.TEST.PRE_NMS_TOP_N = 1000
    c.TEST.SELECT_CLASSES = ()
    # VOC AP protocol (evaluation/voc/voc_eval.py use_07_metric)
    c.TEST.VOC_USE_07_METRIC = False

    # ---- MQ-Det vision query block (reference: defaults.py:899-938) ------
    c.VISION_QUERY = CfgNode()
    c.VISION_QUERY.ENABLED = False
    c.VISION_QUERY.QUERY_BANK_PATH = ""
    c.VISION_QUERY.DATASET_NAME = ""
    c.VISION_QUERY.NUM_QUERY_PER_CLASS = 5
    c.VISION_QUERY.MAX_QUERY_NUMBER = 5000
    c.VISION_QUERY.MAX_TEST_QUERY_NUMBER = 100
    c.VISION_QUERY.SCORE_THRESHOLD = 0.6
    c.VISION_QUERY.NUM_TURNS = 1
    c.VISION_QUERY.TEXT_DROPOUT = 0.0
    c.VISION_QUERY.PURE_TEXT_RATE = 0.0
    c.VISION_QUERY.VISION_SCALE = 1.0
    c.VISION_QUERY.RANDOM_KSHOT = False
    c.VISION_QUERY.LEARNABLE_BANK = False
    c.VISION_QUERY.ADD_ADAPT_LAYER = False
    c.VISION_QUERY.ADD_VISION_LAYER = False
    c.VISION_QUERY.CONDITION_GATE = True
    c.VISION_QUERY.NONLINEAR_GATE = True
    c.VISION_QUERY.NO_CAT = True
    c.VISION_QUERY.SHARE_KV = False
    c.VISION_QUERY.FIX_ATTN_GATE = -1.0
    c.VISION_QUERY.START_QV_LAYER = 6
    c.VISION_QUERY.NUM_PRE_SELECT_LAYERS = 2
    c.VISION_QUERY.EXPAND_RATIO = 1.5
    c.VISION_QUERY.SELECT_FPN_LEVEL = True
    c.VISION_QUERY.QUERY_FUSION = False
    c.VISION_QUERY.GATE_REGULARIZATION = False
    c.VISION_QUERY.GATE_REGULARIZATION_SCALE = 1.0
    c.VISION_QUERY.RETURN_ATTN_GATE_VALUE = False
    c.VISION_QUERY.MASK_DURING_INFERENCE = False
    c.VISION_QUERY.NEW_MASK_TOKEN = False
    c.VISION_QUERY.AUGMENT_IMAGE_WITH_QUERY = False
    c.VISION_QUERY.DEBUG = False
    c.VISION_QUERY.QUERY_BANK_SAVE_PATH = ""
    c.VISION_QUERY.QUERY_ADDITION_NUM = 5
    c.VISION_QUERY.ONLINE_UPDATE = False
    # TPU fixed-shape ABI
    c.VISION_QUERY.MAX_CLASSES_PER_PROMPT = 40   # chunk size (labels per fwd)
    c.VISION_QUERY.NUM_SCALES = 1                # scales per bank entry

    # ---- GroundingDINO block (reference: defaults.py:944-1001) -----------
    c.GROUNDINGDINO = CfgNode()
    c.GROUNDINGDINO.enabled = False
    c.GROUNDINGDINO.hidden_dim = 256
    c.GROUNDINGDINO.num_queries = 900
    c.GROUNDINGDINO.nheads = 8
    c.GROUNDINGDINO.dim_feedforward = 2048
    c.GROUNDINGDINO.enc_layers = 6
    c.GROUNDINGDINO.dec_layers = 6
    c.GROUNDINGDINO.num_feature_levels = 4
    c.GROUNDINGDINO.enc_n_points = 4
    c.GROUNDINGDINO.dec_n_points = 4
    c.GROUNDINGDINO.two_stage_type = "standard"
    c.GROUNDINGDINO.max_text_len = 256
    c.GROUNDINGDINO.box_threshold = 0.05
    c.GROUNDINGDINO.dn_number = 0
    c.GROUNDINGDINO.query_dim = 4
    c.GROUNDINGDINO.fusion_droppath = 0.1
    # criterion weights (defaults.py:992-1001)
    c.GROUNDINGDINO.loss_ce_coef = 2.0
    c.GROUNDINGDINO.loss_bbox_coef = 5.0
    c.GROUNDINGDINO.loss_giou_coef = 2.0
    c.GROUNDINGDINO.matcher = CfgNode()
    c.GROUNDINGDINO.matcher.matcher_type = "HungarianMatcher"
    c.GROUNDINGDINO.matcher.set_cost_class = 1.0
    c.GROUNDINGDINO.matcher.set_cost_bbox = 5.0
    c.GROUNDINGDINO.matcher.set_cost_giou = 2.0
    c.GROUNDINGDINO.matcher.focal_alpha = 0.25

    # ---- TPU-specific runtime knobs ---------------------------------------
    c.TPU = CfgNode()
    c.TPU.MESH_SHAPE = (-1,)          # -1 = all devices, 1-D data mesh
    c.TPU.MESH_AXIS_NAMES = ("data",)
    c.TPU.COMPUTE_DTYPE = "bfloat16"
    c.TPU.PARAM_DTYPE = "float32"
    c.TPU.IMAGE_BUCKETS = ((800, 1344),)  # static (H, W) eval buckets
    c.TPU.MAX_DETECTIONS_PRE_NMS = 1000
    c.TPU.REMAT = False
    # DCNv2 window/Pallas paths clip sampling offsets to [-R, R] around each
    # tap (exact when |offset| <= R). utils/calibrate.py measures the actual
    # offset range of a loaded checkpoint and raises this (or falls back to
    # the exact gather impl) when the clip would bite.
    c.TPU.DEFORM_RADIUS = 2
    # offset handling when DyConv applies level-L offsets to level L±1 convs:
    # "strided" = the reference CUDA kernel's flat-buffer reinterpretation
    # (what released checkpoints were trained with); "resample" = bilinear
    # offset-field resampling (cleaner; off-reference)
    c.TPU.DEFORM_OFFSET_COMPAT = "strided"

    # GLIPKNOW knowledge-augmented prompts (defaults.py:887-894)
    c.GLIPKNOW = CfgNode()
    c.GLIPKNOW.KNOWLEDGE_FILE = ""
    c.GLIPKNOW.KNOWLEDGE_TYPE = ""
    c.GLIPKNOW.MAX_NUM_CLASSES_PER_BATCH_TRAIN = -1
    c.GLIPKNOW.PARALLEL_LANGUAGE_INPUT = False
    c.GLIPKNOW.LAN_FEATURE_AGG_TYPE = "first"
    c.GLIPKNOW.GPT3_NUM = 5
    c.GLIPKNOW.WIKI_AND_GPT3 = False

    c.OUTPUT_DIR = "OUTPUT"
    return c


# --- named high-level tuning recipes (mirrors tuning_highlevel_override) ---
# Each recipe returns (trainable_patterns, overrides). A parameter is
# trainable iff any pattern is a substring of its flattened path.
# Pattern vocabulary (flattened param paths): "backbone" (Swin), "fpn",
# "rpn" (VLDyHead incl. fusion + heads), "language_backbone" (BERT + GCP),
# "qv_layer"/"pre_select"/"attn_gate"/"ff_gate" (GCP pieces),
# "tunable_linear" (prompt layer), "query_bank" (learnable bank),
# head-linear-probe subset = final prediction convs.
_HEAD_PROBE = ["cls_logits", "bbox_pred", "centerness", "dot_product_projection"]
_GCP = ["qv_layer", "pre_select", "attn_gate", "ff_gate"]
TUNING_RECIPES: Dict[str, List[str]] = {
    # full finetuning (reference tools/finetune.py:320-326)
    "full": [""],
    # modulated pre-training: the reference combines the "vision_query"
    # recipe (freeze backbone+FPN, :345-351) with train_net.py:67-82's
    # freeze-all-but-GCP when VISION_QUERY.ENABLED — effective trainables
    # are the GCP pieces only
    "vision_query": _GCP,
    # frozen image tower, everything else trains (:327-337, :353-360)
    "full_with_vs": ["rpn", "language_backbone"],
    "full_frozen_image": ["rpn", "language_backbone"],
    # full finetune but vision queries disabled (:338-344)
    "full_vs": [""],
    # only GCP cross-attention (+ selector bank) (:361-369)
    "vision_query_v2": _GCP,
    # v2 + prompt-tuning linear (:370-378) — the ODinW few-shot default
    "vision_query_v3": _GCP + ["tunable_linear"],
    # v3 semantics with prompt-weight init (:389-397)
    "vision_query_v4": _GCP + ["tunable_linear"],
    # v3 + learnable query bank (:379-388)
    "vision_query_v5": _GCP + ["tunable_linear", "query_bank"],
    # learnable bank only (:398-406)
    "query_prompt": ["query_bank"],
    # extra vision layer only (:407-416)
    "query_prompt_v2": ["vision_layer"],
    # head linear probe (:417-425)
    "linear_prob": _HEAD_PROBE,
    # adapter layers (:426-435)
    "adapter": ["adapter"],
    # learnable bank + prompt linear, rest frozen (:436-442)
    "vision_language_prompt": ["query_bank", "tunable_linear"],
    # language-prompt family (:443-476)
    "language_prompt_v1": ["language_backbone"],
    "language_prompt_v2": ["tunable_linear"],
    "language_prompt_v3": _HEAD_PROBE + ["language_backbone"],
    "language_prompt_v4": _HEAD_PROBE + ["tunable_linear"],
    "language_prompt_v5": ["tunable_linear", "language_backbone"],
}


def trainable_patterns(cfg: CfgNode) -> List[str]:
    name = cfg.SOLVER.TUNING_HIGHLEVEL_OVERRIDE
    if not name:
        return [""]
    if name not in TUNING_RECIPES:
        raise KeyError(f"Unknown tuning recipe {name!r}; known: {list(TUNING_RECIPES)}")
    return TUNING_RECIPES[name]


def frozen_patterns(cfg: CfgNode) -> List[str]:
    """Explicit freeze flags (applied on top of the tuning recipe):
    MODEL.BACKBONE.FREEZE / FREEZE_CONV_BODY_AT (reference
    modeling/backbone freezing) and MODEL.LANGUAGE_BACKBONE.FREEZE
    (bert_model_new.py requires_grad gating)."""
    out: List[str] = []
    if cfg.MODEL.BACKBONE.FREEZE or cfg.MODEL.BACKBONE.FREEZE_CONV_BODY_AT == 0:
        out.append("backbone/")
    elif cfg.MODEL.BACKBONE.FREEZE_CONV_BODY_AT > 0:
        # freeze patch embed + the first FREEZE_CONV_BODY_AT-1 stages
        out.append("backbone/patch_embed")
        for i in range(cfg.MODEL.BACKBONE.FREEZE_CONV_BODY_AT - 1):
            out.append(f"backbone/layers_{i}")
    if cfg.MODEL.LANGUAGE_BACKBONE.FREEZE:
        out.append("language_backbone/")
    return out
