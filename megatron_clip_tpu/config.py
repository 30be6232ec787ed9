"""Structured configuration for models and parallelism.

Replaces the reference's three config systems (megatron argparse ~190 flags,
`TransformerConfig` dataclasses, open_CLIP JSON model registry — reference:
megatron/arguments.py:20-1474, megatron/core/transformer/transformer_config.py,
open_CLIP/src/open_clip/factory.py:33-84) with plain dataclasses. The JSON
model-config registry format is preserved (see factory.py).
"""
import dataclasses
from dataclasses import dataclass, field
from typing import Optional, Tuple

import jax.numpy as jnp


def _dtype(name: str):
    return {"float32": jnp.float32, "bfloat16": jnp.bfloat16, "float16": jnp.float16}[name]


@dataclass(frozen=True)
class Precision:
    """Mixed-precision policy. Params live in `param_dtype`; matmuls/activations
    run in `compute_dtype`; layernorm/softmax/losses are computed in fp32.

    The reference's fp16 + dynamic loss scaling (megatron/optimizer/grad_scaler.py)
    is unnecessary on TPU: bf16 has fp32 range, so `bf16` compute with fp32 params
    is the default production policy.
    """

    param_dtype: str = "float32"
    compute_dtype: str = "bfloat16"

    @property
    def param_jnp(self):
        return _dtype(self.param_dtype)

    @property
    def compute_jnp(self):
        return _dtype(self.compute_dtype)


FP32 = Precision(param_dtype="float32", compute_dtype="float32")
BF16 = Precision(param_dtype="float32", compute_dtype="bfloat16")


@dataclass(frozen=True)
class TransformerCfg:
    """Shared transformer-stack hyperparameters (one tower).

    Mirrors the knobs of open_CLIP's Transformer (open_CLIP transformer.py:190-286)
    plus the Megatron execution knobs that matter on TPU.
    """

    layers: int
    width: int
    heads: int
    mlp_ratio: float = 4.0
    ls_init_value: Optional[float] = None  # layer-scale init (open_CLIP ls_init_value)
    act: str = "gelu"  # gelu | quick_gelu | swiglu
    norm: str = "layernorm"  # layernorm | rmsnorm (megatron --normalization)
    use_bias: bool = True    # linear biases (megatron --disable-bias-linear)
    rope: bool = False       # rotary embeddings (megatron --use-rotary-position-embeddings)
    rope_theta: float = 10000.0
    rotary_percent: float = 1.0  # rotate only the first D*percent channels
                                 # (megatron --rotary-percent)
    rope_interpolation: Optional[float] = None  # divide positions (megatron
                                 # --rotary-seq-len-interpolation-factor)
    kv_heads: Optional[int] = None  # grouped-query attention (megatron --group-query-attention)
    kv_channels: Optional[int] = None  # per-head projection dim when it is
                                 # not width/heads (megatron --kv-channels,
                                 # arguments.py kv-channels default
                                 # hidden_size // num_attention_heads)
    num_experts: int = 0     # >0: SwitchMLP MoE (megatron --num-experts)
    moe_capacity_factor: float = 1.25
    moe_router: str = "sinkhorn"  # sinkhorn (megatron) | top1 (switch)
    train: bool = False      # True only inside training loss fns: sinkhorn
                             # routing is batch-dependent, so eval/serving
                             # must use per-token argmax like megatron's
                             # not-self.training branch (switch_mlp.py)
    sequence_parallel: bool = False  # shard activations on seq over tensor axis
    context_parallel: bool = False   # shard seq over the `context` mesh axis;
                                     # attention runs as a ppermute ring
                                     # (ops/ring_attention.py)
    context_parallel_layout: str = "contiguous"  # contiguous | zigzag
    # dropout (megatron --attention-dropout / --hidden-dropout, default 0.1
    # there; 0 here because CLIP trains without dropout). Active only when an
    # rng key is threaded into apply_transformer (training), never in eval.
    attention_dropout: float = 0.0
    hidden_dropout: float = 0.0
    # quantized matmuls (the TPU answer to the reference's optional
    # TransformerEngine fp8 path — int8 is what the MXU accelerates;
    # ops/quant.py). "int8" runs the MLP GEMMs as int8 x int8 -> int32
    # with straight-through-estimator backward.
    quantize: str = "none"  # none | int8
    # weight init: None = the open_CLIP width-derived scheme; a float =
    # megatron --init-method-std (inputs at std, residual outputs at
    # std/sqrt(2L) — model/utils.py scaled_init_method)
    init_std: Optional[float] = None
    # execution knobs
    remat: str = "none"  # none | full | selective  (megatron --recompute-granularity)
    use_flash: bool = True  # Pallas flash attention when on TPU
    scan_layers: bool = True  # stack layer params & lax.scan (fast compile, PP-friendly)

    @property
    def head_dim(self) -> int:
        if self.kv_channels is not None:
            return self.kv_channels
        assert self.width % self.heads == 0
        return self.width // self.heads

    @property
    def mlp_hidden(self) -> int:
        return int(round(self.width * self.mlp_ratio))


@dataclass(frozen=True)
class VisionCfg:
    """Vision tower config. Field names match open_CLIP's CLIPVisionCfg
    (open_CLIP/src/open_clip/model.py:24-47) so JSON configs load directly."""

    layers: int = 12
    width: int = 768
    head_width: int = 64
    mlp_ratio: float = 4.0
    patch_size: int = 16
    image_size: int = 224
    ls_init_value: Optional[float] = None
    patch_dropout: float = 0.0
    attentional_pool: bool = False
    attn_pooler_queries: int = 256
    attn_pooler_heads: int = 8
    no_ln_pre: bool = False
    pool_type: str = "tok"  # tok | avg | none
    # BEiT-style learned relative-position attention bias instead of the
    # absolute position embedding (timm vit_relpos_* family; reference zoo
    # config vit_relpos_medium_patch16_cls_224.json via timm_model.py)
    rel_pos_bias: bool = False
    final_ln_after_pool: bool = False
    output_tokens: bool = False

    @property
    def heads(self) -> int:
        return self.width // self.head_width

    @property
    def grid(self) -> int:
        assert self.image_size % self.patch_size == 0
        return self.image_size // self.patch_size

    @property
    def num_patches(self) -> int:
        return self.grid * self.grid

    @property
    def seq_len(self) -> int:
        # +1 class token
        return self.num_patches + 1

    def transformer(self, **overrides) -> TransformerCfg:
        return TransformerCfg(
            layers=self.layers, width=self.width, heads=self.heads,
            mlp_ratio=self.mlp_ratio, ls_init_value=self.ls_init_value, **overrides,
        )


@dataclass(frozen=True)
class TextCfg:
    """Text tower config, field-compatible with open_CLIP's CLIPTextCfg
    (open_CLIP/src/open_clip/model.py:49-66)."""

    context_length: int = 77
    vocab_size: int = 49408
    width: int = 512
    heads: int = 8
    layers: int = 12
    mlp_ratio: float = 4.0
    ls_init_value: Optional[float] = None
    embed_cls: bool = False
    no_causal_mask: bool = False
    pad_id: int = 0
    pool_type: str = "argmax"  # argmax (EOT) | last | first | none
    proj_bias: bool = False

    def transformer(self, **overrides) -> TransformerCfg:
        return TransformerCfg(
            layers=self.layers, width=self.width, heads=self.heads,
            mlp_ratio=self.mlp_ratio, ls_init_value=self.ls_init_value, **overrides,
        )


@dataclass(frozen=True)
class CLIPCfg:
    """Full two-tower model config (open_CLIP model_configs/*.json schema)."""

    embed_dim: int = 512
    vision: VisionCfg = field(default_factory=VisionCfg)
    text: TextCfg = field(default_factory=TextCfg)
    quick_gelu: bool = False  # OpenAI checkpoints use x*sigmoid(1.702x)
    resnet_layers: Optional[Tuple[int, ...]] = None  # ModifiedResNet when set
    resnet_width: int = 64
    # ConvNeXt tower (open_CLIP convnext_* configs use timm; here native —
    # models/convnext.py). Set to a timm model name, e.g. "convnext_base".
    convnext: Optional[str] = None
    convnext_proj: str = "linear"    # timm_proj: linear | mlp | none
    convnext_drop_path: float = 0.0  # timm_drop_path
    # Swin tower (open_CLIP swin_*_patchX_windowY_SZ configs use timm; here
    # native — models/swin.py). Set to the timm model name.
    swin: Optional[str] = None
    swin_proj: str = "linear"        # timm_proj: linear | mlp | none
    # HF text tower (open_CLIP text_cfg.hf_model_name -> HFTextEncoder;
    # here a native JAX BERT/RoBERTa encoder, models/hf_text.py). Holds
    # {model_name, pretrained, proj, pooler} — arch dims come from
    # `text` fields (random init) or the checkpoint config (pretrained).
    hf_text: Optional[dict] = None
    init_logit_scale: float = 2.659260036932778  # ln(1/0.07)
    init_logit_bias: Optional[float] = None  # SigLIP uses a learned bias
    # multimodal decoder (CoCa) — None for plain CLIP
    multimodal: Optional["MultimodalCfg"] = None

    @property
    def act(self) -> str:
        return "quick_gelu" if self.quick_gelu else "gelu"


@dataclass(frozen=True)
class MultimodalCfg:
    """CoCa multimodal text decoder (open_CLIP coca_model.py:31-60)."""

    context_length: int = 76
    width: int = 512
    heads: int = 8
    layers: int = 12
    mlp_ratio: float = 4.0
    dim_head: int = 64
    ls_init_value: Optional[float] = None
    attn_pooler_queries: int = 256
    attn_pooler_heads: int = 8


@dataclass(frozen=True)
class ParallelCfg:
    """Mesh layout for one tower/model.

    Replaces megatron/core/parallel_state.py's process-group bookkeeping: the
    reference's TP/PP/DP/EP groups become named mesh axes; the fork's
    branch-parallel `extra_world_size`/`xtp`/`xpp` (arguments.py:1114-1123,
    parallel_state.py:99-241) becomes two disjoint sub-meshes with independent
    ParallelCfg (see parallel/branch.py).
    """

    dp: int = 1            # data-parallel axis size (within one ICI slice)
    fsdp: int = 1          # optimizer/param shard axis (ZeRO-1/3 analogue)
    tp: int = 1            # tensor-parallel axis size
    pp: int = 1            # pipeline-parallel stage count
    vpp: int = 1           # virtual pipeline chunks per stage (interleaved)
    cp: int = 1            # context-parallel axis (ring attention over seq;
                           # completes megatron's --context-parallel-size,
                           # which is plumbing-only in the reference)
    dcn_dp: int = 1        # data parallelism ACROSS slices/pods (DCN): the
                           # outer-major blocks of the `data` axis, laid out
                           # slice-contiguous so only grad all-reduce crosses
                           # the data-center network while tp/pp/cp/fsdp
                           # collectives stay on ICI (the reference's
                           # inter-node DP over IB, here via
                           # mesh_utils.create_hybrid_device_mesh)
    microbatches: int = 1  # pipeline microbatches per step
    sequence_parallel: bool = False  # shard activations on seq within tp group
    # NOTE: there is intentionally no separate expert-parallel axis — MoE
    # expert weights shard over the fsdp axis (ops/moe.py expert specs),
    # which is megatron's data-modulo-expert grouping done as sharding.

    @property
    def num_devices(self) -> int:
        return (self.dp * self.fsdp * self.tp * self.pp * self.cp
                * self.dcn_dp)

    def validate(self) -> None:
        for k in ("dp", "fsdp", "tp", "pp", "cp", "microbatches", "dcn_dp"):
            v = getattr(self, k)
            if v < 1:
                raise ValueError(f"ParallelCfg.{k} must be >= 1, got {v}")
        if self.pp > 1 and self.microbatches % self.pp != 0:
            # GPipe-style schedule wants microbatches divisible by stages for
            # clean bubbles; we allow !=0 but warn at mesh build.
            pass
        if self.sequence_parallel and self.tp == 1:
            raise ValueError("sequence_parallel requires tp > 1 "
                             "(reference: megatron/arguments.py:340-344)")


@dataclass(frozen=True)
class BranchParallelCfg:
    """The fork's signature capability: the global device set is split into a
    main branch (vision tower) and an extra branch (text tower), each with its
    own parallel layout (reference: megatron/core/parallel_state.py:99-241,
    pretrain_CLIP.py:50-66)."""

    vision: ParallelCfg = field(default_factory=ParallelCfg)
    text: Optional[ParallelCfg] = None  # None => no extra branch; both towers share one mesh

    @property
    def extra_world_size(self) -> int:
        return 0 if self.text is None else self.text.num_devices

    @property
    def num_devices(self) -> int:
        return self.vision.num_devices + self.extra_world_size


def cfg_to_dict(cfg) -> dict:
    return dataclasses.asdict(cfg)
