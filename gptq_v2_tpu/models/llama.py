"""Functional Llama-family decoder in pure JAX.

The TPU-native replacement for the reference's use of HF
``LlamaForCausalLM`` (reference: ``llama.py:14-17``): parameters are a plain
pytree of arrays, every forward is a pure jittable function, and the decoder
block exposes *capture points* at each linear's input so the quantization
driver can read stage activations without the reference's
Catcher/RecorderWrapper exception machinery (``model_utils.py:69-109``).

Weight layout: linear weights are stored ``(in_features, out_features)`` so
the forward pass is a plain ``x @ W`` (HF stores the transpose).  Parameter
names mirror HF module paths (``self_attn.q_proj`` …) so loader mapping and
per-layer metric names (``model.layers.{i}.self_attn.q_proj``) line up with
the reference's logs.

Numerics match HF Llama: RMSNorm in fp32 then cast, rotary embeddings
computed in fp32, attention softmax in fp32 — so perplexity parity with the
reference evaluation protocol (``llama.py:207-247``) holds.
"""
from __future__ import annotations

import dataclasses
import json
import math
from pathlib import Path
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]

# Linear layers inside one decoder block, in HF naming.
ATTN_LINEARS = ("self_attn.q_proj", "self_attn.k_proj", "self_attn.v_proj",
                "self_attn.o_proj")
MLP_LINEARS = ("mlp.gate_proj", "mlp.up_proj", "mlp.down_proj")
BLOCK_LINEARS = ATTN_LINEARS + MLP_LINEARS

# 2-D block params that are never quantized (the MoE router is a tiny
# (D, E) classifier — quantizing it would perturb routing decisions for a
# negligible memory win; HF GPTQ integrations skip it for the same reason).
NON_QUANTIZED_LINEARS = ("mlp.router",)


@dataclasses.dataclass(frozen=True)
class LlamaConfig:
    """Config for the Llama *family*: Llama-1/2/3, Mistral (same math plus a
    sliding attention window), Qwen2/2.5 (QKV biases), and Gemma-2
    (sandwich norms, unit-offset RMSNorm, GeGLU, logit softcapping,
    alternating sliding/global attention).  One functional decoder serves
    them all — the HF classes differ only in these switches."""

    vocab_size: int = 32000
    hidden_size: int = 4096
    intermediate_size: int = 11008
    num_hidden_layers: int = 32
    num_attention_heads: int = 32
    num_key_value_heads: int = 32
    head_dim: Optional[int] = None
    max_position_embeddings: int = 4096
    rope_theta: float = 10000.0
    rms_norm_eps: float = 1e-5
    tie_word_embeddings: bool = False
    dtype: str = "float16"
    # HF ``rope_scaling`` as a hashable tuple of (key, value) pairs
    # (the config doubles as a jit static arg / cache key); None = no
    # scaling.  Supported rope types: "linear", "llama3".
    rope_scaling: Optional[Tuple[Tuple[str, float], ...]] = None
    qkv_bias: bool = False  # Qwen2; HF llama `attention_bias` sets both
    o_bias: bool = False
    qk_norm: bool = False  # Qwen3/Gemma-3: head-dim RMSNorm on Q/K before rope
    # Phi-3: checkpoints store fused qkv_proj / gate_up_proj tensors; the
    # loader splits them into the standard per-projection names (row-exact:
    # GPTQ solves rows independently, so split == fused quantization)
    fused_qkv_gate_up: bool = False
    sliding_window: Optional[int] = None  # Mistral/Qwen2 local attention
    # --- Gemma-2 switches ---------------------------------------------------
    hidden_act: str = "silu"  # "silu" | "gelu_pytorch_tanh"
    norm_unit_offset: bool = False  # RMSNorm weight stored as (w - 1)
    sandwich_norms: bool = False  # post-attn + pre/post-FFN norms (4 total)
    embed_normalizer: bool = False  # hidden *= sqrt(D) after embedding
    attn_logit_softcap: Optional[float] = None  # tanh capping of attn scores
    final_logit_softcap: Optional[float] = None  # tanh capping of lm logits
    query_pre_attn_scalar: Optional[float] = None  # sm_scale = this**-0.5
    # per-layer attention kind ("sliding_attention" | "full_attention");
    # None = ``sliding_window`` (if set) applies to every layer (Mistral)
    layer_types: Optional[Tuple[str, ...]] = None
    # Gemma-3: sliding layers rotate with this base frequency (unscaled)
    # while full-attention layers use ``rope_theta`` (+ ``rope_scaling``)
    rope_local_base_freq: Optional[float] = None
    # SmolLM3/Llama-4-style NoPE: layer indices with NO rotary embedding
    nope_layers: Optional[Tuple[int, ...]] = None
    # GLM-4: rope covers only this fraction of head_dim (rest passes
    # through).  GLM's interleaved pairing is de-interleaved at load time
    # (a per-head permutation of q/k out-features — attention-invariant),
    # so the standard half-rotation applies to the rotary prefix.
    partial_rotary_factor: float = 1.0
    # GLM-4 checkpoints store a fused gate_up_proj ([gate | up] rows)
    fused_gate_up: bool = False
    # GLM-4 / Llama-4: the checkpoint's rope pairing is interleaved
    # (even/odd); the loader de-interleaves each head's rotary prefix of
    # q/k out-features once (attention-invariant permutation), so runtime
    # keeps the standard half-rotation convention
    rope_interleaved: bool = False
    # --- DeepSeek-V2/V3 Multi-head Latent Attention -------------------------
    # q via a low-rank bottleneck (q_a -> norm -> q_b; None = direct q_proj),
    # kv via a compressed latent (kv_a_proj_with_mqa = [c_kv | shared rope
    # key]); per head q/k = [nope | rope] with an MQA-shared rope key.
    mla: bool = False
    q_lora_rank: Optional[int] = None
    kv_lora_rank: int = 512
    qk_nope_head_dim: int = 128
    qk_rope_head_dim: int = 64
    v_head_dim: int = 128
    # --- OLMo-2 switches ----------------------------------------------------
    # post-norm-only block: NO input/pre-FFN norms; sublayer outputs are
    # normed before the residual add (HF Olmo2DecoderLayer)
    postnorm_only: bool = False
    # RMSNorm over ALL heads' features of the q/k projections, applied
    # BEFORE the head reshape (HF Olmo2Attention q_norm/k_norm)
    qk_norm_flat: bool = False
    # --- Mixture-of-Experts (Mixtral / Qwen3-MoE) ---------------------------
    moe_num_experts: int = 0  # 0 = dense MLP
    moe_top_k: int = 2
    moe_intermediate_size: Optional[int] = None  # None = intermediate_size
    moe_renorm: bool = True  # renormalize top-k routing weights to sum 1
    # HF checkpoint naming: Mixtral stores experts as
    # ``block_sparse_moe.experts.{e}.w1|w3|w2`` + router ``.gate``;
    # Qwen3-MoE uses ``mlp.experts.{e}.gate|up|down_proj`` + ``mlp.gate``
    moe_mixtral_names: bool = False
    # layer indices with a DENSE MLP in an otherwise-MoE model (DeepSeek
    # first_k_dense_replace, Qwen3-MoE mlp_only_layers/decoder_sparse_step)
    moe_dense_layers: Optional[Tuple[int, ...]] = None
    # DeepSeek-V3 routing: sigmoid scores + e_score_correction_bias for
    # EXPERT CHOICE only (combine weights use the unbiased scores),
    # group-limited top-k (n_group groups ranked by their top-2 biased
    # scores, topk_group kept), renorm, x routed_scaling_factor; plus
    # n_shared_experts always-on dense experts added to the routed output
    moe_sigmoid_routing: bool = False
    moe_n_group: int = 1
    moe_topk_group: int = 1
    moe_routed_scale: float = 1.0
    moe_shared_experts: int = 0
    # --- GPT-OSS switches ---------------------------------------------------
    # learned per-head attention-sink logits (dense-attention paths only)
    attn_sinks: bool = False
    # GPT-OSS MoE: biased linear router (softmax over the top-k), stacked
    # expert checkpoints with interleaved gate/up + per-expert biases, and
    # the clamped (up + 1) * gate * sigmoid(1.702 gate) GLU
    moe_gptoss: bool = False
    # --- Llama-4 switches ---------------------------------------------------
    # weightless L2 norm on q/k AFTER rope (HF Llama4TextL2Norm, eps 1e-6)
    qk_l2_norm: bool = False
    # temperature tuning on NoPE layers: q *= log1p(floor((pos+1)/floor))
    # * scale + 1 (HF Llama4TextAttention / arXiv 2501.19399)
    attn_temp_tuning: bool = False
    attn_floor_scale: float = 8192.0
    attn_scale_coef: float = 0.1
    # chunked attention on "chunked_attention" layers: query i attends only
    # keys in its own chunk of this size (AND causal) — unlike a sliding
    # window the boundary is absolute-position-aligned
    attn_chunk_size: Optional[int] = None
    # Llama-4 dense/shared-MLP width differs from the expert width
    # (intermediate_size_mlp vs intermediate_size); None = intermediate_size
    intermediate_size_dense: Optional[int] = None
    # Llama-4 MoE: top-k on logits, SIGMOID of the selected logits as
    # scores, routed INPUT scaled by the score (outputs sum unweighted),
    # plus one always-on shared expert; stacked [gate | up] checkpoints
    moe_llama4: bool = False
    # Llama-4 checkpoints name the MLP "feed_forward" (loader remap)
    llama4_names: bool = False
    # --- Granite switches ---------------------------------------------------
    # four scalar knobs (HF GraniteConfig "main diff with Llama" lines)
    embed_multiplier: Optional[float] = None  # embeds *= this
    residual_multiplier: Optional[float] = None  # x += sublayer * this
    attn_multiplier: Optional[float] = None  # sm_scale = this (direct)
    logits_divider: Optional[float] = None  # logits /= this

    @property
    def head_dim_(self) -> int:
        if self.mla:  # attention/cache head dim = [nope | rope] key width
            return self.qk_nope_head_dim + self.qk_rope_head_dim
        return self.head_dim or self.hidden_size // self.num_attention_heads

    @property
    def rope_dim_(self) -> int:
        """Rotated dims per head (= table width): MLA rotates only the
        shared rope key; GLM-4 a partial prefix; else the full head."""
        if self.mla:
            return self.qk_rope_head_dim
        return int(self.head_dim_ * self.partial_rotary_factor)

    @property
    def moe_intermediate_(self) -> int:
        return self.moe_intermediate_size or self.intermediate_size

    @property
    def jdtype(self):
        return jnp.dtype(self.dtype)

    @property
    def sm_scale_(self) -> float:
        """Attention score scale (Gemma-2 overrides 1/sqrt(head_dim);
        Granite sets it directly)."""
        if self.attn_multiplier is not None:
            return self.attn_multiplier
        if self.query_pre_attn_scalar is not None:
            return self.query_pre_attn_scalar ** -0.5
        return 1.0 / math.sqrt(self.head_dim_)

    def layer_is_moe(self, layer_idx: int) -> bool:
        """Whether this layer's MLP is the sparse-MoE block."""
        if not self.moe_num_experts:
            return False
        return (self.moe_dense_layers is None
                or layer_idx not in self.moe_dense_layers)

    def layer_qk_l2(self, layer_idx: int) -> bool:
        """Llama-4 applies the weightless QK L2 norm on ROPE layers only
        (HF: ``use_qk_norm and use_rope``)."""
        if not self.qk_l2_norm:
            return False
        return not (self.nope_layers and layer_idx in self.nope_layers)

    def layer_chunk(self, layer_idx: int) -> Optional[int]:
        """Llama-4 chunked-attention size for one layer (None = not
        chunked)."""
        if self.attn_chunk_size is None or self.layer_types is None:
            return None
        return (self.attn_chunk_size
                if self.layer_types[layer_idx] == "chunked_attention"
                else None)

    def layer_window(self, layer_idx: int) -> Optional[int]:
        """Sliding window for one layer (None = global attention)."""
        if self.sliding_window is None:
            return None
        if self.layer_types is None:
            return self.sliding_window
        lt = self.layer_types[layer_idx]
        return self.sliding_window if lt == "sliding_attention" else None

    @property
    def num_ropes(self) -> int:
        """1 + a local table (Gemma-3) + a NoPE identity table (SmolLM3)."""
        n = 1 + (self.rope_local_base_freq is not None)
        return n + bool(self.nope_layers)

    def layer_rope(self, layer_idx: int) -> int:
        """Index into :func:`rope_tables` for one layer: 0 = global
        (``rope_theta`` + scaling), then local (Gemma-3 sliding layers),
        then the NoPE identity (SmolLM3 no-rope layers)."""
        if self.nope_layers and layer_idx in self.nope_layers:
            return 1 + (self.rope_local_base_freq is not None)
        if self.rope_local_base_freq is None:
            return 0
        return 1 if self.layer_window(layer_idx) is not None else 0

    @classmethod
    def from_hf_dict(cls, d: dict) -> "LlamaConfig":
        model_type = d.get("model_type", "llama")
        if model_type in ("gemma3", "llama4") and "text_config" in d:
            # multimodal wrapper config: serve the text tower
            inner = dict(d["text_config"])
            inner.setdefault("torch_dtype", d.get("torch_dtype")
                             or d.get("dtype") or "float16")
            return cls.from_hf_dict(inner)
        if model_type == "llama4" and "text_config" not in d:
            model_type = "llama4_text"  # already the text tower
        if model_type not in ("llama", "mistral", "qwen2", "qwen3", "gemma2",
                              "gemma3_text", "phi3", "mixtral", "qwen3_moe",
                              "smollm3", "olmo2", "glm4", "deepseek_v3",
                              "gpt_oss", "llama4_text", "granite"):
            raise NotImplementedError(f"model_type {model_type!r}")
        # Mixture-of-Experts switches (Mixtral / Qwen3-MoE)
        moe_experts, moe_top_k, moe_inter, moe_renorm = 0, 2, None, True
        moe_dense = None
        if model_type == "mixtral":
            moe_experts = d["num_local_experts"]
            moe_top_k = d["num_experts_per_tok"]
        elif model_type == "gpt_oss":
            moe_experts = d["num_local_experts"]
            moe_top_k = d["num_experts_per_tok"]
            # router: biased linear, softmax over the top-k values — equal
            # to softmax-then-renormalize, i.e. moe_renorm semantics
        elif model_type == "llama4_text" and d.get("num_local_experts"):
            moe_experts = d["num_local_experts"]
            moe_top_k = d["num_experts_per_tok"]
            moe_inter = d["intermediate_size"]  # expert width; the dense
            # and shared MLPs use intermediate_size_mlp / intermediate_size
            ml = d.get("moe_layers")
            if ml is None:
                step = d.get("interleave_moe_layer_step", 1)
                ml = list(range(step - 1, d["num_hidden_layers"], step))
            dense = tuple(i for i in range(d["num_hidden_layers"])
                          if i not in set(ml))
            moe_dense = dense or None
        elif model_type == "qwen3_moe":
            moe_experts = d["num_experts"]
            moe_top_k = d["num_experts_per_tok"]
            moe_inter = d.get("moe_intermediate_size")
            moe_renorm = d.get("norm_topk_prob", True)
            # HF Qwen3MoeDecoderLayer: MoE iff layer not in mlp_only_layers
            # AND (layer + 1) % decoder_sparse_step == 0
            only = set(d.get("mlp_only_layers") or ())
            step = d.get("decoder_sparse_step", 1)
            dense = tuple(i for i in range(d["num_hidden_layers"])
                          if i in only or (i + 1) % step)
            moe_dense = dense or None
        # transformers >=4.56 writes the checkpoint dtype under "dtype";
        # older checkpoints use "torch_dtype"
        dtype = d.get("torch_dtype") or d.get("dtype") or "float16"
        rs = d.get("rope_scaling")
        rope_scaling = None
        if rs is not None:
            rope_type = rs.get("rope_type", rs.get("type", "default"))
            if rope_type != "default":
                if rope_type not in ("linear", "llama3", "yarn"):
                    raise NotImplementedError(f"rope_scaling type {rope_type!r}")
                norm = {k: (v if isinstance(v, str) else float(v))
                        for k, v in rs.items()
                        if k != "type" and v is not None}
                norm["rope_type"] = rope_type
                rope_scaling = tuple(sorted(norm.items()))
        # HF LlamaConfig.attention_bias covers q/k/v/o; Qwen2 hard-codes
        # bias=True on q/k/v and bias=False on o (HF Qwen2Attention)
        glm4 = model_type == "glm4"
        mla = model_type == "deepseek_v3"
        ds_moe = False
        if mla:
            if not d.get("rope_interleave", True):
                raise NotImplementedError(
                    "deepseek_v3 with rope_interleave=False")
            first_dense = d.get("first_k_dense_replace", 0)
            ds_moe = bool(d.get("n_routed_experts")) and \
                first_dense < d["num_hidden_layers"]
            if ds_moe:
                moe_experts = d["n_routed_experts"]
                moe_top_k = d["num_experts_per_tok"]
                moe_inter = d.get("moe_intermediate_size")
                moe_renorm = d.get("norm_topk_prob", True)
                moe_dense = tuple(range(first_dense)) or None
        attention_bias = d.get("attention_bias", False)
        qkv_bias = attention_bias or model_type == "qwen2"
        sliding = d.get("sliding_window")
        if model_type in ("qwen2", "qwen3", "qwen3_moe", "smollm3") and not \
                d.get("use_sliding_window", False):
            sliding = None  # these families gate the window behind a flag
        llama4 = model_type == "llama4_text"
        nope_layers = None
        if llama4:
            nr = d.get("no_rope_layers")  # 1 = rope ON, 0 = NoPE
            if nr:
                nope_layers = tuple(i for i, v in enumerate(nr)
                                    if not v) or None
        if model_type == "smollm3":
            # HF no_rope_layers: 1 = rope ON for that layer, 0 = NoPE
            nr = d.get("no_rope_layers")
            if nr is None:
                iv = d.get("no_rope_layer_interval", 4)
                nr = [int(bool((i + 1) % iv))
                      for i in range(d["num_hidden_layers"])]
            nope_layers = tuple(i for i, v in enumerate(nr) if not v) or None
        gemma2 = model_type == "gemma2"
        gemma3 = model_type == "gemma3_text"
        gemma = gemma2 or gemma3
        layer_types = d.get("layer_types")
        if layer_types is None and gemma2:
            # HF Gemma2Config default: even layers sliding, odd global
            layer_types = tuple(
                "sliding_attention" if (i + 1) % 2 else "full_attention"
                for i in range(d["num_hidden_layers"]))
        if layer_types is None and gemma3:
            # HF Gemma3TextConfig default: every 6th layer global
            pat = d.get("sliding_window_pattern",
                        d.get("_sliding_window_pattern", 6))
            layer_types = tuple(
                "sliding_attention" if (i + 1) % pat else "full_attention"
                for i in range(d["num_hidden_layers"]))
        return cls(
            vocab_size=d["vocab_size"],
            hidden_size=d["hidden_size"],
            intermediate_size=d["intermediate_size"],
            num_hidden_layers=d["num_hidden_layers"],
            num_attention_heads=d["num_attention_heads"],
            # MLA broadcasts the shared latent to every head — KV-head
            # count is vestigial in DeepSeek configs; force = heads
            num_key_value_heads=d["num_attention_heads"] if mla
            else d.get("num_key_value_heads", d["num_attention_heads"]),
            head_dim=d.get("head_dim"),
            max_position_embeddings=d.get("max_position_embeddings", 4096),
            rope_theta=d.get("rope_theta", 10000.0),
            rms_norm_eps=d.get("rms_norm_eps", 1e-5),
            # HF Gemma2/3 configs *default* tie_word_embeddings=True, so
            # their absence from a config.json means tied
            tie_word_embeddings=d.get("tie_word_embeddings", gemma),
            dtype=dtype,
            rope_scaling=rope_scaling,
            qkv_bias=qkv_bias,
            # GLM-4 biases q/k/v but hard-codes bias=False on o_proj
            o_bias=attention_bias and not glm4,
            qk_norm=gemma3 or model_type in ("qwen3", "qwen3_moe"),
            fused_qkv_gate_up=model_type == "phi3",
            sliding_window=sliding,
            hidden_act=d.get("hidden_activation" if gemma else "hidden_act",
                             "gelu_pytorch_tanh" if gemma else "silu"),
            norm_unit_offset=gemma,
            # GLM-4's block is the Gemma sandwich with different weight
            # names (loader remaps); plain (non-offset) RMSNorm
            sandwich_norms=gemma or glm4,
            embed_normalizer=gemma,
            attn_logit_softcap=d.get("attn_logit_softcapping")
            if gemma else None,
            final_logit_softcap=d.get("final_logit_softcapping")
            if gemma else None,
            query_pre_attn_scalar=d.get("query_pre_attn_scalar")
            if gemma else None,
            layer_types=None if layer_types is None else tuple(layer_types),
            rope_local_base_freq=d.get("rope_local_base_freq")
            if gemma3 else None,
            nope_layers=nope_layers,
            postnorm_only=model_type == "olmo2",
            qk_norm_flat=model_type == "olmo2",
            partial_rotary_factor=d.get("partial_rotary_factor", 1.0)
            if glm4 else 1.0,
            fused_gate_up=glm4,
            rope_interleaved=glm4 or llama4,
            mla=mla,
            q_lora_rank=d.get("q_lora_rank") if mla else None,
            kv_lora_rank=d.get("kv_lora_rank", 512) if mla else 512,
            qk_nope_head_dim=d.get("qk_nope_head_dim", 128) if mla else 128,
            qk_rope_head_dim=d.get("qk_rope_head_dim", 64) if mla else 64,
            v_head_dim=d.get("v_head_dim", 128) if mla else 128,
            moe_num_experts=moe_experts,
            moe_top_k=moe_top_k,
            moe_intermediate_size=moe_inter,
            moe_renorm=moe_renorm,
            moe_mixtral_names=model_type == "mixtral",
            moe_dense_layers=moe_dense,
            moe_sigmoid_routing=ds_moe,
            attn_sinks=model_type == "gpt_oss",
            moe_gptoss=model_type == "gpt_oss",
            qk_l2_norm=llama4 and d.get("use_qk_norm", True),
            attn_temp_tuning=llama4 and d.get("attn_temperature_tuning",
                                              False),
            attn_floor_scale=d.get("floor_scale", 8192.0) or 8192.0,
            attn_scale_coef=d.get("attn_scale", 0.1) or 0.1,
            attn_chunk_size=d.get("attention_chunk_size") if llama4
            else None,
            intermediate_size_dense=d.get("intermediate_size_mlp")
            if llama4 else None,
            moe_llama4=llama4 and bool(d.get("num_local_experts")),
            llama4_names=llama4,
            embed_multiplier=d.get("embedding_multiplier")
            if model_type == "granite" else None,
            residual_multiplier=d.get("residual_multiplier")
            if model_type == "granite" else None,
            attn_multiplier=d.get("attention_multiplier")
            if model_type == "granite" else None,
            logits_divider=d.get("logits_scaling")
            if model_type == "granite" else None,
            moe_n_group=d.get("n_group", 1) if ds_moe else 1,
            moe_topk_group=d.get("topk_group", 1) if ds_moe else 1,
            moe_routed_scale=d.get("routed_scaling_factor", 1.0)
            if ds_moe else 1.0,
            moe_shared_experts=(d.get("n_shared_experts") or 0) if ds_moe
            else 1 if (llama4 and d.get("num_local_experts")) else 0,
        )

    @classmethod
    def from_hf_dir(cls, path) -> "LlamaConfig":
        with open(Path(path) / "config.json") as f:
            return cls.from_hf_dict(json.load(f))

    @classmethod
    def tiny(cls, **kw) -> "LlamaConfig":
        """Small config for tests; dims chosen to exercise GQA + grouping."""
        base = dict(
            vocab_size=256, hidden_size=64, intermediate_size=112,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            max_position_embeddings=128, rms_norm_eps=1e-5, dtype="float32",
        )
        base.update(kw)
        return cls(**base)


# ---------------------------------------------------------------------------
# Parameter initialization / structure
# ---------------------------------------------------------------------------


def layer_param_shapes(cfg: LlamaConfig,
                       layer_idx: Optional[int] = None) -> Dict[str, Tuple[int, ...]]:
    """Per-layer parameter shapes.  ``layer_idx=None`` assumes the model's
    dominant layer type (MoE when configured); pass the index for models
    with interleaved dense MLP layers (``cfg.layer_is_moe``)."""
    d, hd = cfg.hidden_size, cfg.head_dim_
    nq, nkv = cfg.num_attention_heads, cfg.num_key_value_heads
    i = cfg.intermediate_size_dense or cfg.intermediate_size
    shapes = {
        "input_layernorm": (d,),
        "self_attn.q_proj": (d, nq * hd),
        "self_attn.k_proj": (d, nkv * hd),
        "self_attn.v_proj": (d, nkv * hd),
        "self_attn.o_proj": (nq * hd, d),
        "post_attention_layernorm": (d,),
        "mlp.gate_proj": (d, i),
        "mlp.up_proj": (d, i),
        "mlp.down_proj": (i, d),
    }
    if cfg.mla:  # DeepSeek MLA replaces the q/k/v projections
        assert nq == nkv, "MLA shares one latent across all heads"
        qk_head = cfg.qk_nope_head_dim + cfg.qk_rope_head_dim
        for n in ("self_attn.q_proj", "self_attn.k_proj",
                  "self_attn.v_proj"):
            del shapes[n]
        if cfg.q_lora_rank:
            shapes["self_attn.q_a_proj"] = (d, cfg.q_lora_rank)
            shapes["self_attn.q_a_layernorm"] = (cfg.q_lora_rank,)
            shapes["self_attn.q_b_proj"] = (cfg.q_lora_rank, nq * qk_head)
        else:
            shapes["self_attn.q_proj"] = (d, nq * qk_head)
        shapes["self_attn.kv_a_proj_with_mqa"] = (
            d, cfg.kv_lora_rank + cfg.qk_rope_head_dim)
        shapes["self_attn.kv_a_layernorm"] = (cfg.kv_lora_rank,)
        shapes["self_attn.kv_b_proj"] = (
            cfg.kv_lora_rank, nq * (cfg.qk_nope_head_dim + cfg.v_head_dim))
        shapes["self_attn.o_proj"] = (nq * cfg.v_head_dim, d)
    if cfg.moe_num_experts and (layer_idx is None
                                or cfg.layer_is_moe(layer_idx)):
        # MoE: router + per-expert MLPs replace the dense MLP
        for n in MLP_LINEARS:
            del shapes[n]
        shapes["mlp.router"] = (d, cfg.moe_num_experts)
        if cfg.moe_sigmoid_routing:
            shapes["mlp.router_bias"] = (cfg.moe_num_experts,)
        if cfg.moe_gptoss:
            shapes["mlp.router.bias"] = (cfg.moe_num_experts,)
        mi = cfg.moe_intermediate_
        for e in range(cfg.moe_num_experts):
            shapes[f"mlp.experts.{e}.gate_proj"] = (d, mi)
            shapes[f"mlp.experts.{e}.up_proj"] = (d, mi)
            shapes[f"mlp.experts.{e}.down_proj"] = (mi, d)
            if cfg.moe_gptoss:  # per-expert biases
                shapes[f"mlp.experts.{e}.gate_proj.bias"] = (mi,)
                shapes[f"mlp.experts.{e}.up_proj.bias"] = (mi,)
                shapes[f"mlp.experts.{e}.down_proj.bias"] = (d,)
        if cfg.moe_shared_experts:
            si = mi * cfg.moe_shared_experts
            shapes["mlp.shared_experts.gate_proj"] = (d, si)
            shapes["mlp.shared_experts.up_proj"] = (d, si)
            shapes["mlp.shared_experts.down_proj"] = (si, d)
    if cfg.sandwich_norms:  # Gemma-2: 4 norms per block (HF names)
        shapes["pre_feedforward_layernorm"] = (d,)
        shapes["post_feedforward_layernorm"] = (d,)
    if cfg.postnorm_only:  # OLMo-2: only the two post-sublayer norms
        del shapes["input_layernorm"]
        shapes["post_feedforward_layernorm"] = (d,)
    if cfg.qk_norm:  # Qwen3: per-head-dim norms, shared across heads
        shapes["self_attn.q_norm"] = (hd,)
        shapes["self_attn.k_norm"] = (hd,)
    if cfg.attn_sinks:  # GPT-OSS: one learned sink logit per query head
        shapes["self_attn.sinks"] = (nq,)
    if cfg.qk_norm_flat:  # OLMo-2: norms over all heads' features
        shapes["self_attn.q_norm"] = (nq * hd,)
        shapes["self_attn.k_norm"] = (nkv * hd,)
    if cfg.qkv_bias:
        for n in ("self_attn.q_proj", "self_attn.k_proj", "self_attn.v_proj"):
            shapes[n + ".bias"] = (shapes[n][1],)
    if cfg.o_bias:
        shapes["self_attn.o_proj.bias"] = (d,)
    return shapes


def init_params(cfg: LlamaConfig, key: jax.Array) -> Params:
    """Random-init parameters (tests / benchmarking without checkpoints)."""
    dt = cfg.jdtype
    n_weights = 2 + sum(
        sum(len(s) == 2 for s in layer_param_shapes(cfg, i).values())
        for i in range(cfg.num_hidden_layers))
    keys = iter(jax.random.split(key, n_weights))

    def w(shape):
        scale = 1.0 / math.sqrt(shape[0])
        return (jax.random.normal(next(keys), shape, dtype=jnp.float32) * scale).astype(dt)

    # unit-offset norms (Gemma-2) store w-1: zeros == identity scale
    norm_init = jnp.zeros if cfg.norm_unit_offset else jnp.ones
    layers = []
    for i in range(cfg.num_hidden_layers):
        lp = {}
        for name, shape in layer_param_shapes(cfg, i).items():
            lp[name] = norm_init(shape, dtype=dt) if len(shape) == 1 else w(shape)
        layers.append(lp)
    embed = w((cfg.vocab_size, cfg.hidden_size))
    return {
        "embed_tokens": embed,
        "layers": layers,
        "norm": norm_init((cfg.hidden_size,), dtype=dt),
        "lm_head": embed.T if cfg.tie_word_embeddings else w((cfg.hidden_size, cfg.vocab_size)),
    }


# ---------------------------------------------------------------------------
# Building blocks
# ---------------------------------------------------------------------------


def rms_norm(x: jax.Array, weight: jax.Array, eps: float,
             unit_offset: bool = False) -> jax.Array:
    """RMSNorm.  ``unit_offset`` (Gemma-2) stores the weight as ``w - 1``
    and multiplies ``(1 + w)`` in fp32 before the cast (HF Gemma2RMSNorm);
    Llama multiplies the cast output by ``w`` in model dtype."""
    x32 = x.astype(jnp.float32)
    var = jnp.mean(x32 * x32, axis=-1, keepdims=True)
    normed = x32 * jax.lax.rsqrt(var + eps)
    if unit_offset:
        return (normed * (1.0 + weight.astype(jnp.float32))).astype(x.dtype)
    return weight * normed.astype(x.dtype)


def activation(cfg: LlamaConfig):
    """The MLP gate activation (SiLU for Llama, tanh-GELU for Gemma-2)."""
    if cfg.hidden_act == "silu":
        return jax.nn.silu
    if cfg.hidden_act in ("gelu_pytorch_tanh", "gelu_tanh"):
        return lambda x: jax.nn.gelu(x, approximate=True)
    raise NotImplementedError(f"hidden_act {cfg.hidden_act!r}")


def soft_cap(x: jax.Array, cap: Optional[float]) -> jax.Array:
    """Gemma-2 logit softcapping: ``cap * tanh(x / cap)`` (None = no-op)."""
    if cap is None:
        return x
    return jnp.tanh(x / cap) * cap


def _scaled_inv_freq(cfg: LlamaConfig, inv_freq: np.ndarray,
                     base: float) -> Tuple[np.ndarray, float]:
    """Apply HF ``rope_scaling``; returns ``(inv_freq, attention_factor)``
    (the factor multiplies the cos/sin tables — 1.0 except for yarn).

    ``linear`` divides all frequencies by the factor; ``llama3`` keeps
    high frequencies, divides low frequencies, and smoothly interpolates
    in between (HF ``_compute_llama3_parameters``); ``yarn`` blends
    interpolated and extrapolated frequencies over a correction ramp and
    scales attention by the mscale (HF ``_compute_yarn_parameters``).
    """
    if cfg.rope_scaling is None:
        return inv_freq, 1.0
    rs = dict(cfg.rope_scaling)
    factor = rs["factor"]
    if rs["rope_type"] == "linear":
        return inv_freq / factor, 1.0
    if rs["rope_type"] == "yarn":
        dim = 2 * len(inv_freq)
        orig_max = (rs.get("original_max_position_embeddings")
                    or cfg.max_position_embeddings)
        attn_factor = rs.get("attention_factor")

        def get_mscale(scale, m=1.0):
            return 0.1 * m * math.log(scale) + 1.0 if scale > 1 else 1.0

        if attn_factor is None:
            ms, msd = rs.get("mscale"), rs.get("mscale_all_dim")
            attn_factor = (get_mscale(factor, ms) / get_mscale(factor, msd)
                           if ms and msd else get_mscale(factor))
        beta_fast = rs.get("beta_fast") or 32.0
        beta_slow = rs.get("beta_slow") or 1.0

        def corr_dim(n_rot):
            return (dim * math.log(orig_max / (n_rot * 2 * math.pi))
                    / (2 * math.log(base)))

        low, high = corr_dim(beta_fast), corr_dim(beta_slow)
        if rs.get("truncate", 1.0):  # HF default True
            low, high = math.floor(low), math.ceil(high)
        low, high = max(low, 0), min(high, dim - 1)
        if low == high:
            high += 0.001
        ramp = np.clip((np.arange(dim // 2, dtype=np.float64) - low)
                       / (high - low), 0.0, 1.0)
        extrap_f = 1.0 - ramp
        scaled = (inv_freq / factor) * (1 - extrap_f) + inv_freq * extrap_f
        return scaled, float(attn_factor)
    # llama3
    orig_max = rs["original_max_position_embeddings"]
    low_f, high_f = rs["low_freq_factor"], rs["high_freq_factor"]
    low_wavelen = orig_max / low_f
    high_wavelen = orig_max / high_f
    wavelen = 2.0 * np.pi / inv_freq
    scaled = np.where(wavelen > low_wavelen, inv_freq / factor, inv_freq)
    smooth = (orig_max / wavelen - low_f) / (high_f - low_f)
    mid = (1.0 - smooth) * inv_freq / factor + smooth * inv_freq
    is_mid = (wavelen <= low_wavelen) & (wavelen >= high_wavelen)
    return np.where(is_mid, mid, scaled), 1.0


def rope_cos_sin(
    cfg: LlamaConfig,
    positions: jax.Array,
    theta: Optional[float] = None,
    scaled: bool = True,
) -> Tuple[jax.Array, jax.Array]:
    """Rotary tables ``(N, head_dim)`` in fp32 (HF half-duplicated layout),
    with HF ``rope_scaling`` (linear / llama3) applied when configured.

    ``theta``/``scaled`` override the base frequency and disable scaling
    (Gemma-3's local rope).  Computed in float64 on host when positions
    are concrete (large angles × fp32 pow drift otherwise cost ~1e-5 vs
    HF); falls back to on-device fp32 under tracing.
    """
    hd = cfg.rope_dim_
    base = cfg.rope_theta if theta is None else theta
    inv_freq = 1.0 / (base ** (np.arange(0, hd, 2, dtype=np.float64) / hd))
    attn_f = 1.0
    if scaled:
        inv_freq, attn_f = _scaled_inv_freq(cfg, inv_freq, base)
    try:
        pos = np.asarray(positions, dtype=np.float64)
    except (jax.errors.TracerArrayConversionError, jax.errors.ConcretizationTypeError):
        pos = None
    if pos is not None:
        freqs = pos[:, None] * inv_freq[None, :]
        emb = np.concatenate([freqs, freqs], axis=-1)
        return (jnp.asarray(np.cos(emb) * attn_f, dtype=jnp.float32),
                jnp.asarray(np.sin(emb) * attn_f, dtype=jnp.float32))
    inv_freq_j = jnp.asarray(inv_freq, dtype=jnp.float32)
    freqs = positions.astype(jnp.float32)[:, None] * inv_freq_j[None, :]  # (N, hd/2)
    emb = jnp.concatenate([freqs, freqs], axis=-1)  # (N, hd)
    return jnp.cos(emb) * attn_f, jnp.sin(emb) * attn_f


def rope_tables(
    cfg: LlamaConfig, positions: jax.Array,
) -> Tuple[Tuple[jax.Array, jax.Array], ...]:
    """All rotary tables a forward pass needs: ``tables[cfg.layer_rope(li)]``
    is layer ``li``'s ``(cos, sin)``.  One entry for single-rope families;
    Gemma-3 adds a second, unscaled local-theta entry for sliding layers
    (HF ``Gemma3RotaryEmbedding`` local/global split)."""
    tables = (rope_cos_sin(cfg, positions),)
    if cfg.rope_local_base_freq is not None:
        tables += (rope_cos_sin(cfg, positions,
                                theta=cfg.rope_local_base_freq,
                                scaled=False),)
    if cfg.nope_layers:
        # NoPE identity: cos=1/sin=0 makes apply_rope a no-op, so no-rope
        # layers reuse every rope-threaded forward path unchanged
        c0, s0 = tables[0]
        tables += ((jnp.ones_like(c0), jnp.zeros_like(s0)),)
    return tables


def layer_q_scale(cfg: LlamaConfig, layer_idx: int,
                  positions: jax.Array) -> Optional[jax.Array]:
    """The per-query temperature factor for one layer, or None — Llama-4
    applies it on NoPE layers only."""
    if not cfg.attn_temp_tuning:
        return None
    if not (cfg.nope_layers and layer_idx in cfg.nope_layers):
        return None
    return llama4_q_scale(cfg, positions)


def llama4_q_scale(cfg: LlamaConfig, positions: jax.Array) -> jax.Array:
    """Llama-4 attention-temperature factor per query position (applied on
    NoPE layers only): ``log1p(floor((pos+1)/floor_scale)) * coef + 1``."""
    return (jnp.log1p(jnp.floor((positions.astype(jnp.float32) + 1.0)
                                / cfg.attn_floor_scale))
            * cfg.attn_scale_coef + 1.0)


def _l2_norm(x: jax.Array, eps: float = 1e-6) -> jax.Array:
    """Weightless RMS normalization (HF Llama4TextL2Norm)."""
    x32 = x.astype(jnp.float32)
    return (x32 * jax.lax.rsqrt(
        jnp.mean(x32 * x32, axis=-1, keepdims=True) + eps)).astype(x.dtype)


def _rotate_half(x: jax.Array) -> jax.Array:
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """x: (B, N, H, hd); cos/sin: (N, rd) shared or (B, N, rd) per-sequence.

    ``rd < hd`` (GLM-4 partial rotary) rotates only the first ``rd`` head
    dims; the tail passes through (HF keeps ``q_pass``/``k_pass``)."""
    rd = cos.shape[-1]
    if rd != x.shape[-1]:
        x_rot, x_pass = x[..., :rd], x[..., rd:]
        return jnp.concatenate([apply_rope(x_rot, cos, sin), x_pass],
                               axis=-1)
    if cos.ndim == 2:
        c = cos[None, :, None, :]
        s = sin[None, :, None, :]
    else:
        c = cos[:, :, None, :]
        s = sin[:, :, None, :]
    return x * c.astype(x.dtype) + _rotate_half(x) * s.astype(x.dtype)


def _use_flash(q: jax.Array, k: jax.Array, window: Optional[int],
               logit_cap: Optional[float]) -> bool:
    """Full-sequence causal self-attention on TPU → Pallas flash kernel.

    Dense attention materializes (B, H, N, N) fp32 scores — at the
    calibration length 2048 that is HBM-catastrophic (measured 14x off MXU
    peak); the flash kernel keeps the softmax online in VMEM.  A sliding
    window narrower than the sequence needs the dense mask path (the flash
    kernel is causal-only), as does logit softcapping (Gemma-2); a window
    >= N is a no-op and keeps flash.
    """
    b, n, hq, hd = q.shape
    return (jax.default_backend() == "tpu" and n == k.shape[1]
            and n >= 1024 and n % 512 == 0 and hd % 128 == 0
            and logit_cap is None
            and (window is None or window >= n))


def _flash_attention(q, k, v, sm_scale=None):
    from jax.experimental.pallas.ops.tpu import flash_attention as fa

    b, n, hq, hd = q.shape
    hkv = k.shape[2]
    if hkv != hq:  # GQA: expand KV heads for the kernel
        k = jnp.repeat(k, hq // hkv, axis=2)
        v = jnp.repeat(v, hq // hkv, axis=2)
    out = fa.flash_attention(
        q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
        v.transpose(0, 2, 1, 3),
        causal=True,
        sm_scale=1.0 / math.sqrt(hd) if sm_scale is None else sm_scale,
    )
    return out.transpose(0, 2, 1, 3)


def attention(
    q: jax.Array,  # (B, N, Hq, hd)
    k: jax.Array,  # (B, S, Hkv, hd)
    v: jax.Array,  # (B, S, Hkv, hd)
    causal_offset: Optional[int] = 0,
    key_mask: Optional[jax.Array] = None,  # (B, S) valid-key mask
    window: Optional[int] = None,  # sliding window (Mistral/Qwen2)
    sm_scale: Optional[float] = None,  # score scale; None = 1/sqrt(hd)
    logit_cap: Optional[float] = None,  # Gemma-2 attn softcapping
    sinks: Optional[jax.Array] = None,  # (Hq,) GPT-OSS attention sinks
    chunk: Optional[int] = None,  # Llama-4 chunked attention size
    q_scale: Optional[jax.Array] = None,  # (N,) | (B, N) per-query scale
) -> jax.Array:
    """Dense attention with GQA; fp32 softmax. Returns (B, N, Hq, hd).

    ``sinks``: a learned per-head logit joins each softmax and its
    probability mass is dropped (HF GptOssAttention) — equivalently the
    denominator gains ``exp(sink - max)``.

    ``causal_offset``: query i attends to keys ``<= i + offset`` (offset =
    S - N for decode with a prefix); ``None`` disables causal masking; a
    ``(B,)`` array applies a per-row offset (speculative-decoding chunk
    verification, where each sequence's chunk starts at its own position).
    ``key_mask`` additionally masks invalid keys (paged-cache decode).
    ``window``: query i additionally attends only the last ``window`` keys
    (``i + offset - window < j``, HF sliding-window semantics).
    Long causal self-attention dispatches to the Pallas flash kernel.
    """
    if (isinstance(causal_offset, int) and causal_offset == 0
            and key_mask is None and sinks is None and chunk is None
            and q_scale is None and _use_flash(q, k, window, logit_cap)):
        return _flash_attention(q, k, v, sm_scale)
    if q_scale is not None:  # Llama-4 NoPE temperature tuning scales q
        qs = (q_scale[None, :, None, None] if q_scale.ndim == 1
              else q_scale[:, :, None, None])
        q = q * qs.astype(q.dtype)
    b, n, hq, hd = q.shape
    s, hkv = k.shape[1], k.shape[2]
    groups = hq // hkv
    qg = q.reshape(b, n, hkv, groups, hd)
    scores = jnp.einsum("bnkgh,bskh->bkgns", qg, k, preferred_element_type=jnp.float32)
    scores = scores * (1.0 / math.sqrt(hd) if sm_scale is None else sm_scale)
    scores = soft_cap(scores, logit_cap)
    neg = jnp.finfo(jnp.float32).min
    if causal_offset is not None:
        per_row = getattr(causal_offset, "ndim", 0) == 1
        qi = jnp.arange(n)[:, None]
        kj = jnp.arange(s)[None, :]
        off = causal_offset[:, None, None] if per_row else causal_offset
        mask = kj <= qi + off  # (n, s) or (B, n, s)
        if window is not None:
            mask &= kj > qi + off - window
        if chunk is not None:  # Llama-4: same absolute-position chunk only
            mask &= (kj // chunk) == ((qi + off) // chunk)
        scores = jnp.where(mask[:, None, None] if per_row
                           else mask[None, None, None], scores, neg)
    if key_mask is not None:
        scores = jnp.where(key_mask[:, None, None, None, :], scores, neg)
    if sinks is None:
        probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    else:  # per-head sink logit joins the softmax; its mass is dropped
        sk = sinks.astype(jnp.float32).reshape(hkv, groups)[None, :, :, None]
        m = jnp.maximum(jnp.max(scores, axis=-1), sk)  # (b, hkv, g, n)
        p = jnp.exp(scores - m[..., None])
        denom = jnp.sum(p, axis=-1) + jnp.exp(sk - m)
        probs = (p / denom[..., None]).astype(v.dtype)
    out = jnp.einsum("bkgns,bskh->bnkgh", probs, v)
    return out.reshape(b, n, hq, v.shape[-1])  # v may be narrower than q
    # (absorbed MLA attends 576-dim latent keys but reads 512-dim values)


# Sentinel: "use cfg.sliding_window on every layer" (the pre-Gemma default;
# Gemma-2 callers pass cfg.layer_window(layer_idx) explicitly).
AUTO_WINDOW = -1


def moe_combine(cfg: LlamaConfig, router_w: jax.Array,
                h: jax.Array,
                router_bias: Optional[jax.Array] = None) -> jax.Array:
    """Per-token expert combine weights ``(B, N, E)`` — softmax over router
    logits, top-k selection, optional renormalization (HF
    MixtralSparseMoeBlock / Qwen3MoeSparseMoeBlock numerics: softmax in
    fp32, top-k then ``/= sum``); zero for unselected experts."""
    logits = h @ router_w
    if router_bias is not None:  # GPT-OSS: biased linear router
        logits = logits + router_bias
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    vals, idx = jax.lax.top_k(probs, cfg.moe_top_k)
    if cfg.moe_renorm:
        vals = vals / jnp.sum(vals, axis=-1, keepdims=True)
    one_hot = jax.nn.one_hot(idx, cfg.moe_num_experts, dtype=vals.dtype)
    return jnp.sum(one_hot * vals[..., None], axis=-2)


def moe_combine_deepseek(cfg: LlamaConfig, router_w: jax.Array,
                         router_bias: jax.Array, h: jax.Array) -> jax.Array:
    """DeepSeek-V3 combine weights ``(B, N, E)`` (HF DeepseekV3TopkRouter):
    sigmoid scores in fp32; expert CHOICE adds ``e_score_correction_bias``
    and is group-limited (``n_group`` groups ranked by the sum of their
    top-2 biased scores, ``topk_group`` kept, others zeroed); the combine
    WEIGHTS are the unbiased scores of the chosen experts, renormalized
    (``+1e-20``) and scaled by ``routed_scaling_factor``."""
    e = cfg.moe_num_experts
    scores = jax.nn.sigmoid((h @ router_w).astype(jnp.float32))
    choice = scores + router_bias.astype(jnp.float32)
    if cfg.moe_n_group > 1:
        grp = choice.reshape(*choice.shape[:-1], cfg.moe_n_group,
                             e // cfg.moe_n_group)
        top2 = jnp.sum(jax.lax.top_k(grp, 2)[0], axis=-1)
        _, gidx = jax.lax.top_k(top2, cfg.moe_topk_group)
        gmask = jnp.sum(jax.nn.one_hot(gidx, cfg.moe_n_group,
                                       dtype=choice.dtype), axis=-2)
        choice = jnp.where(
            jnp.repeat(gmask, e // cfg.moe_n_group, axis=-1) > 0,
            choice, 0.0)
    _, idx = jax.lax.top_k(choice, cfg.moe_top_k)
    vals = jnp.take_along_axis(scores, idx, axis=-1)
    if cfg.moe_renorm:
        vals = vals / (jnp.sum(vals, axis=-1, keepdims=True) + 1e-20)
    vals = vals * cfg.moe_routed_scale
    one_hot = jax.nn.one_hot(idx, e, dtype=vals.dtype)
    return jnp.sum(one_hot * vals[..., None], axis=-2)


def moe_combine_llama4(cfg: LlamaConfig, router_w: jax.Array,
                       h: jax.Array) -> jax.Array:
    """Llama-4 router scores ``(B, N, E)``: top-k on the logits, SIGMOID of
    the selected logits, zero elsewhere (HF Llama4Router — sigmoid(-inf)
    of the masked logits), NO renormalization."""
    logits = (h @ router_w).astype(jnp.float32)
    _, idx = jax.lax.top_k(logits, cfg.moe_top_k)
    sel = jnp.sum(jax.nn.one_hot(idx, cfg.moe_num_experts,
                                 dtype=logits.dtype), axis=-2)
    return jax.nn.sigmoid(logits) * sel


def moe_apply_llama4(cfg: LlamaConfig, lin, h: jax.Array,
                     scores: jax.Array) -> jax.Array:
    """Llama-4 masked-dense experts: the routed INPUT is scaled by the
    router score (``x * s`` feeds the expert; outputs sum unweighted —
    NOT equivalent to output-weighting through the SwiGLU nonlinearity).
    Unrouted rows carry score 0, so their expert compute is exactly zero
    (no biases) and each expert's captured Hessian sees only its routed,
    score-scaled activations — the serving-time input distribution."""
    out = None
    for e in range(cfg.moe_num_experts):
        he = h * scores[..., e:e + 1].astype(h.dtype)
        g = lin(f"mlp.experts.{e}.gate_proj", he)
        u = lin(f"mlp.experts.{e}.up_proj", he)
        d = lin(f"mlp.experts.{e}.down_proj", moe_glu(cfg, g, u))
        out = d if out is None else out + d
    return out


def _mlp_tail(cfg: LlamaConfig, lp: Params, lin, h: jax.Array, moe_fn):
    """The block's MLP: dense SwiGLU/GeGLU, or the layer's sparse MoE
    (router present in ``lp``) plus DeepSeek's always-on shared experts."""
    if "mlp.router" in lp:  # this layer's MLP is the sparse-MoE block
        if cfg.moe_llama4:
            scores = moe_combine_llama4(cfg, lp["mlp.router"], h)
            # moe_fn (EP/sharded variants) receives the scores as its
            # combine weights; make_ep_moe_fn applies the Llama-4
            # input-scaling semantics when cfg.moe_llama4 is set
            mlp = (moe_fn(h, scores) if moe_fn is not None
                   else moe_apply_llama4(cfg, lin, h, scores))
        else:
            if cfg.moe_sigmoid_routing:
                comb = moe_combine_deepseek(cfg, lp["mlp.router"],
                                            lp["mlp.router_bias"], h)
            else:
                comb = moe_combine(cfg, lp["mlp.router"], h,
                                   lp.get("mlp.router.bias"))
            mlp = (moe_fn(h, comb) if moe_fn is not None
                   else moe_apply_dense(cfg, lin, h, comb))
        if "mlp.shared_experts.gate_proj" in lp:
            sg = lin("mlp.shared_experts.gate_proj", h)
            su = lin("mlp.shared_experts.up_proj", h)
            mlp = mlp + lin("mlp.shared_experts.down_proj",
                            activation(cfg)(sg) * su)
        return mlp
    if "mlp.gate_up_proj" in lp:  # fused [gate | up] (fuse_stage_linears)
        gu = lin("mlp.gate_up_proj", h)
        gate, up = jnp.split(gu, 2, axis=-1)
    else:
        gate = lin("mlp.gate_proj", h)
        up = lin("mlp.up_proj", h)
    return lin("mlp.down_proj", activation(cfg)(gate) * up)


def moe_glu(cfg: LlamaConfig, gate: jax.Array, up: jax.Array) -> jax.Array:
    """Per-expert gating: standard ``act(gate) * up``, or GPT-OSS's clamped
    ``(up + 1) * gate * sigmoid(1.702 * gate)`` (HF GptOssExperts)."""
    if cfg.moe_gptoss:
        gate = jnp.clip(gate, None, 7.0)
        up = jnp.clip(up, -7.0, 7.0)
        return (up + 1.0) * gate * jax.nn.sigmoid(gate * 1.702)
    return activation(cfg)(gate) * up


def moe_apply_dense(cfg: LlamaConfig, lin, h: jax.Array,
                    comb: jax.Array) -> jax.Array:
    """Masked-dense MoE: every expert runs on the full token set with its
    input *zero-masked* to the tokens routed to it, outputs combined by the
    routing weights.

    TPU-first rationale: at decode the step is weight-streaming-bound and
    every expert's INT4 weights must be read from HBM regardless of which
    tokens picked it, so dense compute costs no extra memory traffic — only
    cheap VPU FLOPs (``E/top_k`` × the routed FLOPs) while keeping shapes
    static for XLA.  The input mask also makes the capture semantics exact
    for quantization: the captured input of expert ``e``'s gate/up (and the
    derived down input) has zero rows for unrouted tokens, so its Hessian
    ``XᵀX`` accumulates *only routed tokens* — the GPTQ-for-MoE analogue of
    the reference's shared-input Hessians (``gptq_py.py:19-36``), and the
    GPTQ solver is invariant to the resulting constant rescaling of H.
    """
    out = None
    for e in range(cfg.moe_num_experts):
        ce = comb[..., e:e + 1]
        mask = (ce > 0).astype(h.dtype)
        he = h * mask
        g = lin(f"mlp.experts.{e}.gate_proj", he)
        u = lin(f"mlp.experts.{e}.up_proj", he)
        # the down input masks too: biased experts (GPT-OSS) emit nonzero
        # values for unrouted zero rows, which must not pollute the down
        # projection's captured Hessian (output is ce-weighted either way)
        d = lin(f"mlp.experts.{e}.down_proj", moe_glu(cfg, g, u) * mask)
        d = ce.astype(d.dtype) * d
        out = d if out is None else out + d
    return out


def block_core(
    cfg: LlamaConfig,
    lp: Params,
    x: jax.Array,  # (B, N, D)
    cos: jax.Array,
    sin: jax.Array,
    lin,  # lin(name, h) -> projection output (packing/TP/capture variants)
    attn_fn,  # attn_fn(q, k, v) -> (attn (B,N,H,hd), aux)
    moe_fn=None,  # moe_fn(h, comb) -> mlp output (EP/sharded variants)
    qk_norm_fn=None,  # flat-QK-norm override (TP: global mean-of-squares)
    mla_lat_sink=None,  # list: receives the MLA [latent | rope-key] row
    qk_l2=None,  # Llama-4 L2 norm for THIS layer; None = cfg.qk_l2_norm
):
    """Family-generic decoder block skeleton shared by every forward path
    (dense, packed serving, cache decode, ragged, TP).  The caller supplies
    the linear-application and attention strategies; this function owns the
    family switches: sandwich norms + unit-offset RMSNorm + GeGLU (Gemma-2)
    vs the 2-norm SiLU Llama block.  Head counts are inferred from the
    projection outputs so TP-local shards work unchanged.  Returns
    ``(hidden, aux)`` where ``aux`` is whatever ``attn_fn`` returned
    (cache state / new K,V)."""
    b, n = x.shape[0], x.shape[1]
    hd, eps, uo = cfg.head_dim_, cfg.rms_norm_eps, cfg.norm_unit_offset

    h = x if cfg.postnorm_only else rms_norm(x, lp["input_layernorm"],
                                             eps, uo)
    if cfg.mla:
        return _mla_attn_mlp(cfg, lp, x, h, cos, sin, lin, attn_fn, moe_fn,
                             mla_lat_sink)
    if "self_attn.qkv_proj" in lp:
        # serving-side fused projection (serving.model.fuse_stage_linears):
        # q/k/v share one act-order perm (one stage Hessian), so one packed
        # kernel call replaces three — one activation gather (the act-order
        # column gather is a slow lane-shuffle op) and one weight-stream
        # dispatch.  Split points follow the family head geometry.
        qkv = lin("self_attn.qkv_proj", h)
        # ratio-derived split (TP-local shards keep the q:kv head ratio):
        # width = (groups + 2) * hkv_local * hd
        groups = cfg.num_attention_heads // cfg.num_key_value_heads
        kw = qkv.shape[-1] // (groups + 2)
        qf, kf, v = jnp.split(qkv, [groups * kw, (groups + 1) * kw], axis=-1)
    else:
        qf = lin("self_attn.q_proj", h)
        kf = lin("self_attn.k_proj", h)
        v = lin("self_attn.v_proj", h)
    if cfg.qk_norm_flat:  # OLMo-2: norm over ALL heads' features pre-reshape
        if qk_norm_fn is None:
            qk_norm_fn = lambda t, w: rms_norm(t, w, eps, uo)
        qf = qk_norm_fn(qf, lp["self_attn.q_norm"])
        kf = qk_norm_fn(kf, lp["self_attn.k_norm"])
    q = qf.reshape(b, n, -1, hd)
    k = kf.reshape(b, n, -1, hd)
    if cfg.qk_norm:  # Qwen3: head-dim RMSNorm before rope (HF Qwen3Attention)
        q = rms_norm(q, lp["self_attn.q_norm"], eps, uo)
        k = rms_norm(k, lp["self_attn.k_norm"], eps, uo)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)
    if cfg.qk_l2_norm if qk_l2 is None else qk_l2:
        # Llama-4: weightless L2 norm AFTER rope (rope layers only)
        q, k = _l2_norm(q, eps), _l2_norm(k, eps)
    attn, aux = attn_fn(q, k, v.reshape(b, n, -1, hd))
    o = lin("self_attn.o_proj", attn.reshape(b, n, -1))
    if cfg.sandwich_norms or cfg.postnorm_only:
        o = rms_norm(o, lp["post_attention_layernorm"], eps, uo)
    if cfg.residual_multiplier is not None:  # Granite
        o = o * jnp.asarray(cfg.residual_multiplier, o.dtype)
    x = x + o

    if cfg.postnorm_only:  # OLMo-2: the MLP consumes the raw residual
        h = x
    else:
        pre_mlp = ("pre_feedforward_layernorm" if cfg.sandwich_norms
                   else "post_attention_layernorm")
        h = rms_norm(x, lp[pre_mlp], eps, uo)
    mlp = _mlp_tail(cfg, lp, lin, h, moe_fn)
    if cfg.sandwich_norms or cfg.postnorm_only:
        mlp = rms_norm(mlp, lp["post_feedforward_layernorm"], eps, uo)
    if cfg.residual_multiplier is not None:  # Granite
        mlp = mlp * jnp.asarray(cfg.residual_multiplier, mlp.dtype)
    return x + mlp, aux


def _mla_attn_mlp(cfg, lp, x, h, cos, sin, lin, attn_fn, moe_fn,
                  mla_lat_sink=None):
    """DeepSeek Multi-head Latent Attention + MLP (block_core's MLA arm).

    Exact (non-absorbed) form, HF ``DeepseekV3Attention`` semantics: q via
    the low-rank bottleneck (or direct), kv from the compressed latent
    ``kv_a_proj_with_mqa = [c_kv | shared rope key]``; per head
    ``q/k = [nope | rope]`` with the MQA rope key broadcast to every head.
    The value (``v_head_dim``) is zero-padded to the qk head dim so the
    family-generic attention/caches apply unchanged; the pad is sliced
    off before ``o_proj``.  Rope rows are de-interleaved at load
    (``rope_interleave`` checkpoints), so the standard half-rotation
    applies to the rope slice.
    """
    b, n = x.shape[0], x.shape[1]
    eps, uo = cfg.rms_norm_eps, cfg.norm_unit_offset
    nope, rd, vd = cfg.qk_nope_head_dim, cfg.qk_rope_head_dim, cfg.v_head_dim
    qk_head = nope + rd

    if cfg.q_lora_rank:
        qa = rms_norm(lin("self_attn.q_a_proj", h),
                      lp["self_attn.q_a_layernorm"], eps, uo)
        q = lin("self_attn.q_b_proj", qa)
    else:
        q = lin("self_attn.q_proj", h)
    q = q.reshape(b, n, -1, qk_head)
    nq = q.shape[2]
    kv_a = lin("self_attn.kv_a_proj_with_mqa", h)
    c_kv, k_rope = kv_a[..., :cfg.kv_lora_rank], kv_a[..., cfg.kv_lora_rank:]
    c_kv_n = rms_norm(c_kv, lp["self_attn.kv_a_layernorm"], eps, uo)
    kv = lin("self_attn.kv_b_proj", c_kv_n)
    kv = kv.reshape(b, n, nq, nope + vd)
    k_nope, v = kv[..., :nope], kv[..., nope:]

    q_rot = apply_rope(q[..., nope:], cos, sin)
    q = jnp.concatenate([q[..., :nope], q_rot], axis=-1)
    k_rot = apply_rope(k_rope[:, :, None, :], cos, sin)  # (B, N, 1, rd)
    if mla_lat_sink is not None:  # absorbed decode caches THIS row per
        # token: the normalized latent + the shared rope'd key
        mla_lat_sink.append(
            jnp.concatenate([c_kv_n, k_rot[:, :, 0, :]], axis=-1))
    k = jnp.concatenate(
        [k_nope, jnp.broadcast_to(k_rot, (b, n, nq, rd))], axis=-1)
    v_pad = jnp.pad(v, ((0, 0), (0, 0), (0, 0), (0, qk_head - vd)))
    attn, aux = attn_fn(q, k, v_pad)
    o = lin("self_attn.o_proj", attn[..., :vd].reshape(b, n, -1))
    if cfg.sandwich_norms or cfg.postnorm_only:
        o = rms_norm(o, lp["post_attention_layernorm"], eps, uo)
    x = x + o

    if cfg.postnorm_only:
        h = x
    else:
        pre_mlp = ("pre_feedforward_layernorm" if cfg.sandwich_norms
                   else "post_attention_layernorm")
        h = rms_norm(x, lp[pre_mlp], eps, uo)
    mlp = _mlp_tail(cfg, lp, lin, h, moe_fn)
    if cfg.sandwich_norms or cfg.postnorm_only:
        mlp = rms_norm(mlp, lp["post_feedforward_layernorm"], eps, uo)
    if cfg.residual_multiplier is not None:  # Granite
        mlp = mlp * jnp.asarray(cfg.residual_multiplier, mlp.dtype)
    return x + mlp, aux


def block_apply(
    cfg: LlamaConfig,
    lp: Params,
    x: jax.Array,  # (B, N, D)
    cos: jax.Array,
    sin: jax.Array,
    capture: Sequence[str] = (),
    inject: Optional[Dict[str, jax.Array]] = None,
    window: Optional[int] = AUTO_WINDOW,
    chunk: Optional[int] = None,  # Llama-4 chunked attention
    q_scale: Optional[jax.Array] = None,  # Llama-4 NoPE temperature
    qk_l2: Optional[bool] = None,  # Llama-4 per-layer L2 norm
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """One decoder block. Returns ``(hidden, {name: linear_input})``.

    ``capture`` names linears whose *inputs* to return — the stage-activation
    hook the quantization driver uses for Hessian accumulation (replacing
    reference RecorderWrapper.stage_hessian_accumulation,
    ``model_utils.py:101-103``).  Unused captures are DCE'd by XLA, so
    requesting an early stage's input skips all later compute for free.

    ``inject`` maps linear names to pre-computed *inputs*: the linear uses
    the injected activation instead of the locally computed one, and XLA
    DCE's the now-unused producing compute.  This is the functional analogue
    of the reference's replay records (``llama.py:171-179``): the
    quantization driver caches each stage's captured input and injects it
    into later stages' forwards, so the expensive prefix (e.g. attention)
    runs once per block instead of once per stage.

    ``window``: this layer's sliding window — pass
    ``cfg.layer_window(layer_idx)`` for families with per-layer attention
    kinds (Gemma-2); the default applies ``cfg.sliding_window`` uniformly.
    """
    caps: Dict[str, jax.Array] = {}
    inject = inject or {}
    if window == AUTO_WINDOW:
        window = cfg.sliding_window

    def lin(name: str, h: jax.Array) -> jax.Array:
        h = inject.get(name, h)
        if name in capture:
            caps[name] = h
        y = h @ lp[name]
        bias = lp.get(name + ".bias")
        return y if bias is None else y + bias

    def attn_fn(q, k, v):
        return attention(q, k, v, window=window, sm_scale=cfg.sm_scale_,
                         sinks=lp.get("self_attn.sinks"),
                         chunk=chunk, q_scale=q_scale,
                         logit_cap=cfg.attn_logit_softcap), None

    x, _ = block_core(cfg, lp, x, cos, sin, lin, attn_fn, qk_l2=qk_l2)
    return x, caps


def embed(cfg: LlamaConfig, params: Params, tokens: jax.Array) -> jax.Array:
    return embed_lookup(cfg, params["embed_tokens"], tokens)


def embed_lookup(cfg: LlamaConfig, embed_w: jax.Array,
                 tokens: jax.Array) -> jax.Array:
    """Token embedding + the Gemma-2 ``sqrt(D)`` normalizer (multiplied in
    model dtype, matching HF's cast-then-multiply)."""
    x = jnp.take(embed_w, tokens, axis=0)
    if cfg.embed_normalizer:
        x = x * jnp.asarray(cfg.hidden_size ** 0.5, x.dtype)
    if cfg.embed_multiplier is not None:  # Granite
        x = x * jnp.asarray(cfg.embed_multiplier, x.dtype)
    return x


def forward_hidden(
    cfg: LlamaConfig, params: Params, tokens: jax.Array,
    positions: Optional[jax.Array] = None,
) -> jax.Array:
    """Embedding + all decoder blocks + final norm. tokens: (B, N)."""
    if positions is None:
        positions = jnp.arange(tokens.shape[1])
    ropes = rope_tables(cfg, positions)
    x = embed(cfg, params, tokens)
    for li, lp in enumerate(params["layers"]):
        cos, sin = ropes[cfg.layer_rope(li)]
        x, _ = block_apply(cfg, lp, x, cos, sin, window=cfg.layer_window(li),
                           chunk=cfg.layer_chunk(li),
                           q_scale=layer_q_scale(cfg, li, positions),
                           qk_l2=cfg.layer_qk_l2(li))
    return rms_norm(x, params["norm"], cfg.rms_norm_eps, cfg.norm_unit_offset)


def lm_logits(cfg: LlamaConfig, params: Params, hidden: jax.Array) -> jax.Array:
    logits = soft_cap(hidden @ params["lm_head"], cfg.final_logit_softcap)
    if cfg.logits_divider is not None:  # Granite
        logits = logits / cfg.logits_divider
    return logits


def forward_logits(cfg: LlamaConfig, params: Params, tokens: jax.Array) -> jax.Array:
    return lm_logits(cfg, params, forward_hidden(cfg, params, tokens))
