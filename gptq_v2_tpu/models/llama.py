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


@dataclasses.dataclass(frozen=True)
class LlamaConfig:
    """Config for the Llama *family*: Llama-1/2/3, Mistral (same math plus a
    sliding attention window), and Qwen2/2.5 (QKV biases, otherwise
    identical).  One functional decoder serves all three — the HF classes
    differ only in these switches."""

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
    sliding_window: Optional[int] = None  # Mistral/Qwen2 local attention

    @property
    def head_dim_(self) -> int:
        return self.head_dim or self.hidden_size // self.num_attention_heads

    @property
    def jdtype(self):
        return jnp.dtype(self.dtype)

    @classmethod
    def from_hf_dict(cls, d: dict) -> "LlamaConfig":
        model_type = d.get("model_type", "llama")
        if model_type not in ("llama", "mistral", "qwen2"):
            raise NotImplementedError(f"model_type {model_type!r}")
        dtype = d.get("torch_dtype", "float16")
        rs = d.get("rope_scaling")
        rope_scaling = None
        if rs is not None:
            rope_type = rs.get("rope_type", rs.get("type", "default"))
            if rope_type != "default":
                if rope_type not in ("linear", "llama3"):
                    raise NotImplementedError(f"rope_scaling type {rope_type!r}")
                norm = {k: (v if isinstance(v, str) else float(v))
                        for k, v in rs.items() if k != "type"}
                norm["rope_type"] = rope_type
                rope_scaling = tuple(sorted(norm.items()))
        # HF LlamaConfig.attention_bias covers q/k/v/o; Qwen2 hard-codes
        # bias=True on q/k/v and bias=False on o (HF Qwen2Attention)
        attention_bias = d.get("attention_bias", False)
        qkv_bias = attention_bias or model_type == "qwen2"
        sliding = d.get("sliding_window")
        if model_type == "qwen2" and not d.get("use_sliding_window", False):
            sliding = None  # HF Qwen2 gates the window behind this flag
        return cls(
            vocab_size=d["vocab_size"],
            hidden_size=d["hidden_size"],
            intermediate_size=d["intermediate_size"],
            num_hidden_layers=d["num_hidden_layers"],
            num_attention_heads=d["num_attention_heads"],
            num_key_value_heads=d.get("num_key_value_heads", d["num_attention_heads"]),
            head_dim=d.get("head_dim"),
            max_position_embeddings=d.get("max_position_embeddings", 4096),
            rope_theta=d.get("rope_theta", 10000.0),
            rms_norm_eps=d.get("rms_norm_eps", 1e-5),
            tie_word_embeddings=d.get("tie_word_embeddings", False),
            dtype=dtype,
            rope_scaling=rope_scaling,
            qkv_bias=qkv_bias,
            o_bias=attention_bias,
            sliding_window=sliding,
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


def layer_param_shapes(cfg: LlamaConfig) -> Dict[str, Tuple[int, ...]]:
    d, hd = cfg.hidden_size, cfg.head_dim_
    nq, nkv, i = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.intermediate_size
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
    if cfg.qkv_bias:
        for n in ("self_attn.q_proj", "self_attn.k_proj", "self_attn.v_proj"):
            shapes[n + ".bias"] = (shapes[n][1],)
    if cfg.o_bias:
        shapes["self_attn.o_proj.bias"] = (d,)
    return shapes


def init_params(cfg: LlamaConfig, key: jax.Array) -> Params:
    """Random-init parameters (tests / benchmarking without checkpoints)."""
    dt = cfg.jdtype
    n_weights = cfg.num_hidden_layers * len(BLOCK_LINEARS) + 2
    keys = iter(jax.random.split(key, n_weights))

    def w(shape):
        scale = 1.0 / math.sqrt(shape[0])
        return (jax.random.normal(next(keys), shape, dtype=jnp.float32) * scale).astype(dt)

    layers = []
    for _ in range(cfg.num_hidden_layers):
        lp = {}
        for name, shape in layer_param_shapes(cfg).items():
            lp[name] = jnp.ones(shape, dtype=dt) if len(shape) == 1 else w(shape)
        layers.append(lp)
    embed = w((cfg.vocab_size, cfg.hidden_size))
    return {
        "embed_tokens": embed,
        "layers": layers,
        "norm": jnp.ones((cfg.hidden_size,), dtype=dt),
        "lm_head": embed.T if cfg.tie_word_embeddings else w((cfg.hidden_size, cfg.vocab_size)),
    }


# ---------------------------------------------------------------------------
# Building blocks
# ---------------------------------------------------------------------------


def rms_norm(x: jax.Array, weight: jax.Array, eps: float) -> jax.Array:
    x32 = x.astype(jnp.float32)
    var = jnp.mean(x32 * x32, axis=-1, keepdims=True)
    normed = x32 * jax.lax.rsqrt(var + eps)
    return weight * normed.astype(x.dtype)


def _scaled_inv_freq(cfg: LlamaConfig, inv_freq: np.ndarray) -> np.ndarray:
    """Apply HF ``rope_scaling`` to the base inverse frequencies.

    ``linear`` divides all frequencies by the factor; ``llama3`` keeps
    high frequencies, divides low frequencies, and smoothly interpolates
    in between (HF ``_compute_llama3_parameters``).
    """
    if cfg.rope_scaling is None:
        return inv_freq
    rs = dict(cfg.rope_scaling)
    factor = rs["factor"]
    if rs["rope_type"] == "linear":
        return inv_freq / factor
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
    return np.where(is_mid, mid, scaled)


def rope_cos_sin(cfg: LlamaConfig, positions: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Rotary tables ``(N, head_dim)`` in fp32 (HF half-duplicated layout),
    with HF ``rope_scaling`` (linear / llama3) applied when configured.

    Computed in float64 on host when positions are concrete (large angles ×
    fp32 pow drift otherwise cost ~1e-5 vs HF); falls back to on-device fp32
    under tracing.
    """
    hd = cfg.head_dim_
    try:
        pos = np.asarray(positions, dtype=np.float64)
    except (jax.errors.TracerArrayConversionError, jax.errors.ConcretizationTypeError):
        pos = None
    if pos is not None:
        inv_freq = 1.0 / (cfg.rope_theta ** (np.arange(0, hd, 2, dtype=np.float64) / hd))
        inv_freq = _scaled_inv_freq(cfg, inv_freq)
        freqs = pos[:, None] * inv_freq[None, :]
        emb = np.concatenate([freqs, freqs], axis=-1)
        return (jnp.asarray(np.cos(emb), dtype=jnp.float32),
                jnp.asarray(np.sin(emb), dtype=jnp.float32))
    inv_freq = 1.0 / (cfg.rope_theta ** (np.arange(0, hd, 2, dtype=np.float64) / hd))
    inv_freq_j = jnp.asarray(_scaled_inv_freq(cfg, inv_freq), dtype=jnp.float32)
    freqs = positions.astype(jnp.float32)[:, None] * inv_freq_j[None, :]  # (N, hd/2)
    emb = jnp.concatenate([freqs, freqs], axis=-1)  # (N, hd)
    return jnp.cos(emb), jnp.sin(emb)


def _rotate_half(x: jax.Array) -> jax.Array:
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """x: (B, N, H, hd); cos/sin: (N, hd) shared or (B, N, hd) per-sequence."""
    if cos.ndim == 2:
        c = cos[None, :, None, :]
        s = sin[None, :, None, :]
    else:
        c = cos[:, :, None, :]
        s = sin[:, :, None, :]
    return x * c.astype(x.dtype) + _rotate_half(x) * s.astype(x.dtype)


def _use_flash(q: jax.Array, k: jax.Array, window: Optional[int]) -> bool:
    """Full-sequence causal self-attention on TPU → Pallas flash kernel.

    Dense attention materializes (B, H, N, N) fp32 scores — at the
    calibration length 2048 that is HBM-catastrophic (measured 14x off MXU
    peak); the flash kernel keeps the softmax online in VMEM.  A sliding
    window narrower than the sequence needs the dense mask path (the flash
    kernel is causal-only); a window >= N is a no-op and keeps flash.
    """
    b, n, hq, hd = q.shape
    return (jax.default_backend() == "tpu" and n == k.shape[1]
            and n >= 1024 and n % 512 == 0 and hd % 128 == 0
            and (window is None or window >= n))


def _flash_attention(q, k, v):
    from jax.experimental.pallas.ops.tpu import flash_attention as fa

    b, n, hq, hd = q.shape
    hkv = k.shape[2]
    if hkv != hq:  # GQA: expand KV heads for the kernel
        k = jnp.repeat(k, hq // hkv, axis=2)
        v = jnp.repeat(v, hq // hkv, axis=2)
    out = fa.flash_attention(
        q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
        v.transpose(0, 2, 1, 3),
        causal=True, sm_scale=1.0 / math.sqrt(hd),
    )
    return out.transpose(0, 2, 1, 3)


def attention(
    q: jax.Array,  # (B, N, Hq, hd)
    k: jax.Array,  # (B, S, Hkv, hd)
    v: jax.Array,  # (B, S, Hkv, hd)
    causal_offset: Optional[int] = 0,
    key_mask: Optional[jax.Array] = None,  # (B, S) valid-key mask
    window: Optional[int] = None,  # sliding window (Mistral/Qwen2)
) -> jax.Array:
    """Dense attention with GQA; fp32 softmax. Returns (B, N, Hq, hd).

    ``causal_offset``: query i attends to keys ``<= i + offset`` (offset =
    S - N for decode with a prefix); ``None`` disables causal masking.
    ``key_mask`` additionally masks invalid keys (paged-cache decode).
    ``window``: query i additionally attends only the last ``window`` keys
    (``i + offset - window < j``, HF sliding-window semantics).
    Long causal self-attention dispatches to the Pallas flash kernel.
    """
    if causal_offset == 0 and key_mask is None and _use_flash(q, k, window):
        return _flash_attention(q, k, v)
    b, n, hq, hd = q.shape
    s, hkv = k.shape[1], k.shape[2]
    groups = hq // hkv
    qg = q.reshape(b, n, hkv, groups, hd)
    scores = jnp.einsum("bnkgh,bskh->bkgns", qg, k, preferred_element_type=jnp.float32)
    scores = scores / math.sqrt(hd)
    neg = jnp.finfo(jnp.float32).min
    if causal_offset is not None:
        qi = jnp.arange(n)[:, None]
        kj = jnp.arange(s)[None, :]
        mask = kj <= qi + causal_offset
        if window is not None:
            mask &= kj > qi + causal_offset - window
        scores = jnp.where(mask[None, None, None], scores, neg)
    if key_mask is not None:
        scores = jnp.where(key_mask[:, None, None, None, :], scores, neg)
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    out = jnp.einsum("bkgns,bskh->bnkgh", probs, v)
    return out.reshape(b, n, hq, hd)


def block_apply(
    cfg: LlamaConfig,
    lp: Params,
    x: jax.Array,  # (B, N, D)
    cos: jax.Array,
    sin: jax.Array,
    capture: Sequence[str] = (),
    inject: Optional[Dict[str, jax.Array]] = None,
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
    """
    caps: Dict[str, jax.Array] = {}
    inject = inject or {}

    def lin(name: str, h: jax.Array) -> jax.Array:
        h = inject.get(name, h)
        if name in capture:
            caps[name] = h
        y = h @ lp[name]
        bias = lp.get(name + ".bias")
        return y if bias is None else y + bias

    b, n, d = x.shape
    hd, hq, hkv = cfg.head_dim_, cfg.num_attention_heads, cfg.num_key_value_heads

    h = rms_norm(x, lp["input_layernorm"], cfg.rms_norm_eps)
    q = lin("self_attn.q_proj", h).reshape(b, n, hq, hd)
    k = lin("self_attn.k_proj", h).reshape(b, n, hkv, hd)
    v = lin("self_attn.v_proj", h).reshape(b, n, hkv, hd)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)
    attn = attention(q, k, v, window=cfg.sliding_window).reshape(b, n, hq * hd)
    x = x + lin("self_attn.o_proj", attn)

    h = rms_norm(x, lp["post_attention_layernorm"], cfg.rms_norm_eps)
    gate = lin("mlp.gate_proj", h)
    up = lin("mlp.up_proj", h)
    x = x + lin("mlp.down_proj", jax.nn.silu(gate) * up)
    return x, caps


def embed(cfg: LlamaConfig, params: Params, tokens: jax.Array) -> jax.Array:
    return jnp.take(params["embed_tokens"], tokens, axis=0)


def forward_hidden(
    cfg: LlamaConfig, params: Params, tokens: jax.Array,
    positions: Optional[jax.Array] = None,
) -> jax.Array:
    """Embedding + all decoder blocks + final norm. tokens: (B, N)."""
    if positions is None:
        positions = jnp.arange(tokens.shape[1])
    cos, sin = rope_cos_sin(cfg, positions)
    x = embed(cfg, params, tokens)
    for lp in params["layers"]:
        x, _ = block_apply(cfg, lp, x, cos, sin)
    return rms_norm(x, params["norm"], cfg.rms_norm_eps)


def lm_logits(cfg: LlamaConfig, params: Params, hidden: jax.Array) -> jax.Array:
    return hidden @ params["lm_head"]


def forward_logits(cfg: LlamaConfig, params: Params, tokens: jax.Array) -> jax.Array:
    return lm_logits(cfg, params, forward_hidden(cfg, params, tokens))
