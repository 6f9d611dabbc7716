"""HF checkpoint loading: safetensors → functional param pytree.

Replaces the reference's ``LlamaForCausalLM.from_pretrained`` + init
monkey-patching (reference: ``llama.py:14-17``) with a direct safetensors
read — no torch, no module tree, no init cost to skip.  Weights land as
host numpy/jax arrays; the pipeline/evaluator stream them to device
layer-by-layer (the TPU analogue of the reference's CPU-offload strategy,
``llama.py:104-105,220-224``).
"""
from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, Tuple

import jax.numpy as jnp
import numpy as np

from gptq_v2_tpu.models.llama import LlamaConfig, Params


def _hf_key(our_layer_key: str, layer_idx: int | None) -> str:
    if layer_idx is None:
        return {
            "embed_tokens": "model.embed_tokens.weight",
            "norm": "model.norm.weight",
            "lm_head": "lm_head.weight",
        }[our_layer_key]
    if our_layer_key.endswith(".bias"):  # Qwen2 QKV biases
        return f"model.layers.{layer_idx}.{our_layer_key}"
    return f"model.layers.{layer_idx}.{our_layer_key}.weight"


def params_from_flat(cfg: LlamaConfig, get) -> Params:
    """Build params from ``get(hf_key) -> array (HF layout)``.

    Linear weights are transposed to our ``(in, out)`` layout; embeddings
    and norms pass through.  Phi-3's fused ``qkv_proj`` / ``gate_up_proj``
    tensors are row-sliced into the standard per-projection names (HF
    layout is (out, in), and HF slices the fused output as
    ``[q | k | v]`` / ``[gate | up]``, Phi3Attention/Phi3MLP).
    """
    import re

    from gptq_v2_tpu.models.llama import layer_param_shapes

    dt = cfg.jdtype

    if cfg.moe_num_experts:
        moe_get = get

        def get(key: str):
            m = re.match(r"(model\.layers\.\d+)\.mlp\.router\.weight", key)
            if m:
                gate = ("block_sparse_moe.gate" if cfg.moe_mixtral_names
                        else "mlp.gate")
                return moe_get(f"{m.group(1)}.{gate}.weight")
            if cfg.moe_mixtral_names:
                m = re.match(
                    r"(model\.layers\.\d+)\.mlp\.experts\.(\d+)\."
                    r"(gate|up|down)_proj\.weight", key)
                if m:
                    w = {"gate": "w1", "up": "w3", "down": "w2"}[m.group(3)]
                    return moe_get(f"{m.group(1)}.block_sparse_moe."
                                   f"experts.{m.group(2)}.{w}.weight")
            return moe_get(key)

    if cfg.fused_qkv_gate_up:
        raw_get = get
        hd = cfg.head_dim_
        qp = cfg.num_attention_heads * hd
        kp = qp + cfg.num_key_value_heads * hd
        vp = kp + cfg.num_key_value_heads * hd
        inter = cfg.intermediate_size  # NB: 'i' is the layer-loop var below

        def get(key: str):
            m = re.match(
                r"(model\.layers\.\d+\.self_attn)\.([qkv])_proj\.weight",
                key)
            if m:
                fused = np.asarray(raw_get(m.group(1) + ".qkv_proj.weight"))
                lo, hi = {"q": (0, qp), "k": (qp, kp),
                          "v": (kp, vp)}[m.group(2)]
                return fused[lo:hi]
            m = re.match(
                r"(model\.layers\.\d+\.mlp)\.(gate|up)_proj\.weight", key)
            if m:
                fused = np.asarray(raw_get(m.group(1) + ".gate_up_proj.weight"))
                return (fused[:inter] if m.group(2) == "gate"
                        else fused[inter:])
            return raw_get(key)

    def linear(hf_key):
        return jnp.asarray(get(hf_key)).T.astype(dt)

    layers = []
    for i in range(cfg.num_hidden_layers):
        lp = {}
        for name, shape in layer_param_shapes(cfg).items():
            key = _hf_key(name, i)
            if len(shape) == 1:
                lp[name] = jnp.asarray(get(key)).astype(dt)
            else:
                lp[name] = linear(key)
        layers.append(lp)

    embed = jnp.asarray(get(_hf_key("embed_tokens", None))).astype(dt)
    if cfg.tie_word_embeddings:
        lm_head = embed.T
    else:
        lm_head = linear(_hf_key("lm_head", None))
    return {
        "embed_tokens": embed,
        "layers": layers,
        "norm": jnp.asarray(get(_hf_key("norm", None))).astype(dt),
        "lm_head": lm_head,
    }


def load_hf_model(model_dir) -> Tuple[LlamaConfig, Params]:
    """Load config + weights from a HF model directory (safetensors shards)."""
    model_dir = Path(model_dir)
    cfg = LlamaConfig.from_hf_dir(model_dir)

    shards = sorted(model_dir.glob("*.safetensors"))
    if not shards:
        raise FileNotFoundError(f"no .safetensors files under {model_dir}")
    index_file = model_dir / "model.safetensors.index.json"
    key_to_shard: Dict[str, Path] = {}
    if index_file.exists():
        with open(index_file) as f:
            weight_map = json.load(f)["weight_map"]
        key_to_shard = {k: model_dir / v for k, v in weight_map.items()}

    from safetensors import safe_open

    handles: Dict[Path, object] = {}

    def get(key: str):
        shard = key_to_shard.get(key)
        candidates = [shard] if shard else shards
        for path in candidates:
            if path not in handles:
                handles[path] = safe_open(str(path), framework="flax")
            h = handles[path]
            if key in h.keys():
                return h.get_tensor(key)
        raise KeyError(key)

    return cfg, params_from_flat(cfg, get)


def params_from_torch_state_dict(cfg: LlamaConfig, state_dict) -> Params:
    """Convert a transformers state_dict (tests: tiny random HF models)."""

    def get(key: str):
        t = state_dict[key]
        if hasattr(t, "detach"):
            t = t.detach()
            if str(t.dtype) == "torch.bfloat16":
                return jnp.asarray(t.float().numpy()).astype(jnp.bfloat16)
            return t.numpy()
        return np.asarray(t)

    return params_from_flat(cfg, get)
