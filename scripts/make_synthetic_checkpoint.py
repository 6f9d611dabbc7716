"""Generate a random sharded HF-format checkpoint on disk.

Exercises the framework's real user-facing load path (``models/loader.py``:
config.json + ``model-*-of-*.safetensors`` shards +
``model.safetensors.index.json``) without network access — this
environment has zero egress, so no real checkpoints can be downloaded
(docs/STATUS.md "ppl parity").  Supports every model family the framework
serves (llama / mistral / qwen2 / qwen3 / gemma2 / gemma3_text / phi3 / mixtral /
qwen3_moe — phi3 writes the fused qkv_proj / gate_up_proj tensors its
real checkpoints use; the MoE families write their real router + expert
names: ``block_sparse_moe.gate`` + ``experts.N.w1|w3|w2`` for Mixtral,
``mlp.gate`` + ``experts.N.{gate,up,down}_proj`` for Qwen3-MoE).

Usage:
  python scripts/make_synthetic_checkpoint.py --out /tmp/ckpt \
      --model-type llama --hidden 4096 --intermediate 11008 --layers 8 \
      --heads 32 --kv-heads 32 --vocab 32000 --shards 2 --dtype bfloat16
"""
import argparse
import json
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def build_config(a) -> dict:
    cfg = {
        "model_type": a.model_type,
        "vocab_size": a.vocab,
        "hidden_size": a.hidden,
        "intermediate_size": a.intermediate,
        "num_hidden_layers": a.layers,
        "num_attention_heads": a.heads,
        "num_key_value_heads": a.kv_heads,
        "max_position_embeddings": a.max_pos,
        "rms_norm_eps": 1e-5,
        "rope_theta": 10000.0,
        "torch_dtype": a.dtype,
        "tie_word_embeddings": a.model_type in ("gemma2", "gemma3_text"),
    }
    if a.head_dim:
        cfg["head_dim"] = a.head_dim
    if a.model_type in ("mistral", "phi3"):
        cfg["sliding_window"] = a.sliding_window or 4096
    if a.model_type == "mixtral":
        cfg.update({"num_local_experts": a.experts,
                    "num_experts_per_tok": a.top_k})
    if a.model_type == "qwen3_moe":
        cfg.update({"num_experts": a.experts,
                    "num_experts_per_tok": a.top_k,
                    "moe_intermediate_size": a.moe_intermediate
                    or a.intermediate,
                    "norm_topk_prob": True})
    if a.model_type == "gemma2":
        cfg.update({
            "rms_norm_eps": 1e-6,
            "hidden_activation": "gelu_pytorch_tanh",
            "query_pre_attn_scalar": a.head_dim or a.hidden // a.heads,
            "attn_logit_softcapping": 50.0,
            "final_logit_softcapping": 30.0,
            "sliding_window": a.sliding_window or 4096,
        })
    if a.model_type == "olmo2":
        cfg.update({"rms_norm_eps": 1e-5})
    if a.model_type == "deepseek_v3":
        hd = a.head_dim or 16
        cfg.update({"q_lora_rank": 3 * a.hidden // 4, "kv_lora_rank": a.hidden // 2,
                    "qk_nope_head_dim": hd, "qk_rope_head_dim": hd // 2,
                    "v_head_dim": hd, "first_k_dense_replace": 1,
                    "n_routed_experts": a.experts, "num_experts_per_tok": a.top_k,
                    "n_group": 2, "topk_group": 1, "n_shared_experts": 1,
                    "routed_scaling_factor": 2.5,
                    "moe_intermediate_size": a.moe_intermediate or a.intermediate,
                    "rms_norm_eps": 1e-6})
        cfg.pop("head_dim", None)
    if a.model_type == "glm4":
        cfg.update({"attention_bias": True, "partial_rotary_factor": 0.5,
                    "rms_norm_eps": 1e-5})
    if a.model_type == "smollm3":
        cfg.update({
            "rms_norm_eps": 1e-6,
            "rope_theta": 2000000.0,
            "no_rope_layer_interval": 4,
            "no_rope_layers": [int(bool((i + 1) % 4))
                               for i in range(a.layers)],
            "tie_word_embeddings": True,
        })
    if a.model_type == "gemma3_text":
        cfg.update({
            "rms_norm_eps": 1e-6,
            "hidden_activation": "gelu_pytorch_tanh",
            "query_pre_attn_scalar": a.head_dim or a.hidden // a.heads,
            "sliding_window": a.sliding_window or 1024,
            "rope_theta": 1000000.0,
            "rope_local_base_freq": 10000.0,
            "sliding_window_pattern": 6,
        })
    return cfg


def tensor_entries(cfg_dict):
    """Yield (hf_key, shape) in HF layout ((out, in) for linears)."""
    from gptq_v2_tpu.models.llama import LlamaConfig, layer_param_shapes

    cfg = LlamaConfig.from_hf_dict(cfg_dict)
    d, v = cfg.hidden_size, cfg.vocab_size
    yield "model.embed_tokens.weight", (v, d)
    fused_of = {}
    if cfg.fused_gate_up and not cfg.fused_qkv_gate_up:  # glm4
        fused_of = {
            "mlp.gate_proj": ("mlp.gate_up_proj",
                              (2 * cfg.intermediate_size, d)),
            "mlp.up_proj": None,
        }
    if cfg.fused_qkv_gate_up:  # phi3 stores fused projection tensors
        hd = cfg.head_dim_
        op = (cfg.num_attention_heads + 2 * cfg.num_key_value_heads) * hd
        fused_of = {
            "self_attn.q_proj": ("self_attn.qkv_proj", (op, d)),
            "self_attn.k_proj": None, "self_attn.v_proj": None,
            "mlp.gate_proj": ("mlp.gate_up_proj",
                              (2 * cfg.intermediate_size, d)),
            "mlp.up_proj": None,
        }
    glm_norms = {"post_attention_layernorm": "post_self_attn_layernorm",
                 "pre_feedforward_layernorm": "post_attention_layernorm",
                 "post_feedforward_layernorm": "post_mlp_layernorm"}

    def hf_name(name):
        """Framework layer-param name → the family's checkpoint name."""
        if cfg.fused_gate_up and name in glm_norms:  # glm4 norm names
            return glm_norms[name]
        if cfg.moe_num_experts:
            if name == "mlp.router":
                return ("block_sparse_moe.gate" if cfg.moe_mixtral_names
                        else "mlp.gate")
            m = re.match(r"mlp\.experts\.(\d+)\.(gate|up|down)_proj$", name)
            if m and cfg.moe_mixtral_names:
                w = {"gate": "w1", "up": "w3", "down": "w2"}[m.group(2)]
                return f"block_sparse_moe.experts.{m.group(1)}.{w}"
        return name

    for i in range(cfg.num_hidden_layers):
        for name, shape in layer_param_shapes(cfg, i).items():
            if name in fused_of:
                if fused_of[name] is None:
                    continue  # folded into the fused tensor
                fname, fshape = fused_of[name]
                yield f"model.layers.{i}.{fname}.weight", fshape
                continue
            if name == "mlp.router_bias":  # DeepSeek buffer name
                yield (f"model.layers.{i}.mlp.gate.e_score_correction_bias",
                       shape)
                continue
            key = f"model.layers.{i}.{hf_name(name)}"
            if not name.endswith(".bias"):
                key += ".weight"
            yield key, shape[::-1] if len(shape) == 2 else shape
    yield "model.norm.weight", (d,)
    if not cfg.tie_word_embeddings:
        yield "lm_head.weight", (v, d)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--model-type", default="llama",
                    choices=["llama", "mistral", "qwen2", "qwen3", "gemma2",
                             "gemma3_text", "phi3", "mixtral", "qwen3_moe",
                             "smollm3", "olmo2", "glm4", "deepseek_v3"])
    ap.add_argument("--experts", type=int, default=8)
    ap.add_argument("--top-k", type=int, default=2)
    ap.add_argument("--moe-intermediate", type=int, default=0,
                    help="qwen3_moe per-expert width (0 = --intermediate)")
    ap.add_argument("--hidden", type=int, default=4096)
    ap.add_argument("--intermediate", type=int, default=11008)
    ap.add_argument("--layers", type=int, default=8)
    ap.add_argument("--heads", type=int, default=32)
    ap.add_argument("--kv-heads", type=int, default=32)
    ap.add_argument("--head-dim", type=int, default=0)
    ap.add_argument("--vocab", type=int, default=32000)
    ap.add_argument("--max-pos", type=int, default=4096)
    ap.add_argument("--sliding-window", type=int, default=0)
    ap.add_argument("--shards", type=int, default=2)
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["bfloat16", "float16", "float32"])
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import ml_dtypes
    from safetensors.numpy import save_file

    np_dtype = {"bfloat16": ml_dtypes.bfloat16, "float16": np.float16,
                "float32": np.float32}[args.dtype]
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    cfg_dict = build_config(args)
    with open(out / "config.json", "w") as f:
        json.dump(cfg_dict, f, indent=1)

    entries = list(tensor_entries(cfg_dict))
    rng = np.random.default_rng(args.seed)
    per_shard = -(-len(entries) // args.shards)
    weight_map, total = {}, 0
    for s in range(args.shards):
        chunk = entries[s * per_shard:(s + 1) * per_shard]
        if not chunk:
            continue
        shard_name = f"model-{s + 1:05d}-of-{args.shards:05d}.safetensors"
        flat = {}
        for key, shape in chunk:
            if len(shape) == 1:  # norms init at identity, biases at zero
                w = (np.zeros(shape, np.float32)
                     if key.endswith(".bias")
                     or args.model_type in ("gemma2", "gemma3_text")
                     else np.ones(shape, np.float32))
            else:
                w = (rng.standard_normal(shape, dtype=np.float32)
                     / np.sqrt(shape[-1]))
            flat[key] = w.astype(np_dtype)
            weight_map[key] = shard_name
            total += flat[key].nbytes
        save_file(flat, str(out / shard_name))
        print(f"wrote {shard_name}: {len(flat)} tensors")
    with open(out / "model.safetensors.index.json", "w") as f:
        json.dump({"metadata": {"total_size": total},
                   "weight_map": weight_map}, f)
    print(f"checkpoint at {out}: {len(entries)} tensors, "
          f"{total / 1e9:.2f} GB, {args.shards} shards")


if __name__ == "__main__":
    main()
