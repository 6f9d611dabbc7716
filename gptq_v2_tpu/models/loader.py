"""HF checkpoint loading: safetensors → functional param pytree.

Replaces the reference's ``LlamaForCausalLM.from_pretrained`` + init
monkey-patching (reference: ``llama.py:14-17``) with a direct safetensors
read — no torch, no module tree, no init cost to skip.  Weights land as
**host** numpy arrays; the pipeline/evaluator stream them to device
layer-by-layer through ``pipeline._to_device`` (the TPU analogue of the
reference's CPU-offload strategy, ``llama.py:104-105,220-224``) — device
HBM holds one block at a time, never the whole model.

``lazy=True`` defers even the host read: each block linear becomes a
:class:`LazyTensor` that mmap-reads its shard bytes on first use and holds
nothing afterwards — host RSS stays bounded by the active block, which is
what makes 70B-class quantization feasible on ordinary hosts (a 70B bf16
checkpoint is ~140 GB; one block is ~2 GB).
"""
from __future__ import annotations

import json
from pathlib import Path
from typing import Callable, Dict, Tuple

import jax.numpy as jnp
import numpy as np

from gptq_v2_tpu.models.llama import LlamaConfig, Params


class LazyTensor:
    """Deferred checkpoint read with array protocol.

    Exposes ``shape``/``dtype``/``ndim`` (enough for ``jax.eval_shape`` /
    ``ShapeDtypeStruct`` tree-maps) and materializes through ``__array__``
    — so ``np.asarray`` / ``jnp.asarray`` / ``pipeline._to_device`` all
    work unchanged.  The fetch re-reads from the (mmap'd) shard on every
    materialization and caches nothing.
    """

    def __init__(self, fetch: Callable[[], np.ndarray], shape, dtype):
        self._fetch = fetch
        self.shape = tuple(shape)
        self.dtype = np.dtype(dtype)
        self.ndim = len(self.shape)

    def __array__(self, dtype=None, copy=None):
        a = np.asarray(self._fetch())
        assert a.shape == self.shape, (a.shape, self.shape)
        return a.astype(dtype) if dtype is not None else a


def _hf_key(our_layer_key: str, layer_idx: int | None) -> str:
    if layer_idx is None:
        return {
            "embed_tokens": "model.embed_tokens.weight",
            "norm": "model.norm.weight",
            "lm_head": "lm_head.weight",
        }[our_layer_key]
    if our_layer_key.endswith((".bias", ".sinks")):  # biases / GPT-OSS sinks
        return f"model.layers.{layer_idx}.{our_layer_key}"
    return f"model.layers.{layer_idx}.{our_layer_key}.weight"


def params_from_flat(cfg: LlamaConfig, get, lazy: bool = False) -> Params:
    """Build params from ``get(hf_key) -> array (HF layout)``.

    Linear weights are transposed to our ``(in, out)`` layout; embeddings
    and norms pass through.  Phi-3's fused ``qkv_proj`` / ``gate_up_proj``
    tensors are row-sliced into the standard per-projection names (HF
    layout is (out, in), and HF slices the fused output as
    ``[q | k | v]`` / ``[gate | up]``, Phi3Attention/Phi3MLP).

    Everything stays on the host (numpy).  ``lazy=True`` wraps block
    params in :class:`LazyTensor` so the checkpoint is read block-by-block
    as the pipeline touches it (embeddings / final norm / lm_head stay
    eager — they are needed up front and at the end).
    """
    import re

    from gptq_v2_tpu.models.llama import layer_param_shapes

    if cfg.moe_gptoss:  # GPT-OSS: stacked expert tensors, router named
        # mlp.router directly, gate/up interleaved in gate_up_proj
        goss_get = get

        def get(key: str):
            m = re.match(
                r"(model\.layers\.\d+)\.mlp\.experts\.(\d+)\."
                r"(gate|up|down)_proj\.(weight|bias)", key)
            if m is None:
                return goss_get(key)
            base, e, kind, wb = m.groups()
            e = int(e)
            if kind == "down":
                if wb == "weight":  # stored (E, inter, d) = (in, out)
                    w = np.asarray(goss_get(f"{base}.mlp.experts.down_proj"))
                    return w[e].T  # → HF (out, in); fetch re-transposes
                w = np.asarray(goss_get(f"{base}.mlp.experts.down_proj_bias"))
                return w[e]
            sel = slice(0, None, 2) if kind == "gate" else slice(1, None, 2)
            if wb == "weight":  # stored (E, d, 2·inter), gate/up interleaved
                w = np.asarray(goss_get(f"{base}.mlp.experts.gate_up_proj"))
                return w[e][:, sel].T
            w = np.asarray(goss_get(f"{base}.mlp.experts.gate_up_proj_bias"))
            return w[e][sel]

    if cfg.llama4_names:  # Llama-4: feed_forward.* names, stacked experts
        l4_get = get
        inter_e = cfg.moe_intermediate_

        def get(key: str):
            m = re.match(
                r"(model\.layers\.\d+)\.mlp\.experts\.(\d+)\."
                r"(gate|up|down)_proj\.weight", key)
            if m:
                base, e, kind = m.groups()
                e = int(e)
                if kind == "down":  # (E, inter, d) = (in, out)
                    w = np.asarray(l4_get(
                        f"{base}.feed_forward.experts.down_proj"))
                    return w[e].T
                w = np.asarray(l4_get(
                    f"{base}.feed_forward.experts.gate_up_proj"))
                half = (slice(0, inter_e) if kind == "gate"
                        else slice(inter_e, None))
                return w[e][:, half].T  # [gate | up] halves, (in, out)
            m = re.match(r"(model\.layers\.\d+)\.mlp\."
                         r"shared_experts\.(\w+)\.weight", key)
            if m:
                return l4_get(f"{m.group(1)}.feed_forward."
                              f"shared_expert.{m.group(2)}.weight")
            m = re.match(r"(model\.layers\.\d+)\.mlp\.(\w+)\.weight", key)
            if m:  # dense gate/up/down + router live under feed_forward
                return l4_get(
                    f"{m.group(1)}.feed_forward.{m.group(2)}.weight")
            return l4_get(key)

    if cfg.moe_num_experts and not cfg.moe_gptoss and not cfg.moe_llama4:
        moe_get = get

        def get(key: str):
            m = re.match(r"(model\.layers\.\d+)\.mlp\.router_bias\.weight",
                         key)
            if m:  # DeepSeek e_score_correction_bias buffer
                return moe_get(
                    f"{m.group(1)}.mlp.gate.e_score_correction_bias")
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

    if cfg.fused_gate_up and not cfg.fused_qkv_gate_up:  # GLM-4
        gu_get = get
        inter_gu = cfg.intermediate_size

        def get(key: str):
            m = re.match(
                r"(model\.layers\.\d+\.mlp)\.(gate|up)_proj\.weight", key)
            if m:
                fused = np.asarray(gu_get(m.group(1) + ".gate_up_proj.weight"))
                return (fused[:inter_gu] if m.group(2) == "gate"
                        else fused[inter_gu:])
            return gu_get(key)

    if cfg.rope_interleaved:
        # GLM-4 (partial) / Llama-4 (full-dim) interleaved rope →
        # de-interleave each head's rotary prefix of q/k out-features at
        # load (q·k is invariant under a simultaneous per-head
        # permutation; Llama-4's weightless post-rope L2 norm is
        # permutation-invariant too), so the standard half-rotation
        # convention applies at runtime with no per-step cost
        pr_get = get
        hd = cfg.head_dim_
        rd = cfg.rope_dim_
        dim_perm = np.concatenate([np.arange(0, rd, 2), np.arange(1, rd, 2),
                                   np.arange(rd, hd)])

        def _deinterleave(w):  # w: (out, ...) HF layout, out = heads*hd
            n_heads = w.shape[0] // hd
            idx = (np.arange(n_heads)[:, None] * hd
                   + dim_perm[None, :]).reshape(-1)
            return w[idx]

        def get(key: str):
            w = pr_get(key)
            if re.match(r"model\.layers\.\d+\.self_attn\.[qk]_proj\."
                        r"(weight|bias)", key):
                return _deinterleave(np.asarray(w))
            return w

    if cfg.mla:
        # DeepSeek rope_interleave checkpoints: de-interleave each head's
        # rope rows of q (and the shared rope key rows of kv_a) at load so
        # the standard half-rotation applies at runtime — HF does the same
        # reshuffle per forward (apply_rotary_pos_emb_interleave)
        mla_get = get
        rd_m, nope_m = cfg.qk_rope_head_dim, cfg.qk_nope_head_dim
        qk_head_m = nope_m + rd_m
        deint = np.concatenate([np.arange(0, rd_m, 2),
                                np.arange(1, rd_m, 2)])

        def _q_rows(out_dim):
            idx = np.arange(out_dim)
            for h0 in range(0, out_dim, qk_head_m):
                idx[h0 + nope_m:h0 + qk_head_m] = h0 + nope_m + deint
            return idx

        def get(key: str):
            w = mla_get(key)
            if re.match(r"model\.layers\.\d+\.self_attn\."
                        r"(q_b_proj|q_proj)\.weight", key):
                w = np.asarray(w)
                return w[_q_rows(w.shape[0])]
            if re.match(r"model\.layers\.\d+\.self_attn\."
                        r"kv_a_proj_with_mqa\.weight", key):
                w = np.asarray(w)
                idx = np.arange(w.shape[0])
                kl = cfg.kv_lora_rank
                idx[kl:kl + rd_m] = kl + deint
                return w[idx]
            return w

    if cfg.sandwich_norms and cfg.fused_gate_up:  # GLM-4 norm names
        nm_get = get
        _GLM_NORMS = {"post_attention_layernorm": "post_self_attn_layernorm",
                      "pre_feedforward_layernorm": "post_attention_layernorm",
                      "post_feedforward_layernorm": "post_mlp_layernorm"}

        def get(key: str):
            m = re.match(r"(model\.layers\.\d+)\.(\w+)\.weight", key)
            if m and m.group(2) in _GLM_NORMS:
                return nm_get(f"{m.group(1)}.{_GLM_NORMS[m.group(2)]}.weight")
            return nm_get(key)

    np_dt = np.dtype(cfg.dtype)  # ml_dtypes registers 'bfloat16' with numpy

    def fetch_linear(hf_key):
        # host transpose to our (in, out) layout; copy=False keeps the
        # mmap'd view when dtypes already match
        return np.asarray(get(hf_key)).T.astype(np_dt, copy=False)

    def fetch_vector(hf_key):
        return np.asarray(get(hf_key)).astype(np_dt, copy=False)

    layers = []
    for i in range(cfg.num_hidden_layers):
        lp = {}
        for name, shape in layer_param_shapes(cfg, i).items():
            key = _hf_key(name, i)
            fetch = (fetch_vector if len(shape) == 1
                     else fetch_linear)
            if lazy:
                lp[name] = LazyTensor(
                    lambda key=key, fetch=fetch: fetch(key), shape, np_dt)
            else:
                lp[name] = fetch(key)
        layers.append(lp)

    embed = fetch_vector(_hf_key("embed_tokens", None))
    if cfg.tie_word_embeddings:
        lm_head = embed.T
    else:
        lm_head = fetch_linear(_hf_key("lm_head", None))
    return {
        "embed_tokens": embed,
        "layers": layers,
        "norm": fetch_vector(_hf_key("norm", None)),
        "lm_head": lm_head,
    }


def load_hf_model(model_dir, lazy: bool = False) -> Tuple[LlamaConfig, Params]:
    """Load config + weights from a HF model directory (safetensors shards).

    ``lazy=True`` streams the checkpoint: block weights become
    :class:`LazyTensor` views read from the shard files on first use
    (the 70B path — peak host RSS stays ~one block, not the model).
    """
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
                handles[path] = safe_open(str(path), framework="numpy")
            h = handles[path]
            if key in h.keys():
                return h.get_tensor(key)
        raise KeyError(key)

    return cfg, params_from_flat(cfg, get, lazy=lazy)


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
