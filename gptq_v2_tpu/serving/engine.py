"""Continuous-batching serving engine (new capability vs the reference).

Host-side scheduler around the jitted prefill/decode steps:

* fixed ``max_batch`` decode slots; finished sequences free their slot (and
  pages, in paged mode) immediately, new requests are admitted the same
  step — classic continuous batching,
* two cache layouts (see ``kv_cache.py``): ``contiguous`` (default,
  TPU-native — attention reads the cache in place, no gather) and
  ``paged`` (vLLM-style page pool; page 0 reserved as the trash page),
* prompts admitted in one tick prefill as batched calls grouped by
  power-of-two length bucket (batch padded to a power of two as well), so
  prefill compilations stay O(log max_len · log max_batch),
* every device step has static shapes; decode compiles once per
  power-of-two context bucket,
* sampling is per-row temperature (each request keeps its own temperature
  inside a mixed batch).
"""
from __future__ import annotations

import dataclasses
import logging
import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from gptq_v2_tpu.serving import decode as D
from gptq_v2_tpu.serving import kv_cache as kvc
from gptq_v2_tpu.serving.model import PackedLlama

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class Request:
    uid: int
    prompt: List[int]
    max_new_tokens: int = 64
    temperature: float = 0.0
    top_k: int = 0  # 0 = disabled; sample from the k highest-logit tokens
    top_p: float = 1.0  # 1.0 = disabled; nucleus sampling mass
    min_p: float = 0.0  # 0.0 = disabled; min probability vs the max token
    stop_token_ids: Optional[List[int]] = None  # per-request extra EOS set
    output: List[int] = dataclasses.field(default_factory=list)
    # raw-distribution log p(token) per output token (Engine(logprobs=True))
    logprobs: List[float] = dataclasses.field(default_factory=list)
    done: bool = False


@dataclasses.dataclass
class _Slot:
    request: Request
    length: int  # tokens currently in cache
    pages: List[int]
    prefill_done: int = 0  # prompt tokens already written (ragged scheduler)


def _bucket(n: int, lo: int = 16) -> int:
    b = lo
    while b < n:
        b *= 2
    return b


class Engine:
    def __init__(
        self,
        model: PackedLlama,
        max_batch: int = 8,
        page_size: int = 16,
        max_seq_len: int = 512,
        n_pages: Optional[int] = None,
        eos_token_id: Optional[int] = None,
        seed: int = 0,
        cache_kind: str = "contiguous",
        mesh=None,
        kv_dtype: str = "native",
        kv_scales=None,
        scheduler: str = "phased",
        token_budget: Optional[int] = None,
        draft: Optional[PackedLlama] = None,
        spec_k: int = 4,
        prefix_cache: bool = False,
        logprobs: bool = False,
        mla_absorbed: bool = False,
        multi_step: int = 1,
        multi_step_impl: str = "fori",
        fuse_stages: bool = True,
        act_dtype: str = "native",
    ):
        """``mesh``: shard the model/cache tensor-parallel over the mesh's
        ``model`` axis and serve through the shard_map'd steps (multi-chip
        serving; ``parallel/tp.py``).  Data parallelism = one engine per
        replica.

        ``kv_dtype="int8"``: store the KV cache as int8 with per-layer
        symmetric scales — decode at batch x context scale is KV-traffic
        bound (e.g. 8.6 GB/step vs 3.5 GB of INT4 weights at 7B, B=64,
        ctx 256), so halving KV bytes is the dominant lever.  ``kv_scales``
        supplies ``(k_scales, v_scales)`` per-layer tuples — see
        :func:`~gptq_v2_tpu.serving.model.calibrate_kv_scales`; if omitted
        they are calibrated on a synthetic forward at engine build.

        ``scheduler="ragged"`` (paged cache, single mesh-less chip):
        vLLM-style chunked prefill — every tick runs ONE dispatch mixing a
        decode token per active sequence with up to ``token_budget`` prompt
        tokens of admitting sequences (``decode.ragged_step``).  Prefill no
        longer stalls decode, and the prefill-bucket x decode-bucket
        compile matrix collapses to two programs (decode-only tick and
        mixed tick).  ``scheduler="phased"`` is the classic
        prefill-then-decode loop.

        ``mla_absorbed`` (DeepSeek MLA, phased, single-device): decode
        over the COMPRESSED latent cache — per token the cache stores one
        ``kv_lora + rope_dim`` row instead of per-head padded K/V (~85x
        smaller at V3 shapes), with the key half of ``kv_b`` absorbed
        into the query and the value half applied to the attention-
        weighted latent (``serving/mla.py``).  Prefill runs the exact
        naive attention and caches latent rows; greedy outputs match the
        naive engine.

        ``logprobs``: record ``log p(token)`` under the raw model
        distribution (f32 log-softmax of the unwarped logits) for every
        emitted token into ``Request.logprobs`` — computed inside the
        decode dispatch and read back bitcast-packed with the token, so
        the per-tick host sync stays ONE transfer.

        ``prefix_cache`` (paged cache + ragged scheduler): automatic
        shared-prefix KV reuse — full prompt pages are content-addressed
        by a sha256 chain from position 0 (so equal tokens at equal
        positions ⇒ equal KV, rope included), admission reuses every
        cached full page of the new prompt's prefix and streams only the
        remainder through the chunked-prefill tick.  Shared pages are
        refcounted; pages of finished requests stay cached until the pool
        runs dry, then evict LRU.  At least one prompt token is always
        recomputed (reuse is capped at ``(plen - 1) // page_size`` pages),
        which also guarantees shared pages are never written again.

        ``draft``: engine-integrated speculative decoding (contiguous
        cache, phased scheduling).  Every decode tick proposes ``spec_k``
        tokens per active slot with the draft model, verifies all slots'
        chunks in ONE target dispatch (``speculative.verify_chunk``), and
        emits 1..``spec_k + 1`` tokens per request via the standard
        accept/reject rule — continuous batching (per-slot admission /
        completion / EOS) composes with speculation.  Greedy requests'
        outputs are token-identical to the non-speculative engine.  With
        ``mesh`` the target verifies tensor-parallel while the small
        draft stays single-device."""
        # Fuse q/k/v and gate/up packed stages sharing one act-order perm
        # (single-device paths; TP shards the unfused names).  One fused
        # kernel call + ONE activation gather per stage — the act-order
        # column gather is a slow lane-shuffle op; bit-identical outputs
        # (serving.model.fuse_stage_linears).
        if fuse_stages and mesh is None and not mla_absorbed:
            from gptq_v2_tpu.serving.model import fuse_stage_linears

            model = fuse_stage_linears(model)
            if draft is not None:
                draft = fuse_stage_linears(draft)
        # W4A8 tier: per-row dynamic int8 activations into int8 MXU dots
        # (serving.model.to_w4a8; single-device — TP specs assume a16)
        assert act_dtype in ("native", "int8"), act_dtype
        if act_dtype == "int8":
            from gptq_v2_tpu.serving.model import to_w4a8

            assert mesh is None, "the W4A8 tier serves single-device"
            model = to_w4a8(model)
        self.model = model
        cfg = model.cfg
        # GPT-OSS attention sinks ride every cache layout: the contiguous
        # einsum path handles them natively, and the paged/ragged kernels
        # use the sink-extended fork (ops/_ragged_sink_kernel.py)
        if cfg.attn_chunk_size and cache_kind == "paged":
            # paged/ragged chunked attention works by block-table rebasing
            # (serving/decode.py) — the chunk boundary must be page-aligned
            assert cfg.attn_chunk_size % page_size == 0, (
                f"attn_chunk_size {cfg.attn_chunk_size} must be a multiple"
                f" of page_size {page_size} for paged serving")
        if cfg.attn_chunk_size or cfg.attn_temp_tuning:
            assert draft is None, (
                "Llama-4 chunked attention / temperature tuning do not"
                " compose with speculative decoding")
        self.max_batch = max_batch
        self.cache_kind = cache_kind
        # multi-step decode ticks: k fused decode+sample steps per host
        # sync.  ``multi_step_impl="fori"`` (default) runs them under one
        # lax.fori_loop — the body compiles ONCE (seconds at 7B, vs >25 min
        # for the k-times-unrolled program on a remote-compile host) with
        # the donated cache updated in place; ``"unroll"`` keeps the
        # straight-line program (marginally less loop overhead at tiny k).
        # Phased scheduler only; admission/EOS handling runs every k
        # tokens, tokens sampled after a mid-chunk stop are discarded
        # host-side (the same semantics as the speculative engine's chunk
        # tail).  Both impls are token-identical to single-step.
        self.multi_step = max(1, int(multi_step))
        assert multi_step_impl in ("fori", "unroll"), multi_step_impl
        self.multi_step_impl = multi_step_impl
        if self.multi_step > 1:
            assert draft is None, (
                "multi_step rides the non-speculative decode ticks")
            # mla_absorbed composes: mla_decode_sample_loop single-device,
            # the TP absorbed fori tick over the mesh (round-5)
            # ragged: decode-only ticks fuse k steps (decode.ragged_multi_
            # step); ticks with admitting prompts stay single-step so
            # chunked prefill is never delayed
        self.page_size = page_size
        self.max_pages_per_seq = -(-max_seq_len // page_size)
        self.max_seq_len = self.max_pages_per_seq * page_size
        if kv_dtype in ("int8", "int4"):
            if kv_scales is None:
                from gptq_v2_tpu.serving.model import calibrate_kv_scales

                kv_scales = calibrate_kv_scales(
                    model, bits=4 if kv_dtype == "int4" else 8)
            k_scales, v_scales = kv_scales
            cache_dtype = jnp.int8
        elif kv_dtype == "native":
            k_scales = v_scales = None
            cache_dtype = model.embed_tokens.dtype
        else:
            raise ValueError(kv_dtype)
        if kv_dtype == "int4":
            assert not mla_absorbed, (
                "int4 KV rides the contiguous (two-pass XLA unpack) and "
                "paged (in-kernel nibble unpack, ops/_ragged_sink_kernel "
                "kv_int4) caches; the MLA latent cache has its own int8 "
                "tier (kv_dtype='int8')")
            # speculation composes on the ragged paged path (round-5): the
            # verify dispatch runs the same int4-page kernels
            assert draft is None or scheduler == "ragged", (
                "int4 KV + speculation rides the ragged scheduler's paged "
                "verify path (scheduler='ragged')")
            if mesh is not None:
                from gptq_v2_tpu.parallel.mesh import tp_size

                # TP shards the paged pool's combined axis: adjacent-pair
                # bytes keep real heads contiguous, so the split aligns
                # with the q-head column shard when each shard holds whole
                # pairs
                assert cache_kind == "paged" and "stage" not in mesh.axis_names
                assert (model.cfg.num_key_value_heads
                        % (2 * tp_size(mesh)) == 0), (
                    "int4 TP needs n_kv % (2*tp) == 0 (whole nibble pairs"
                    " per shard)")
        self.mla_absorbed = mla_absorbed
        if mla_absorbed:
            from gptq_v2_tpu.serving import mla as MLA

            assert cfg.mla, "mla_absorbed requires a DeepSeek MLA model"
            assert ((cache_kind == "contiguous" and scheduler == "phased")
                    or (cache_kind == "paged" and scheduler == "ragged"
                        and mesh is None)), (
                "mla_absorbed serves contiguous+phased, or (round-5) the "
                "paged latent cache under the ragged scheduler "
                "(single-device)")
            # round-5: speculation composes — the target verifies chunks
            # over the absorbed latent cache (mla.mla_verify_chunk);
            # phased + contiguous only (the spec engine's scheduling mode)
            assert draft is None or (cache_kind == "contiguous"
                                     and scheduler == "phased" and
                                     mesh is None), (
                "MLA speculation runs phased+contiguous, single-device")
            # int8 latent: per-layer calibrated scales, like the K/V path
            self._mla_scales = (MLA.calibrate_mla_scales(model)
                                if kv_dtype == "int8" else None)
            lat_dim = cfg.kv_lora_rank + cfg.qk_rope_head_dim
            lat_dtype = (jnp.int8 if kv_dtype == "int8"
                         else model.embed_tokens.dtype)
            self._absorbed = MLA.absorb_kv_b(model)
            if scheduler == "ragged":
                if n_pages is None:
                    n_pages = 1 + max_batch * self.max_pages_per_seq
                self.cache = MLA.init_mla_paged_cache(
                    cfg.num_hidden_layers, n_pages, page_size, lat_dim,
                    dtype=lat_dtype)
                self.free_pages = list(range(1, n_pages))  # page 0 = trash
                self.block_tables = np.zeros(
                    (max_batch, self.max_pages_per_seq), np.int32)
            else:
                self.cache = MLA.init_mla_cache(
                    cfg.num_hidden_layers, max_batch, self.max_seq_len,
                    lat_dim, dtype=lat_dtype)
                self.free_pages = []
                self.block_tables = None
        elif cache_kind == "contiguous":
            self.cache = kvc.init_contiguous_cache(
                cfg.num_hidden_layers, max_batch, self.max_seq_len,
                cfg.num_key_value_heads, cfg.head_dim_,
                dtype=cache_dtype, k_scales=k_scales, v_scales=v_scales,
                kv_bits=4 if kv_dtype == "int4" else None,
            )
            self.free_pages: List[int] = []
            self.block_tables = None
        elif cache_kind == "paged":
            if n_pages is None:
                n_pages = 1 + max_batch * self.max_pages_per_seq
            # int4 pages keep the PER-KV-HEAD calibrated scales (round-5:
            # the round-4 collapse to a per-layer max is gone — writes
            # quantize per head, reads fold the head scales into q / the
            # attention output outside the kernel, decode.fold_paged_kv_
            # scales, so heads with small ranges keep their resolution)
            self.cache = kvc.init_cache(
                cfg.num_hidden_layers, n_pages, page_size,
                cfg.num_key_value_heads, cfg.head_dim_,
                dtype=cache_dtype, k_scales=k_scales, v_scales=v_scales,
                kv_bits=4 if kv_dtype == "int4" else None,
            )
            self.free_pages = list(range(1, n_pages))  # page 0 = trash
            self.block_tables = np.zeros((max_batch, self.max_pages_per_seq),
                                         np.int32)
        else:
            raise ValueError(cache_kind)
        self.scheduler = scheduler
        if scheduler == "ragged":
            assert cache_kind == "paged", "ragged scheduler needs paged cache"
            assert mesh is None or "stage" not in mesh.axis_names, \
                "ragged scheduling composes with TP meshes, not PP"
        elif scheduler != "phased":
            raise ValueError(scheduler)
        self.token_budget = token_budget or max(2 * max_batch, 64)
        self.logprobs = logprobs
        self.prefix_cache = prefix_cache
        if prefix_cache:
            assert cache_kind == "paged" and scheduler == "ragged", \
                "prefix caching runs on the paged cache + ragged scheduler"
            self._hash_to_page: Dict[bytes, int] = {}
            self._page_key: Dict[int, bytes] = {}  # inverse, for eviction
            self._page_rc: Dict[int, int] = {}  # active slots per cached page
            self._cached_free: Dict[int, None] = {}  # rc==0, LRU order
            self.prefix_hit_tokens = 0
        self.draft = draft
        self.spec_k = spec_k
        self.spec_rounds = self.spec_proposed = self.spec_accepted = 0
        self._tp_verify = None
        if draft is not None:
            # logprobs compose: the verify dispatch already computes the
            # raw target distribution (speculative.acceptance_step
            # return_logprobs)
            if scheduler == "ragged":
                pass  # single-device or TP mesh (build_tp_ragged_spec_step)
            else:
                assert cache_kind == "contiguous", \
                    "phased speculative serving uses the contiguous KV cache"
                assert mesh is None or "stage" not in mesh.axis_names, \
                    "speculative serving composes with TP meshes, not PP"
            assert draft.cfg.vocab_size == cfg.vocab_size, "vocab mismatch"
            assert spec_k >= 1
            dcfg = draft.cfg
            self.draft_cache = kvc.init_contiguous_cache(
                dcfg.num_hidden_layers, max_batch, self.max_seq_len,
                dcfg.num_key_value_heads, dcfg.head_dim_,
                dtype=draft.embed_tokens.dtype)
            self.prev_tokens = np.zeros((max_batch,), np.int32)
        self.mesh = mesh
        self._min_prefill_batch = 1
        # multi-step tick builders for meshed serving (round-5: multi-step
        # composes with TP and PP — the k-step fori body runs INSIDE the
        # shard_map, so multi-chip serving amortizes the per-token host
        # sync exactly like the single-chip tick)
        self._tp_loop = self._pp_loop = self._tp_ragged_multi = None
        self._mla_tp_loop = None
        if mesh is not None and "stage" in mesh.axis_names:
            # pipeline-parallel serving: layer stages over the 'stage' axis
            from gptq_v2_tpu.parallel import pp as PP

            pp = PP.pp_size(mesh)
            assert cache_kind == "contiguous", "PP serving uses contiguous KV"
            assert scheduler == "phased", "PP serving uses phased scheduling"
            assert max_batch % pp == 0, (max_batch, pp)
            self.model = PP.shard_packed_llama_pp(model, mesh)
            self.cache = PP.shard_cache_pp(self.cache, mesh)
            self._min_prefill_batch = pp
            scales = (None if k_scales is None else (k_scales, v_scales))
            pp_dec = PP.build_pp_decode_step(mesh, max_batch,
                                             kv_scales=scales)
            self._decode = (lambda m, t, c, bt, pos, s_bucket=None:
                            pp_dec(m, t, c, pos))
            if self.multi_step > 1:
                self._pp_loop = PP.build_pp_decode_loop(mesh, max_batch,
                                                        kv_scales=scales)
            prefills = {}

            def _pp_prefill(m, tokens, cache, bt, lengths, slot):
                nb = tokens.shape[0]
                if nb not in prefills:
                    prefills[nb] = PP.build_pp_prefill(mesh, nb,
                                                       kv_scales=scales)
                return prefills[nb](m, tokens, cache, lengths, slot)

            self._prefill = _pp_prefill
        elif mesh is not None and not mla_absorbed:
            from gptq_v2_tpu.parallel import tp as TP

            self.model = TP.shard_packed_llama(model, mesh)
            self.cache = TP.shard_cache(self.cache, mesh)
            self._prefill = TP.build_tp_prefill(mesh, self.cache)
            self._decode = TP.build_tp_decode_step(mesh, self.cache)
            self._ragged = (TP.build_tp_ragged_step(mesh)
                            if scheduler == "ragged" else None)
            self._ragged_spec = (TP.build_tp_ragged_spec_step(mesh)
                                 if scheduler == "ragged" and draft is not None
                                 else None)
            if draft is not None and scheduler != "ragged":
                self._tp_verify = TP.build_tp_verify_chunk(mesh, self.cache)
            if self.multi_step > 1:
                self._tp_loop = TP.build_tp_decode_loop(mesh, self.cache)
                if scheduler == "ragged":
                    self._tp_ragged_multi = TP.build_tp_ragged_multi(mesh)
        elif mla_absorbed and mesh is not None:
            # TP absorbed decode: q_b + absorbed halves shard by head, the
            # tiny latent cache replicates (serving/mla.py)
            from gptq_v2_tpu.parallel import tp as TP
            from gptq_v2_tpu.serving import mla as MLA

            self.model = TP.shard_packed_llama(model, mesh)
            from gptq_v2_tpu.parallel.mesh import tp_size

            self._absorbed = MLA.shard_absorbed(self._absorbed, mesh,
                                                tp_size(mesh))
            self.cache = jax.device_put(
                self.cache, jax.sharding.NamedSharding(
                    mesh, jax.sharding.PartitionSpec()))
            _pf = MLA.build_tp_mla_prefill(mesh, scales=self._mla_scales)
            self._prefill = (lambda m, t, c, bt, lens, slot:
                             _pf(m, t, c, lens, slot))
            self._mla_tp_decode, self._mla_tp_loop = \
                MLA.build_tp_mla_decode_step(mesh, scales=self._mla_scales)
            self._decode = self._ragged = None
        elif mla_absorbed:
            from gptq_v2_tpu.serving import mla as MLA

            if scheduler == "ragged":
                # every tick (mixed prefill+decode) runs the absorbed
                # ragged step over the paged latent cache
                self._prefill = None

                def _mla_ragged(m, tokens, cache, positions, tok_pages,
                                tok_offs, bt, kv_lens, cu, num_seqs,
                                sample_rows, temps, key, tks=None, tps=None,
                                mps=None, return_logprobs=False):
                    return MLA.mla_ragged_step(
                        m, self._absorbed, tokens, cache, positions,
                        tok_pages, tok_offs, bt, kv_lens, cu, num_seqs,
                        sample_rows, temps, key, tks, tps, mps,
                        scales=self._mla_scales,
                        return_logprobs=return_logprobs)

                self._ragged = _mla_ragged
                self._decode = None
            else:
                self._prefill = (lambda m, t, c, bt, lens, slot:
                                 MLA.mla_prefill(m, t, c, lens, slot,
                                                 scales=self._mla_scales))
                self._decode = self._ragged = None
        else:
            self._prefill = D.prefill
            self._decode = D.decode_step
            self._ragged = D.ragged_step
        self.slots: List[Optional[_Slot]] = [None] * max_batch
        self.last_tokens = np.zeros((max_batch,), np.int32)
        self.queue: List[Request] = []
        self.eos_token_id = eos_token_id
        self.key = jax.random.key(seed)
        self.steps = 0
        self.decode_tokens = 0
        self._dev = None  # device-resident scheduler state (see step())
        self._dirty = True
        # flips True on the first request that uses top-k/top-p; switches
        # the sampling dispatches to the per-row-warped variant (one extra
        # compile, then stable)
        self._sampling_full = False

    # ------------------------------------------------------------------ admin
    def add_request(self, req: Request) -> None:
        # speculative chunks write up to spec_k positions past the last
        # emitted token; reserve that headroom in the cache
        pad = self.spec_k if self.draft is not None else 0
        assert len(req.prompt) + req.max_new_tokens + pad <= self.max_seq_len, (
            f"request {req.uid} exceeds max_seq_len {self.max_seq_len}")
        # round-5: warped sampling (top-k/top-p/min-p) composes with every
        # engine mode incl. MLA-absorbed — add_request has no exclusions
        if req.top_k > 0 or req.top_p < 1.0 or req.min_p > 0.0:
            self._sampling_full = True
        self.queue.append(req)

    def _alloc_pages(self, n: int) -> Optional[List[int]]:
        if self.prefix_cache:
            # reclaim LRU cached-but-unreferenced pages once the plain
            # free list runs dry
            while len(self.free_pages) < n and self._cached_free:
                page = next(iter(self._cached_free))
                del self._cached_free[page]
                del self._hash_to_page[self._page_key.pop(page)]
                del self._page_rc[page]
                self.free_pages.append(page)
        if len(self.free_pages) < n:
            return None
        pages, self.free_pages = self.free_pages[:n], self.free_pages[n:]
        return pages

    def _free_slot(self, si: int) -> None:
        slot = self.slots[si]
        if slot and self.prefix_cache:
            for p in slot.pages:
                if p in self._page_rc:  # cached (shared or registered) page
                    self._page_rc[p] -= 1
                    if self._page_rc[p] == 0:
                        self._cached_free[p] = None  # newest = LRU tail
                else:
                    self.free_pages.append(p)
        elif slot:
            self.free_pages.extend(slot.pages)
        self.slots[si] = None
        self._dirty = True
        if self.block_tables is not None:
            self.block_tables[si] = 0

    def _bt(self, si: Optional[int] = None):
        if self.block_tables is None:
            return None
        bt = self.block_tables if si is None else self.block_tables[si:si + 1]
        return jnp.asarray(bt)

    # ---------------------------------------------------------------- prefill
    def _admit(self) -> None:
        """Admit queued requests into free slots; prompts sharing a length
        bucket prefill as ONE batched call (padded to a power-of-two batch
        by repeating the last row — duplicate cache writes of identical
        values are benign, pad logits are dropped)."""
        admitted = []  # (slot, request, prompt_len)
        for si in range(self.max_batch):
            if self.slots[si] is not None or not self.queue:
                continue
            req = self.queue[0]
            plen = len(req.prompt)
            if self.cache_kind == "paged":
                need = -(-(plen + req.max_new_tokens) // self.page_size)
                pages = self._alloc_pages(need)
                if pages is None:
                    break  # wait for memory
                self.block_tables[si] = 0
                self.block_tables[si, :need] = pages
            else:
                pages = []
            self.queue.pop(0)
            self.slots[si] = _Slot(request=req, length=plen, pages=pages)
            admitted.append((si, req, plen))

        by_bucket: Dict[int, list] = {}
        for item in admitted:
            by_bucket.setdefault(_bucket(item[2]), []).append(item)
        for lpad, group in by_bucket.items():
            # PP prefill needs a stage-divisible batch; pad rows are benign
            nb = max(_bucket(len(group), lo=1), self._min_prefill_batch)
            rows = group + [group[-1]] * (nb - len(group))
            tokens = np.zeros((nb, lpad), np.int32)
            lengths = np.zeros((nb,), np.int32)
            slot_ids = np.zeros((nb,), np.int32)
            for i, (si, req, plen) in enumerate(rows):
                tokens[i, :plen] = req.prompt
                lengths[i] = plen
                slot_ids[i] = si
            bt = None
            if self.block_tables is not None:
                bt = jnp.asarray(self.block_tables[slot_ids])
            logits, self.cache = self._prefill(
                self.model, jnp.asarray(tokens), self.cache, bt,
                jnp.asarray(lengths), jnp.asarray(slot_ids),
            )
            if self.draft is not None:  # mirror the prompt into draft KV
                _, self.draft_cache = D.prefill(
                    self.draft, jnp.asarray(tokens), self.draft_cache, None,
                    jnp.asarray(lengths), slot=jnp.asarray(slot_ids))
                for si, req, _ in group:
                    self.prev_tokens[si] = req.prompt[-1]
            temps = np.zeros((nb,), np.float32)
            tks, tps, mps = self._warp_arrays(nb)
            for i, (_, req, _) in enumerate(group):
                temps[i] = req.temperature
                if tks is not None:
                    tks[i], tps[i], mps[i] = req.top_k, req.top_p, req.min_p
            toks, lps = self._sample(logits, temps, tks, tps, mps)
            for i, (si, req, _) in enumerate(group):
                self._emit(si, int(toks[i]),
                           None if lps is None else float(lps[i]))
        if admitted:
            self._dirty = True

    # ----------------------------------------------------------------- decode
    def _warp_arrays(self, n: int):
        """(top_ks, top_ps, min_ps) host buffers sized ``n``, or three
        Nones while no request has asked for top-k/top-p/min-p (keeps the
        cheap sampling program compiled for the common case)."""
        if not self._sampling_full:
            return None, None, None
        return (np.zeros((n,), np.int32), np.ones((n,), np.float32),
                np.zeros((n,), np.float32))

    def _sample(self, logits, temperatures: np.ndarray, top_ks=None,
                top_ps=None, min_ps=None):
        """Sample one token per row; returns ``(tokens, logprobs|None)``
        host arrays (one device->host transfer either way)."""
        self.key, sub = jax.random.split(self.key)
        toks = D.sample_per_row(
            logits, sub, jnp.asarray(temperatures, jnp.float32),
            top_ks=None if top_ks is None else jnp.asarray(top_ks),
            top_ps=None if top_ps is None else jnp.asarray(top_ps),
            min_ps=None if min_ps is None else jnp.asarray(min_ps))
        if self.logprobs:
            packed = D.pack_tok_logprob(toks, D.chosen_logprob(logits, toks))
            return D.unpack_tok_logprob(np.asarray(packed))
        return np.asarray(toks), None

    def _emit(self, si: int, token: int, lp: Optional[float] = None) -> None:
        slot = self.slots[si]
        req = slot.request
        req.output.append(token)
        if lp is not None:
            req.logprobs.append(lp)
        self.last_tokens[si] = token
        stop = (self.eos_token_id is not None and token == self.eos_token_id
                ) or (req.stop_token_ids is not None
                      and token in req.stop_token_ids)
        if stop or len(req.output) >= req.max_new_tokens:
            req.done = True
            self._free_slot(si)

    # ----------------------------------------------------------------- ragged
    def _prefix_chain(self, prompt: List[int], n_pages: int):
        """sha256 chain key per full prompt page (position-anchored: the
        chain starts at position 0, so a key pins both content and
        absolute positions — rope-safe)."""
        import hashlib

        h, keys = b"", []
        ps = self.page_size
        for i in range(n_pages):
            chunk = np.asarray(prompt[i * ps:(i + 1) * ps], np.int64)
            h = hashlib.sha256(h + chunk.tobytes()).digest()
            keys.append(h)
        return keys

    def _prefix_lookup(self, prompt: List[int]) -> List[int]:
        """Longest cached page-chain for this prompt, capped so at least
        one prompt token is left to recompute (the sampled first token
        needs a forward pass, and the cap keeps shared pages write-free).
        Bumps refcounts; caller must roll back via ``_prefix_release`` if
        admission fails."""
        reuse = []
        for key in self._prefix_chain(prompt,
                                      (len(prompt) - 1) // self.page_size):
            page = self._hash_to_page.get(key)
            if page is None:
                break
            reuse.append(page)
            self._page_rc[page] += 1
            self._cached_free.pop(page, None)  # active again: not evictable
        return reuse

    def _prefix_release(self, pages: List[int]) -> None:
        for p in pages:
            self._page_rc[p] -= 1
            if self._page_rc[p] == 0:
                self._cached_free[p] = None

    def _prefix_register(self, si: int) -> None:
        """Called when a slot finishes prefill: publish its full prompt
        pages (pages wholly covered by prompt tokens — never written
        again) into the content-addressed cache."""
        slot = self.slots[si]
        prompt = slot.request.prompt
        for i, key in enumerate(self._prefix_chain(
                prompt, len(prompt) // self.page_size)):
            page = int(self.block_tables[si, i])
            if self._hash_to_page.get(key) is not None:
                continue  # this page was reused, or another copy is cached
            self._hash_to_page[key] = page
            self._page_key[page] = key
            self._page_rc[page] = 1

    def _admit_ragged(self) -> None:
        """Bookkeeping-only admission: allocate a slot + pages; the prompt
        streams in chunks through subsequent ragged ticks.  With
        ``prefix_cache`` the longest cached prefix chain is linked into
        the block table instead of allocated+recomputed."""
        for si in range(self.max_batch):
            if self.slots[si] is not None or not self.queue:
                continue
            req = self.queue[0]
            plen = len(req.prompt)
            # speculative chunks write up to spec_k positions past the
            # last emitted token; allocate that headroom
            pad = self.spec_k if self.draft is not None else 0
            need = -(-(plen + req.max_new_tokens + pad) // self.page_size)
            reuse = self._prefix_lookup(req.prompt) if self.prefix_cache \
                else []
            pages = self._alloc_pages(need - len(reuse))
            if pages is None:
                if reuse:
                    self._prefix_release(reuse)
                break  # wait for memory
            self.block_tables[si] = 0
            self.block_tables[si, :need] = reuse + pages
            self.queue.pop(0)
            done = len(reuse) * self.page_size
            if self.prefix_cache:
                self.prefix_hit_tokens += done
            self.slots[si] = _Slot(request=req, length=done,
                                   pages=reuse + pages, prefill_done=done)

    def _step_ragged(self) -> None:
        """One mixed prefill+decode tick (see ``decode.ragged_step``)."""
        self._admit_ragged()
        active = [si for si in range(self.max_batch)
                  if self.slots[si] is not None]
        if not active:
            return
        S, PS = self.max_batch, self.page_size
        decoding = [si for si in active
                    if self.slots[si].prefill_done >= len(self.slots[si].request.prompt)]
        prefilling = [si for si in active if si not in decoding]
        # multi-step: a DECODE-ONLY tick (no admitting prompts) fuses k
        # ragged steps in one dispatch — page/offset targets derive on
        # device, EOS/max_new tails are discarded host-side (the same
        # semantics as the phased multi-step chunk).  Mixed ticks stay
        # single-step so prefill chunking is never delayed.
        k_steps = self.multi_step
        if (k_steps > 1 and not prefilling and not self.mla_absorbed
                and (self.mesh is None or self._tp_ragged_multi is not None)
                and max(self.slots[si].length for si in decoding) + k_steps
                <= self.max_seq_len):
            return self._step_ragged_multi(decoding, k_steps)
        # two static shapes total: a decode-only tick (S rows) and a mixed
        # tick (token_budget rows)
        T = self.token_budget if prefilling else S

        tokens = np.zeros((T,), np.int32)
        positions = np.zeros((T,), np.int32)
        tok_pages = np.zeros((T,), np.int32)  # 0 = trash page for padding
        tok_offs = np.zeros((T,), np.int32)
        kv_lens = np.ones((S,), np.int32)
        cu = np.zeros((S + 1,), np.int32)
        sample_rows = np.zeros((S,), np.int32)
        temps = np.zeros((S,), np.float32)
        tks, tps, mps = self._warp_arrays(S)
        bt_rows = np.zeros((S, self.max_pages_per_seq), np.int32)

        row = 0
        order = []  # (slot_id, n_new, completes_prefill)
        remaining = T - len(decoding)
        for si in decoding + prefilling:
            slot = self.slots[si]
            req = slot.request
            if si in decoding:
                n_new = 1
                tokens[row] = self.last_tokens[si]
                positions[row] = slot.length
                completes = True
            else:
                left = len(req.prompt) - slot.prefill_done
                n_new = min(left, max(0, remaining))
                ac = self.model.cfg.attn_chunk_size
                if ac:  # Llama-4: a tick's tokens must share one attn
                    # chunk (the ragged dispatch rebases ONE chunk start
                    # per sequence); cap at the next chunk boundary
                    n_new = min(n_new,
                                (slot.prefill_done // ac + 1) * ac
                                - slot.prefill_done)
                if n_new == 0:  # out of budget this tick; try next tick
                    continue
                remaining -= n_new
                chunk = req.prompt[slot.prefill_done:slot.prefill_done + n_new]
                tokens[row:row + n_new] = chunk
                positions[row:row + n_new] = np.arange(
                    slot.prefill_done, slot.prefill_done + n_new)
                completes = slot.prefill_done + n_new >= len(req.prompt)
            i = len(order)
            pos = positions[row:row + n_new]
            tok_pages[row:row + n_new] = self.block_tables[si][pos // PS]
            tok_offs[row:row + n_new] = pos % PS
            kv_lens[i] = int(pos[-1]) + 1
            cu[i + 1] = cu[i] + n_new
            sample_rows[i] = row + n_new - 1
            temps[i] = req.temperature
            if tks is not None:
                tks[i], tps[i], mps[i] = req.top_k, req.top_p, req.min_p
            bt_rows[i] = self.block_tables[si]
            order.append((si, n_new, completes))
            row += n_new
        cu[len(order) + 1:] = cu[len(order)]

        toks_dev, self.cache, self.key = self._ragged(
            self.model, jnp.asarray(tokens), self.cache,
            jnp.asarray(positions), jnp.asarray(tok_pages),
            jnp.asarray(tok_offs), jnp.asarray(bt_rows),
            jnp.asarray(kv_lens), jnp.asarray(cu),
            jnp.asarray([len(order)], np.int32),
            jnp.asarray(sample_rows), jnp.asarray(temps), self.key,
            None if tks is None else jnp.asarray(tks),
            None if tps is None else jnp.asarray(tps),
            None if mps is None else jnp.asarray(mps),
            return_logprobs=self.logprobs,
        )
        arr = np.asarray(toks_dev)  # the one host sync per tick
        toks, lps = (D.unpack_tok_logprob(arr) if self.logprobs
                     else (arr, None))
        self.steps += 1
        for i, (si, n_new, completes) in enumerate(order):
            slot = self.slots[si]
            lp_i = None if lps is None else float(lps[i])
            if si in decoding:
                slot.length += 1
                self.decode_tokens += 1
                self._emit(si, int(toks[i]), lp_i)
            else:
                slot.prefill_done += n_new
                slot.length = slot.prefill_done
                if completes:  # prompt done: first generated token
                    if self.prefix_cache:
                        # register BEFORE _emit: a 1-token request frees
                        # its slot inside _emit
                        self._prefix_register(si)
                    self._emit(si, int(toks[i]), lp_i)

    def _step_ragged_multi(self, decoding, k_steps: int) -> None:
        """k fused decode-only ragged steps (``decode.ragged_multi_step``):
        one dispatch, one host sync, per-token bookkeeping afterwards."""
        S = self.max_batch
        tokens = np.zeros((S,), np.int32)
        positions = np.zeros((S,), np.int32)
        kv_lens = np.ones((S,), np.int32)
        temps = np.zeros((S,), np.float32)
        tks, tps, mps = self._warp_arrays(S)
        bt_rows = np.zeros((S, self.max_pages_per_seq), np.int32)
        for i, si in enumerate(decoding):
            slot = self.slots[si]
            tokens[i] = self.last_tokens[si]
            positions[i] = slot.length
            kv_lens[i] = slot.length + 1
            temps[i] = slot.request.temperature
            if tks is not None:
                tks[i] = slot.request.top_k
                tps[i] = slot.request.top_p
                mps[i] = slot.request.min_p
            bt_rows[i] = self.block_tables[si]
        ragged_multi = (self._tp_ragged_multi
                        if self._tp_ragged_multi is not None
                        else D.ragged_multi_step)
        out_dev, self.cache, self.key = ragged_multi(
            self.model, jnp.asarray(tokens), self.cache,
            jnp.asarray(positions), jnp.asarray(bt_rows),
            jnp.asarray(kv_lens), jnp.asarray([len(decoding)], np.int32),
            jnp.asarray(temps), self.key, k_steps,
            None if tks is None else jnp.asarray(tks),
            None if tps is None else jnp.asarray(tps),
            None if mps is None else jnp.asarray(mps),
            return_logprobs=self.logprobs,
        )
        arr = np.asarray(out_dev)  # the one host sync per tick
        self.steps += 1
        for step in range(k_steps):
            toks, lps = (D.unpack_tok_logprob(arr[step]) if self.logprobs
                         else (arr[step], None))
            for i, si in enumerate(decoding):
                if self.slots[si] is None:  # stopped mid-chunk: tail
                    continue  # discarded (same as phased multi-step)
                self.slots[si].length += 1
                self.decode_tokens += 1
                self._emit(si, int(toks[i]),
                           None if lps is None else float(lps[i]))

    # ------------------------------------------------------------ speculative
    def _draft_propose(self, pos_dev, temps_dev, cur, warps=(None,) * 3):
        """k draft proposals per slot: a 2-token catch-up chunk (rewrites
        position - 1, filling the draft KV gap after a fully-accepted
        round), then k - 1 plain decode steps.  Proposals sample from the
        per-row WARPED draft distribution (the corrected acceptance rule
        requires p_d to be what the draft actually sampled from).
        Returns ``(d_logits (B, k, V), d_toks (B, k))`` on device."""
        from gptq_v2_tpu.serving.speculative import verify_chunk

        tks, tps, mps = warps
        pair = jnp.stack([jnp.asarray(self.prev_tokens), cur], axis=1)
        lg2, self.draft_cache = verify_chunk(self.draft, pair,
                                             self.draft_cache, pos_dev - 1)
        self.key, sub = jax.random.split(self.key)
        d_in = D.sample_per_row(lg2[:, 1], sub, temps_dev,
                                top_ks=tks, top_ps=tps, min_ps=mps)
        d_lgs, d_tks = [lg2[:, 1]], [d_in]
        for i in range(1, self.spec_k):
            lg, self.draft_cache = D.decode_step(
                self.draft, d_in, self.draft_cache, None, pos_dev + i)
            self.key, sub = jax.random.split(self.key)
            d_in = D.sample_per_row(lg, sub, temps_dev,
                                    top_ks=tks, top_ps=tps, min_ps=mps)
            d_lgs.append(lg)
            d_tks.append(d_in)
        return jnp.stack(d_lgs, axis=1), jnp.stack(d_tks, axis=1)

    def _verify(self, chunk, positions):
        if self.mla_absorbed:  # round-5: verify over the latent cache
            from gptq_v2_tpu.serving import mla as MLA

            # bound the attended context like the decode ticks: the chunk
            # writes through max_len(active) + spec_k
            max_pos = max((s.length for s in self.slots if s is not None),
                          default=0)
            s_bucket = min(_bucket(max_pos + self.spec_k + 1,
                                   lo=self.page_size), self.max_seq_len)
            return MLA.mla_verify_chunk(self.model, self._absorbed, chunk,
                                        self.cache, positions,
                                        scales=self._mla_scales,
                                        s_bucket=s_bucket)
        if self._tp_verify is not None:
            return self._tp_verify(self.model, chunk, self.cache, positions)
        from gptq_v2_tpu.serving.speculative import verify_chunk

        return verify_chunk(self.model, chunk, self.cache, positions)

    def _step_speculative(self) -> None:
        """One continuous-batching tick with draft speculation: k draft
        proposals per slot, ONE (B, k+1) target verify over every slot,
        accept/reject on device, 1..k+1 emits per active request.

        Inactive slots ride along at position 1 with token 0 — their
        junk KV is never attended (every position is rewritten before any
        query can reach it, the same trash-steering invariant as prefill
        padding) and their sampled tokens are dropped.  A request
        finishing mid-chunk (EOS / max_new_tokens) stops emitting there;
        the tail of its chunk is discarded and the slot frees this tick.
        """
        from gptq_v2_tpu.serving.speculative import acceptance_step

        self._admit()
        active = [si for si in range(self.max_batch)
                  if self.slots[si] is not None]
        if not active:
            return
        k = self.spec_k
        positions = np.ones((self.max_batch,), np.int32)
        temps = np.zeros((self.max_batch,), np.float32)
        tks, tps, mps = self._warp_arrays(self.max_batch)
        for si in active:
            positions[si] = self.slots[si].length
            temps[si] = self.slots[si].request.temperature
            if tks is not None:
                tks[si] = self.slots[si].request.top_k
                tps[si] = self.slots[si].request.top_p
                mps[si] = self.slots[si].request.min_p
        pos_dev = jnp.asarray(positions)
        temps_dev = jnp.asarray(temps)
        warps = tuple(None if a is None else jnp.asarray(a)
                      for a in (tks, tps, mps))
        cur = jnp.asarray(self.last_tokens)

        d_logits, d_toks = self._draft_propose(pos_dev, temps_dev, cur,
                                               warps=warps)

        chunk = jnp.concatenate([cur[:, None], d_toks], axis=1)
        t_logits, self.cache = self._verify(chunk, pos_dev)
        self.key, sub = jax.random.split(self.key)
        out, counts, self.key = acceptance_step(
            t_logits, d_logits, d_toks, sub, temps_dev,
            top_ks=warps[0], top_ps=warps[1], min_ps=warps[2],
            return_logprobs=self.logprobs)
        out_np = np.asarray(out)
        counts_np = np.asarray(counts)  # the one host sync per tick
        if self.logprobs:
            out_np, lps_np = out_np[..., 0], out_np[..., 1].view(np.float32)
        self.steps += 1
        self.spec_rounds += len(active)
        self.spec_proposed += k * len(active)
        for si in active:
            self.spec_accepted += int(counts_np[si]) - 1
            for j in range(int(counts_np[si])):
                if self.slots[si] is None:
                    break  # finished mid-chunk; drop the rest
                self.slots[si].length += 1
                self.decode_tokens += 1
                self.prev_tokens[si] = self.last_tokens[si]
                self._emit(si, int(out_np[si, j]),
                           float(lps_np[si, j]) if self.logprobs else None)

    def _step_ragged_spec(self) -> None:
        """One speculative ragged tick: draft proposes ``k`` tokens per
        decoding slot (contiguous draft cache, fixed-shape ops, inactive
        slots ride along), then ONE ragged target dispatch verifies every
        decoding slot's ``k + 1``-token chunk AND streams admitting slots'
        prompt chunks — speculation composes with chunked prefill, the
        paged cache, and prefix caching.  Acceptance is fused on device;
        the tick's single host sync is the packed result readback."""
        self._admit_ragged()
        active = [si for si in range(self.max_batch)
                  if self.slots[si] is not None]
        if not active:
            return
        S, PS, k = self.max_batch, self.page_size, self.spec_k
        decoding = [si for si in active
                    if self.slots[si].prefill_done
                    >= len(self.slots[si].request.prompt)]
        prefilling = [si for si in active if si not in decoding]

        # draft proposal (slot-indexed (B,) device ops; inactive ride along)
        positions_b = np.ones((S,), np.int32)
        temps_b = np.zeros((S,), np.float32)
        tks_b, tps_b, mps_b = self._warp_arrays(S)
        for si in decoding:
            positions_b[si] = self.slots[si].length
            temps_b[si] = self.slots[si].request.temperature
            if tks_b is not None:
                tks_b[si] = self.slots[si].request.top_k
                tps_b[si] = self.slots[si].request.top_p
                mps_b[si] = self.slots[si].request.min_p
        pos_dev = jnp.asarray(positions_b)
        temps_dev = jnp.asarray(temps_b)
        warps_b = tuple(None if a is None else jnp.asarray(a)
                        for a in (tks_b, tps_b, mps_b))
        d_logits, d_toks = self._draft_propose(pos_dev, temps_dev,
                                               jnp.asarray(self.last_tokens),
                                               warps=warps_b)

        # two static shapes: decode-only spec tick vs mixed tick; the last
        # row is reserved as the trash row non-decoding chunk_rows point at
        T = S * (k + 1) + (self.token_budget if prefilling else 0) + 1
        tokens = np.zeros((T,), np.int32)
        positions = np.zeros((T,), np.int32)
        tok_pages = np.zeros((T,), np.int32)  # 0 = trash page for padding
        tok_offs = np.zeros((T,), np.int32)
        kv_lens = np.ones((S,), np.int32)
        cu = np.zeros((S + 1,), np.int32)
        sample_rows = np.zeros((S,), np.int32)
        chunk_rows = np.full((S, k + 1), T - 1, np.int32)
        seq_slots = np.zeros((S,), np.int32)
        temps = np.zeros((S,), np.float32)
        tks, tps, mps = self._warp_arrays(S)  # order-indexed warpers
        bt_rows = np.zeros((S, self.max_pages_per_seq), np.int32)

        row = 0
        order = []  # (slot_id, is_spec, n_new, completes_prefill)
        remaining = T - 1 - (k + 1) * len(decoding)
        for si in decoding + prefilling:
            slot = self.slots[si]
            req = slot.request
            if si in decoding:
                n_new = k + 1
                tokens[row] = self.last_tokens[si]  # chunk head; draft
                # proposals land at rows row+1.. via the device scatter
                pos = np.arange(slot.length, slot.length + k + 1)
                chunk_rows[len(order)] = np.arange(row, row + k + 1)
                completes = False
            else:
                left = len(req.prompt) - slot.prefill_done
                n_new = min(left, max(0, remaining))
                if n_new == 0:
                    continue
                remaining -= n_new
                chunk = req.prompt[slot.prefill_done:slot.prefill_done + n_new]
                tokens[row:row + n_new] = chunk
                pos = np.arange(slot.prefill_done, slot.prefill_done + n_new)
                completes = slot.prefill_done + n_new >= len(req.prompt)
            i = len(order)
            positions[row:row + n_new] = pos
            tok_pages[row:row + n_new] = self.block_tables[si][pos // PS]
            tok_offs[row:row + n_new] = pos % PS
            kv_lens[i] = int(pos[-1]) + 1
            cu[i + 1] = cu[i] + n_new
            sample_rows[i] = row + n_new - 1
            seq_slots[i] = si
            temps[i] = req.temperature
            if tks is not None:
                tks[i], tps[i], mps[i] = req.top_k, req.top_p, req.min_p
            bt_rows[i] = self.block_tables[si]
            order.append((si, si in decoding, n_new, completes))
            row += n_new
        cu[len(order) + 1:] = cu[len(order)]

        spec_step = (self._ragged_spec if getattr(self, "_ragged_spec",
                                                      None) is not None
                     else D.ragged_spec_step)
        packed_dev, self.cache, self.key = spec_step(
            self.model, jnp.asarray(tokens), self.cache,
            jnp.asarray(positions), jnp.asarray(tok_pages),
            jnp.asarray(tok_offs), jnp.asarray(bt_rows),
            jnp.asarray(kv_lens), jnp.asarray(cu),
            jnp.asarray([len(order)], np.int32),
            jnp.asarray(sample_rows), jnp.asarray(chunk_rows),
            jnp.asarray(seq_slots), d_logits, d_toks,
            jnp.asarray(temps), self.key,
            None if tks is None else jnp.asarray(tks),
            None if tps is None else jnp.asarray(tps),
            None if mps is None else jnp.asarray(mps),
            return_logprobs=self.logprobs,
        )
        packed = np.asarray(packed_dev)  # the one host sync per tick
        lp_bits = packed[:, k + 3:].view(np.float32) if self.logprobs else None
        self.steps += 1
        for i, (si, is_spec, n_new, completes) in enumerate(order):
            slot = self.slots[si]
            if is_spec:
                count = int(packed[i, 1])
                self.spec_rounds += 1
                self.spec_proposed += k
                self.spec_accepted += count - 1
                for j in range(count):
                    if self.slots[si] is None:
                        break  # finished mid-chunk; drop the rest
                    self.slots[si].length += 1
                    self.decode_tokens += 1
                    self.prev_tokens[si] = self.last_tokens[si]
                    self._emit(si, int(packed[i, 2 + j]),
                               float(lp_bits[i, 1 + j]) if self.logprobs
                               else None)
            else:
                slot.prefill_done += n_new
                slot.length = slot.prefill_done
                if completes:
                    if self.prefix_cache:
                        self._prefix_register(si)
                    # mirror the prompt into the draft KV before the slot
                    # joins speculation next tick
                    plen = len(slot.request.prompt)
                    lpad = _bucket(plen)
                    toks_d = np.zeros((1, lpad), np.int32)
                    toks_d[0, :plen] = slot.request.prompt
                    _, self.draft_cache = D.prefill(
                        self.draft, jnp.asarray(toks_d), self.draft_cache,
                        None, jnp.asarray([plen], np.int32),
                        slot=jnp.asarray([si], np.int32))
                    self.prev_tokens[si] = slot.request.prompt[-1]
                    self._emit(si, int(packed[i, 0]),
                               float(lp_bits[i, 0]) if self.logprobs
                               else None)

    def step(self) -> None:
        """One scheduler tick: admit new work, then one decode step.

        Scheduler state (last tokens, positions, temperatures) lives on
        device between steps and is re-uploaded only when slot membership
        changes; the single host sync per step is the sampled-token
        readback the scheduler needs for EOS/output bookkeeping.  (Matters
        on remote/tunneled runtimes where each transfer is a full RTT.)
        """
        if self.scheduler == "ragged":
            if self.draft is not None:
                return self._step_ragged_spec()
            return self._step_ragged()
        if self.draft is not None:
            return self._step_speculative()
        self._admit()
        active = [si for si in range(self.max_batch) if self.slots[si] is not None]
        if not active:
            return
        if self._dirty or self._dev is None:
            positions = np.zeros((self.max_batch,), np.int32)
            temps = np.zeros((self.max_batch,), np.float32)
            mask = np.zeros((self.max_batch,), np.int32)
            tks, tps, mps = self._warp_arrays(self.max_batch)
            for si in active:
                positions[si] = self.slots[si].length
                temps[si] = self.slots[si].request.temperature
                mask[si] = 1
                if tks is not None:
                    tks[si] = self.slots[si].request.top_k
                    tps[si] = self.slots[si].request.top_p
                    mps[si] = self.slots[si].request.min_p
            self._dev = {
                "tokens": jnp.asarray(self.last_tokens),
                "positions": jnp.asarray(positions),
                "temps": jnp.asarray(temps),
                "mask": jnp.asarray(mask),
                "top_ks": None if tks is None else jnp.asarray(tks),
                "top_ps": None if tps is None else jnp.asarray(tps),
                "min_ps": None if mps is None else jnp.asarray(mps),
            }
            self._dirty = False
        d = self._dev
        max_pos = max(self.slots[si].length for si in active)
        # multi-step ticks: k fused decode+sample steps, ONE host sync —
        # k x fewer per-token round trips (the dominant engine cost on
        # remote runtimes).  Falls back to single steps near the sequence
        # cap so the chunk never writes past max_seq_len.
        k_steps = self.multi_step
        if (k_steps > 1
                and (self.mesh is None or self._tp_loop is not None
                     or self._pp_loop is not None
                     or self._mla_tp_loop is not None)
                and max_pos + k_steps <= self.max_seq_len):
            s_bucket = min(_bucket(max_pos + k_steps, lo=self.page_size),
                           self.max_seq_len)
            if self._mla_tp_loop is not None:  # TP absorbed fori tick
                out_dev, self.cache, self.key = self._mla_tp_loop(
                    self.model, self._absorbed, self.cache, d["tokens"],
                    d["positions"], d["temps"], self.key, k_steps,
                    s_bucket=s_bucket, top_ks=d["top_ks"],
                    top_ps=d["top_ps"], min_ps=d["min_ps"],
                    return_logprobs=self.logprobs,
                )
            elif self.mla_absorbed:  # single-device absorbed fori tick
                from gptq_v2_tpu.serving import mla as MLA

                out_dev, self.cache, self.key = MLA.mla_decode_sample_loop(
                    self.model, self._absorbed, self.cache, d["tokens"],
                    d["positions"], d["temps"], self.key, k_steps,
                    s_bucket=s_bucket, scales=self._mla_scales,
                    top_ks=d["top_ks"], top_ps=d["top_ps"],
                    min_ps=d["min_ps"], return_logprobs=self.logprobs,
                )
            elif self._pp_loop is not None:  # PP mesh: no s_bucket/tables
                out_dev, self.cache, self.key = self._pp_loop(
                    self.model, d["tokens"], self.cache, d["positions"],
                    d["temps"], self.key, k_steps, top_ks=d["top_ks"],
                    top_ps=d["top_ps"], min_ps=d["min_ps"],
                    return_logprobs=self.logprobs,
                )
            else:
                tick = (self._tp_loop if self._tp_loop is not None
                        else D.decode_sample_loop
                        if self.multi_step_impl == "fori"
                        else D.decode_sample_multi)
                out_dev, self.cache, self.key = tick(
                    self.model, d["tokens"], self.cache, self._bt(),
                    d["positions"], d["temps"], self.key, k_steps,
                    s_bucket=s_bucket, top_ks=d["top_ks"],
                    top_ps=d["top_ps"], min_ps=d["min_ps"],
                    return_logprobs=self.logprobs,
                )
            toks_dev = out_dev[-1, :, 0] if self.logprobs else out_dev[-1]
            self._dev = {**d, "tokens": toks_dev,
                         "positions": d["positions"] + k_steps * d["mask"]}
            arr = np.asarray(out_dev)  # the one host sync per tick
            self.steps += 1
            for i in range(k_steps):
                toks, lps = (D.unpack_tok_logprob(arr[i]) if self.logprobs
                             else (arr[i], None))
                for si in active:
                    if self.slots[si] is None:  # stopped mid-chunk:
                        continue  # the tail of its chunk is discarded
                    self.slots[si].length += 1
                    self.decode_tokens += 1
                    self._emit(si, int(toks[si]),
                               None if lps is None else float(lps[si]))
            return
        # power-of-two context bucket: short sequences skip max_seq_len KV
        # traffic; O(log max_len) decode compilations per session
        s_bucket = min(_bucket(max_pos + 1, lo=self.page_size),
                       self.max_seq_len)
        if self.mla_absorbed and self.mesh is not None:
            out_dev, self.cache, self.key = self._mla_tp_decode(
                self.model, self._absorbed, self.cache, d["tokens"],
                d["positions"], d["temps"], self.key, s_bucket=s_bucket,
                top_ks=d["top_ks"], top_ps=d["top_ps"], min_ps=d["min_ps"],
                return_logprobs=self.logprobs)
            toks_dev = out_dev[:, 0] if self.logprobs else out_dev
        elif self.mesh is None and self.mla_absorbed:
            from gptq_v2_tpu.serving import mla as MLA

            out_dev, self.cache, self.key = MLA.mla_decode_sample_step(
                self.model, self._absorbed, self.cache, d["tokens"],
                d["positions"], d["temps"], self.key, s_bucket=s_bucket,
                scales=self._mla_scales, top_ks=d["top_ks"],
                top_ps=d["top_ps"], min_ps=d["min_ps"],
                return_logprobs=self.logprobs)
            toks_dev = out_dev[:, 0] if self.logprobs else out_dev
        elif self.mesh is None:
            # decode + sample + key split in ONE dispatch (RTT-bound hosts)
            out_dev, self.cache, self.key = D.decode_sample_step(
                self.model, d["tokens"], self.cache, self._bt(),
                d["positions"], d["temps"], self.key, s_bucket=s_bucket,
                top_ks=d["top_ks"], top_ps=d["top_ps"], min_ps=d["min_ps"],
                return_logprobs=self.logprobs,
            )
            toks_dev = out_dev[:, 0] if self.logprobs else out_dev
        else:
            logits, self.cache = self._decode(
                self.model, d["tokens"], self.cache, self._bt(),
                d["positions"], s_bucket=s_bucket,
            )
            self.key, sub = jax.random.split(self.key)
            toks_dev = D.sample_per_row(logits, sub, d["temps"],
                                        top_ks=d["top_ks"],
                                        top_ps=d["top_ps"],
                                        min_ps=d["min_ps"])
            out_dev = (D.pack_tok_logprob(
                toks_dev, D.chosen_logprob(logits, toks_dev))
                if self.logprobs else toks_dev)
        self._dev = {**d, "tokens": toks_dev,
                     "positions": d["positions"] + d["mask"]}
        arr = np.asarray(out_dev)  # the one host sync per step
        toks, lps = (D.unpack_tok_logprob(arr) if self.logprobs
                     else (arr, None))
        self.steps += 1
        for si in active:
            self.slots[si].length += 1
            self.decode_tokens += 1
            self._emit(si, int(toks[si]),
                       None if lps is None else float(lps[si]))

    # ---------------------------------------------------- failure recovery
    def snapshot(self) -> dict:
        """Host-side serving state for crash recovery: every unfinished
        request's prompt, emitted tokens, and sampling parameters (queued
        and in-flight alike).  The KV cache is deliberately NOT captured —
        it is recomputable: :func:`restore_requests` turns each entry into
        a continuation request whose prompt is ``prompt + emitted``, and a
        re-prefill reproduces the exact cache state (greedy decoding then
        continues token-identically; sampled requests continue from the
        same distribution).  Cheap enough to write every tick."""
        entries = []
        for r in ([s.request for s in self.slots if s is not None]
                  + list(self.queue)):
            if r.done:
                continue
            entries.append(dict(
                uid=r.uid, prompt=list(r.prompt), emitted=list(r.output),
                max_new_tokens=r.max_new_tokens, temperature=r.temperature,
                top_k=r.top_k, top_p=r.top_p, min_p=r.min_p,
                stop_token_ids=r.stop_token_ids,
                logprobs=list(r.logprobs) if r.logprobs else []))
        return {"version": 1, "requests": entries}

    def run(self, requests: List[Request],
            snapshot_path: Optional[str] = None,
            snapshot_every: int = 16) -> Dict[int, List[int]]:
        """Serve a batch of requests to completion; returns uid → tokens.

        ``snapshot_path``: write :meth:`snapshot` atomically every
        ``snapshot_every`` ticks (and clear it on clean completion) so a
        supervisor can restart a crashed/hung server without losing
        accepted work (``scripts/serve_supervised.py``)."""
        import json as _json
        import os as _os

        for r in requests:
            self.add_request(r)
        t0 = time.time()
        ticks = 0
        import os as _os2

        hb = _os2.environ.get("GPTQ_SERVE_HEARTBEAT")
        while self.queue or any(s is not None for s in self.slots):
            self.step()
            ticks += 1
            if hb:  # liveness for scripts/serve_supervised.py — a tick
                try:  # that returned means the device answered
                    _os2.utime(hb, None)
                except OSError:
                    open(hb, "w").close()
            if snapshot_path and ticks % snapshot_every == 0:
                tmp = snapshot_path + ".tmp"
                with open(tmp, "w") as f:
                    _json.dump(self.snapshot(), f)
                _os.replace(tmp, snapshot_path)
        if snapshot_path and _os.path.exists(snapshot_path):
            _os.remove(snapshot_path)  # clean completion
        dt = time.time() - t0
        if self.decode_tokens:
            logger.info("decoded %d tokens in %.2fs (%.1f tok/s aggregate)",
                        self.decode_tokens, dt, self.decode_tokens / dt)
        return {r.uid: r.output for r in requests}


def restore_requests(snapshot: dict):
    """Rebuild continuation requests from an :meth:`Engine.snapshot`.

    Returns ``(requests, prefixes)``: serve ``requests`` on a fresh engine
    and report ``prefixes[uid] + engine_output[uid]`` as each request's
    full output.  The continuation prompt is ``prompt + emitted`` — the
    deterministic re-prefill reconstructs the lost KV cache exactly, so a
    greedy request's final output is identical to the uninterrupted run.
    """
    reqs, prefixes = [], {}
    for e in snapshot["requests"]:
        emitted = e["emitted"]
        remaining = e["max_new_tokens"] - len(emitted)
        prefixes[e["uid"]] = list(emitted)
        if remaining <= 0:
            continue
        reqs.append(Request(
            uid=e["uid"], prompt=list(e["prompt"]) + list(emitted),
            max_new_tokens=remaining, temperature=e["temperature"],
            top_k=e["top_k"], top_p=e["top_p"], min_p=e["min_p"],
            stop_token_ids=e["stop_token_ids"]))
    return reqs, prefixes
