"""Packed-INT4 format + fused dequant-matmul kernel."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gptq_v2_tpu.ops import packing as pk
from gptq_v2_tpu.ops.w4a16 import w4a16_matmul
from gptq_v2_tpu.quant import gptq as gq
from gptq_v2_tpu.quant import hessian as hs


def rand(shape, seed=0):
    return np.random.default_rng(seed).standard_normal(shape).astype(np.float32)


def assert_close_scaled(out, expected, rel=5e-3):
    """Kernel vs twin tolerance scaled to output magnitude: the kernel's
    rank-1 zero-fold is algebraically equal but rounds differently in bf16
    (cancellation), so elementwise rtol on near-zero outputs is meaningless."""
    out = np.asarray(out, dtype=np.float32)
    expected = np.asarray(expected, dtype=np.float32)
    atol = rel * float(np.abs(expected).max())
    np.testing.assert_allclose(out, expected, rtol=0, atol=atol)


class TestPacking:
    @pytest.mark.parametrize("c", [256, 384])  # 384 = 3 groups of 128: padded
    def test_pack_unpack_roundtrip(self, c):
        rng = np.random.default_rng(0)
        codes = rng.integers(0, 16, (64, c)).astype(np.uint8)
        packed = pk.pack_int4(codes, group_size=32)
        out = pk.unpack_int4(packed, group_size=32, c_orig=c)
        np.testing.assert_array_equal(out, codes)

    def test_pack_quant_meta_and_dense_twin(self):
        R, C, g = 64, 256, 32
        w = rand((R, C), seed=1)
        x = rand((4, 1024, C), seed=2) * 0.2
        st = hs.accumulate(hs.init_state(C), jnp.asarray(x), use_kernel=False)
        inv = hs.invert(st, act_order=True)
        res = gq.gptq_quant(jnp.asarray(w), inv, [g] * (C // g), [4] * (C // g),
                            save_dtype=jnp.float32)
        p = pk.pack_quant_meta(res["quant_meta"])
        dense = pk.dequantize_dense(p, dtype=jnp.float32)  # (C, R)
        # must match the solver's dequantized output (fp16 feedback -> bf16 storage noise)
        np.testing.assert_allclose(
            np.asarray(dense.T), np.asarray(res["quant"]), rtol=2e-2, atol=2e-2
        )


class TestW4A16Matmul:
    def _packed(self, R=128, C=256, g=32, act_order=True, seed=3):
        w = rand((R, C), seed=seed)
        x = rand((2, 512, C), seed=seed + 1) * 0.3
        st = hs.accumulate(hs.init_state(C), jnp.asarray(x), use_kernel=False)
        inv = hs.invert(st, act_order=act_order)
        res = gq.gptq_quant(jnp.asarray(w), inv, [g] * (C // g), [4] * (C // g))
        return pk.pack_quant_meta(res["quant_meta"])

    @pytest.mark.parametrize("batch", [1, 5, 16])
    def test_matches_dense_twin(self, batch):
        p = self._packed()
        x = jnp.asarray(rand((batch, p.in_features), seed=7).astype(np.float32))
        x = x.astype(jnp.bfloat16)
        dense = pk.dequantize_dense(p)  # (C, R) bf16
        expected = (x.astype(jnp.float32) @ dense.astype(jnp.float32))
        out = w4a16_matmul(x, p, interpret=True)
        assert out.shape == (batch, p.out_features)
        assert_close_scaled(out, expected)

    def test_padded_contraction(self):
        # C=384 with g=32: 8g=256 block => padded to 512
        p = self._packed(R=128, C=384, g=32, seed=11)
        assert p.in_features_padded == 512
        x = jnp.asarray(rand((3, 384), seed=12)).astype(jnp.bfloat16)
        dense = pk.dequantize_dense(p)
        expected = x.astype(jnp.float32) @ dense.astype(jnp.float32)
        out = w4a16_matmul(x, p, interpret=True)
        assert_close_scaled(out, expected)

    def test_no_act_order(self):
        p = self._packed(act_order=False, seed=13)
        assert p.perm is None
        x = jnp.asarray(rand((2, p.in_features), seed=14)).astype(jnp.bfloat16)
        dense = pk.dequantize_dense(p)
        expected = x.astype(jnp.float32) @ dense.astype(jnp.float32)
        out = w4a16_matmul(x, p, interpret=True)
        assert_close_scaled(out, expected)

    def test_leading_dims(self):
        p = self._packed(seed=15)
        x = jnp.asarray(rand((2, 3, p.in_features), seed=16)).astype(jnp.bfloat16)
        out = w4a16_matmul(x, p, interpret=True)
        assert out.shape == (2, 3, p.out_features)


class TestMultiBitPacking:
    """2/8-bit variants of the plane-per-group format + fused kernel."""

    @pytest.mark.parametrize("bits,c", [(8, 256), (8, 320), (2, 1024),
                                        (2, 1100)])
    def test_pack_unpack_roundtrip(self, bits, c):
        rng = np.random.default_rng(bits + c)
        codes = rng.integers(0, 1 << bits, (48, c)).astype(np.uint8)
        packed = pk.pack_codes(codes, group_size=32, bits=bits)
        assert packed.shape[0] == -(-c // (32 // bits * 32)) * 32 * 32 // 32
        out = pk.unpack_codes(packed, group_size=32, bits=bits, c_orig=c)
        np.testing.assert_array_equal(out, codes)

    @pytest.mark.parametrize("bits", [2, 8])
    def test_kernel_matches_dense_twin(self, bits):
        R, C, g = 128, 512, 32
        w = rand((R, C), seed=bits)
        x = rand((2, 512, C), seed=bits + 1) * 0.3
        st = hs.accumulate(hs.init_state(C), jnp.asarray(x), use_kernel=False)
        inv = hs.invert(st, act_order=True)
        res = gq.gptq_quant(jnp.asarray(w), inv, [g] * (C // g),
                            [bits] * (C // g))
        p = pk.pack_quant_meta(res["quant_meta"])
        assert p.bits == bits and p.planes == 32 // bits
        xq = jnp.asarray(rand((5, C), seed=9)).astype(jnp.bfloat16)
        dense = pk.dequantize_dense(p)
        expected = xq.astype(jnp.float32) @ dense.astype(jnp.float32)
        out = w4a16_matmul(xq, p, interpret=True)
        assert_close_scaled(out, expected)

    @pytest.mark.parametrize("bits", [2, 8])
    def test_row_split_roundtrip(self, bits):
        """TP row-parallel splits preserve multi-bit packing: shard sums
        equal the whole layer's output."""
        R, C, g = 64, 512, 64
        w = rand((R, C), seed=20 + bits)
        x = rand((2, 256, C), seed=21) * 0.3
        st = hs.accumulate(hs.init_state(C), jnp.asarray(x), use_kernel=False)
        inv = hs.invert(st, act_order=True)
        res = gq.gptq_quant(jnp.asarray(w), inv, [g] * (C // g),
                            [bits] * (C // g))
        p = pk.pack_quant_meta(res["quant_meta"])
        xq = jnp.asarray(rand((3, C), seed=22).astype(np.float32))
        whole = w4a16_matmul(xq.astype(jnp.bfloat16), p, interpret=True)
        parts = [w4a16_matmul(xq.astype(jnp.bfloat16), s, interpret=True)
                 for s in pk.split_packed_row(p, 2)]
        assert_close_scaled(sum(parts), whole, rel=1e-2)


class TestBitSliced3Bit:
    """3-bit serving: BitSlicedLinear (2-bit + 1-bit planes) through the
    fused kernel — BASELINE sweep config 4 no longer falls back to dense."""

    def test_kernel_matches_dense_twin(self):
        R, C, g = 128, 512, 32
        w = rand((R, C), seed=33)
        x = rand((2, 512, C), seed=34) * 0.3
        st = hs.accumulate(hs.init_state(C), jnp.asarray(x), use_kernel=False)
        inv = hs.invert(st, act_order=True)
        res = gq.gptq_quant(jnp.asarray(w), inv, [g] * (C // g),
                            [3] * (C // g))
        p = pk.pack_quant_meta(res["quant_meta"])
        assert isinstance(p, pk.BitSlicedLinear)
        assert p.bits == 3 and p.lo.bits == 2 and p.hi.bits == 1
        # storage: 2 bits/weight (lo) + 1 bit/weight (hi), each padded to
        # its own packing block (16g / 32g; both exact at 7B dims)
        assert p.lo.qweight.size * 32 == 2 * p.lo.in_features_padded * R
        assert p.hi.qweight.size * 32 == 1 * p.hi.in_features_padded * R
        xq = jnp.asarray(rand((5, C), seed=35)).astype(jnp.bfloat16)
        dense = pk.dequantize_dense(p)
        # the sliced dequant IS the affine dequant of the 3-bit codes
        from gptq_v2_tpu.quant.quantizer import reconstruct_weight

        np.testing.assert_allclose(
            np.asarray(dense, np.float32),
            np.asarray(reconstruct_weight(res["quant_meta"]).T,
                       np.float32).astype(np.float32),
            rtol=2e-2, atol=2e-2)  # bf16 packed scales vs f16 meta scales
        expected = xq.astype(jnp.float32) @ dense.astype(jnp.float32)
        out = w4a16_matmul(xq, p, interpret=True)
        # two bf16 kernel passes (lo + hi) round independently: ~2x the
        # single-pass tolerance (the f32 path is exact, verified separately)
        assert_close_scaled(out, expected, rel=1.2e-2)

    def test_engine_serves_w3(self):
        """End-to-end: a 3-bit quantized tiny model decodes through the
        engine on the packed path and matches full recompute."""
        from gptq_v2_tpu.models import llama as L
        from gptq_v2_tpu.pipeline import QuantConfig, quantize_model
        from gptq_v2_tpu.serving import Engine, Request
        from gptq_v2_tpu.serving.model import (packed_forward_logits,
                                               quantize_params_to_packed)

        cfg = L.LlamaConfig.tiny(dtype="float32")
        params = L.init_params(cfg, jax.random.key(6))
        rng = np.random.default_rng(7)
        calib = rng.integers(0, cfg.vocab_size, (4, 32)).astype(np.int32)
        results = quantize_model(cfg, params, calib,
                                 QuantConfig(bits=3, group_size=16),
                                 batch_size=4)
        model = quantize_params_to_packed(cfg, params, results["data"],
                                          compute_dtype=jnp.float32)
        assert any(isinstance(v, pk.BitSlicedLinear)
                   for lp in model.layers for v in lp.values())
        prompt = rng.integers(0, cfg.vocab_size, (7,)).tolist()
        toks = list(prompt)
        for _ in range(5):
            logits = packed_forward_logits(model, jnp.asarray([toks]))
            toks.append(int(jnp.argmax(logits[0, -1])))
        expected = toks[len(prompt):]
        eng = Engine(model, max_batch=2, max_seq_len=64)
        out = eng.run([Request(uid=0, prompt=prompt, max_new_tokens=5)])
        assert out[0] == expected


class TestW4A8:
    """Round-5 W4A8 tier: per-row dynamic int8 activations feeding int8
    MXU dots (PackedLinear.act_bits=8, ops/w4a16.py::_kernel_a8)."""

    def _packed(self, C=256, R=128, g=32, seed=5):
        import dataclasses

        w = rand((C, R), seed=seed) * 0.05
        p = jax.tree_util.tree_map(jnp.asarray, pk.rtn_pack_dense(w, g))
        return p, dataclasses.replace(p, act_bits=8)

    def test_matches_integer_simulation(self):
        """Kernel output == the explicit integer-math simulation: quantize
        x per row, int32 dot against the codes, per-group scale algebra,
        per-row dequant — exact up to output-dtype rounding."""
        p, p8 = self._packed()
        x = jnp.asarray(rand((16, p.in_features), seed=6), jnp.float32)

        got = w4a16_matmul(x, p8)

        amax = np.abs(np.asarray(x, np.float32)).max(axis=1, keepdims=True)
        x_scale = np.maximum(amax, 1e-12) / 127.0
        xq = np.clip(np.round(np.asarray(x) / x_scale), -127, 127)
        codes = pk.unpack_codes(np.asarray(p.qweight), p.group_size,
                                p.bits).astype(np.float64).T  # (C_pad, R)
        xq_pad = np.zeros((16, codes.shape[0]))
        xq_pad[:, :xq.shape[1]] = xq[:, np.asarray(p.perm)] \
            if p.perm is not None else xq
        g = p.group_size
        sc = np.repeat(np.asarray(p.scales, np.float64), g, axis=0)
        zr = np.repeat(np.asarray(p.zeros, np.float64), g, axis=0)
        want = (xq_pad @ (codes * sc) - xq_pad @ (zr * sc)) * x_scale
        # the kernel multiplies the exact int32 dot by the STORED
        # (dtype-rounded) scales and z*s products; the f64 simulation uses
        # exact ones — tolerance covers that storage rounding
        assert_close_scaled(got, want, rel=1e-2)

    def test_w8a8_codes_do_not_wrap(self):
        """bits=8 codes span [0, 255] — the int8 MXU operand would WRAP
        without the 128-centering (code 200 -> -56); this pins the a8
        kernel against the bf16-activation path on an 8-bit packing
        whose codes exercise the upper half of the range."""
        import dataclasses

        w = rand((256, 128), seed=9) * 0.05 + 0.1  # biased: codes skew high
        p = jax.tree_util.tree_map(jnp.asarray,
                                   pk.rtn_pack_dense(w, 32, bits=8))
        codes = pk.unpack_codes(np.asarray(p.qweight), 32, 8)
        assert codes.max() > 200  # the wrap-prone range is exercised
        p8 = dataclasses.replace(p, act_bits=8)
        x = jnp.asarray(rand((8, 256), seed=10) * 0.3, jnp.float32)
        a16 = np.asarray(w4a16_matmul(x, p), np.float32)
        a8 = np.asarray(w4a16_matmul(x, p8), np.float32)
        rel = np.abs(a16 - a8).max() / np.abs(a16).max()
        assert rel < 0.03, rel

    def test_close_to_a16_path(self):
        """The a8 tier tracks the bf16-activation path to ~1% (the
        documented per-row int8 activation-quant trade)."""
        p, p8 = self._packed(seed=7)
        x = jnp.asarray(rand((8, p.in_features), seed=8) * 0.3, jnp.float32)
        a16 = np.asarray(w4a16_matmul(x, p), np.float32)
        a8 = np.asarray(w4a16_matmul(x, p8), np.float32)
        rel = np.abs(a16 - a8).max() / np.abs(a16).max()
        assert rel < 0.03, rel

    def test_engine_serves_w4a8(self):
        """Engine(act_dtype='int8') serves end-to-end; greedy outputs
        track the W4A16 engine on a well-conditioned tiny model."""
        from gptq_v2_tpu.models import llama as L
        from gptq_v2_tpu.serving import Engine, Request
        from gptq_v2_tpu.serving.model import random_packed_llama

        cfg = L.LlamaConfig.tiny(dtype="float32")
        model = random_packed_llama(cfg, group_size=16, seed=11,
                                    compute_dtype=jnp.float32)
        rng = np.random.default_rng(12)
        prompt = rng.integers(0, cfg.vocab_size, (7,)).tolist()
        eng = Engine(model, max_batch=1, max_seq_len=32, act_dtype="int8")
        assert all(w.act_bits == 8
                   for lp in eng.model.layers for w in lp.values()
                   if isinstance(w, pk.PackedLinear))
        out = eng.run([Request(uid=0, prompt=prompt, max_new_tokens=5)])
        assert len(out[0]) == 5
