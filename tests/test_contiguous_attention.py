"""Fused contiguous-decode-attention kernel vs its jnp twin."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gptq_v2_tpu.ops.contiguous_attention import (
    contiguous_decode_attention,
    contiguous_decode_attention_ref,
)

L_, B, S, HKV, HD = 2, 4, 32, 4, 64


def make(dtype=jnp.float32, hq=None, seed=0):
    hq = hq or HKV
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((B, hq, HD)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((L_, B, S, HKV, HD)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((L_, B, S, HKV, HD)).astype(np.float32))
    pos = jnp.asarray(rng.integers(3, S - 1, (B,)), jnp.int32)
    return q, k.astype(dtype), v.astype(dtype), pos


def both(q, k, v, pos, **kw):
    got = contiguous_decode_attention(q, k, v, pos, **kw)
    ref = contiguous_decode_attention_ref(q, k, v, pos, **kw)
    return np.asarray(got), np.asarray(ref)


class TestKernel:
    def test_vanilla(self):
        q, k, v, pos = make()
        got, ref = both(q, k, v, pos, layer=1, sm_scale=0.125)
        np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)

    def test_s_bucket(self):
        q, k, v, pos = make()
        got, ref = both(q, k, v, jnp.minimum(pos, 15), layer=0,
                        s_bucket=16, sm_scale=0.125)
        np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)

    def test_window_and_chunk(self):
        q, k, v, pos = make(seed=1)
        got, ref = both(q, k, v, pos, layer=0, sm_scale=0.2, window=7)
        np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)
        got, ref = both(q, k, v, pos, layer=1, sm_scale=0.2, chunk=8)
        np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)

    def test_softcap_and_sinks(self):
        q, k, v, pos = make(seed=2)
        got, ref = both(q, k, v, pos, layer=0, sm_scale=0.125, soft_cap=30.0)
        np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)
        sinks = jnp.asarray(np.random.default_rng(3).standard_normal(HKV),
                            jnp.float32)
        got, ref = both(q, k, v, pos, layer=0, sm_scale=0.125, sinks=sinks)
        np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)

    def test_gqa(self):
        q, k, v, pos = make(hq=8, seed=4)  # G = 2
        sinks = jnp.asarray(np.random.default_rng(5).standard_normal(8),
                            jnp.float32)
        got, ref = both(q, k, v, pos, layer=1, sm_scale=0.125, sinks=sinks)
        np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)

    def test_int4_pack_roundtrip(self):
        from gptq_v2_tpu.serving.kv_cache import (pack_int4_rows,
                                                  unpack_int4_rows)

        _, kf, _, _ = make(seed=7)
        k4 = jnp.clip(jnp.round(kf * 2.0), -7, 7).astype(jnp.int32)
        kp = pack_int4_rows(k4)
        assert kp.shape == (L_, B, S, HKV // 2, HD)  # head-pair layout
        assert kp.dtype == jnp.int8
        np.testing.assert_array_equal(np.asarray(unpack_int4_rows(kp)),
                                      np.asarray(k4))

    def test_int4_xla_two_pass(self):
        """The production int4 path (pure-XLA two-pass unpack) matches
        both the packed jnp twin and the full-precision math, across
        GQA/window/chunk/softcap/sinks variants."""
        from gptq_v2_tpu.ops.contiguous_attention import (
            contiguous_decode_attention_xla4)
        from gptq_v2_tpu.serving.kv_cache import pack_int4_rows

        q, kf, vf, pos = make(hq=8, seed=9)
        k4 = jnp.clip(jnp.round(kf * 2.0), -7, 7).astype(jnp.int32)
        v4 = jnp.clip(jnp.round(vf * 2.0), -7, 7).astype(jnp.int32)
        kp, vp = pack_int4_rows(k4), pack_int4_rows(v4)
        ks = vs = 0.5
        got0 = contiguous_decode_attention_xla4(
            q * ks, kp, vp, pos, layer=1, sm_scale=0.125) * vs
        ref0 = contiguous_decode_attention_ref(
            q, k4.astype(jnp.float32) * ks, v4.astype(jnp.float32) * vs,
            pos, layer=1, sm_scale=0.125)
        np.testing.assert_allclose(np.asarray(got0), np.asarray(ref0),
                                   rtol=2e-4, atol=2e-4)
        for kw in (dict(), dict(window=9), dict(chunk=8),
                   dict(soft_cap=30.0),
                   dict(sinks=jnp.asarray(
                       np.random.default_rng(10).standard_normal(8),
                       jnp.float32))):
            got = contiguous_decode_attention_xla4(
                q, kp, vp, pos, layer=1, sm_scale=0.125, **kw)
            ref = contiguous_decode_attention_ref(
                q, kp, vp, pos, layer=1, sm_scale=0.125, kv_bits=4, **kw)
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                       rtol=2e-5, atol=2e-5,
                                       err_msg=str(kw))

    def test_int8_cache(self):
        q, kf, vf, pos = make(seed=6)
        k8 = jnp.clip(jnp.round(kf * 20.0), -127, 127).astype(jnp.int8)
        v8 = jnp.clip(jnp.round(vf * 20.0), -127, 127).astype(jnp.int8)
        ks = vs = 1.0 / 20.0
        # caller folds the k-scale into q and applies the v-scale after
        got = contiguous_decode_attention(q * ks, k8, v8, pos, layer=0,
                                          sm_scale=0.125) * vs
        ref = contiguous_decode_attention_ref(
            q, (k8.astype(jnp.float32) * ks), (v8.astype(jnp.float32) * vs),
            pos, layer=0, sm_scale=0.125)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)
