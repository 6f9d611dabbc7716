"""Quantizer math: self-consistency + parity with the reference Quantizer."""
import numpy as np
import pytest

import jax.numpy as jnp

from gptq_v2_tpu.quant import quantizer as qz


def rand(shape, seed=0, scale=1.0):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal(shape) * scale).astype(np.float32)


class TestAffine:
    def test_quantize_range(self):
        x = rand((4, 32))
        p = qz.find_params(jnp.asarray(x), bit_width=4, sym=False)
        q = qz.params_quantize(p, jnp.asarray(x))
        assert float(q.min()) >= 0.0
        assert float(q.max()) <= 15.0
        assert np.allclose(q, np.round(np.asarray(q)))  # integer codes

    def test_roundtrip_error_bounded(self):
        x = rand((8, 64))
        p = qz.find_params(jnp.asarray(x), bit_width=8, sym=False)
        dq = qz.params_dequantize(p, qz.params_quantize(p, jnp.asarray(x)))
        # max error <= scale/2 per row
        err = np.abs(np.asarray(dq) - x)
        assert np.all(err <= np.asarray(p.scale) * 0.5 + 1e-6)

    def test_sym_qzero_mid(self):
        x = rand((4, 32))
        p = qz.find_params(jnp.asarray(x), bit_width=4, sym=True)
        assert np.all(np.asarray(p.qzero) == 8.0)

    def test_exl2_scale_roundtrip(self):
        x = rand((16, 32), seed=3)
        p = qz.find_params(jnp.asarray(x), bit_width=4, sym=True, scale_bit_width=4)
        # scale must equal qscale^2 * sscale exactly
        np.testing.assert_allclose(
            np.asarray(p.scale), np.asarray(p.qscale) ** 2 * np.asarray(p.sscale),
            rtol=1e-6,
        )
        assert np.all(np.asarray(p.qscale) >= 1.0)
        assert np.all(np.asarray(p.qscale) <= 16.0)

    def test_mse_never_worse(self):
        x = rand((8, 128), seed=5)
        p0 = qz.find_params(jnp.asarray(x), bit_width=3, sym=False)
        p1 = qz.mse_refine(p0, jnp.asarray(x))

        def loss(p):
            dq = qz.dequantize_quantized(jnp.asarray(x), p.scale, p.qzero, p.maxq)
            return float(jnp.sum(jnp.abs(dq - x) ** 2.4))

        assert loss(p1) <= loss(p0) + 1e-5


class TestConstructMatrix:
    def test_construct_matches_dequantize(self):
        R, C, g = 8, 64, 16
        x = rand((R, C), seed=7)
        G = C // g
        qweight = np.zeros((R, C), dtype=np.float32)
        scales = np.zeros((R, G), dtype=np.float32)
        qzeros = np.zeros((R, G), dtype=np.float32)
        expected = np.zeros((R, C), dtype=np.float32)
        for k in range(G):
            blk = jnp.asarray(x[:, k * g:(k + 1) * g])
            p = qz.find_params(blk, bit_width=4)
            q = qz.params_quantize(p, blk)
            qweight[:, k * g:(k + 1) * g] = np.asarray(q)
            scales[:, k] = np.asarray(p.scale)[:, 0]
            qzeros[:, k] = np.asarray(p.qzero)[:, 0]
            expected[:, k * g:(k + 1) * g] = np.asarray(qz.params_dequantize(p, q))
        out = qz.construct_matrix(
            jnp.asarray(qweight), jnp.asarray(scales), jnp.asarray(qzeros), [g] * G
        )
        np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-6)


@pytest.mark.parametrize("sym", [False, True])
@pytest.mark.parametrize("bits", [3, 4, 8])
class TestReferenceParity:
    def test_find_params(self, reference_modules, sym, bits):
        import torch

        x = rand((32, 128), seed=bits)
        ref_q = reference_modules.quant.Quantizer()
        # the reference expects bit_width as a 0-d tensor (group_bit_widths elements)
        ref_q.find_params(torch.from_numpy(x), bit_width=torch.tensor(float(bits)), sym=sym)
        p = qz.find_params(jnp.asarray(x), bit_width=bits, sym=sym)
        np.testing.assert_allclose(np.asarray(p.scale), ref_q.scale.numpy(), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(p.qzero), ref_q.qzero.numpy(), rtol=0, atol=0)
        assert float(p.maxq) == float(ref_q.maxq)

    def test_quantize_dequantize(self, reference_modules, sym, bits):
        import torch

        x = rand((32, 128), seed=bits + 10)
        ref_q = reference_modules.quant.Quantizer()
        ref_q.find_params(torch.from_numpy(x), bit_width=torch.tensor(float(bits)), sym=sym)
        ref_codes = ref_q.quantize(torch.from_numpy(x))
        ref_dq = ref_q.dequantize(ref_codes)
        p = qz.find_params(jnp.asarray(x), bit_width=bits, sym=sym)
        codes = qz.params_quantize(p, jnp.asarray(x))
        dq = qz.params_dequantize(p, codes)
        # torch and XLA may differ by 1 ulp in x/scale, flipping codes that land
        # exactly on a round-half boundary — allow a tiny off-by-one fraction.
        code_diff = np.abs(np.asarray(codes) - ref_codes.numpy())
        assert code_diff.max() <= 1.0
        assert (code_diff > 0).mean() < 0.005
        np.testing.assert_allclose(
            np.asarray(dq), ref_dq.numpy(), atol=float(np.asarray(p.scale).max()) + 1e-6
        )

    def test_mse(self, reference_modules, sym, bits):
        import torch

        x = rand((16, 64), seed=bits + 20)
        ref_q = reference_modules.quant.Quantizer()
        ref_q.find_params(torch.from_numpy(x), bit_width=torch.tensor(float(bits)), sym=sym)
        ref_q.mse(torch.from_numpy(x), max_shrink=0.8, n_grid=100, norm=2.4)
        p = qz.find_params(jnp.asarray(x), bit_width=bits, sym=sym)
        p = qz.mse_refine(p, jnp.asarray(x), max_shrink=0.8, n_grid=100, norm=2.4)
        np.testing.assert_allclose(np.asarray(p.scale), ref_q.scale.numpy(), rtol=1e-5)


class TestReferenceParityEXL2:
    def test_exl2_find_params(self, reference_modules):
        import torch

        x = rand((32, 128), seed=42)
        ref_q = reference_modules.quant.Quantizer()
        ref_q.find_params(torch.from_numpy(x), bit_width=torch.tensor(4.0), sym=True,
                          scale_bit_width=torch.tensor(4.0))
        p = qz.find_params(jnp.asarray(x), bit_width=4, sym=True, scale_bit_width=4)
        np.testing.assert_allclose(np.asarray(p.scale), ref_q.scale.numpy(), rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(p.qscale), ref_q.qscale.numpy())
        np.testing.assert_allclose(np.asarray(p.sscale), ref_q.sscale.numpy(), rtol=1e-6)
