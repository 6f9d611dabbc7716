"""Pallas blocked GPTQ solver vs the jnp scan solver (its executable spec)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gptq_v2_tpu.ops.gptq_pallas import _f16_roundtrip, gptq_solve
from gptq_v2_tpu.quant import hessian as hs
from gptq_v2_tpu.quant.gptq import _solve_uniform, gptq_quant


@pytest.fixture(scope="module")
def problem():
    rng = np.random.default_rng(0)
    C, R, g = 256, 192, 64
    mix = (rng.standard_normal((C, C)).astype(np.float32) / np.sqrt(C)
           + 0.5 * np.eye(C, dtype=np.float32))
    acts = rng.standard_normal((4, 128, C)).astype(np.float32) @ mix
    st = hs.init_state(C)
    for b in range(4):
        st = hs.accumulate(st, jnp.asarray(acts[b:b + 1]), use_kernel=False)
    inv = hs.invert(st, act_order=True)
    w = jnp.asarray(rng.standard_normal((R, C)).astype(np.float32) * 0.02)
    w_p = jnp.take(w, inv.perm, axis=1)
    return dict(C=C, R=R, g=g, inv=inv, w_p=w_p)


def _objective(quant, w_p, hessian):
    d = np.asarray(quant) - np.asarray(w_p)
    h = np.asarray(hessian)
    return float(np.mean(np.einsum("rc,cd,rd->r", d, h, d)))


class TestF16Emulation:
    def test_matches_astype_for_f16_normals(self):
        rng = np.random.default_rng(1)
        v = jnp.asarray(rng.standard_normal(50000).astype(np.float32))
        v = jnp.where(jnp.abs(v) < 1e-4, 1.0, v)  # exclude f16 denormals
        got = _f16_roundtrip(v)
        want = v.astype(jnp.float16).astype(jnp.float32)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_denormals_overflow_and_nonfinite(self):
        rng = np.random.default_rng(2)
        v = np.concatenate([
            rng.standard_normal(20000).astype(np.float32) * 3e-5,  # denormals
            np.asarray([7e4, -7e4, 65504.0, -65504.0, 65520.0,
                        np.inf, -np.inf, 0.0, -0.0], np.float32),
        ])
        got = np.asarray(_f16_roundtrip(jnp.asarray(v)))
        want = v.astype(np.float16).astype(np.float32)
        np.testing.assert_array_equal(got, want)
        assert np.isnan(np.asarray(_f16_roundtrip(jnp.asarray([np.nan],
                                                              jnp.float32))))[0]


class TestSolverKernel:
    @pytest.mark.parametrize("sym", [False, True])
    def test_match_full_precision(self, problem, sym):
        """fb=None: scales/zeros bit-exact; codes bit-exact up to rare
        rounding-boundary flips from f32 dot-summation order (the tail
        update is one big dot in the kernel vs jnp's layout), which must
        stay vanishingly rare and quality-neutral."""
        p = problem
        ref = _solve_uniform(
            p["w_p"], p["inv"].hessian_inv,
            jnp.full((p["C"] // p["g"],), 15.0), p["g"], sym=sym,
            scale_bits=None, fb_dtype_name=None, mse=False,
            mse_max_shrink=0.8, mse_n_grid=100, mse_norm=2.4)
        got = gptq_solve(p["w_p"].T, p["inv"].hessian_inv, p["g"], 15.0,
                         sym=sym, feedback_dtype=None)
        np.testing.assert_array_equal(np.asarray(ref["qzero"]),
                                      np.asarray(got["qzero"]))
        # group 0 sees identical inputs (no cascade yet): scale must match
        # to f32 ulps; later groups' params shift with any code flip
        np.testing.assert_allclose(np.asarray(ref["scale"])[:, 0],
                                   np.asarray(got["scale"])[:, 0], rtol=1e-6)
        flips = np.mean(np.asarray(ref["qweight"]) != np.asarray(got["qweight"]))
        assert flips < 1e-3, flips
        o_ref = _objective(ref["quant"], p["w_p"], p["inv"].hessian)
        o_got = _objective(got["quant"], p["w_p"], p["inv"].hessian)
        assert o_got == pytest.approx(o_ref, rel=1e-3)

    @pytest.mark.parametrize("fb", ["float16", "bfloat16"])
    def test_quality_match_low_precision_feedback(self, problem, fb):
        """Low-precision error feedback amplifies f32-associativity noise
        into occasional code flips; the GPTQ objective must still match."""
        p = problem
        ref = _solve_uniform(
            p["w_p"], p["inv"].hessian_inv,
            jnp.full((p["C"] // p["g"],), 15.0), p["g"], sym=False,
            scale_bits=None, fb_dtype_name=fb, mse=False,
            mse_max_shrink=0.8, mse_n_grid=100, mse_norm=2.4)
        got = gptq_solve(p["w_p"].T, p["inv"].hessian_inv, p["g"], 15.0,
                         sym=False, feedback_dtype=fb)
        flips = np.mean(np.asarray(ref["qweight"]) != np.asarray(got["qweight"]))
        assert flips < 0.05, flips
        o_ref = _objective(ref["quant"], p["w_p"], p["inv"].hessian)
        o_got = _objective(got["quant"], p["w_p"], p["inv"].hessian)
        assert o_got == pytest.approx(o_ref, rel=0.02)

    def test_group_128(self, problem):
        p = problem
        ref = _solve_uniform(
            p["w_p"], p["inv"].hessian_inv, jnp.full((p["C"] // 128,), 7.0),
            128, sym=False, scale_bits=None, fb_dtype_name=None, mse=False,
            mse_max_shrink=0.8, mse_n_grid=100, mse_norm=2.4)
        got = gptq_solve(p["w_p"].T, p["inv"].hessian_inv, 128, 7.0,
                         sym=False, feedback_dtype=None)
        np.testing.assert_array_equal(np.asarray(ref["qweight"]),
                                      np.asarray(got["qweight"]))

    def test_gptq_quant_kernel_path(self, problem):
        """gptq_quant(use_solver_kernel=True) end-to-end: same quant_meta
        schema, quality equal to the scan path."""
        p = problem
        w = jnp.take(p["w_p"], p["inv"].perm_inv, axis=1)  # original order
        g = p["g"]
        n_g = p["C"] // g
        kw = dict(feedback_dtype=None)
        a = gptq_quant(w, p["inv"], [g] * n_g, [4] * n_g,
                       use_solver_kernel=False, **kw)
        b = gptq_quant(w, p["inv"], [g] * n_g, [4] * n_g,
                       use_solver_kernel=True, **kw)
        np.testing.assert_array_equal(a["quant_meta"]["qweight"],
                                      b["quant_meta"]["qweight"])
        np.testing.assert_array_equal(a["quant_meta"]["perm"],
                                      b["quant_meta"]["perm"])
        assert a["metrics"]["l2_error"] == pytest.approx(
            b["metrics"]["l2_error"], rel=1e-5)


class TestSteppedSolver:
    """Group-stepped Pallas solver (MSE / EXL2 / mixed bit widths) vs the
    jnp scan solver at the same config."""

    def _ref(self, p, maxqs, g, **kw):
        base = dict(sym=False, scale_bits=None, fb_dtype_name=None,
                    mse=False, mse_max_shrink=0.8, mse_n_grid=100,
                    mse_norm=2.4)
        base.update(kw)
        return _solve_uniform(p["w_p"], p["inv"].hessian_inv,
                              jnp.asarray(maxqs, jnp.float32), g, **base)

    def test_mse_uniform(self, problem):
        from gptq_v2_tpu.ops.gptq_pallas import gptq_solve_stepped

        p = problem
        g = p["g"]
        n_g = p["C"] // g
        ref = self._ref(p, [15.0] * n_g, g, mse=True)
        got = gptq_solve_stepped(p["w_p"].T, p["inv"].hessian_inv, g,
                                 (4,) * n_g, mse=True, feedback_dtype=None)
        np.testing.assert_allclose(np.asarray(ref["scale"])[:, 0],
                                   np.asarray(got["scale"])[:, 0], rtol=1e-6)
        flips = np.mean(np.asarray(ref["qweight"]) != np.asarray(got["qweight"]))
        assert flips < 1e-3, flips
        o_ref = _objective(ref["quant"], p["w_p"], p["inv"].hessian)
        o_got = _objective(got["quant"], p["w_p"], p["inv"].hessian)
        assert o_got == pytest.approx(o_ref, rel=1e-3)

    def test_mixed_bits(self, problem):
        from gptq_v2_tpu.ops.gptq_pallas import gptq_solve_stepped

        p = problem
        g = p["g"]
        n_g = p["C"] // g
        bits = tuple(8 if i % 2 == 0 else 3 for i in range(n_g))
        maxqs = [2.0 ** b - 1.0 for b in bits]
        ref = self._ref(p, maxqs, g)
        got = gptq_solve_stepped(p["w_p"].T, p["inv"].hessian_inv, g,
                                 bits, feedback_dtype=None)
        flips = np.mean(np.asarray(ref["qweight"]) != np.asarray(got["qweight"]))
        assert flips < 1e-3, flips
        o_ref = _objective(ref["quant"], p["w_p"], p["inv"].hessian)
        o_got = _objective(got["quant"], p["w_p"], p["inv"].hessian)
        assert o_got == pytest.approx(o_ref, rel=1e-3)

    def test_exl2_scale_quant(self, problem):
        from gptq_v2_tpu.ops.gptq_pallas import gptq_solve_stepped

        p = problem
        g = p["g"]
        n_g = p["C"] // g
        ref = self._ref(p, [15.0] * n_g, g, scale_bits=4, sym=True)
        got = gptq_solve_stepped(p["w_p"].T, p["inv"].hessian_inv, g,
                                 (4,) * n_g, sym=True, scale_bits=4,
                                 feedback_dtype=None)
        np.testing.assert_allclose(np.asarray(ref["sscale"]),
                                   np.asarray(got["sscale"]), rtol=1e-6)
        flips = np.mean(np.asarray(ref["qweight"]) != np.asarray(got["qweight"]))
        assert flips < 1e-3, flips
        o_ref = _objective(ref["quant"], p["w_p"], p["inv"].hessian)
        o_got = _objective(got["quant"], p["w_p"], p["inv"].hessian)
        assert o_got == pytest.approx(o_ref, rel=1e-3)

    def test_f16_feedback(self, problem):
        from gptq_v2_tpu.ops.gptq_pallas import gptq_solve_stepped

        p = problem
        g = p["g"]
        n_g = p["C"] // g
        ref = self._ref(p, [15.0] * n_g, g, mse=True, fb_dtype_name="float16")
        got = gptq_solve_stepped(p["w_p"].T, p["inv"].hessian_inv, g,
                                 (4,) * n_g, mse=True,
                                 feedback_dtype="float16")
        flips = np.mean(np.asarray(ref["qweight"]) != np.asarray(got["qweight"]))
        assert flips < 0.05, flips
        o_ref = _objective(ref["quant"], p["w_p"], p["inv"].hessian)
        o_got = _objective(got["quant"], p["w_p"], p["inv"].hessian)
        assert o_got == pytest.approx(o_ref, rel=0.02)

    def test_gptq_quant_routes_stepped(self, problem, monkeypatch):
        """gptq_quant picks the stepped solver for MSE/mixed/EXL2 configs
        when kernels are requested, and its output matches the scan path."""
        p = problem
        w = jnp.take(p["w_p"], p["inv"].perm_inv, axis=1)
        g = p["g"]
        n_g = p["C"] // g
        a = gptq_quant(w, p["inv"], [g] * n_g, [4] * n_g, quant_mse=True,
                       use_solver_kernel=False, feedback_dtype=None)
        b = gptq_quant(w, p["inv"], [g] * n_g, [4] * n_g, quant_mse=True,
                       use_solver_kernel=True, feedback_dtype=None)
        flips = np.mean(a["quant_meta"]["qweight"] != b["quant_meta"]["qweight"])
        assert flips < 1e-3, flips
        np.testing.assert_array_equal(a["quant_meta"]["perm"],
                                      b["quant_meta"]["perm"])
        assert a["metrics"]["l2_error"] == pytest.approx(
            b["metrics"]["l2_error"], rel=1e-3)
