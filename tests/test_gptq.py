"""Hessian accumulation/inversion + GPTQ solver: correctness and parity."""
import numpy as np
import pytest

import jax.numpy as jnp

from gptq_v2_tpu.quant import gptq as gq
from gptq_v2_tpu.quant import hessian as hs
from gptq_v2_tpu.quant import quantizer as qz
from gptq_v2_tpu.ops import hessian_pallas as hp


def rand(shape, seed=0, scale=1.0):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal(shape) * scale).astype(np.float32)


class TestHessianAccumulate:
    def test_jnp_twin_matches_numpy(self):
        x = rand((3, 16, 32), seed=1)
        st = hs.init_state(32)
        st = hs.accumulate(st, jnp.asarray(x), use_kernel=False)
        flat = x.reshape(-1, 32)
        np.testing.assert_allclose(
            np.asarray(st.hessian), flat.T @ flat, rtol=1e-5, atol=1e-4
        )
        assert int(st.n_samples) == 3

    def test_pallas_kernel_matches_twin(self):
        d, t = 64, 96
        x = rand((t, d), seed=2)
        h0 = rand((d, d), seed=3)
        h0 = h0 @ h0.T  # symmetric start
        ours = hp.accumulate_hessian(jnp.asarray(h0), jnp.asarray(x), block_d=16,
                                     block_t=32, interpret=True)
        full = hp.symmetrize(ours, block_d=16)
        expected = h0 + x.T @ x
        np.testing.assert_allclose(np.asarray(full), expected, rtol=1e-4, atol=1e-3)

    def test_pallas_kernel_pads_tokens(self):
        d, t = 32, 40  # t not a multiple of block_t
        x = rand((t, d), seed=4)
        h = hp.accumulate_hessian(jnp.zeros((d, d)), jnp.asarray(x), block_d=16,
                                  block_t=16, interpret=True)
        full = hp.symmetrize(h, block_d=16)
        np.testing.assert_allclose(np.asarray(full), x.T @ x, rtol=1e-4, atol=1e-3)

    def test_pallas_kernel_pads_features(self):
        """D not divisible by block_d (Llama's 11008 vs the 512 tile):
        the feature axis pads with zero columns and slices back."""
        d, t = 160, 64
        x = rand((t, d), seed=5)
        h0 = rand((d, d), seed=6)
        h0 = h0 @ h0.T
        ours = hp.accumulate_hessian(jnp.asarray(h0), jnp.asarray(x),
                                     block_d=128, block_t=32, interpret=True)
        # symmetrize at finer granularity than the kernel tiles (the
        # production pairing: 256-granular repair of 512-tile accumulation)
        full = hp.symmetrize(ours, block_d=32)
        np.testing.assert_allclose(np.asarray(full), h0 + x.T @ x,
                                   rtol=1e-4, atol=1e-3)


class TestInvert:
    def _state(self, d=32, t=256, seed=0):
        x = rand((4, t // 4, d), seed=seed)
        st = hs.init_state(d)
        return hs.accumulate(st, jnp.asarray(x), use_kernel=False), x

    def test_upper_factor_property(self):
        st, _ = self._state()
        inv = hs.invert(st, damp_ratio=1e-2, act_order=False)
        u = np.asarray(inv.hessian_inv)
        assert np.allclose(u, np.triu(u))  # upper triangular
        h = np.asarray(inv.hessian)
        np.testing.assert_allclose(u.T @ u @ h, np.eye(h.shape[0]), atol=1e-3)

    def test_act_order_perm(self):
        st, _ = self._state(seed=5)
        inv = hs.invert(st, act_order=True)
        perm = np.asarray(inv.perm)
        h = np.asarray(hp.symmetrize(st.hessian)) * 2.0 / int(st.n_samples)
        diag = np.diagonal(h)
        assert np.all(np.diff(diag[perm]) <= 1e-6)  # descending diagonal
        np.testing.assert_array_equal(np.argsort(perm), np.asarray(inv.perm_inv))

    def test_parity_with_reference(self, reference_modules):
        import torch

        d, t = 32, 512
        x = rand((8, t // 8, d), seed=7)
        hook = reference_modules.gptq.HessianHook()
        hook.add_batch(torch.from_numpy(x), use_kernel=False)
        ref_hinv = hook.invert(damp_ratio=1e-2, act_order=True)

        st = hs.accumulate(hs.init_state(d), jnp.asarray(x), use_kernel=False)
        inv = hs.invert(st, damp_ratio=1e-2, act_order=True)
        np.testing.assert_array_equal(np.asarray(inv.perm), hook.perm.numpy())
        np.testing.assert_allclose(
            np.asarray(inv.hessian_inv), ref_hinv.numpy(), rtol=5e-3, atol=5e-5
        )


def make_inverted(d, t=2048, seed=11, act_order=True):
    x = rand((8, t // 8, d), seed=seed, scale=0.7)
    st = hs.accumulate(hs.init_state(d), jnp.asarray(x), use_kernel=False)
    return hs.invert(st, act_order=act_order), st, x


class TestGPTQSolver:
    def test_rtn_matches_groupwise_quantizer(self):
        R, C, g = 8, 32, 8
        w = rand((R, C), seed=13)
        res = gq.gptq_quant(jnp.asarray(w), None, [g] * (C // g), [4] * (C // g),
                            quant_mse=False)
        # manual per-group RTN
        for k in range(C // g):
            blk = jnp.asarray(w[:, k * g:(k + 1) * g])
            p = qz.find_params(blk, 4, sym=False)
            dq = qz.params_dequantize(p, qz.params_quantize(p, blk))
            np.testing.assert_allclose(
                np.asarray(res["quant"])[:, k * g:(k + 1) * g], np.asarray(dq),
                rtol=1e-6,
            )

    def test_solver_reduces_layer_output_error(self):
        """GPTQ must beat RTN on calibration-set output error (the point of GPTQ).

        Uses *correlated* calibration activations (like real LLM activations);
        with i.i.d. inputs H is near-diagonal and GPTQ degenerates to RTN.
        """
        R, C, g = 16, 64, 16
        w = rand((R, C), seed=17)
        mix = rand((C, C), seed=18) / np.sqrt(C) + 0.5 * np.eye(C, dtype=np.float32)
        z = rand((2048, C), seed=19)
        flat = (z @ mix).astype(np.float32)
        st = hs.accumulate(hs.init_state(C), jnp.asarray(flat[None]), use_kernel=False)
        inv = hs.invert(st, act_order=True)
        res_gptq = gq.gptq_quant(jnp.asarray(w), inv, [g] * (C // g), [4] * (C // g),
                                 feedback_dtype=None)
        res_rtn = gq.gptq_quant(jnp.asarray(w), None, [g] * (C // g), [4] * (C // g),
                                quant_mse=False)
        err_g = np.linalg.norm(flat @ (np.asarray(res_gptq["quant"]) - w).T)
        err_r = np.linalg.norm(flat @ (np.asarray(res_rtn["quant"]) - w).T)
        assert err_g < err_r

    def test_quant_meta_schema(self):
        R, C, g = 8, 32, 8
        w = rand((R, C), seed=19)
        inv, _, _ = make_inverted(C, seed=19)
        meta = gq.gptq_quant(jnp.asarray(w), inv, [g] * (C // g), [4] * (C // g))["quant_meta"]
        assert meta["qweight"].dtype == np.uint8 and meta["qweight"].shape == (R, C)
        assert meta["qzero"].dtype == np.uint8 and meta["qzero"].shape == (R, C // g)
        assert meta["scale"].shape == (R, C // g)
        assert meta["perm_inv"].dtype == np.int16
        assert meta["group_sizes"].dtype == np.int16
        assert meta["group_bit_widths"].dtype == np.uint8
        assert meta["qscale"] is None and meta["sscale"] is None

    def test_reconstruct_matches_quant(self):
        """reconstruct_weight(quant_meta) == solver's dequantized output.

        The fp16-roundtrip feedback path stores errors in inference numerics;
        reconstruction in fp16 must reproduce the solver's `quant` exactly.
        """
        R, C, g = 8, 32, 8
        w = rand((R, C), seed=23)
        inv, _, _ = make_inverted(C, seed=23)
        res = gq.gptq_quant(jnp.asarray(w), inv, [g] * (C // g), [4] * (C // g),
                            feedback_dtype="float16", save_dtype=jnp.float16)
        meta = {k: (jnp.asarray(v) if v is not None else None) for k, v in res["quant_meta"].items()}
        rec = qz.reconstruct_weight(meta, out_dtype=jnp.float32)
        np.testing.assert_allclose(
            np.asarray(rec), np.asarray(res["quant"]).astype(np.float16), rtol=1e-3, atol=1e-4
        )

    def test_parity_with_reference_solver(self, reference_modules):
        """Bit-exact-ish parity with the reference pure-Python GPTQ loop
        (gptq_py.py:158-193), sharing one inverse-Hessian factor."""
        import torch

        R, C, g = 16, 64, 16
        w = rand((R, C), seed=29)
        inv, st, _ = make_inverted(C, seed=29)

        hook = reference_modules.gptq.HessianHook()
        hook.hessian = torch.from_numpy(np.asarray(inv.hessian))
        hook.hessian_inv = torch.from_numpy(np.asarray(inv.hessian_inv))
        hook.perm = torch.from_numpy(np.asarray(inv.perm)).long()
        hook.perm_inv = torch.from_numpy(np.asarray(inv.perm_inv)).long()
        hook.n_samples = int(st.n_samples)

        sizes = torch.full([C // g], g, dtype=torch.int32)
        bws = torch.full([C // g], 4, dtype=torch.int32)
        ref = reference_modules.gptq.gptq_quant(
            weight=torch.from_numpy(w), hessian_hook=hook, group_sizes=sizes,
            group_bit_widths=bws, scale_bit_width=None, gptq_use_kernel=False,
            gptq_block_sizes=sizes, quant_symmetric=False, quant_mse=False,
        )
        ours = gq.gptq_quant(
            jnp.asarray(w), inv, [g] * (C // g), [4] * (C // g),
            quant_symmetric=False, quant_mse=False, feedback_dtype=None,
            save_dtype=jnp.float32,
        )
        ref_meta = ref["quant_meta"]
        our_meta = ours["quant_meta"]
        np.testing.assert_array_equal(our_meta["qweight"], ref_meta["qweight"].numpy())
        np.testing.assert_allclose(our_meta["scale"], ref_meta["scale"].numpy(), rtol=1e-6)
        np.testing.assert_array_equal(our_meta["qzero"], ref_meta["qzero"].numpy())
        np.testing.assert_array_equal(our_meta["perm_inv"], ref_meta["perm_inv"].numpy())
        np.testing.assert_array_equal(our_meta["group_sizes"], ref_meta["group_sizes"].numpy())
        for ours_key, ref_key in [
            ("gptq_error", "gptq_error"), ("gptq_norm", "gptq_norm"),
            ("l2_error", "l2.0_error"), ("l2_norm", "l2.0_norm"),
        ]:
            np.testing.assert_allclose(ours["metrics"][ours_key], ref["metrics"][ref_key],
                                       rtol=1e-4, atol=1e-9)

    def test_parity_with_reference_rtn(self, reference_modules):
        import torch

        R, C, g = 8, 32, 8
        w = rand((R, C), seed=31)
        sizes = torch.full([C // g], g, dtype=torch.int32)
        bws = torch.full([C // g], 4, dtype=torch.int32)
        ref = reference_modules.gptq.gptq_quant(
            weight=torch.from_numpy(w), hessian_hook=None, group_sizes=sizes,
            group_bit_widths=bws, quant_mse=True, save_device=torch.device("cpu"),
        )
        ours = gq.gptq_quant(jnp.asarray(w), None, [g] * (C // g), [4] * (C // g),
                             quant_mse=True, save_dtype=jnp.float32)
        np.testing.assert_array_equal(
            ours["quant_meta"]["qweight"], ref["quant_meta"]["qweight"].numpy()
        )
        np.testing.assert_allclose(
            ours["quant_meta"]["scale"], ref["quant_meta"]["scale"].numpy(), rtol=1e-5
        )

    def _ref_solve(self, reference_modules, w, inv, st, sizes, bws,
                   block_sizes=None, mse=False):
        import torch

        hook = reference_modules.gptq.HessianHook()
        hook.hessian = torch.from_numpy(np.asarray(inv.hessian))
        hook.hessian_inv = torch.from_numpy(np.asarray(inv.hessian_inv))
        hook.perm = torch.from_numpy(np.asarray(inv.perm)).long()
        hook.perm_inv = torch.from_numpy(np.asarray(inv.perm_inv)).long()
        hook.n_samples = int(st.n_samples)
        t_sizes = torch.tensor(sizes, dtype=torch.int32)
        t_blocks = torch.tensor(block_sizes if block_sizes is not None
                                else sizes, dtype=torch.int32)
        return reference_modules.gptq.gptq_quant(
            weight=torch.from_numpy(w), hessian_hook=hook,
            group_sizes=t_sizes,
            group_bit_widths=torch.tensor(bws, dtype=torch.int32),
            scale_bit_width=None, gptq_use_kernel=False,
            gptq_block_sizes=t_blocks, quant_symmetric=False, quant_mse=mse,
        )

    def _assert_meta_parity(self, ours, ref):
        ref_meta, our_meta = ref["quant_meta"], ours["quant_meta"]
        np.testing.assert_array_equal(our_meta["qweight"],
                                      ref_meta["qweight"].numpy())
        np.testing.assert_allclose(our_meta["scale"],
                                   ref_meta["scale"].numpy(), rtol=1e-6)
        np.testing.assert_array_equal(our_meta["qzero"],
                                      ref_meta["qzero"].numpy())
        np.testing.assert_array_equal(our_meta["group_sizes"],
                                      ref_meta["group_sizes"].numpy())
        np.testing.assert_allclose(ours["metrics"]["gptq_error"],
                                   ref["metrics"]["gptq_error"],
                                   rtol=1e-4, atol=1e-9)

    def test_parity_nonuniform_groups(self, reference_modules):
        """Non-uniform group sizes + mixed bit widths vs the reference loop
        (gptq_py.py:158-193) — the EXL2 mixed-precision use case."""
        R, C = 16, 64
        sizes, bws = [8, 24, 16, 16], [2, 4, 3, 8]
        w = rand((R, C), seed=41)
        inv, st, _ = make_inverted(C, seed=41)
        ref = self._ref_solve(reference_modules, w, inv, st, sizes, bws)
        ours = gq.gptq_quant(jnp.asarray(w), inv, sizes, bws,
                             quant_mse=False, feedback_dtype=None,
                             save_dtype=jnp.float32)
        self._assert_meta_parity(ours, ref)

    def test_parity_blocks_coarser_than_groups(self, reference_modules):
        """gptq_block_sizes spanning several groups: tail updates fire at
        block — not group — boundaries (reference gptq_py.py:165-193)."""
        R, C, g = 16, 64, 16
        sizes, bws = [g] * (C // g), [4] * (C // g)
        blocks = [32, 32]
        w = rand((R, C), seed=43)
        inv, st, _ = make_inverted(C, seed=43)
        ref = self._ref_solve(reference_modules, w, inv, st, sizes, bws,
                              block_sizes=blocks)
        ours = gq.gptq_quant(jnp.asarray(w), inv, sizes, bws,
                             gptq_block_sizes=blocks, quant_mse=False,
                             feedback_dtype=None, save_dtype=jnp.float32)
        self._assert_meta_parity(ours, ref)
        # and the composition really differs from block==group
        base = gq.gptq_quant(jnp.asarray(w), inv, sizes, bws,
                             quant_mse=False, feedback_dtype=None,
                             save_dtype=jnp.float32, use_solver_kernel=False)
        assert (np.asarray(ours["quant_meta"]["qweight"])
                != np.asarray(base["quant_meta"]["qweight"])).any()

    def test_parity_blocks_finer_than_groups(self, reference_modules):
        """A group spanning a block boundary carries its quantizer across
        (reference gptq_py.py:168-186's ``cur_group`` walk)."""
        R, C, g = 8, 64, 32
        sizes, bws = [g] * (C // g), [4] * (C // g)
        blocks = [16] * (C // 16)
        w = rand((R, C), seed=47)
        inv, st, _ = make_inverted(C, seed=47)
        ref = self._ref_solve(reference_modules, w, inv, st, sizes, bws,
                              block_sizes=blocks)
        ours = gq.gptq_quant(jnp.asarray(w), inv, sizes, bws,
                             gptq_block_sizes=blocks, quant_mse=False,
                             feedback_dtype=None, save_dtype=jnp.float32)
        self._assert_meta_parity(ours, ref)

    def test_parity_nonuniform_mse(self, reference_modules):
        """MSE search through the general path: the reference refines on the
        *block* slice, not the group slice (gptq_py.py:180-186)."""
        R, C = 8, 48
        sizes, bws = [16, 8, 24], [4, 2, 4]
        w = rand((R, C), seed=53)
        inv, st, _ = make_inverted(C, seed=53)
        ref = self._ref_solve(reference_modules, w, inv, st, sizes, bws,
                              mse=True)
        ours = gq.gptq_quant(jnp.asarray(w), inv, sizes, bws,
                             quant_mse=True, feedback_dtype=None,
                             save_dtype=jnp.float32)
        self._assert_meta_parity(ours, ref)

    def test_parity_rtn_nonuniform(self, reference_modules):
        import torch

        R, C = 8, 48
        sizes, bws = [16, 8, 24], [4, 2, 8]
        w = rand((R, C), seed=59)
        ref = reference_modules.gptq.gptq_quant(
            weight=torch.from_numpy(w), hessian_hook=None,
            group_sizes=torch.tensor(sizes, dtype=torch.int32),
            group_bit_widths=torch.tensor(bws, dtype=torch.int32),
            quant_mse=True, save_device=torch.device("cpu"),
        )
        ours = gq.gptq_quant(jnp.asarray(w), None, sizes, bws,
                             quant_mse=True, save_dtype=jnp.float32)
        np.testing.assert_array_equal(
            ours["quant_meta"]["qweight"], ref["quant_meta"]["qweight"].numpy())
        np.testing.assert_allclose(
            ours["quant_meta"]["scale"], ref["quant_meta"]["scale"].numpy(),
            rtol=1e-5)

    def test_fp16_feedback_changes_low_bits_only(self):
        R, C, g = 8, 32, 8
        w = rand((R, C), seed=37)
        inv, _, _ = make_inverted(C, seed=37)
        a = gq.gptq_quant(jnp.asarray(w), inv, [g] * (C // g), [4] * (C // g),
                          feedback_dtype="float16")
        b = gq.gptq_quant(jnp.asarray(w), inv, [g] * (C // g), [4] * (C // g),
                          feedback_dtype=None)
        # same codes almost everywhere; dequantized result close
        frac_diff = np.mean(a["quant_meta"]["qweight"] != b["quant_meta"]["qweight"])
        assert frac_diff < 0.05
