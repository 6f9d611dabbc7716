"""Solver wall-time: mse=True (stepped Pallas) vs mse=False (monolithic)
at 7B layer shapes — the verdict's done-criterion is mse within ~2x.
"""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from gptq_v2_tpu.quant import gptq as gq
from gptq_v2_tpu.quant import hessian as hs


def solve(w, inv, C, g, mse, exl2=False):
    kw = dict(quant_mse=mse)
    if exl2:
        kw.update(scale_bit_width=4, quant_symmetric=True)
    t0 = time.time()
    out = gq.gptq_quant(w, inv, [g] * (C // g), [4] * (C // g),
                        keep_on_device=True, **kw)
    jax.block_until_ready(out["quant"])
    np.asarray(jax.device_get(out["quant"].ravel()[:1]))
    return time.time() - t0


def main():
    for (R, C) in ((4096, 4096), (4096, 11008)):
        g = 128
        rng = np.random.default_rng(0)
        mix = (rng.standard_normal((C, C)).astype(np.float32) / np.sqrt(C)
               + 0.5 * np.eye(C, dtype=np.float32))
        acts = rng.standard_normal((2, 512, C)).astype(np.float32) @ mix
        st = hs.init_state(C)
        for bi in range(2):
            st = hs.accumulate(st, jnp.asarray(acts[bi:bi + 1]))
        inv = hs.invert(st, act_order=True)
        w = jnp.asarray(rng.standard_normal((R, C)).astype(np.float32) * 0.02)
        # warm both paths, then time second runs
        solve(w, inv, C, g, mse=False)
        solve(w, inv, C, g, mse=True)
        t_plain = solve(w, inv, C, g, mse=False)
        t_mse = solve(w, inv, C, g, mse=True)
        t_exl2 = None
        if C == 4096:
            solve(w, inv, C, g, mse=False, exl2=True)
            t_exl2 = solve(w, inv, C, g, mse=False, exl2=True)
        print(f"({R},{C}) g={g}: plain {t_plain*1e3:.0f} ms, "
              f"mse {t_mse*1e3:.0f} ms ({t_mse/t_plain:.2f}x)"
              + (f", exl2 {t_exl2*1e3:.0f} ms ({t_exl2/t_plain:.2f}x)"
                 if t_exl2 else ""),
              file=sys.stderr)


if __name__ == "__main__":
    main()
