"""CLI driver: quantize a Llama checkpoint, save results, evaluate ppl.

TPU-native counterpart of the reference entry point (reference
``main.py:16-52``): load → calibrate → quantize (timed) → save → evaluate
perplexity on the calibration set plus the held-out suites.  The TF32
kill-switch has no analogue here — fp32 matmuls in the numerics-critical
paths already request ``Precision.HIGHEST`` explicitly (TPUs would
otherwise demote fp32 matmuls to bf16 passes, the same failure mode).

Run: ``python -m gptq_v2_tpu.main --model-dir /path/to/llama-2-7b-hf``
"""
from __future__ import annotations

import json
import logging
import sys
from pathlib import Path

import numpy as np

from gptq_v2_tpu.data import get_dataloader
from gptq_v2_tpu.evaluate import evaluate_ppl
from gptq_v2_tpu.flags import parse_args
from gptq_v2_tpu.models.loader import load_hf_model
from gptq_v2_tpu.pipeline import QuantConfig, quantize_model

logger = logging.getLogger(__name__)


def save_results(path: str, results: dict, qcfg: QuantConfig) -> None:
    """Single-file save of all quant_meta + metrics (reference
    ``main.py:37-38`` uses torch.save of a pickled dict; we use npz with
    ``{layer}::{field}`` keys plus a JSON sidecar for metrics/config)."""
    from gptq_v2_tpu.pipeline import npz_payload

    out = Path(path)
    out.parent.mkdir(parents=True, exist_ok=True)
    flat = {}
    for name, meta in results["data"].items():
        for field, v in npz_payload(meta).items():
            flat[f"{name}::{field}"] = v
    np.savez(out, **flat)
    with open(out.with_suffix(".metrics.json"), "w") as f:
        json.dump({"metrics": results["metrics"],
                   "config": qcfg.__dict__}, f, indent=1)


def load_results(path: str) -> dict:
    """Inverse of :func:`save_results`: ``{'data': {name: quant_meta}}``."""
    from gptq_v2_tpu.pipeline import _unpack_meta, ensure_optional_meta

    z = np.load(path)
    data: dict = {}
    for key in z.files:
        name, field = key.split("::", 1)
        data.setdefault(name, {})[field] = z[key]
    return {"data": {name: ensure_optional_meta(_unpack_meta(meta))
                     for name, meta in data.items()}}


def main(argv=None) -> dict:
    # root at INFO (root DEBUG floods jax/urllib3 internals); our package
    # keeps per-layer DEBUG detail, mirroring the reference's debug logs
    logging.basicConfig(format="%(levelname)s %(asctime)s %(message)s",
                        level=logging.INFO)
    logging.getLogger("gptq_v2_tpu").setLevel(logging.DEBUG)
    logging.info(" ".join(argv if argv is not None else sys.argv))
    args = parse_args(argv)
    logging.info(args)

    from gptq_v2_tpu.utils import PhaseTimer, enable_compilation_cache, \
        profile_trace

    enable_compilation_cache()
    timer = PhaseTimer()

    with timer("load"):
        cfg, params = load_hf_model(args.model_dir, lazy=args.lazy_load)

    with timer("data"):
        encodings_train = get_dataloader(
            name=args.data_train_set, split="train", seqlen=args.seqlen,
            n_samples=args.data_train_n_samples, model_path=args.model_dir,
            seed=args.data_seed, cache_dir=args.data_cache_dir,
        )

    results = None
    if args.do_quant:
        qcfg = QuantConfig(
            bits=args.bits, group_size=args.group_size, sym=args.sym,
            act_order=args.act_order, damp_ratio=args.damp_ratio,
            mse=args.mse, scale_bit_width=args.scale_bit_width, rtn=args.rtn,
        )
        with profile_trace(args.profile_dir), timer("quantize"):
            results = quantize_model(
                cfg, params, encodings_train, qcfg,
                batch_size=args.batch_size,
                save_dir=args.save_dir or None, resume=args.resume,
            )
        logging.info("finished quantizing in %.2f s",
                     timer.seconds["quantize"])
        if args.save_model_path:
            with timer("save"):
                save_results(args.save_model_path, results, qcfg)

    ppls = {}
    for dataset_name in [s.strip() for s in args.eval_sets.split(",") if s.strip()]:
        if dataset_name == "train":
            encodings = encodings_train
        else:
            if dataset_name == "c4" and args.data_new_eval:
                dataset_name = "c4-new"
            with timer("data"):
                encodings = get_dataloader(
                    name=dataset_name, split="test", seqlen=args.seqlen,
                    n_samples=args.eval_n_samples, model_path=args.model_dir,
                    seed=args.data_seed, cache_dir=args.data_cache_dir,
                )
        logging.info("evaluating %s", dataset_name)
        with timer("eval"):
            ppl = evaluate_ppl(cfg, params, encodings,
                               batch_size=args.batch_size)
        ppls[dataset_name] = ppl
        logging.info("ppl: %.4f", ppl)
    logging.info("phase timings: %s", timer.summary())
    return {"results": results, "ppls": ppls,
            "quant_s": timer.seconds.get("quantize"),
            "phases": timer.summary()}


if __name__ == "__main__":
    main()
