"""Multi-host scaling harness: decode tok/s at 1 chip / 1 host / N hosts.

The north-star report (SURVEY §5.8): absolute tokens/s and parallel
efficiency as the mesh grows.  Configurations measured (largest first so
compile caches warm on the big mesh):

* ``1 chip``    — single-device decode (the bench.py headline path)
* ``1 host``    — TP over all local devices (ICI)
* ``N hosts``   — ``(data=N, model=per_host)`` DCN mesh: TP inside each
  host, data-parallel batches across hosts (the DCN-safe layout —
  per-token collectives never cross hosts; see ``parallel.mesh
  .make_dcn_mesh``)

Multi-process usage (one process per host; also how it is CI-tested on
CPU with virtual devices — ``tests/test_multihost.py``)::

    python scripts/bench_scaling.py --coordinator host0:1234 \
        --num-processes 2 --process-id $i [--tiny]

Single-process: runs whatever fits the local device count.
Only process 0 prints; output is one JSON line per configuration.
"""
import argparse
import json
import os
import sys
import time


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", default="")
    ap.add_argument("--num-processes", type=int, default=1)
    ap.add_argument("--process-id", type=int, default=0)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--max-seq", type=int, default=256)
    ap.add_argument("--steps", type=int, default=16)
    ap.add_argument("--tiny", action="store_true",
                    help="tiny model (CPU/virtual-device testing)")
    ap.add_argument("--cpu-devices", type=int, default=0,
                    help="force N virtual CPU devices per process")
    args = ap.parse_args(argv)

    if args.cpu_devices:
        import re

        flags = re.sub(r"--xla_force_host_platform_device_count=\d+", "",
                       os.environ.get("XLA_FLAGS", ""))
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count="
                    f"{args.cpu_devices}").strip()
    import jax

    if args.cpu_devices:
        jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent.parent))
    from gptq_v2_tpu.parallel import mesh as M

    M.init_distributed(args.coordinator or None,
                       args.num_processes if args.num_processes > 1 else None,
                       args.process_id if args.num_processes > 1 else None)

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from gptq_v2_tpu.models.llama import LlamaConfig
    from gptq_v2_tpu.parallel import tp as TP
    from gptq_v2_tpu.serving import kv_cache as kvc
    from gptq_v2_tpu.serving.model import random_packed_llama

    is0 = jax.process_index() == 0
    devs = jax.devices()
    n_local = len(jax.local_devices())
    n_hosts = jax.process_count()

    if args.tiny or jax.default_backend() == "cpu":
        cfg = LlamaConfig(vocab_size=256, hidden_size=256,
                          intermediate_size=512, num_hidden_layers=2,
                          num_attention_heads=8, num_key_value_heads=8,
                          dtype="float32")
        group = 32
    else:
        cfg = LlamaConfig(dtype="bfloat16")  # Llama-2-7B
        group = 128
    model = random_packed_llama(cfg, group_size=group, seed=0,
                                compute_dtype=cfg.jdtype)

    def measure(mesh, dp, tp, label):
        """Aggregate decode tok/s on a (data=dp, model=tp) mesh."""
        b = args.batch * dp  # global batch: args.batch per replica
        sharded_model = TP.shard_packed_llama(model, mesh)
        cache = kvc.init_contiguous_cache(
            cfg.num_hidden_layers, b, args.max_seq,
            cfg.num_key_value_heads, cfg.head_dim_, dtype=cfg.jdtype)
        cache = TP.shard_cache(cache, mesh, data_parallel=dp > 1)
        step = TP.build_tp_decode_step(mesh, cache, data_parallel=dp > 1)
        tokens = jax.device_put(
            jnp.zeros((b,), jnp.int32),
            NamedSharding(mesh, P(M.DATA_AXIS)))
        positions = jax.device_put(
            jnp.full((b,), args.max_seq // 2, jnp.int32),
            NamedSharding(mesh, P(M.DATA_AXIS)))
        logits, cache = step(sharded_model, tokens, cache, None, positions)
        np.asarray(jax.device_get(logits.addressable_shards[0].data[:1, :1]))
        t0 = time.time()
        for _ in range(args.steps):
            logits, cache = step(sharded_model, tokens, cache, None,
                                 positions)
        np.asarray(jax.device_get(logits.addressable_shards[0].data[:1, :1]))
        dt = (time.time() - t0) / args.steps
        del cache
        return dict(config=label, dp=dp, tp=tp, global_batch=b,
                    tok_s=round(b / dt, 1), ms_per_step=round(dt * 1e3, 2))

    results = []
    # N hosts: data over DCN (hosts), TP inside each host
    if n_hosts > 1:
        mesh = M.make_dcn_mesh(tp=n_local, dp=n_hosts)
        results.append(measure(mesh, n_hosts, n_local, f"{n_hosts} hosts"))
    # 1 host: TP over local devices (process 0's host)
    if n_local > 1 and n_hosts == 1:
        mesh = M.make_mesh(tp=n_local, dp=1)
        results.append(measure(mesh, 1, n_local, "1 host"))
    # 1 chip
    if n_hosts == 1:
        mesh = M.make_mesh(tp=1, dp=1, devices=devs[:1])
        results.append(measure(mesh, 1, 1, "1 chip"))

    if is0:
        base = results[-1]["tok_s"] if results else 1.0
        for r in results:
            n_dev = r["dp"] * r["tp"]
            r["efficiency_vs_1chip"] = (
                round(r["tok_s"] / (base * n_dev), 4)
                if results[-1]["config"] == "1 chip" and n_dev else None)
            print(json.dumps(r))
    return results


if __name__ == "__main__":
    main()
