"""gptq_v2_tpu — a TPU-native GPTQ quantization + W4A16 inference framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the GPTQ-v2
reference pipeline (error-propagated, dependency-scheduled post-training
quantization of Llama-family models) plus a W4A16 serving stack (fused
dequant-matmul Pallas kernel, paged KV cache, continuous batching) sharded
over multi-host TPU meshes.

Layering (mirrors SURVEY.md §7):
  quant/      quantizer math, Hessian hook, GPTQ solver   (jnp reference twins)
  ops/        Pallas TPU kernels + packed-int4 formats
  models/     functional Llama (pure JAX) + HF safetensors loader
  graph.py    jaxpr-based linear-layer dependency extraction
  pipeline.py block-sequential quantization driver
  evaluate.py perplexity evaluation
  data.py     calibration/eval dataset loaders + caches
  parallel/   mesh construction + sharding rules
  serving/    paged KV cache + continuous-batching engine
"""

__version__ = "0.1.0"
