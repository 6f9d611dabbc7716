from gptq_v2_tpu.serving.model import PackedLlama, quantize_params_to_packed
from gptq_v2_tpu.serving.kv_cache import PagedKVCache
from gptq_v2_tpu.serving.engine import Engine, Request
from gptq_v2_tpu.serving.speculative import speculative_generate
