from gptq_v2_tpu.models.llama import (
    ATTN_LINEARS,
    BLOCK_LINEARS,
    MLP_LINEARS,
    LlamaConfig,
    block_apply,
    embed,
    forward_hidden,
    forward_logits,
    init_params,
    lm_logits,
    rope_cos_sin,
)
from gptq_v2_tpu.models.loader import (
    load_hf_model,
    params_from_torch_state_dict,
)
