from gptq_v2_tpu.quant.quantizer import (
    EPSILON,
    QuantParams,
    construct_matrix,
    construct_matrix_2,
    dequantize,
    dequantize2,
    dequantize2_quantized2,
    dequantize_quantized,
    find_params,
    mse_refine,
    quantize,
    quantize2,
    reconstruct_weight,
)
from gptq_v2_tpu.quant.hessian import (
    HessianState,
    InvertedHessian,
    accumulate,
    init_state,
    invert,
)
from gptq_v2_tpu.quant.gptq import gptq_quant

__all__ = [
    "EPSILON", "QuantParams", "construct_matrix", "construct_matrix_2",
    "dequantize", "dequantize2", "dequantize2_quantized2", "dequantize_quantized",
    "find_params", "mse_refine", "quantize", "quantize2", "reconstruct_weight",
    "HessianState", "InvertedHessian", "accumulate", "init_state", "invert",
    "gptq_quant",
]
