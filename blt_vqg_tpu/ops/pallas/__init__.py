from blt_vqg_tpu.ops.pallas.flash_attention import flash_attention
from blt_vqg_tpu.ops.pallas.int8_matmul import int8_matmul, quantize_int8
from blt_vqg_tpu.ops.pallas.decode_stream import (decode_stack_step,
                                                  quantize_stack)
from blt_vqg_tpu.ops.pallas.decode_head import head_argmax

__all__ = ["flash_attention", "int8_matmul", "quantize_int8",
           "decode_stack_step", "quantize_stack", "head_argmax"]
