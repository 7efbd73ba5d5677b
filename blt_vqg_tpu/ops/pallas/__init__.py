from blt_vqg_tpu.ops.pallas.flash_attention import flash_attention
