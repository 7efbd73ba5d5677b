from blt_vqg_tpu.core.config import Config, add_config_args, config_from_args
from blt_vqg_tpu.core.rng import RngStream
