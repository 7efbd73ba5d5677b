from blt_vqg_tpu.train.losses import LossOutputs, compute_losses, kl_weight_schedule
from blt_vqg_tpu.train.schedule import noam_schedule
from blt_vqg_tpu.train.state import TrainState, create_train_state
from blt_vqg_tpu.train.step import make_train_step, make_eval_step
