from blt_vqg_tpu.models.iq import IQ, apply_glove_table
from blt_vqg_tpu.models.iq_rnn import IQRNN
