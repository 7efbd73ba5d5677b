from blt_vqg_tpu.ops.timing import timing_signal
from blt_vqg_tpu.ops.masks import pad_mask, causal_mask, decoder_mask
from blt_vqg_tpu.ops.attention import MultiHeadAttention
from blt_vqg_tpu.ops.transformer import (
    TransformerEncoder,
    TransformerDecoder,
    PositionwiseFeedForward,
)
from blt_vqg_tpu.ops.latent import Latent, gaussian_kld
from blt_vqg_tpu.ops.mlp import MLP
from blt_vqg_tpu.ops.resnet import EncoderCNN, ResNet18Backbone
from blt_vqg_tpu.ops.vit import ViTEncoder
from blt_vqg_tpu.ops.rnn import RNNEncoder, RNNDecoder
from blt_vqg_tpu.ops.ring_attention import ring_attention
