"""Public import surface stays importable and re-exported."""


def test_package_surface():
    import blt_vqg_tpu
    from blt_vqg_tpu.core import Config, RngStream
    from blt_vqg_tpu.core.checkpoint import CheckpointManager
    from blt_vqg_tpu.core.debug import enable_nan_checks, guarded_update
    from blt_vqg_tpu.core.distributed import initialize_distributed
    from blt_vqg_tpu.core.metrics import MetricWriter
    from blt_vqg_tpu.core.utils import Dict2Obj
    from blt_vqg_tpu.text import Vocabulary, load_vocab, tokenize, process_text
    from blt_vqg_tpu.text.bpe import BPETokenizer
    from blt_vqg_tpu.text.build import build_vocab
    from blt_vqg_tpu.data import (IQDataset, PackedDataset, make_loader,
                                  make_augment_fn, write_synthetic_hdf5,
                                  pack_hdf5)
    from blt_vqg_tpu.data import native
    from blt_vqg_tpu.ops import (MultiHeadAttention, TransformerEncoder,
                                 TransformerDecoder, Latent, MLP, EncoderCNN,
                                 ViTEncoder, RNNEncoder, RNNDecoder,
                                 ring_attention, timing_signal, pad_mask)
    from blt_vqg_tpu.ops.pallas import flash_attention
    from blt_vqg_tpu.models import IQ, IQRNN, apply_glove_table
    from blt_vqg_tpu.parallel import (build_mesh, local_mesh, shard_params,
                                      batch_sharding, replicate)
    from blt_vqg_tpu.parallel.mesh import build_hybrid_mesh
    from blt_vqg_tpu.train import (compute_losses, noam_schedule, TrainState,
                                   create_train_state, make_train_step,
                                   make_eval_step)
    from blt_vqg_tpu.train.trainer import Trainer
    from blt_vqg_tpu.train.tune import run_tune, ASHAScheduler
    from blt_vqg_tpu.train.nlg_metrics import NLGEval
    assert blt_vqg_tpu.__version__


def test_cli_mains_importable():
    from blt_vqg_tpu.cli import (train_iq, evaluate_iq, test_iq,
                                 store_dataset, pack_dataset, vocab, tune)
    for mod in (train_iq, evaluate_iq, test_iq, store_dataset, pack_dataset,
                vocab, tune):
        assert callable(mod.main)
