"""Single source of truth for configuration.

The reference threads an argparse ``args`` namespace through every module
(reference train_iq.py:312-353, run.sh:1-10).  Here config is a frozen
dataclass — hashable, so it can be a static argument to ``jax.jit`` — with an
argparse shim that reproduces the reference flag surface exactly, plus a JSON
round-trip (the reference dumps ``args.json`` next to checkpoints and reloads
it at eval time, old_train_iq.py:287-288 / evaluate_iq.py:81-83).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
from dataclasses import dataclass
from typing import Optional, Tuple


@dataclass(frozen=True)
class Config:
    """Hyperparameters and run options.

    Field names match the reference CLI flags (reference train_iq.py:315-351)
    so run.sh-style configs translate 1:1.  TPU-specific fields are grouped at
    the bottom.
    """

    # --- model dims (reference train_iq.py:315-326) ---
    emb_dim: int = 300
    hidden_dim: int = 300
    latent_dim: int = 300
    pwffn_dim: int = 600
    num_layers: int = 4
    num_heads: int = 4

    # --- optimization (reference train_iq.py:327-339) ---
    lr: float = 3e-5
    num_pretraining_steps: int = 12_000
    total_training_steps: int = 35_000
    full_kl_step: int = 15_000
    kl_ceiling: float = 0.5
    kl_floor: float = 0.0             # >0: free-bits floor (nats) on the
                                      # total KL — the KL term stops pulling
                                      # once kld ≤ floor, preventing the
                                      # saturated anneal from collapsing z
                                      # (benchmarks/latent_decay.md); 0 is
                                      # the exact reference objective
    aux_ceiling: float = 1.0
    image_recon_lambda: float = 0.1
    batch_size: int = 128
    warmup_steps: int = 4000          # reference train_iq.py:252 (hardcoded)
    grad_clip: float = 5.0            # reference train_iq.py:372 (Trainer arg)

    # --- data (reference train_iq.py:341-351) ---
    emb_file: Optional[str] = None    # GloVe text file, e.g. vectors/glove.6B.300d.txt
    resnet_ckpt: Optional[str] = None # torchvision resnet18 state_dict (.pth
                                      # or .npz) — the reference's
                                      # pretrained=True backbone
                                      # (encoder_cnn.py:17-21) as an offline
                                      # file; grafted at init (ops/resnet.py
                                      # load_resnet18_checkpoint)
    dataset: str = "data/processed/iq_dataset.hdf5"
    val_dataset: str = "data/processed/iq_val_dataset.hdf5"
    vocab: str = "vocab.json"
    cat2name: str = "data/processed/cat2name.json"
    input_mode: str = "ans"           # "ans" | "cat"
    print_note: str = ""

    # --- sequence geometry (reference store_dataset.py:45, data_loader.py:41) ---
    max_q_length: int = 20
    max_a_length: int = 4
    max_decode_length: int = 50       # reference train_iq.py:174

    # --- dropout (reference transformer_layers.py:96-97 defaults) ---
    attention_dropout: float = 0.1
    relu_dropout: float = 0.1
    layer_dropout: float = 0.0
    input_dropout: float = 0.0
    # >0: latent-phase decoder-input word dropout (Bowman et al. 2016) —
    # each non-pad teacher-forced input token is replaced by <unk> with
    # this probability, weakening the autoregressive path so
    # reconstruction leans on z (anti-posterior-collapse knob; no
    # reference equivalent)
    target_word_dropout: float = 0.0

    # --- harness cadence (reference train_iq.py:372-373) ---
    val_check_interval: int = 500
    limit_val_batches: int = 100
    checkpoint_every: int = 400       # reference train_iq.py:373 (CheckpointEveryNSteps(400))
    checkpoint_at_end: bool = True    # False skips the final save (benchmark
                                      # runs on tunneled TPUs where device→host
                                      # is ~MB/s)
    output_dir: str = "runs/default"

    # --- TPU-native options (no reference equivalent) ---
    dtype: str = "bfloat16"           # compute dtype for matmuls/attention
    param_dtype: str = "float32"      # parameter STORAGE dtype; "bfloat16"
                                      # = mixed precision (bf16 params +
                                      # f32 Adam masters, fused optimizer
                                      # only; vocab heads stay f32) — the
                                      # compute dtype is `dtype` either way
    mesh_shape: Tuple[int, ...] = (1, 1)   # (data, model)
    mesh_axis_names: Tuple[str, ...] = ("data", "model")
    use_pallas_attention: bool = False
    use_pallas_decode: bool = False   # fused per-layer decode step: 2 Pallas
                                      # ops instead of ~15 XLA ops on the
                                      # latency-bound serial decode chain
                                      # (ops/pallas/decode_layer.py)
    use_stream_decode: bool = False   # whole-stack streaming decode: ONE
                                      # Pallas kernel for all layers, weights
                                      # and KV cache pipelined HBM->VMEM
                                      # (ops/pallas/decode_stream.py).
                                      # Batch ceilings at flagship dims
                                      # (16 MB scoped VMEM, measured
                                      # round 5): bf16 weights <= b64,
                                      # int8 <= b128; larger batches OOM
                                      # at compile — serve them on the
                                      # XLA path (METHODOLOGY round 5).
    stream_weight_dtype: str = "bfloat16"  # "int8": stream decode weights
                                      # quantized (per-column scales, VMEM
                                      # dequant) — halves the stream
                                      # kernel's weight-DMA floor.  Accuracy
                                      # measured at the b128 headline on the
                                      # flagship-v2 checkpoint: ZERO NLG
                                      # delta vs XLA greedy (BLEU-4/METEOR/
                                      # CIDEr identical, token agreement
                                      # 0.977 — METHODOLOGY round 5);
                                      # synthetic-corpus caveat applies
                                      # until real VQA data is reachable.
    stream_fused_head: str = "auto"   # on the streaming serving decode, fuse
                                      # final-LN + vocab projection + argmax
                                      # into one Pallas kernel with the head
                                      # weights streamed at stream_head_dtype
                                      # (ops/pallas/decode_head.py).
                                      # "auto" enables it exactly where it is
                                      # measured a win — when the head
                                      # streams int8 (bf16 head parity-ties
                                      # XLA's hoisted-cast head, METHODOLOGY
                                      # round-4); "on"/"off" force it
    stream_head_dtype: str = "auto"   # fused-head weight stream dtype:
                                      # "auto" follows stream_weight_dtype,
                                      # or explicit "bfloat16"/"int8".  int8
                                      # halves the head's ~24 MB/step bf16
                                      # stream (measured zero NLG delta,
                                      # benchmarks/METHODOLOGY.md round-4)
    remat: bool = False               # jax.checkpoint the transformer blocks
    seed: int = 0
    image_size: int = 224
    prefetch_depth: int = 2
    guard_nonfinite: bool = False     # skip updates whose loss is NaN/Inf
    log_grad_norm: bool = True        # False saves a full-param-tree read/step
    debug_nans: bool = False          # jax_debug_nans (debugging only)
    image_encoder: str = "resnet18"   # "resnet18" | "vit_b16"
    beam_size: int = 1                # >1 switches eval decode to beam search
    decode_early_stop: bool = False   # while_loop decode: exit when all rows
                                      # emitted <end> (serving speedup)
    decode_z_source: str = "prior_sample"  # latent-mode decode z:
                                      # "prior_sample" (reference
                                      # iq.py:124-127) | "prior_mean"
                                      # (deterministic; immune to the
                                      # prior-variance decay,
                                      # benchmarks/latent_decay.md)
    decode_sampling: bool = False     # decode by categorical sampling from
                                      # temperature/top-k/top-p-filtered
                                      # logits (ops/sampling.py) instead of
                                      # argmax — serving/diversity knob (the
                                      # reference is greedy-only)
    decode_temperature: float = 1.0
    decode_top_k: int = 0             # 0 disables the top-k filter
    decode_top_p: float = 1.0         # 1.0 disables the nucleus filter
    latent_diagnostics: bool = False  # validation also reports z stats
                                      # (per-dim KL, prior spread) and the
                                      # prior-vs-posterior decode BLEU gap
    num_z_samples: int = 1            # evaluate: k prior draws per image →
                                      # question diversity + consistency
                                      # report (train/infomax.py; the
                                      # information-maximization eval)
    model_family: str = "transformer" # "transformer" | "rnn" (legacy IQ)
    rnn_cell: str = "lstm"            # rnn family: "lstm" | "gru"
    compat_pad_seed: bool = True      # seed greedy decode with <pad> like the
                                      # reference (iq.py:129); False uses <start>
    compat_decode_pad_mask: bool = False  # reference decode also MASKS pad-
                                      # token keys (incl. the pad seed) in
                                      # self-attention — generate_pad_mask
                                      # over the grown prefix each step
                                      # (decoder_transformer.py:44).  On:
                                      # exact reference decode semantics
                                      # (token-parity-tested); off: plain
                                      # positional masking (every generated
                                      # token attends the injected pos-0
                                      # state — usually what you want)
    early_stop_patience: int = 0      # >0: stop when val loss hasn't improved
                                      # for N validations, checked only after
                                      # the pretraining phase (reference
                                      # MyEarlyStopping, train_iq_ray.py:
                                      # 248-256; the Ray config uses 8)
    early_stop_min_delta: float = 0.0
    steps_per_dispatch: int = 1       # >1: run G train steps per jitted call
                                      # (lax.scan) — amortizes host dispatch
                                      # latency G-fold (train/step.py
                                      # make_multi_step); chunks auto-align
                                      # to val/ckpt/phase boundaries
    compat_trailing_relu: bool = False  # reproduce the reference FFN's
                                      # trailing ReLU+dropout quirk
                                      # (transformer_layers.py:400-408) —
                                      # used by golden-parity runs
    pipeline_stages: int = 1          # GPipe over a "pipe" mesh axis
                                      # (parallel/pipeline.py): >1 splits
                                      # the DECODER stack into stages with
                                      # microbatched activations hopping
                                      # via ppermute; training forward only
                                      # (decode serves via DP/TP).  The
                                      # mesh must carry a "pipe" axis of
                                      # this size.
    pipeline_microbatches: int = 2    # microbatches per pipeline step
    fsdp: bool = False                # ZeRO-3 style: shard every large
                                      # param's first free dim over the
                                      # ICI "data" axis (annotation-only;
                                      # XLA inserts per-use all-gathers
                                      # and grad reduce-scatters); implies
                                      # sharded optimizer state
    shard_opt_state: bool = False     # ZeRO-1: shard Adam moments (and
                                      # mixed-precision masters) over the
                                      # ICI "data" axis — per-device
                                      # optimizer bytes drop ~|data|x on
                                      # the bandwidth-bound step; XLA
                                      # inserts the collectives from the
                                      # shardings (parallel/sharding.py
                                      # opt_state_sharding_rules)
    sequence_parallel: bool = False   # shard self-attention sequence dim
                                      # over a "seq" mesh axis (ring
                                      # attention, ops/ring_attention.py);
                                      # pass the seq-axis mesh to the model
                                      # (Trainer does).  Long-context
                                      # variants only — lengths that don't
                                      # divide the axis fall back to full
                                      # attention per (static) shape
    ring_attention_impl: str = "xla"  # with sequence_parallel: "xla" =
                                      # ppermute-per-hop ring; "pallas" =
                                      # RDMA inner loop (one kernel/device,
                                      # make_async_remote_copy hops overlap
                                      # block compute over ICI —
                                      # ops/pallas/ring_attention.py)
    moe_num_experts: int = 0          # >1: replace FFNs with a mixture of
                                      # experts (ops/moe.py) — static-shape
                                      # einsum dispatch, Switch/GShard
                                      # routing; expert-stacked kernels
                                      # shard over an "expert" mesh axis
                                      # (expert parallelism — capability
                                      # extension, the reference has no MoE)
    moe_top_k: int = 2                # experts per token (1 = Switch)
    moe_capacity_factor: float = 1.25 # per-expert slots =
                                      # ceil(cf·k·tokens/E); overflow drops
    moe_every: int = 1                # MoE on every Nth layer (2 = GShard
                                      # dense/MoE alternation)
    moe_aux_weight: float = 0.01      # load-balance loss weight
    moe_router_z_weight: float = 1e-3 # router z-loss weight (logit scale
                                      # control, ST-MoE convention)
    moe_router_noise: float = 0.0     # train-time routing jitter stddev
    checkpoint_backend: str = "npz"   # "npz" (flat archive, default) |
                                      # "orbax" (StandardCheckpointHandler
                                      # store per step — JAX-ecosystem
                                      # interop; identical manager API,
                                      # core/checkpoint.py)
    checkpoint_param_dtype: str = "float32"  # "bfloat16": half-size params
                                      # on disk (core/checkpoint.py); restore
                                      # casts back — for slow disks/tunnels
    tie_output_z: bool = False        # share the vocab projection between
                                      # output_proj and z_classifier — the
                                      # two [hidden, vocab] heads are the
                                      # largest params after the embedding;
                                      # tying removes one from params,
                                      # grads, and both Adam moments (HBM
                                      # diet).  Off by default: the
                                      # reference trains them separately
                                      # (iq.py:45-48)
    fused_adam: bool = True           # ONE read-modify-write pass per tensor
                                      # for clip+Adam+LR+apply (train/
                                      # fused_adam.py) — the train step is
                                      # HBM-bound, so collapsing the optax
                                      # chain's many tree passes is the
                                      # single biggest step-time lever; bit-
                                      # parity-tested vs the chain, which
                                      # stays available via --no-fused_adam
    adam_mu_dtype: str = "float32"    # "bfloat16" halves the first-moment
                                      # HBM traffic of the bandwidth-bound
                                      # train step (benchmarks/METHODOLOGY.md
                                      # roofline); f32 default keeps the
                                      # parity runs bit-faithful.  Second
                                      # moments stay f32 (sqrt of a tiny
                                      # value needs the mantissa).
    adam_factored_nu: bool = False    # Adafactor-style factored second
                                      # moment for >=2-D trainable leaves
                                      # (train/fused_adam.py FactoredNu):
                                      # removes ~1.9 GB/step of the
                                      # bandwidth-FLOORED fused update
                                      # (attribution_r5: 10.0 ms measured
                                      # vs 6.5 GB analytic).  Changes
                                      # optimizer numerics — off for
                                      # reference parity, like the other
                                      # diet knobs.
    grad_dtype: str = "float32"       # "bfloat16" stores gradients bf16:
                                      # XLA fuses the cast into the dW GEMM
                                      # epilogues so the f32 grads never
                                      # round-trip HBM (~1 GB/step at the
                                      # flagship config).  Optimizer math
                                      # still promotes to f32 (moments/
                                      # masters unchanged); diet knob, off
                                      # for bit-faithful parity runs.

    # ------------------------------------------------------------------
    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2, sort_keys=True)

    @classmethod
    def from_json(cls, s: str) -> "Config":
        raw = json.loads(s)
        fields = {f.name for f in dataclasses.fields(cls)}
        kept = {k: v for k, v in raw.items() if k in fields}
        for key in ("mesh_shape", "mesh_axis_names"):
            if key in kept and isinstance(kept[key], list):
                kept[key] = tuple(kept[key])
        return cls(**kept)

    def save(self, path: str) -> None:
        with open(path, "w") as f:
            f.write(self.to_json())

    @classmethod
    def load(cls, path: str) -> "Config":
        with open(path) as f:
            return cls.from_json(f.read())

    # convenience ------------------------------------------------------
    @property
    def head_dim(self) -> int:
        return self.hidden_dim // self.num_heads

    @property
    def max_target_len(self) -> int:
        return self.max_q_length

    @property
    def max_posterior_len(self) -> int:
        # posterior = question with the answer-type token inserted at idx 1
        # (reference data_loader.py:84)
        return self.max_q_length + 1

    @property
    def max_context_len(self) -> int:
        # "ans": answer (max_a_length) with answer-type inserted at idx 1
        # (reference data_loader.py:115); "cat": [<start>, cat, <end>]
        # (reference data_loader.py:81-82)
        return self.max_a_length + 1 if self.input_mode == "ans" else 3


# ----------------------------------------------------------------------
# argparse shim mirroring reference train_iq.py:312-353


def add_config_args(parser: argparse.ArgumentParser) -> argparse.ArgumentParser:
    defaults = Config()
    parser.add_argument("--emb_dim", type=int, default=defaults.emb_dim)
    parser.add_argument("--hidden_dim", type=int, default=defaults.hidden_dim)
    parser.add_argument("--latent_dim", type=int, default=defaults.latent_dim)
    parser.add_argument("--pwffn_dim", type=int, default=defaults.pwffn_dim)
    parser.add_argument("--num_layers", type=int, default=defaults.num_layers)
    parser.add_argument("--num_heads", type=int, default=defaults.num_heads)
    parser.add_argument("--lr", type=float, default=defaults.lr)
    parser.add_argument("--num_pretraining_steps", type=int,
                        default=defaults.num_pretraining_steps)
    parser.add_argument("--total_training_steps", type=int,
                        default=defaults.total_training_steps)
    parser.add_argument("--full_kl_step", type=int, default=defaults.full_kl_step)
    parser.add_argument("--kl_ceiling", type=float, default=defaults.kl_ceiling)
    parser.add_argument("--kl_floor", type=float, default=defaults.kl_floor)
    parser.add_argument("--target_word_dropout", type=float,
                        default=defaults.target_word_dropout)
    parser.add_argument("--aux_ceiling", type=float, default=defaults.aux_ceiling)
    parser.add_argument("--image_recon_lambda", type=float,
                        default=defaults.image_recon_lambda)
    parser.add_argument("--batch_size", type=int, default=defaults.batch_size)
    parser.add_argument("--emb_file", type=str, default=defaults.emb_file)
    parser.add_argument("--resnet_ckpt", type=str,
                        default=defaults.resnet_ckpt)
    parser.add_argument("--dataset", type=str, default=defaults.dataset)
    parser.add_argument("--val_dataset", type=str, default=defaults.val_dataset)
    parser.add_argument("--vocab", type=str, default=defaults.vocab)
    parser.add_argument("--cat2name", type=str, default=defaults.cat2name)
    parser.add_argument("--input_mode", type=str, default=defaults.input_mode,
                        choices=("ans", "cat"))
    parser.add_argument("--print_note", type=str, default=defaults.print_note)
    parser.add_argument("--output_dir", type=str, default=defaults.output_dir)
    parser.add_argument("--val_check_interval", type=int,
                        default=defaults.val_check_interval)
    parser.add_argument("--limit_val_batches", type=int,
                        default=defaults.limit_val_batches)
    parser.add_argument("--checkpoint_every", type=int,
                        default=defaults.checkpoint_every)
    parser.add_argument("--image_size", type=int, default=defaults.image_size)
    parser.add_argument("--max_q_length", type=int,
                        default=defaults.max_q_length)
    parser.add_argument("--max_a_length", type=int,
                        default=defaults.max_a_length)
    parser.add_argument("--max_decode_length", type=int,
                        default=defaults.max_decode_length)
    parser.add_argument("--warmup_steps", type=int,
                        default=defaults.warmup_steps)
    parser.add_argument("--grad_clip", type=float, default=defaults.grad_clip)
    parser.add_argument("--compat_pad_seed",
                        action=argparse.BooleanOptionalAction,
                        default=defaults.compat_pad_seed,
                        help="seed greedy decode with <pad> like the "
                        "reference (iq.py:129); --no-compat-pad-seed uses "
                        "<start>")
    parser.add_argument("--compat_decode_pad_mask", action="store_true",
                        help="mask pad-token keys in decode self-attention "
                        "like the reference (exact decode parity)")
    # TPU-native flags
    parser.add_argument("--dtype", type=str, default=defaults.dtype)
    parser.add_argument("--param_dtype", type=str,
                        default=defaults.param_dtype,
                        choices=("float32", "bfloat16"),
                        help="'bfloat16': mixed-precision storage — params "
                        "live in bf16 with f32 Adam masters (train/"
                        "fused_adam.py); forward math is value-identical "
                        "(compute was already bf16), grads/update gain one "
                        "bf16 rounding.  HBM diet for the bandwidth-bound "
                        "step")
    parser.add_argument("--num_data_shards", type=int, default=1,
                        help="size of the 'data' mesh axis")
    parser.add_argument("--num_model_shards", type=int, default=1,
                        help="size of the 'model' mesh axis")
    parser.add_argument("--use_pallas_attention", action="store_true")
    parser.add_argument("--pipeline_stages", type=int,
                        default=defaults.pipeline_stages)
    parser.add_argument("--pipeline_microbatches", type=int,
                        default=defaults.pipeline_microbatches)
    parser.add_argument("--fsdp", action="store_true")
    parser.add_argument("--shard_opt_state", action="store_true")
    parser.add_argument("--sequence_parallel", action="store_true")
    parser.add_argument("--ring_attention_impl", type=str, default="xla",
                        choices=("xla", "pallas"))
    parser.add_argument("--moe_num_experts", type=int,
                        default=defaults.moe_num_experts,
                        help=">1: mixture-of-experts FFNs (ops/moe.py); "
                        "expert kernels shard over an 'expert' mesh axis")
    parser.add_argument("--moe_top_k", type=int, default=defaults.moe_top_k)
    parser.add_argument("--moe_capacity_factor", type=float,
                        default=defaults.moe_capacity_factor)
    parser.add_argument("--moe_every", type=int, default=defaults.moe_every)
    parser.add_argument("--moe_aux_weight", type=float,
                        default=defaults.moe_aux_weight)
    parser.add_argument("--moe_router_z_weight", type=float,
                        default=defaults.moe_router_z_weight)
    parser.add_argument("--moe_router_noise", type=float,
                        default=defaults.moe_router_noise)
    parser.add_argument("--num_expert_shards", type=int, default=1,
                        help="size of the 'expert' mesh axis (with "
                        "--moe_num_experts)")
    parser.add_argument("--checkpoint_backend", type=str, default="npz",
                        choices=("npz", "orbax"))
    parser.add_argument("--use_pallas_decode", action="store_true")
    parser.add_argument("--use_stream_decode", action="store_true")
    parser.add_argument("--stream_weight_dtype", type=str,
                        default=defaults.stream_weight_dtype,
                        choices=("bfloat16", "int8"))
    parser.add_argument("--stream_fused_head", type=str,
                        default=defaults.stream_fused_head,
                        choices=("auto", "on", "off"),
                        help="fuse final-LN + vocab projection + argmax into "
                        "one streamed Pallas kernel on the serving decode "
                        "(ops/pallas/decode_head.py); auto = on iff the "
                        "head streams int8 (the measured-win regime)")
    parser.add_argument("--stream_head_dtype", type=str,
                        default=defaults.stream_head_dtype,
                        choices=("auto", "bfloat16", "int8"),
                        help="fused-head weight stream dtype; auto follows "
                        "--stream_weight_dtype")
    parser.add_argument("--tie_output_z", action="store_true")
    parser.add_argument("--num_seq_shards", type=int, default=1,
                        help="size of the 'seq' mesh axis (with "
                        "--sequence_parallel)")
    parser.add_argument("--remat", action="store_true")
    parser.add_argument("--guard_nonfinite", action="store_true")
    parser.add_argument("--debug_nans", action="store_true")
    parser.add_argument("--decode_early_stop", action="store_true")
    parser.add_argument("--steps_per_dispatch", type=int,
                        default=defaults.steps_per_dispatch)
    parser.add_argument("--fused_adam", action=argparse.BooleanOptionalAction,
                        default=defaults.fused_adam,
                        help="fused clip+Adam update pass (train/"
                        "fused_adam.py); --no-fused_adam restores the "
                        "optax chain")
    parser.add_argument("--adam_mu_dtype", type=str,
                        default=defaults.adam_mu_dtype,
                        choices=("float32", "bfloat16"))
    parser.add_argument("--adam_factored_nu", action="store_true",
                        default=defaults.adam_factored_nu,
                        help="Adafactor-style factored second moment for "
                        ">=2-D trainable leaves (optimizer diet; changes "
                        "optimizer numerics — see train/fused_adam.py)")
    parser.add_argument("--grad_dtype", type=str,
                        default=defaults.grad_dtype,
                        choices=("float32", "bfloat16"),
                        help="gradient storage dtype; bfloat16 halves grad "
                        "HBM round-trips (diet knob, optimizer math stays "
                        "f32)")
    parser.add_argument("--checkpoint_param_dtype", type=str,
                        default=defaults.checkpoint_param_dtype,
                        choices=("float32", "bfloat16"))
    parser.add_argument("--early_stop_patience", type=int,
                        default=defaults.early_stop_patience)
    parser.add_argument("--early_stop_min_delta", type=float,
                        default=defaults.early_stop_min_delta)
    parser.add_argument("--no_checkpoint_at_end", dest="checkpoint_at_end",
                        action="store_false")
    parser.set_defaults(checkpoint_at_end=True)
    parser.add_argument("--image_encoder", type=str,
                        default=defaults.image_encoder,
                        choices=("resnet18", "vit_b16"))
    parser.add_argument("--beam_size", type=int, default=defaults.beam_size)
    parser.add_argument("--decode_z_source", type=str,
                        default=defaults.decode_z_source,
                        choices=("prior_sample", "prior_mean"))
    parser.add_argument("--decode_sampling", action="store_true",
                        help="sampled decode (temperature/top-k/top-p) "
                        "instead of greedy argmax")
    parser.add_argument("--decode_temperature", type=float,
                        default=defaults.decode_temperature)
    parser.add_argument("--decode_top_k", type=int,
                        default=defaults.decode_top_k)
    parser.add_argument("--decode_top_p", type=float,
                        default=defaults.decode_top_p)
    parser.add_argument("--latent_diagnostics", action="store_true")
    parser.add_argument("--num_z_samples", type=int,
                        default=defaults.num_z_samples)
    parser.add_argument("--model_family", type=str,
                        default=defaults.model_family,
                        choices=("transformer", "rnn"))
    parser.add_argument("--rnn_cell", type=str, default=defaults.rnn_cell,
                        choices=("lstm", "gru"))
    parser.add_argument("--seed", type=int, default=defaults.seed)
    return parser


def config_from_args(args: argparse.Namespace) -> Config:
    fields = {f.name for f in dataclasses.fields(Config)}
    kw = {k: v for k, v in vars(args).items() if k in fields and v is not None}
    d = getattr(args, "num_data_shards", 1)
    m = getattr(args, "num_model_shards", 1)
    s = getattr(args, "num_seq_shards", 1)
    e = getattr(args, "num_expert_shards", 1)
    if getattr(args, "sequence_parallel", False) and s > 1:
        kw["mesh_shape"] = (d, m, s)
        kw["mesh_axis_names"] = ("data", "model", "seq")
    elif getattr(args, "moe_num_experts", 0) > 1 and e > 1:
        kw["mesh_shape"] = (d, m, e)
        kw["mesh_axis_names"] = ("data", "model", "expert")
    else:
        kw["mesh_shape"] = (d, m)
    return Config(**kw)
