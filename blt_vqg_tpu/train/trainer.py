"""Training harness: the TPU-native counterpart of the reference's TrainIQ
LightningModule + pl.Trainer (reference train_iq.py:28-261, 372-374).

Responsibilities and their reference counterparts:
- two-phase schedule with optimizer restart at the boundary (train_iq.py:105-111)
- jitted train step per phase; val every ``val_check_interval`` steps capped
  at ``limit_val_batches`` (train_iq.py:372-373)
- validation-end report: greedy decode of one batch, 10 printed samples with
  per-token top-6 probabilities, NLG metrics ×100, running val-metric means
  (train_iq.py:159-206)
- step checkpoints every ``checkpoint_every`` steps (train_iq.py:275-309)
- metric logging with the reference scalar names (core/metrics.py)
- optional per-step profiler traces (jax.profiler) — the reference has none
  (SURVEY.md §5)

Everything stochastic threads explicit keys from one RngStream; the loop
never blocks on device→host transfers except at logging boundaries.
"""

from __future__ import annotations

import logging
import os
import time
from typing import Dict, Iterator, Optional

import jax
import numpy as np

from blt_vqg_tpu.core.checkpoint import CheckpointManager
from blt_vqg_tpu.core.config import Config
from blt_vqg_tpu.core.metrics import MetricWriter
from blt_vqg_tpu.core.rng import RngStream
from blt_vqg_tpu.data.augment import make_augment_fn
from blt_vqg_tpu.models.iq import IQ
from blt_vqg_tpu.parallel.sharding import replicate, shard_params
from blt_vqg_tpu.train.nlg_metrics import NLGEval
from blt_vqg_tpu.train.state import create_train_state
from blt_vqg_tpu.train.step import (
    make_beam_decode_step, make_decode_step, make_eval_step, make_train_step)

log = logging.getLogger(__name__)

SPECIAL_TOKENS = ("<start>", "<end>", "<pad>")


def filter_special_tokens(tokens):
    """(reference train_iq.py:208-214)"""
    return [t for t in tokens if t not in SPECIAL_TOKENS]


class EarlyStopping:
    """val-loss early stopping gated to the post-pretraining phase
    (reference MyEarlyStopping, train_iq_ray.py:248-256, 331-339:
    monitor val_loss/min, patience counted over validations, checks only
    once ``step > active_from``)."""

    def __init__(self, patience: int, min_delta: float = 0.0,
                 active_from: int = 0, mode: str = "min"):
        self.patience = patience
        self.min_delta = min_delta
        self.active_from = active_from
        self.sign = 1.0 if mode == "min" else -1.0
        self.best = float("inf")
        self.stale = 0

    def update(self, step: int, value: float) -> bool:
        """Records one validation result; returns True when training should
        stop.  Pre-gate validations are ignored entirely (Lightning only
        runs the check when the callback fires, so best/wait don't move)."""
        if self.patience <= 0 or step <= self.active_from:
            return False
        v = self.sign * float(value)
        if v < self.best - self.min_delta:
            self.best = v
            self.stale = 0
            return False
        self.stale += 1
        return self.stale >= self.patience


class Trainer:
    def __init__(self, cfg: Config, vocab, mesh=None,
                 profile_dir: Optional[str] = None):
        self.cfg = cfg
        self.vocab = vocab
        self.mesh = mesh
        if cfg.debug_nans:
            from blt_vqg_tpu.core.debug import enable_nan_checks
            enable_nan_checks(True)
        if cfg.model_family == "rnn":
            from blt_vqg_tpu.models.iq_rnn import IQRNN
            self.model = IQRNN(cfg, len(vocab))
        else:
            self.model = IQ(cfg, len(vocab),
                            mesh=(mesh if (cfg.sequence_parallel
                                           or cfg.pipeline_stages > 1)
                                  else None))
        self.rngs = RngStream(cfg.seed)
        self.nlge = NLGEval(no_glove=True, no_skipthoughts=True)
        self.writer = MetricWriter(cfg.output_dir)
        self.ckpt = CheckpointManager(
            os.path.join(cfg.output_dir, "checkpoints"),
            backend=cfg.checkpoint_backend)
        self.profile_dir = profile_dir
        self.augment_train = make_augment_fn(cfg.image_size, train=True)
        self.augment_eval = make_augment_fn(cfg.image_size, train=False)

        self._train_steps = {
            False: make_train_step(cfg, latent_mode=False, mesh=mesh),
            True: make_train_step(cfg, latent_mode=True, mesh=mesh),
        }
        # steps_per_dispatch > 1: G steps per jitted call (lax.scan) to
        # amortize host dispatch latency — see train/step.py make_multi_step
        if cfg.steps_per_dispatch > 1:
            from blt_vqg_tpu.train.step import make_multi_step
            self._multi_steps = {
                False: make_multi_step(cfg, latent_mode=False, mesh=mesh),
                True: make_multi_step(cfg, latent_mode=True, mesh=mesh),
            }
        else:
            self._multi_steps = None
        self._eval_steps = {
            False: make_eval_step(cfg, latent_mode=False, mesh=mesh),
            True: make_eval_step(cfg, latent_mode=True, mesh=mesh),
        }
        self._decode_steps = {
            False: make_decode_step(cfg, self.model, latent_mode=False),
            True: make_decode_step(cfg, self.model, latent_mode=True),
        }
        # cfg.beam_size > 1 switches the validation decode report to beam
        # search (the RNN family has no beam decoder — falls back to greedy)
        if cfg.beam_size > 1 and hasattr(type(self.model), "decode_beam"):
            self._beam_steps = {
                False: make_beam_decode_step(cfg, self.model,
                                             latent_mode=False),
                True: make_beam_decode_step(cfg, self.model,
                                            latent_mode=True),
            }
        else:
            self._beam_steps = None
        # z-instrumentation steps (cfg.latent_diagnostics) — built lazily so
        # the default path compiles nothing extra
        self._diag_steps = None
        # reference hp string (train_iq.py:35-37)
        self.hp_string = "{}_{}_{}_{}_{}_{}_{}_{}_{}_{}. {}".format(
            cfg.input_mode, cfg.emb_dim, "True", cfg.hidden_dim,
            cfg.latent_dim, cfg.pwffn_dim, cfg.num_layers, cfg.num_heads,
            cfg.lr, cfg.batch_size, cfg.print_note)

    # ------------------------------------------------------------------
    def init_state(self, sample_batch: Dict, glove_table=None, resume=True):
        sample_batch = dict(sample_batch)
        sample_batch["images"] = self.augment_eval(
            sample_batch["images"], self.rngs.key(0))
        # glove surgery happens inside create_train_state, BEFORE the
        # optimizer snapshots mixed-precision masters
        state = create_train_state(
            self.cfg, self.model, jax.random.key(self.cfg.seed), sample_batch,
            glove_table=glove_table)
        rc = getattr(self.cfg, "resnet_ckpt", None)
        if rc and self.cfg.image_encoder == "resnet18":
            # pretrained frozen backbone (reference encoder_cnn.py:17-21):
            # graft imported torchvision weights + BN stats.  Done BEFORE a
            # resume restore (checkpointed weights win) and safe w.r.t. the
            # optimizer: the backbone is frozen (MaskedNode moments, no
            # masters).
            state = self._graft_resnet(state, rc)
        if resume and self.ckpt.latest_step() is not None:
            state = self.ckpt.restore(state)
            log.info("resumed from step %d", int(state.step))
        if self.mesh is not None:
            state = state.replace(
                params=shard_params(state.params, self.mesh,
                                    fsdp=getattr(self.cfg, "fsdp", False)),
                batch_stats=replicate(state.batch_stats, self.mesh),
                opt_state=self._place_opt_state(state.opt_state))
        return state

    def _graft_resnet(self, state, path):
        """Overwrite the backbone subtree with imported torchvision weights
        (dtype-preserving — bf16 storage under the mixed-precision diet)."""
        import jax.numpy as jnp
        from blt_vqg_tpu.ops.resnet import load_resnet18_checkpoint
        p_new, s_new = load_resnet18_checkpoint(path)
        cast = lambda new, old: jax.tree_util.tree_map(
            lambda n, o: jnp.asarray(n, dtype=o.dtype), new, old)
        params = dict(state.params)
        params["encoder_cnn"] = dict(params["encoder_cnn"])
        params["encoder_cnn"]["backbone"] = cast(
            p_new, state.params["encoder_cnn"]["backbone"])
        batch_stats = dict(state.batch_stats)
        batch_stats["encoder_cnn"] = dict(batch_stats["encoder_cnn"])
        batch_stats["encoder_cnn"]["backbone"] = cast(
            s_new, state.batch_stats["encoder_cnn"]["backbone"])
        log.info("grafted pretrained resnet18 backbone from %s", path)
        return state.replace(params=params, batch_stats=batch_stats)

    def _place_opt_state(self, opt_state):
        """ZeRO-1 (cfg.shard_opt_state) or FSDP (cfg.fsdp, whose sharded
        params imply sharded moments): Adam moments/masters shard over the
        ``data`` axis; default replicates (bit-faithful DP)."""
        if (getattr(self.cfg, "shard_opt_state", False)
                or getattr(self.cfg, "fsdp", False)):
            from blt_vqg_tpu.parallel.sharding import shard_opt_state
            return shard_opt_state(opt_state, self.mesh)
        return replicate(opt_state, self.mesh)

    def _disk_dtype(self):
        """On-disk param dtype for checkpoints (None = store as-is)."""
        dt = getattr(self.cfg, "checkpoint_param_dtype", "float32")
        return None if dt == "float32" else dt

    def _model_batch(self, batch: Dict, step: int, train: bool) -> Dict:
        aug = self.augment_train if train else self.augment_eval
        out = {k: batch[k] for k in ("context", "posterior", "target")}
        out["images"] = aug(batch["images"], self.rngs.key(1_000_000 + step))
        return out

    def _chunk_len(self, step: int, max_steps: int, log_every: int) -> int:
        """Steps to run in one multi-step dispatch: capped so a chunk never
        crosses a phase/validation/checkpoint/log boundary (those events are
        host-side decisions between dispatches)."""
        cfg = self.cfg
        nxt = max_steps
        for interval in (cfg.val_check_interval, cfg.checkpoint_every,
                         log_every):
            nxt = min(nxt, (step // interval + 1) * interval)
        if step < cfg.num_pretraining_steps:
            nxt = min(nxt, cfg.num_pretraining_steps)
        return max(1, min(cfg.steps_per_dispatch, nxt - step))

    # ------------------------------------------------------------------
    def fit(self, state, train_iter: Iterator, val_iter_factory,
            max_steps: Optional[int] = None) -> "TrainState":
        cfg = self.cfg
        max_steps = max_steps or cfg.total_training_steps
        step = int(state.step)
        latent = step >= cfg.num_pretraining_steps
        t_last = time.time()
        log_every = 50

        # graceful shutdown: SIGTERM/SIGINT finish the current step, save a
        # checkpoint, and return (elastic-restart friendly — resume picks up
        # from here)
        import signal
        stop_requested = {"flag": False}

        def _request_stop(signum, frame):
            log.warning("signal %d: checkpointing and stopping", signum)
            stop_requested["flag"] = True

        old_handlers = {}
        for sig in (signal.SIGTERM, signal.SIGINT):
            try:
                old_handlers[sig] = signal.signal(sig, _request_stop)
            except ValueError:  # non-main thread
                pass

        early_stop = EarlyStopping(cfg.early_stop_patience,
                                   cfg.early_stop_min_delta,
                                   active_from=cfg.num_pretraining_steps)

        if self.profile_dir:
            jax.profiler.start_trace(self.profile_dir)
        try:
            while step < max_steps and not stop_requested["flag"]:
                if not latent and step >= cfg.num_pretraining_steps:
                    latent = True
                    state = state.reset_optimizer()
                    if self.mesh is not None:
                        # fresh moments come back replicated; re-place them
                        # so the latent-phase program keeps the ZeRO layout
                        state = state.replace(
                            opt_state=self._place_opt_state(state.opt_state))
                    log.info("phase switch at step %d: latent ON, Adam reset",
                             step)

                n = self._chunk_len(step, max_steps, log_every) \
                    if self._multi_steps is not None else 1
                if n > 1:
                    import jax.numpy as jnp
                    mbs = [self._model_batch(next(train_iter), step + i,
                                             train=True) for i in range(n)]
                    stacked = {k: jnp.stack([m[k] for m in mbs])
                               for k in mbs[0]}
                    state, metrics = self._multi_steps[latent](
                        state, stacked, self.rngs.key(step))
                    step += n - 1  # inner steps; the loop tail adds the last
                else:
                    batch = next(train_iter)
                    mb = self._model_batch(batch, step, train=True)
                    state, metrics = self._train_steps[latent](
                        state, mb, self.rngs.key(step))

                if (step + 1) % log_every == 0:
                    host = {k: float(v) for k, v in metrics.items()}
                    dt = time.time() - t_last
                    sps = log_every * cfg.batch_size / dt
                    t_last = time.time()
                    self.writer.write(step + 1, host, prefix="train")
                    log.info(
                        "step %d loss %.4f rec %.4f kld %.4f ppl %.1f "
                        "(%.1f samples/s)", step + 1, host["loss"],
                        host["rec"], host["kld"], host["ppl"], sps)

                step += 1
                if step % cfg.val_check_interval == 0:
                    val = self.validate(state, val_iter_factory(), latent,
                                        step)
                    if early_stop.update(step, val.get("loss", float("inf"))):
                        log.info("early stopping at step %d (val loss "
                                 "plateaued %d validations)", step,
                                 early_stop.stale)
                        break
                if step % cfg.checkpoint_every == 0:
                    # async write: snapshot now, file IO off the step path
                    self.ckpt.save(state, self.cfg, block=False,
                                   on_disk_param_dtype=self._disk_dtype())
        finally:
            if self.profile_dir:
                jax.profiler.stop_trace()
            for sig, handler in old_handlers.items():
                signal.signal(sig, handler)
        if self.cfg.checkpoint_at_end:
            self.ckpt.save(state, self.cfg, block=True,
                           on_disk_param_dtype=self._disk_dtype())
        return state

    # ------------------------------------------------------------------
    def validate(self, state, val_iter, latent: bool, step: int,
                 print_samples: int = 10) -> Dict[str, float]:
        cfg = self.cfg
        sums: Dict[str, float] = {}
        count = 0
        first_batch = None
        for i, batch in enumerate(val_iter):
            if i >= cfg.limit_val_batches:
                break
            if first_batch is None:
                first_batch = batch
            mb = self._model_batch(batch, step + i, train=False)
            metrics = self._eval_steps[latent](
                state, mb, self.rngs.key(2_000_000 + step + i))
            for k, v in metrics.items():
                sums[k] = sums.get(k, 0.0) + float(v)
            count += 1
        if count == 0:
            # e.g. a tuned batch size larger than the eval split with
            # drop_remainder — surface it instead of KeyErroring downstream
            log.warning("validation saw 0 batches (batch_size %d vs split "
                        "size); returning inf loss", cfg.batch_size)
            return {"loss": float("inf")}
        means = {k: v / count for k, v in sums.items()}
        self.writer.write(step, means, prefix="val")

        # --- greedy decode report on the first val batch
        scores = {}
        if first_batch is not None:
            scores = self.decode_report(state, first_batch, latent, step,
                                        print_samples)
            if scores:
                # persist the decode-quality trail (×100, the printed
                # convention) so offline analysis doesn't have to scrape
                # stdout (benchmarks/latent_decay_probe.py)
                self.writer.write(
                    step, {k: v * 100.0 for k, v in scores.items()},
                    prefix="nlg")
        diag = {}
        if (latent and first_batch is not None
                and getattr(self.cfg, "latent_diagnostics", False)):
            diag = self.latent_report(state, first_batch, step)
            self.writer.write(step, diag, prefix="zdiag")
        print("##### validation @ step", step, "#####")
        for k, v in means.items():
            print(k, "\t", np.round(v, 4))
        for k, v in scores.items():
            print(k, "\t", np.round(v * 100, 4))
        for k, v in diag.items():
            print(k, "\t", np.round(v, 4))
        print(self.hp_string)
        return {**means, **{f"nlg_{k}": v for k, v in scores.items()}, **diag}

    def _detok(self, tokens_row) -> str:
        """Token ids → space-joined words, stopping at <end>, specials
        filtered (decode_report's convention)."""
        idx2word = self.vocab.idx2word
        words = []
        for t in tokens_row:
            w = idx2word.get(int(t), "<unk>")
            if w == "<end>":
                break
            words.append(w)
        return " ".join(filter_special_tokens(words))

    def latent_report(self, state, batch, step: int) -> Dict[str, float]:
        """z-instrumentation on one val batch (cfg.latent_diagnostics;
        VERDICT r3 #2): distribution stats (active dims, prior spread,
        posterior-prior mean gap) plus the decode-BLEU gap between z drawn
        from a prior sample (reference decode, iq.py:124-127), the prior
        mean, and the posterior mean (oracle).  A widening
        sample-vs-mean gap with a stable oracle is the prior-variance decay
        signature (benchmarks/latent_decay.md)."""
        from blt_vqg_tpu.train.step import (make_diag_decode_step,
                                            make_latent_diag_step)
        if self._diag_steps is None:
            self._diag_steps = {"stats": make_latent_diag_step(
                self.cfg, self.model)}
            for src in ("prior_sample", "prior_mean", "posterior_mean"):
                self._diag_steps[src] = make_diag_decode_step(
                    self.cfg, self.model, src)
        images = self.augment_eval(batch["images"], self.rngs.key(3))
        context = np.asarray(batch["answer_types"])[:, None].astype(np.int32)
        posterior = batch["posterior"]

        stats = self._diag_steps["stats"](state, images, context, posterior)
        kl_dim = np.asarray(stats["kl_per_dim"])
        report = {
            "z_active_dims": float(stats["active_dims"]),
            "z_kl_top_dim": float(kl_dim.max()),
            "z_prior_logvar": float(stats["prior_logvar"]),
            "z_post_logvar": float(stats["post_logvar"]),
            "z_prior_mean_var": float(stats["prior_mean_var"]),
            "z_mean_gap": float(stats["mean_gap"]),
        }
        gts = [" ".join(filter_special_tokens(
            [self.vocab.idx2word.get(int(w), "<unk>") for w in row]))
            for row in np.asarray(batch["target"])]
        for src in ("prior_sample", "prior_mean", "posterior_mean"):
            out = self._diag_steps[src](state, images, context, posterior,
                                        self.rngs.key(5_000_000 + step))
            preds = [self._detok(row) for row in np.asarray(out["tokens"])]
            try:
                sc = self.nlge.compute_metrics(ref_list=[gts],
                                               hyp_list=preds)
                report[f"bleu4_{src}"] = sc["Bleu_4"] * 100.0
            except ZeroDivisionError:
                report[f"bleu4_{src}"] = 0.0
        report["bleu4_prior_gap"] = (report["bleu4_posterior_mean"]
                                     - report["bleu4_prior_sample"])
        return report

    def decode_report(self, state, batch, latent: bool, step: int,
                      print_samples: int = 10) -> Dict[str, float]:
        """Greedy decode + sample printing + NLG scores
        (reference train_iq.py:159-206).  Context at validation is the
        category sequence, as in the reference's ``answer_types`` decode."""
        cfg = self.cfg
        images = self.augment_eval(batch["images"], self.rngs.key(3))
        # decode conditions on the category token (reference
        # train_iq.py:165, 173-174 passes answer_types as 1-token context)
        context = np.asarray(batch["answer_types"])[:, None].astype(np.int32)
        decode = (self._beam_steps[latent] if self._beam_steps is not None
                  else self._decode_steps[latent])
        out = decode(state, images, context, self.rngs.key(4_000_000 + step))
        tokens = np.asarray(out["tokens"])
        # beam decode and the RNN family's decode have no top-k probe
        has_topk = "top_tokens" in out
        top_tokens = np.asarray(out["top_tokens"]) if has_topk else None
        top_probs = np.asarray(out["top_probs"]) if has_topk else None

        preds, gts = [], []
        idx2word = self.vocab.idx2word
        for i in range(tokens.shape[0]):
            pred_words = []
            for t in tokens[i]:
                w = idx2word.get(int(t), "<unk>")
                if w == "<end>":
                    break
                pred_words.append(w)
            pred = " ".join(filter_special_tokens(pred_words))
            gt = " ".join(filter_special_tokens(
                [idx2word.get(int(w), "<unk>") for w in
                 np.asarray(batch["target"])[i]]))
            preds.append(pred)
            gts.append(gt)
            if i < print_samples:
                print("Image ID:\t", int(np.asarray(batch["image_ids"])[i])
                      if "image_ids" in batch else "-")
                print("Context:\t", idx2word.get(int(context[i, 0]), "?"))
                print("Generated:\t", pred)
                print("Reference:\t", gt)
                if has_topk:
                    for j, w in enumerate(pred_words[:12]):
                        near = [(idx2word.get(int(tt), "?"),
                                 round(float(pv), 4))
                                for tt, pv in zip(top_tokens[i, j],
                                                  top_probs[i, j])]
                        print(w, "\t\t", near)
                print()

        try:
            return self.nlge.compute_metrics(ref_list=[gts], hyp_list=preds)
        except ZeroDivisionError:
            return {}
