"""The IQ model: information-maximizing visual question generation.

Capability-parity with reference models/iq.py + encoder_transformer.py +
decoder_transformer.py, re-designed for TPU:

- one flax module wiring shared embedding→context/posterior encoders→latent→
  decoder→image reconstructor, same forward contract as reference
  iq.py:82-114: ``(images, context, posterior, target) →
  (logits, z_logit, kld, (img_feat, recon_img_feat))``;
- ``latent_mode`` (the two-phase GVT switch, reference iq.py:51-54) is a
  *static* argument — the pretrain and latent phases are two separately
  compiled programs sharing one parameter pytree, instead of Python-side
  module mutation;
- greedy decode is a ``lax.scan`` over a KV cache (O(T) work/step) instead of
  re-encoding the whole prefix per step (reference iq.py:134-143, O(T²));
  emits the same per-step top-6 (token, prob) probe used by the reference's
  validation printer (train_iq.py:189-193);
- the decode seed token is ``<pad>`` when ``compat_pad_seed`` (faithful to
  reference iq.py:129) or ``<start>`` (the presumably-intended behavior).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from blt_vqg_tpu.core.config import Config
from blt_vqg_tpu.ops.latent import Latent
from blt_vqg_tpu.ops.masks import pad_mask
from blt_vqg_tpu.ops.mlp import MLP
from blt_vqg_tpu.ops.resnet import EncoderCNN
from blt_vqg_tpu.ops.transformer import TransformerDecoder, TransformerEncoder

PAD, START, END, UNK = 0, 1, 3, 4  # reserved ids (text/vocabulary.py contract)


class IQ(nn.Module):
    cfg: Config
    vocab_size: int
    # sequence-parallel mesh (must carry a "seq" axis) — activates ring
    # attention in the encoder/decoder stacks when cfg.sequence_parallel
    mesh: Any = None

    def setup(self):
        cfg = self.cfg
        dtype = jnp.dtype(cfg.dtype)
        self.embed = nn.Embed(self.vocab_size, cfg.emb_dim, dtype=dtype,
                              embedding_init=nn.initializers.normal(0.01),
                              name="embed")
        self.embed_proj = nn.Dense(cfg.hidden_dim, dtype=dtype,
                                   name="embed_proj")
        if cfg.image_encoder == "vit_b16":
            from blt_vqg_tpu.ops.vit import ViTEncoder
            self.encoder_cnn = ViTEncoder(cfg.hidden_dim, dtype,
                                          name="encoder_cnn")
        else:
            self.encoder_cnn = EncoderCNN(cfg.hidden_dim, dtype,
                                          name="encoder_cnn")
        enc_kw = dict(
            hidden_dim=cfg.hidden_dim, num_layers=cfg.num_layers,
            num_heads=cfg.num_heads, pwffn_dim=cfg.pwffn_dim,
            attention_dropout=cfg.attention_dropout,
            relu_dropout=cfg.relu_dropout, layer_dropout=cfg.layer_dropout,
            input_dropout=cfg.input_dropout, dtype=dtype,
            use_pallas=cfg.use_pallas_attention, remat=cfg.remat,
            compat_trailing_relu=cfg.compat_trailing_relu,
            ring_mesh=(self.mesh if cfg.sequence_parallel else None),
            ring_impl=cfg.ring_attention_impl,
            moe_num_experts=cfg.moe_num_experts, moe_top_k=cfg.moe_top_k,
            moe_capacity_factor=cfg.moe_capacity_factor,
            moe_router_noise=cfg.moe_router_noise, moe_every=cfg.moe_every)
        # context encoder ("encoder") + posterior encoder ("r_encoder"),
        # reference encoder_transformer.py:12-19
        self.context_encoder = TransformerEncoder(**enc_kw, name="context_encoder")
        self.posterior_encoder = TransformerEncoder(**enc_kw, name="posterior_encoder")
        self.latent = Latent(cfg.latent_dim, dtype=dtype, name="latent")
        self.latent_projection = nn.Dense(cfg.hidden_dim, dtype=dtype,
                                          name="latent_projection")
        self.decoder = TransformerDecoder(
            **enc_kw, max_decode_len=max(cfg.max_decode_length + 1,
                                         cfg.max_target_len),
            use_pallas_decode=cfg.use_pallas_decode,
            use_stream_decode=cfg.use_stream_decode,
            stream_weight_dtype=cfg.stream_weight_dtype,
            pipeline_stages=cfg.pipeline_stages,
            pipeline_microbatches=cfg.pipeline_microbatches,
            pipeline_mesh=(self.mesh if cfg.pipeline_stages > 1 else None),
            name="decoder")
        self.output_proj = nn.Dense(self.vocab_size, dtype=jnp.float32,
                                    name="output_proj")
        # tie_output_z: reuse the SAME module — flax shares its params, so
        # one [hidden, vocab] head serves both roles (config-gated HBM diet;
        # the reference trains separate heads, iq.py:45-48)
        self.z_classifier = (self.output_proj if cfg.tie_output_z
                             else nn.Dense(self.vocab_size,
                                           dtype=jnp.float32,
                                           name="z_classifier"))
        self.image_reconstructor = MLP(cfg.pwffn_dim, cfg.hidden_dim,
                                       num_layers=2, dtype=dtype,
                                       name="image_reconstructor")

    # ------------------------------------------------------------------
    def embed_tokens(self, tokens: jnp.ndarray) -> jnp.ndarray:
        """Shared embedding + projection to hidden (reference iq.py:75-78)."""
        return self.embed_proj(self.embed(tokens))

    def encode_context(self, context: jnp.ndarray, image_features: jnp.ndarray,
                       deterministic: bool = True):
        """Context encoder + image injection at position 0
        (reference encoder_transformer.py:28-32)."""
        src_mask = pad_mask(context, PAD)
        enc = self.context_encoder(self.embed_tokens(context), src_mask,
                                   deterministic)
        enc = enc.at[:, 0].add(image_features.astype(enc.dtype))
        return enc, src_mask

    # ------------------------------------------------------------------
    def __call__(self, images: jnp.ndarray, context: jnp.ndarray,
                 posterior: jnp.ndarray, target: jnp.ndarray,
                 latent_mode: bool = False, train: bool = False
                 ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray], jnp.ndarray,
                            Tuple[jnp.ndarray, jnp.ndarray]]:
        """Training/validation forward (reference iq.py:82-114 contract).

        images [B,224,224,3] NHWC float; context [B,Tc] (answer or category
        tokens per ``input_mode``); posterior [B,Tp] (question-derived
        posterior sequence); target [B,Tq] (question tokens).
        """
        det = not train
        image_features = self.encoder_cnn(images, train=train)

        enc, src_mask = self.encode_context(context, image_features, det)

        kld = jnp.zeros((), jnp.float32)
        z_proj = None
        z_logit = None
        if latent_mode:
            # posterior branch: encode the posterior sequence, take its
            # position-0 summary (reference encoder_transformer.py:24-35)
            post_mask = pad_mask(posterior, PAD)
            post_enc = self.posterior_encoder(
                self.embed_tokens(posterior), post_mask, det)
            # the posterior is used for both train and validation forward
            # (reference train_iq.py:134-139); only decode_greedy samples
            # from the prior.
            kld, z, _ = self.latent(enc[:, 0], post_enc[:, 0], deterministic=det)
            z_proj = self.latent_projection(z)
            z_logit = self.z_classifier(
                (z_proj + image_features).astype(jnp.float32))

        # --- decoder: shift-right with <start>, inject img(+z) at pos 0
        # (reference decoder_transformer.py:22-41)
        b = target.shape[0]
        sos = jnp.full((b, 1), START, dtype=target.dtype)
        shifted = jnp.concatenate([sos, target[:, :-1]], axis=1)
        # key-padding mask only; causality is structural in the decoder's
        # self-attention (ops/attention.py causal=True)
        trg_mask = pad_mask(shifted, PAD)
        if train and latent_mode and self.cfg.target_word_dropout > 0.0:
            # latent-phase word dropout (Bowman et al. 2016): corrupt the
            # teacher-forced input (never the <start>/injection slot, never
            # pads — the mask above is computed on the clean sequence) so
            # reconstruction cannot ride the autoregressive path alone and
            # must pull information through z.
            keep = jax.random.bernoulli(
                self.make_rng("dropout"),
                1.0 - self.cfg.target_word_dropout, shifted.shape)
            droppable = (shifted != PAD).at[:, 0].set(False)
            shifted = jnp.where(droppable & ~keep,
                                jnp.full_like(shifted, UNK), shifted)
        temb = self.embed_tokens(shifted)
        inject = image_features if z_proj is None else image_features + z_proj
        temb = temb.at[:, 0].add(inject.astype(temb.dtype))
        dec_out = self.decoder(temb, enc, src_mask, trg_mask, det)
        logits = self.output_proj(dec_out.astype(jnp.float32))

        # --- image-feature reconstruction (reference iq.py:109-112)
        recon_in = enc[:, 0] if z_proj is None else enc[:, 0] + z_proj
        recon = self.image_reconstructor(recon_in, deterministic=det)

        return logits, z_logit, kld, (image_features.astype(jnp.float32),
                                      recon.astype(jnp.float32))

    # ------------------------------------------------------------------
    def latent_diagnostics(self, images: jnp.ndarray, context: jnp.ndarray,
                           posterior: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        """z-instrumentation (VERDICT r3 #2): prior/posterior distribution
        stats for a batch — per-dim KL, logvar means, prior conditioning
        strength, posterior-prior mean gap, plus ``active_dims`` (KL>0.01
        count, the posterior-collapse gauge).  Eval-mode, no RNG needed."""
        image_features = self.encoder_cnn(images, train=False)
        enc, _ = self.encode_context(context, image_features, True)
        post_mask = pad_mask(posterior, PAD)
        post_enc = self.posterior_encoder(
            self.embed_tokens(posterior), post_mask, True)
        stats = self.latent.stats(enc[:, 0], post_enc[:, 0],
                                  deterministic=True)
        stats["active_dims"] = jnp.sum(
            (stats["kl_per_dim"] > 0.01).astype(jnp.int32))
        return stats

    # ------------------------------------------------------------------
    def predict_from_answer(self, images: jnp.ndarray, answers: jnp.ndarray,
                            max_decode_length: int = 50,
                            latent_mode: bool = True
                            ) -> Dict[str, jnp.ndarray]:
        """Generate questions conditioned on answer tokens (the old IQ API
        name the stale reference eval driver calls, evaluate_iq.py:52)."""
        return self.decode_greedy(images, answers, max_decode_length,
                                  latent_mode)

    def predict_from_category(self, images: jnp.ndarray,
                              categories: jnp.ndarray,
                              max_decode_length: int = 50,
                              latent_mode: bool = True
                              ) -> Dict[str, jnp.ndarray]:
        """Generate questions conditioned on category ids [B] or [B, 1]
        (reference evaluate_iq.py:54 / train_iq.py:165 semantics)."""
        if categories.ndim == 1:
            categories = categories[:, None]
        return self.decode_greedy(images, categories, max_decode_length,
                                  latent_mode)

    # ------------------------------------------------------------------
    def decode_beam(self, images: jnp.ndarray, context: jnp.ndarray,
                    beam_size: int = 4, max_decode_length: int = 50,
                    latent_mode: bool = False, length_penalty: float = 0.6,
                    ) -> Dict[str, jnp.ndarray]:
        """Beam-search decoding under ``lax.scan`` with a KV cache.

        Capability extension over the reference (greedy only, iq.py:117-152):
        beams are folded into the batch dimension (B·K sequences decode in
        one MXU-wide step), finished beams are length-normalized with the
        GNMT penalty ((5+len)/6)^alpha.  Returns the best beam's tokens
        [B, L] and its score [B].

        Note: ``cfg.compat_decode_pad_mask`` (exact reference *greedy*
        masking) is not applied here — beam search has no reference
        counterpart to be compatible with; self-attention masking is
        positional.
        """
        cfg = self.cfg
        k_beams = beam_size
        image_features = self.encoder_cnn(images, train=False)
        enc, src_mask = self.encode_context(context, image_features, True)
        z_proj = jnp.zeros_like(image_features)
        if latent_mode:
            _, z, _ = self.latent(enc[:, 0], None, deterministic=True)
            z_proj = self.latent_projection(z)
        inject = (image_features + z_proj).astype(jnp.dtype(cfg.dtype))

        b = context.shape[0]
        steps = max_decode_length + 1

        def tile(x):  # [B, ...] -> [B*K, ...]
            return jnp.repeat(x, k_beams, axis=0)

        enc_t, src_mask_t, inject_t = tile(enc), tile(src_mask), tile(inject)
        cross_kvs = self.decoder.precompute_cross(enc_t)
        caches = self.decoder.init_cache(b * k_beams, steps)

        seed_id = PAD if cfg.compat_pad_seed else START
        NEG = jnp.asarray(-1e9, jnp.float32)
        # loop-invariant streaming bundle, held outside the scan (see
        # decode_greedy)
        stream = (self.decoder.stream_prep(cross_kvs, src_mask_t,
                                           b * k_beams)
                  if cfg.use_stream_decode else None)

        def body(carry, pos):
            tokens, scores, finished, caches = carry
            # tokens [B, K]; scores [B, K]; finished bool [B, K]
            x_t = self.embed_tokens(tokens.reshape(b * k_beams)[:, None])
            x_t = jnp.where(pos == 0, x_t + inject_t[:, None, :], x_t)
            y_t, new_caches = self.decoder.step(
                x_t, caches, cross_kvs, pos, src_mask_t, stream=stream)
            logits = self.output_proj(y_t[:, 0].astype(jnp.float32))
            logp = jax.nn.log_softmax(logits, axis=-1)  # [B*K, V]
            v = logp.shape[-1]
            logp = logp.reshape(b, k_beams, v)

            # finished beams may only emit <pad> at zero cost
            pad_only = jnp.full((v,), NEG).at[PAD].set(0.0)
            logp = jnp.where(finished[:, :, None], pad_only[None, None, :],
                             logp)
            cand = scores[:, :, None] + logp            # [B, K, V]
            # at step 0 all beams are identical — keep only beam 0's slate
            cand = jnp.where(
                (pos == 0) & (jnp.arange(k_beams)[None, :, None] > 0),
                NEG, cand)
            flat = cand.reshape(b, k_beams * v)
            top_scores, top_idx = jax.lax.top_k(flat, k_beams)   # [B, K]
            parent = top_idx // v                                # [B, K]
            token = (top_idx % v).astype(jnp.int32)              # [B, K]

            # reorder caches along the beam dim to follow the parents
            flat_parent = (jnp.arange(b)[:, None] * k_beams
                           + parent).reshape(b * k_beams)
            cba = self.decoder.cache_batch_axis
            def reorder(c):
                return jnp.take(c, flat_parent, axis=cba)
            new_caches = [(reorder(ck), reorder(cv))
                          for ck, cv in new_caches]

            finished = jnp.take_along_axis(finished, parent, axis=1)
            finished = jnp.logical_or(finished, token == END)
            return ((token, top_scores, finished, new_caches),
                    (token, parent))

        tokens0 = jnp.full((b, k_beams), seed_id, jnp.int32)
        scores0 = jnp.zeros((b, k_beams), jnp.float32)
        finished0 = jnp.zeros((b, k_beams), bool)
        (_, final_scores, final_finished, _), (toks, parents) = jax.lax.scan(
            body, (tokens0, scores0, finished0, caches), jnp.arange(steps))

        # backtrack the best beam (length-penalized); scan stacked [L, B, K]
        toks_lbk = toks
        parents_lbk = parents
        ended = jnp.cumsum((toks_lbk == END).astype(jnp.int32), axis=0) > 0
        beam_len = jnp.sum(~ended, axis=0).astype(jnp.float32) + 1.0  # [B, K]
        penalty = jnp.power((5.0 + beam_len) / 6.0, length_penalty)
        norm_scores = final_scores / penalty
        best = jnp.argmax(norm_scores, axis=1)   # [B]

        def backtrack(carry, inp):
            beam = carry                         # [B]
            tok_l, par_l = inp                   # [B, K] each
            tok = jnp.take_along_axis(tok_l, beam[:, None], axis=1)[:, 0]
            beam = jnp.take_along_axis(par_l, beam[:, None], axis=1)[:, 0]
            return beam, tok

        _, rev_tokens = jax.lax.scan(
            backtrack, best, (toks_lbk, parents_lbk), reverse=True)
        # reverse scan emits ys in original order already (index l output
        # corresponds to step l)
        return {"tokens": jnp.moveaxis(rev_tokens, 0, 1),
                "scores": jnp.take_along_axis(
                    norm_scores, best[:, None], axis=1)[:, 0]}

    # ------------------------------------------------------------------
    def inference_logits(self, images: jnp.ndarray, context: jnp.ndarray,
                         prefix: jnp.ndarray, latent_mode: bool = False
                         ) -> jnp.ndarray:
        """Full-prefix decode logits (reference decoder_transformer.py:43-48
        ``inference_forward`` capability): runs the decoder over the whole
        prefix, no shift-right, image(+z) injected at position 0.

        The reference additionally pad-masks the prefix, which (with its
        ``<pad>`` seed token) fully masks the seed column — a quirk
        SURVEY.md §2.7 flags as a bug; here decode-time self-attention is
        causal-only, consistent with ``decode_greedy``.  O(T²) per sequence —
        exists for parity testing and API compatibility; production decoding
        uses ``decode_greedy``.
        """
        image_features = self.encoder_cnn(images, train=False)
        enc, src_mask = self.encode_context(context, image_features, True)
        z_proj = jnp.zeros_like(image_features)
        if latent_mode:
            _, z, _ = self.latent(enc[:, 0], None, deterministic=True)
            z_proj = self.latent_projection(z)
        temb = self.embed_tokens(prefix)
        temb = temb.at[:, 0].add((image_features + z_proj).astype(temb.dtype))
        # causal-only: no pad mask on the prefix (see docstring)
        dec_out = self.decoder(temb, enc, src_mask, None, True)
        return self.output_proj(dec_out.astype(jnp.float32))

    # ------------------------------------------------------------------
    def decode_greedy(self, images: jnp.ndarray, context: jnp.ndarray,
                      max_decode_length: int = 50, latent_mode: bool = False,
                      early_stop: bool = False, with_probe: bool = True,
                      z_source: str = "prior_sample",
                      posterior: Optional[jnp.ndarray] = None,
                      sample: bool = False, temperature: float = 1.0,
                      top_k: int = 0, top_p: float = 1.0
                      ) -> Dict[str, jnp.ndarray]:
        """Greedy decoding with a KV cache under ``lax.scan``.

        Semantics of reference iq.py:117-152: encode context once, sample z
        from the *prior*, seed with one token, then greedily emit
        ``max_decode_length + 1`` tokens, recording top-6 (prob, token) per
        step.  Returns dict with tokens [B, L], top_tokens [B, L, 6],
        top_probs [B, L, 6].

        ``early_stop=True`` switches to a ``lax.while_loop`` that exits once
        every row has emitted ``<end>`` — same outputs (post-<end> positions
        are ``<pad>``), but a trained model decoding ~10-token questions
        does ~5× fewer steps than the fixed 51-step scan.  The reference has
        no equivalent (its loop always runs max_decode_length+1 re-encodes).

        ``with_probe=False`` is the serving path: it skips the per-step
        softmax + top-6 top_k over the vocab (a validation-printer debugging
        aid, reference train_iq.py:189-193) and returns only ``tokens``.

        ``z_source`` (static) picks where z comes from in latent mode:
        "prior_sample" (reference iq.py:124-127, the default), "prior_mean"
        (deterministic decode — the latent-decay diagnostic/serving knob,
        cfg.decode_z_source), or with ``posterior`` tokens supplied,
        "posterior_sample"/"posterior_mean" (oracle decode for measuring the
        posterior-vs-prior BLEU gap; benchmarks/latent_decay.md).

        ``sample=True`` (static) replaces the per-step argmax with a
        categorical draw from the temperature/top-k/top-p-filtered logits
        (ops/sampling.py) using the ``"sample"`` RNG stream — serving
        capability extension (the reference is greedy-only) and the
        token-level diversity knob for the info-max eval.  Incompatible
        with the fused argmax head (needs full logits; the XLA f32 head is
        used instead).
        """
        cfg = self.cfg
        image_features = self.encoder_cnn(images, train=False)
        enc, src_mask = self.encode_context(context, image_features, True)

        z_proj = jnp.zeros_like(image_features)
        if latent_mode:
            use_mean = z_source.endswith("mean")
            if z_source.startswith("posterior"):
                if posterior is None:
                    raise ValueError("z_source=%r needs posterior tokens"
                                     % z_source)
                post_mask = pad_mask(posterior, PAD)
                post_enc = self.posterior_encoder(
                    self.embed_tokens(posterior), post_mask, True)
                _, z, _ = self.latent(enc[:, 0], post_enc[:, 0],
                                      deterministic=True, use_mean=use_mean)
            else:
                _, z, _ = self.latent(enc[:, 0], None, deterministic=True,
                                      use_mean=use_mean)
            z_proj = self.latent_projection(z)

        cross_kvs = self.decoder.precompute_cross(enc)
        b = context.shape[0]
        steps = max_decode_length + 1
        caches = self.decoder.init_cache(b, steps)
        seed_id = PAD if cfg.compat_pad_seed else START
        seed = jnp.full((b,), seed_id, dtype=jnp.int32)
        # reference-exact decode: pad-TOKEN keys (incl. the pad seed) are
        # masked in self-attention, tracked over the grown prefix
        # (decoder_transformer.py:44; see ops/attention.py step)
        key_pad0 = (jnp.zeros((b, steps), bool)
                    if cfg.compat_decode_pad_mask else None)

        inject = (image_features + z_proj).astype(jnp.dtype(cfg.dtype))

        # Fused decode head (serving path): final-LN + vocab projection +
        # argmax in one Pallas kernel with the [D, V] head streamed at
        # stream_head_dtype (ops/pallas/decode_head.py).  All the prep below
        # is loop-invariant, so XLA hoists it out of the decode scan.  Probe
        # and beam paths need full logits and keep the XLA f32 head.
        # The head stream dtype is independent of the stack's: int8 head +
        # bf16 stack is the measured serving sweet spot (METHODOLOGY.md
        # round-4), so "auto" enables the fused head exactly there — a bf16
        # head only parity-ties XLA's hoisted-cast head.
        head_dt = cfg.stream_head_dtype
        if head_dt == "auto":
            head_dt = cfg.stream_weight_dtype
        use_fused_head = (cfg.use_stream_decode and not with_probe
                          and not sample
                          and (cfg.stream_fused_head == "on"
                               or (cfg.stream_fused_head == "auto"
                                   and head_dt == "int8")))
        # one "sample" key per decode call, folded per position inside the
        # scan (make_rng may not be called from a scan body)
        sample_key = self.make_rng("sample") if sample else None
        if use_fused_head:
            from blt_vqg_tpu.ops.pallas.decode_head import (
                head_argmax, head_chunk, pad_head)
            hp = self.output_proj.variables["params"]
            head_w = hp["kernel"].astype(jnp.float32)        # [D, V]
            head_b = hp["bias"].astype(jnp.float32)          # [V]
            chunk = head_chunk(head_w.shape[1])
            head_scales = None
            if head_dt == "int8":
                from blt_vqg_tpu.ops.pallas.decode_stream import \
                    quantize_stack
                head_w, head_scales = quantize_stack(head_w)
                head_w, head_b = pad_head(head_w, head_b, chunk)
                head_scales = jnp.pad(
                    head_scales, ((0, 0),
                                  (0, head_w.shape[1] - head_scales.shape[1])),
                    constant_values=1.0)
            else:
                # "bfloat16" mirrors the stack convention: stream at the
                # model compute dtype (f32 models stream f32 for exactness)
                head_w, head_b = pad_head(
                    head_w.astype(jnp.dtype(cfg.dtype)), head_b, chunk)
            lnp = self.decoder.final_ln.variables["params"]

        # streaming decode: build the loop-invariant weight/cross bundle
        # ONCE, outside the scan body — XLA's LICM does not hoist the int8
        # quantize chain out of the loop (measured +~120 µs/step without
        # this; METHODOLOGY round-4c)
        stream = (self.decoder.stream_prep(cross_kvs, src_mask, b)
                  if cfg.use_stream_decode else None)

        def one_step(token, caches, key_pad, pos):
            x_t = self.embed_tokens(token[:, None])
            # position-0 injection of image(+z) features, matching the
            # per-step add the reference does at [:, 0] of the full prefix
            # (decoder_transformer.py:46)
            x_t = jnp.where(pos == 0, x_t + inject[:, None, :], x_t)
            if key_pad is not None:
                key_pad = key_pad.at[:, pos].set(token == PAD)
            y_t, caches = self.decoder.step(x_t, caches, cross_kvs, pos,
                                            src_mask, key_pad,
                                            skip_final_ln=use_fused_head,
                                            stream=stream)
            if use_fused_head:
                next_token = head_argmax(
                    y_t[:, 0], lnp["scale"], lnp["bias"], head_w, head_b,
                    chunk=chunk, scales=head_scales)
                return next_token, caches, key_pad, None, None
            logits_t = self.output_proj(y_t[:, 0].astype(jnp.float32))
            if sample:
                from blt_vqg_tpu.ops.sampling import sample_token
                next_token = sample_token(
                    jax.random.fold_in(sample_key, pos), logits_t,
                    temperature, top_k, top_p)
            else:
                next_token = jnp.argmax(logits_t, axis=-1).astype(jnp.int32)
            if not with_probe:
                return next_token, caches, key_pad, None, None
            probs = jax.nn.softmax(logits_t, axis=-1)
            top_probs, top_tokens = jax.lax.top_k(probs, 6)
            return next_token, caches, key_pad, top_tokens, top_probs

        if not early_stop:
            if with_probe:
                def body(carry, pos):
                    token, caches, key_pad = carry
                    next_token, caches, key_pad, top_tokens, top_probs = \
                        one_step(token, caches, key_pad, pos)
                    return (next_token, caches, key_pad), (
                        next_token, top_tokens, top_probs)

                _, (tokens, top_tokens, top_probs) = jax.lax.scan(
                    body, (seed, caches, key_pad0), jnp.arange(steps))
                # scan stacks along axis 0 → [L, B, ...]; move batch first
                return {
                    "tokens": jnp.moveaxis(tokens, 0, 1),
                    "top_tokens": jnp.moveaxis(top_tokens, 0, 1),
                    "top_probs": jnp.moveaxis(top_probs, 0, 1),
                }

            def body(carry, pos):
                token, caches, key_pad = carry
                next_token, caches, key_pad, _, _ = one_step(
                    token, caches, key_pad, pos)
                return (next_token, caches, key_pad), next_token

            _, tokens = jax.lax.scan(body, (seed, caches, key_pad0),
                                     jnp.arange(steps))
            return {"tokens": jnp.moveaxis(tokens, 0, 1)}

        # -- while_loop variant: exit when every row has emitted <end> --
        out_tokens = jnp.zeros((b, steps), jnp.int32)
        out_top_t = jnp.zeros((b, steps, 6), jnp.int32)
        out_top_p = jnp.zeros((b, steps, 6), jnp.float32)
        done = jnp.zeros((b,), bool)

        def cond(state):
            pos, _, _, _, done, *_ = state
            return jnp.logical_and(pos < steps, ~jnp.all(done))

        def wbody(state):
            (pos, token, caches, key_pad, done,
             out_tokens, out_top_t, out_top_p) = state
            next_token, caches, key_pad, top_tokens, top_probs = one_step(
                token, caches, key_pad, pos)
            # rows already finished emit <pad>
            next_token = jnp.where(done, PAD, next_token)
            out_tokens = jax.lax.dynamic_update_slice_in_dim(
                out_tokens, next_token[:, None], pos, axis=1)
            if with_probe:
                out_top_t = jax.lax.dynamic_update_slice_in_dim(
                    out_top_t, top_tokens[:, None, :], pos, axis=1)
                out_top_p = jax.lax.dynamic_update_slice_in_dim(
                    out_top_p, top_probs[:, None, :], pos, axis=1)
            done = jnp.logical_or(done, next_token == END)
            return (pos + 1, next_token, caches, key_pad, done,
                    out_tokens, out_top_t, out_top_p)

        state = (jnp.asarray(0), seed, caches, key_pad0, done,
                 out_tokens, out_top_t, out_top_p)
        (_, _, _, _, _, out_tokens, out_top_t, out_top_p) = jax.lax.while_loop(
            cond, wbody, state)
        if not with_probe:
            return {"tokens": out_tokens}
        return {"tokens": out_tokens, "top_tokens": out_top_t,
                "top_probs": out_top_p}


# ----------------------------------------------------------------------
def apply_glove_table(params: Dict[str, Any], table) -> Dict[str, Any]:
    """Overwrites the embedding param with a GloVe-initialized table
    (reference iq.py:57-74 semantics, done as post-init surgery)."""
    import numpy as np
    new = jax.tree_util.tree_map(lambda x: x, params)  # shallow-ish copy
    new["embed"] = dict(new["embed"])
    # preserve the incoming storage dtype (bf16 under cfg.param_dtype diet)
    new["embed"]["embedding"] = jnp.asarray(
        np.asarray(table), dtype=params["embed"]["embedding"].dtype)
    return new
