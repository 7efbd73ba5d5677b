"""Pre-LN transformer encoder/decoder stacks.

Capability-parity with reference models/transformer_layers.py:88-364 (pre-LN
layers, sinusoidal timing signal added to inputs, final LayerNorm, pad /
causal masking), redesigned for XLA:

- static shapes everywhere; masks are booleans applied to f32 logits;
- the decoder exposes an O(T) single-step decode path over explicit KV
  caches (``precompute_cross`` + ``step``) driven by ``lax.scan`` in the
  model layer — the reference re-encodes the whole prefix per step;
- FFN is linear→ReLU→dropout→linear (the reference accidentally applies
  ReLU+dropout after the last layer too, reference
  transformer_layers.py:400-408 — a bug SURVEY.md §2.7 says not to copy);
- optional ``jax.checkpoint`` (remat) per block to trade FLOPs for HBM.
"""

from __future__ import annotations

from typing import Any, List, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from blt_vqg_tpu.ops.attention import MultiHeadAttention
from blt_vqg_tpu.ops.timing import timing_signal


class PositionwiseFeedForward(nn.Module):
    hidden_dim: int
    pwffn_dim: int
    dropout_rate: float = 0.1
    dtype: jnp.dtype = jnp.bfloat16
    activation: str = "relu"  # "relu" (reference 'll' config) | "gelu" (ViT)
    # reproduce the reference's trailing ReLU+dropout after the LAST linear
    # (reference transformer_layers.py:400-408 — a bug per SURVEY.md §2.7;
    # off by default, used by the full-stack golden-parity tests)
    compat_trailing_relu: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        act = nn.gelu if self.activation == "gelu" else nn.relu
        h = nn.Dense(self.pwffn_dim, dtype=self.dtype, name="ffn_in")(x)
        h = act(h)
        h = nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
        h = nn.Dense(self.hidden_dim, dtype=self.dtype, name="ffn_out")(h)
        if self.compat_trailing_relu:
            h = act(h)
            h = nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
        return h


def _make_ffn(layer) -> nn.Module:
    """Dense FFN, or a mixture-of-experts FFN when the layer carries
    ``moe_num_experts > 1`` (ops/moe.py — expert-parallel capability
    extension; the reference has no MoE, SURVEY.md §2.4)."""
    if getattr(layer, "moe_num_experts", 0) > 1:
        from blt_vqg_tpu.ops.moe import MoEFeedForward
        return MoEFeedForward(
            layer.hidden_dim, layer.pwffn_dim, layer.moe_num_experts,
            top_k=layer.moe_top_k, capacity_factor=layer.moe_capacity_factor,
            dropout_rate=layer.relu_dropout, dtype=layer.dtype,
            activation=getattr(layer, "activation", "relu"),
            router_noise=layer.moe_router_noise, name="ffn")
    return PositionwiseFeedForward(
        layer.hidden_dim, layer.pwffn_dim, layer.relu_dropout,
        dtype=layer.dtype, activation=getattr(layer, "activation", "relu"),
        compat_trailing_relu=layer.compat_trailing_relu, name="ffn")


class EncoderLayer(nn.Module):
    hidden_dim: int
    num_heads: int
    pwffn_dim: int
    attention_dropout: float = 0.1
    relu_dropout: float = 0.1
    layer_dropout: float = 0.0
    dtype: jnp.dtype = jnp.bfloat16
    use_pallas: bool = False
    activation: str = "relu"
    compat_trailing_relu: bool = False
    ring_mesh: object = None  # sequence-parallel mesh (ops/attention.py)
    ring_impl: str = "xla"    # ring inner loop: "xla" ppermute | "pallas" RDMA
    moe_num_experts: int = 0  # >1: FFN is a mixture of experts (ops/moe.py)
    moe_top_k: int = 2
    moe_capacity_factor: float = 1.25
    moe_router_noise: float = 0.0

    def setup(self):
        self.ln_mha = nn.LayerNorm(dtype=self.dtype, name="ln_mha")
        self.mha = MultiHeadAttention(
            self.hidden_dim, self.num_heads, self.attention_dropout,
            dtype=self.dtype, use_pallas=self.use_pallas,
            ring_mesh=self.ring_mesh, ring_impl=self.ring_impl,
            name="mha")
        self.ln_ffn = nn.LayerNorm(dtype=self.dtype, name="ln_ffn")
        self.ffn = _make_ffn(self)
        self.dropout = nn.Dropout(self.layer_dropout)

    def __call__(self, x, mask=None, deterministic: bool = True):
        xn = self.ln_mha(x)
        y = self.mha(xn, xn, mask, deterministic)
        x = self.dropout(x + y, deterministic=deterministic)
        y = self.ffn(self.ln_ffn(x), deterministic)
        return self.dropout(x + y, deterministic=deterministic)


class TransformerEncoder(nn.Module):
    """Stack of pre-LN encoder layers + input timing signal + final LN.

    (reference transformer_layers.py:88-152 capability)
    """
    hidden_dim: int
    num_layers: int
    num_heads: int
    pwffn_dim: int
    attention_dropout: float = 0.1
    relu_dropout: float = 0.1
    layer_dropout: float = 0.0
    input_dropout: float = 0.0
    dtype: jnp.dtype = jnp.bfloat16
    use_pallas: bool = False
    remat: bool = False
    compat_trailing_relu: bool = False
    ring_mesh: object = None
    ring_impl: str = "xla"
    moe_num_experts: int = 0  # >1: MoE FFNs (every moe_every-th layer)
    moe_top_k: int = 2
    moe_capacity_factor: float = 1.25
    moe_router_noise: float = 0.0
    moe_every: int = 1        # 1 = every layer; 2 = alternate (GShard style)

    def _layer_experts(self, i: int) -> int:
        """Experts for layer i: MoE on every ``moe_every``-th layer (the
        LAST of each group, so moe_every=2 gives dense/MoE alternation)."""
        on = self.moe_num_experts > 1 and (i % self.moe_every
                                           == self.moe_every - 1)
        return self.moe_num_experts if on else 0

    def setup(self):
        # deterministic (argnum 3: self, x, mask, deterministic) must stay a
        # python bool under remat — Dropout branches on it at trace time
        layer_cls = (nn.remat(EncoderLayer, static_argnums=(3,))
                     if self.remat else EncoderLayer)
        self.layers = [
            layer_cls(self.hidden_dim, self.num_heads, self.pwffn_dim,
                      self.attention_dropout, self.relu_dropout,
                      self.layer_dropout, self.dtype, self.use_pallas,
                      compat_trailing_relu=self.compat_trailing_relu,
                      ring_mesh=self.ring_mesh, ring_impl=self.ring_impl,
                      moe_num_experts=self._layer_experts(i),
                      moe_top_k=self.moe_top_k,
                      moe_capacity_factor=self.moe_capacity_factor,
                      moe_router_noise=self.moe_router_noise,
                      name=f"layer_{i}")
            for i in range(self.num_layers)
        ]
        self.final_ln = nn.LayerNorm(dtype=self.dtype, name="final_ln")
        self.in_dropout = nn.Dropout(self.input_dropout)

    def __call__(self, x, mask=None, deterministic: bool = True):
        t = x.shape[1]
        x = self.in_dropout(x, deterministic=deterministic)
        x = x + timing_signal(t, self.hidden_dim, dtype=x.dtype)
        for layer in self.layers:
            x = layer(x, mask, deterministic)
        return self.final_ln(x)


class DecoderLayer(nn.Module):
    hidden_dim: int
    num_heads: int
    pwffn_dim: int
    attention_dropout: float = 0.1
    relu_dropout: float = 0.1
    layer_dropout: float = 0.0
    dtype: jnp.dtype = jnp.bfloat16
    use_pallas: bool = False
    compat_trailing_relu: bool = False
    ring_mesh: object = None  # sequence-parallel self-attention only
    ring_impl: str = "xla"
    use_pallas_decode: bool = False  # fused 2-kernel decode step
    moe_num_experts: int = 0  # >1: FFN is a mixture of experts (ops/moe.py)
    moe_top_k: int = 2
    moe_capacity_factor: float = 1.25
    moe_router_noise: float = 0.0

    def setup(self):
        if self.moe_num_experts > 1 and self.use_pallas_decode:
            raise ValueError(
                "MoE FFNs are not supported on the fused Pallas decode "
                "path (use_pallas_decode reads dense ffn_in/ffn_out "
                "kernels); decode MoE models on the XLA path")
        self.ln_self = nn.LayerNorm(dtype=self.dtype, name="ln_self")
        self.self_attn = MultiHeadAttention(
            self.hidden_dim, self.num_heads, self.attention_dropout,
            dtype=self.dtype, use_pallas=self.use_pallas, causal=True,
            ring_mesh=self.ring_mesh, ring_impl=self.ring_impl,
            name="self_attn")
        self.ln_cross = nn.LayerNorm(dtype=self.dtype, name="ln_cross")
        self.cross_attn = MultiHeadAttention(
            self.hidden_dim, self.num_heads, self.attention_dropout,
            dtype=self.dtype, use_pallas=self.use_pallas, name="cross_attn")
        self.ln_ffn = nn.LayerNorm(dtype=self.dtype, name="ln_ffn")
        self.ffn = _make_ffn(self)
        self.dropout = nn.Dropout(self.layer_dropout)

    def __call__(self, x, enc_out, src_mask=None, trg_mask=None,
                 deterministic: bool = True):
        # trg_mask is the target KEY-PADDING mask [B,1,1,T]; causality comes
        # from self_attn.causal (equivalent to the reference's pad+subsequent
        # combine, transformer_layers.py:205-207, without materializing it)
        xn = self.ln_self(x)
        y = self.self_attn(xn, xn, trg_mask, deterministic)
        x = self.dropout(x + y, deterministic=deterministic)
        y = self.cross_attn(self.ln_cross(x), enc_out, src_mask, deterministic)
        x = self.dropout(x + y, deterministic=deterministic)
        y = self.ffn(self.ln_ffn(x), deterministic)
        return self.dropout(x + y, deterministic=deterministic)

    # ---- decode path ----
    def cross_kv(self, enc_out):
        return self.cross_attn.kv(enc_out)

    def step(self, x_t, cache_k, cache_v, ck, cv, pos, src_mask,
             key_pad=None):
        """One decode step. x_t [B,1,D]; caches [B,L,H,Dh]; (ck, cv) are the
        precomputed cross-attention K/V for this layer.  ``key_pad`` [B,L]
        adds reference-style pad-token key masking (ops/attention.py step).

        PRECONDITION: ``key_pad`` must never mark a position > ``pos``.
        The pad fill (-1e18) sits strictly ABOVE the future fill (-1e30),
        and this path (like the per-layer Pallas kernel) applies it
        unguarded over all L rows — a mark past ``pos`` would un-mask a
        garbage cache row.  models/iq.py one_step only marks emitted
        tokens, so the invariant holds for every in-repo caller; the
        stream kernel additionally guards with ``~stale`` and would
        diverge from the other two paths if a caller broke it."""
        if self.use_pallas_decode:
            return self._step_pallas(x_t, cache_k, cache_v, ck, cv, pos,
                                     src_mask, key_pad)
        xn = self.ln_self(x_t)
        y, cache_k, cache_v = self.self_attn.step(xn, cache_k, cache_v, pos,
                                                  key_pad)
        x_t = x_t + y
        y = self.cross_attn.attend_cached(self.ln_cross(x_t), ck, cv, src_mask)
        x_t = x_t + y
        y = self.ffn(self.ln_ffn(x_t), deterministic=True)
        return x_t + y, cache_k, cache_v

    def _step_pallas(self, x_t, cache_k, cache_v, ck, cv, pos, src_mask,
                     key_pad=None):
        """Fused decode step: two Pallas ops instead of ~15 XLA ops — the
        serial-chain diet (ops/pallas/decode_layer.py).  All the weight
        regrouping below is loop-invariant, so XLA hoists it out of the
        decode scan; only the two kernels run per step.  ``key_pad`` [B, L]
        bool adds reference-style pad-token key masking in the fused
        self-attention (compat_decode_pad_mask)."""
        from blt_vqg_tpu.ops.pallas.decode_layer import (cross_ffn_step,
                                                         self_attn_step)
        h = self.num_heads
        d = self.hidden_dim
        dh = d // h
        sp = self.self_attn.variables["params"]
        # [H, D, 3*Dh]: head-h column slices of the fused QKV kernel
        wqkv = jnp.stack([
            jnp.concatenate([sp[n]["kernel"][:, i * dh:(i + 1) * dh]
                             for n in ("q_proj", "k_proj", "v_proj")], axis=1)
            for i in range(h)]).astype(self.dtype)
        # [H, Dh, D]: head-h row slices of the output projection
        wout = jnp.stack([
            sp["out_proj"]["kernel"][i * dh:(i + 1) * dh, :]
            for i in range(h)]).astype(self.dtype)
        lns = self.ln_self.variables["params"]
        y = self_attn_step(
            x_t[:, 0], lns["scale"], lns["bias"], wqkv, wout,
            cache_k, cache_v, pos, h,
            key_pad=(None if key_pad is None
                     else key_pad.astype(jnp.float32).T))
        x2, cache_k, cache_v = y

        cp = self.cross_attn.variables["params"]
        lnc = self.ln_cross.variables["params"]
        lnf = self.ln_ffn.variables["params"]
        fp = self.ffn.variables["params"]
        b = x_t.shape[0]
        pad = (jnp.broadcast_to(src_mask[:, 0, 0, :], (b, ck.shape[1]))
               if src_mask is not None
               else jnp.zeros((b, ck.shape[1]), bool))
        out = cross_ffn_step(
            x2, lnc["scale"], lnc["bias"],
            cp["q_proj"]["kernel"].astype(self.dtype), ck, cv, pad,
            cp["out_proj"]["kernel"].astype(self.dtype),
            lnf["scale"], lnf["bias"],
            fp["ffn_in"]["kernel"].astype(self.dtype), fp["ffn_in"]["bias"],
            fp["ffn_out"]["kernel"].astype(self.dtype), fp["ffn_out"]["bias"],
            h)
        return out[:, None, :], cache_k, cache_v


class TransformerDecoder(nn.Module):
    """Stack of pre-LN decoder layers (self + cross attention + FFN).

    (reference transformer_layers.py:155-221, 286-364 capability)
    """
    hidden_dim: int
    num_layers: int
    num_heads: int
    pwffn_dim: int
    attention_dropout: float = 0.1
    relu_dropout: float = 0.1
    layer_dropout: float = 0.0
    input_dropout: float = 0.0
    dtype: jnp.dtype = jnp.bfloat16
    use_pallas: bool = False
    remat: bool = False
    max_decode_len: int = 64
    compat_trailing_relu: bool = False
    ring_mesh: object = None
    ring_impl: str = "xla"
    use_pallas_decode: bool = False
    # whole-stack streaming decode: ONE Pallas kernel for all layers,
    # weights/caches pipelined HBM→VMEM (ops/pallas/decode_stream.py)
    use_stream_decode: bool = False
    # bucketed: self stages hand-DMA only a prefix bucket of the KV cache
    # (False = full-length blocks on the automatic pipeline)
    stream_bucketed_cache: bool = True
    # "int8": stream the stacked weights int8 (per-column scales, dequant
    # in VMEM per stage) — halves the kernel's weight-DMA floor at a
    # documented quantization-accuracy cost (serving knob)
    stream_weight_dtype: str = "bfloat16"
    # GPipe over a "pipe" mesh axis (parallel/pipeline.py): >1 splits the
    # layer stack into stages; training forward only (decode uses DP/TP)
    pipeline_stages: int = 1
    pipeline_microbatches: int = 2
    pipeline_mesh: Any = None
    moe_num_experts: int = 0  # >1: MoE FFNs (every moe_every-th layer)
    moe_top_k: int = 2
    moe_capacity_factor: float = 1.25
    moe_router_noise: float = 0.0
    moe_every: int = 1

    def _layer_experts(self, i: int) -> int:
        on = self.moe_num_experts > 1 and (i % self.moe_every
                                           == self.moe_every - 1)
        return self.moe_num_experts if on else 0

    def setup(self):
        if self.moe_num_experts > 1:
            if self.use_stream_decode:
                raise ValueError(
                    "MoE FFNs are not supported on the streaming decode "
                    "path (use_stream_decode streams dense FFN stacks); "
                    "decode MoE models on the XLA path")
            if self.pipeline_stages > 1:
                raise ValueError(
                    "MoE + GPipe is not supported: the pipelined stage "
                    "apply (parallel/pipeline.py) does not thread the "
                    "'moe' sow collection, so the load-balance loss would "
                    "be silently dropped — shard experts over an 'expert' "
                    "mesh axis instead (EP replaces PP's memory win here)")
        # deterministic is argnum 5 (self, x, enc_out, src_mask, trg_mask,
        # deterministic) — static for the same Dropout trace-time branch
        layer_cls = (nn.remat(DecoderLayer, static_argnums=(5,))
                     if self.remat else DecoderLayer)
        self.layers = [
            layer_cls(self.hidden_dim, self.num_heads, self.pwffn_dim,
                      self.attention_dropout, self.relu_dropout,
                      self.layer_dropout, self.dtype, self.use_pallas,
                      compat_trailing_relu=self.compat_trailing_relu,
                      ring_mesh=self.ring_mesh, ring_impl=self.ring_impl,
                      use_pallas_decode=self.use_pallas_decode,
                      moe_num_experts=self._layer_experts(i),
                      moe_top_k=self.moe_top_k,
                      moe_capacity_factor=self.moe_capacity_factor,
                      moe_router_noise=self.moe_router_noise,
                      name=f"layer_{i}")
            for i in range(self.num_layers)
        ]
        self.final_ln = nn.LayerNorm(dtype=self.dtype, name="final_ln")
        self.in_dropout = nn.Dropout(self.input_dropout)

    def __call__(self, x, enc_out, src_mask=None, trg_mask=None,
                 deterministic: bool = True):
        t = x.shape[1]
        x = self.in_dropout(x, deterministic=deterministic)
        x = x + timing_signal(t, self.hidden_dim, dtype=x.dtype)
        # init traces the sequential path (layer params don't exist to be
        # stacked yet — and the trees are identical either way)
        if self.pipeline_stages > 1 and not self.is_initializing():
            return self.final_ln(self._pipelined(
                x, enc_out, src_mask, trg_mask, deterministic))
        for layer in self.layers:
            x = layer(x, enc_out, src_mask, trg_mask, deterministic)
        return self.final_ln(x)

    def _pipelined(self, x, enc_out, src_mask, trg_mask, deterministic):
        """GPipe over a ``pipe`` mesh axis (parallel/pipeline.py): the layer
        stack split into ``pipeline_stages`` stages, microbatched activations
        hopping stage→stage via ppermute.  The uniform layers make the stack
        scan-compatible: params are stacked [L, ...] (loop-invariant — XLA
        hoists the stacking) and one functional layer apply serves every
        stage.  Dropout draws from a fold_in(layer, microbatch) stream — a
        VALID dropout pattern but a different one than the sequential path,
        so exact-parity tests run deterministic.
        """
        from jax.sharding import NamedSharding, PartitionSpec
        from blt_vqg_tpu.parallel.pipeline import pipeline_apply

        # Stage the params' layout change EXPLICITLY (VERDICT r3 weak #2):
        # per-layer leaves may carry TP ("model"-axis) shardings, while
        # shard_map consumes the [L, ...] stack pipe-sharded on dim 0 with
        # every other axis replicated.  Left implicit, GSPMD faces a
        # sharded→sharded transition across mismatched dims on the stack's
        # concatenate and falls back to replicate-then-repartition, logging
        # "[SPMD] Involuntary full rematerialization".  Annotating each leaf
        # replicated (a voluntary all-gather — traffic that transition needs
        # anyway) and the stack pipe-sharded (a local slice) makes every
        # step voluntary; the dryrun asserts the warning is gone.
        mesh = self.pipeline_mesh
        repl = NamedSharding(mesh, PartitionSpec())
        pipe_shard = NamedSharding(mesh, PartitionSpec("pipe"))
        stacked = jax.tree.map(
            lambda *ls: jax.lax.with_sharding_constraint(
                jnp.stack([jax.lax.with_sharding_constraint(l, repl)
                           for l in ls]), pipe_shard),
            *[layer.variables["params"] for layer in self.layers])
        template = self.layers[0]
        rng = (None if deterministic
               else self.make_rng("dropout"))

        def layer_fn(p, x_mb, bargs, key):
            enc_mb, src_mb, trg_mb = bargs
            rngs = None if key is None else {"dropout": key}
            return template.apply({"params": p}, x_mb, enc_mb, src_mb,
                                  trg_mb, deterministic, rngs=rngs)

        return pipeline_apply(
            layer_fn, stacked, x, self.pipeline_mesh,
            microbatches=self.pipeline_microbatches,
            batch_args=(enc_out, src_mask, trg_mask), rng=rng)

    # ---- decode path ----
    def precompute_cross(self, enc_out) -> List[Tuple[jnp.ndarray, jnp.ndarray]]:
        return [layer.cross_kv(enc_out) for layer in self.layers]

    @property
    def cache_batch_axis(self) -> int:
        """Axis of the batch dim in the KV caches (beam search reorders
        along it)."""
        if self.use_stream_decode:
            return 3
        return 2 if self.use_pallas_decode else 0

    def init_cache(self, batch: int, max_len: int):
        """Zeroed self-attention KV caches: list of (k, v) [B,L,H,Dh]
        ([H,L,B,Dh] on the fused Pallas path: the per-step dynamic write at
        ``pos`` must land in an untiled leading dim, and the tiled trailing
        dims stay (B,Dh) — ops/pallas/decode_layer.py).  The streaming
        whole-stack path keeps ONE stacked pair [Layers,H,L,B,Dh] (a
        single-element list, so the cache pytree shape is uniform across
        paths)."""
        head_dim = self.hidden_dim // self.num_heads
        if self.use_stream_decode:
            z = jnp.zeros((self.num_layers, self.num_heads, max_len,
                           batch, head_dim), dtype=self.dtype)
            return [(z, z)]
        if self.use_pallas_decode:
            shape = (self.num_heads, max_len, batch, head_dim)
        else:
            shape = (batch, max_len, self.num_heads, head_dim)
        z = jnp.zeros(shape, dtype=self.dtype)
        return [(z, z) for _ in range(self.num_layers)]

    def step(self, x_t, caches, cross_kvs, pos, src_mask=None,
             key_pad=None, skip_final_ln: bool = False, stream=None):
        """One decode step: x_t [B,1,D] at position ``pos``.

        ``key_pad`` [B, L] (optional) masks pad-*token* keys in decode
        self-attention like the reference does (see DecoderLayer.step).
        PRECONDITION: callers must never mark a position > ``pos``
        (pad fill overrides the future fill on the XLA and per-layer
        kernel paths — see DecoderLayer.step).
        ``skip_final_ln=True`` returns the raw stack output (the fused
        decode head, ops/pallas/decode_head.py, applies the final LN
        itself).  ``stream`` (streaming path only) is the loop-invariant
        tensor bundle from :meth:`stream_prep`; decode loops compute it
        ONCE outside their ``lax.scan`` — left None, it is rebuilt here
        each call, which inside a scan body leaves the weight
        stacking/quantization to XLA's loop-invariant code motion (measured
        NOT to hoist the int8 quantize: +~120 µs/step, METHODOLOGY
        round-4c).  Returns (output [B,1,D], updated caches).
        """
        sig = jnp.asarray(
            timing_signal(self.max_decode_len, self.hidden_dim, dtype=x_t.dtype))
        x_t = x_t + jnp.take(sig[0], pos[None], axis=0)[None]
        if self.use_stream_decode:
            if stream is None:
                stream = self.stream_prep(cross_kvs, src_mask, x_t.shape[0])
            return self._step_stream(x_t, caches, stream, pos,
                                     skip_final_ln, key_pad=key_pad)
        new_caches = []
        for layer, (cache_k, cache_v), (ck, cv) in zip(
                self.layers, caches, cross_kvs):
            x_t, cache_k, cache_v = layer.step(
                x_t, cache_k, cache_v, ck, cv, pos, src_mask, key_pad)
            new_caches.append((cache_k, cache_v))
        if skip_final_ln:
            return x_t, new_caches
        return self.final_ln(x_t), new_caches

    def stream_prep(self, cross_kvs, src_mask, batch):
        """Loop-invariant tensors of the streaming decode step, computed
        ONCE per decode call: per-layer weight stacks (optionally int8-
        quantized), LayerNorm/bias stacks, regrouped cross K/V and the
        source mask.  Decode loops hold the result OUTSIDE their
        ``lax.scan``/``while_loop`` body so none of this re-runs per token
        — XLA's loop-invariant code motion hoists the plain converts but
        measured NOT the int8 quantize chain (abs-max reduce → scale →
        round), which cost the int8 stream path ~120 µs/step when left
        inside the scan (METHODOLOGY round-4c)."""
        from blt_vqg_tpu.ops.pallas.decode_stream import (_interpret,
                                                          pick_stages,
                                                          quantize_stack)
        h = self.num_heads
        d = self.hidden_dim
        dh = d // h
        if dh % 128 != 0 and not _interpret():
            # Mosaic rejects the bucketed-cache DMA's memref_slice when the
            # head dim is not lane-aligned ("Slice shape along dimension 4
            # must be aligned to tiling (128)") — caught on hardware with a
            # head_dim-32 probe model; CPU interpret mode does not enforce
            # tiling, so tests pass either way.
            raise ValueError(
                f"use_stream_decode requires head_dim % 128 == 0 on TPU "
                f"(got hidden_dim={d}, num_heads={h} -> head_dim={dh}); "
                f"use the XLA decode path for small-head models")
        dt = self.dtype
        hc, fc = pick_stages(h, self.pwffn_dim)
        hpc = h // hc
        fchunk = self.pwffn_dim // fc

        def per_layer(fn):
            return jnp.stack([fn(layer) for layer in self.layers])

        def lns(layer):
            p = lambda m: m.variables["params"]
            return jnp.stack([
                p(layer.ln_self)["scale"], p(layer.ln_self)["bias"],
                p(layer.ln_cross)["scale"], p(layer.ln_cross)["bias"],
                p(layer.ln_ffn)["scale"], p(layer.ln_ffn)["bias"],
            ]).astype(jnp.float32)

        def wqkv(layer):  # [H, D, 3*Dh] head-h column slices of fused QKV
            sp = layer.self_attn.variables["params"]
            return jnp.stack([
                jnp.concatenate([sp[n]["kernel"][:, i * dh:(i + 1) * dh]
                                 for n in ("q_proj", "k_proj", "v_proj")],
                                axis=1)
                for i in range(h)]).astype(dt)

        def wout(layer):  # [H, Dh, D] head-h row slices
            w = layer.self_attn.variables["params"]["out_proj"]["kernel"]
            return jnp.stack([w[i * dh:(i + 1) * dh] for i in range(h)]
                             ).astype(dt)

        def wqc(layer):   # [Hc, D, hpc*Dh] head-group column slices
            w = layer.cross_attn.variables["params"]["q_proj"]["kernel"]
            return jnp.stack([w[:, j * hpc * dh:(j + 1) * hpc * dh]
                              for j in range(hc)]).astype(dt)

        def woc(layer):   # [Hc, hpc*Dh, D] head-group row slices
            w = layer.cross_attn.variables["params"]["out_proj"]["kernel"]
            return jnp.stack([w[j * hpc * dh:(j + 1) * hpc * dh]
                              for j in range(hc)]).astype(dt)

        def w1(layer):    # [Fc, D, F/Fc]
            w = layer.ffn.variables["params"]["ffn_in"]["kernel"]
            return jnp.stack([w[:, c * fchunk:(c + 1) * fchunk]
                              for c in range(fc)]).astype(dt)

        def b1(layer):    # [Fc, 1, F/Fc] f32
            bv = layer.ffn.variables["params"]["ffn_in"]["bias"]
            return jnp.stack([bv[None, c * fchunk:(c + 1) * fchunk]
                              for c in range(fc)]).astype(jnp.float32)

        def w2(layer):    # [Fc, F/Fc, D]
            w = layer.ffn.variables["params"]["ffn_out"]["kernel"]
            return jnp.stack([w[c * fchunk:(c + 1) * fchunk]
                              for c in range(fc)]).astype(dt)

        def b2(layer):    # [1, D] f32
            return layer.ffn.variables["params"]["ffn_out"]["bias"
                                                            ][None].astype(jnp.float32)

        def ckv(xs):      # list of [B,Tc,H,Dh] -> [L,Hc,Tc,B,hpc*Dh]
            stacked = jnp.stack(xs)                     # [L, B, Tc, H, Dh]
            nl, b, tc = stacked.shape[:3]
            out = stacked.transpose(0, 2, 1, 3, 4).reshape(
                nl, tc, b, hc, hpc * dh)
            return out.transpose(0, 3, 1, 2, 4).astype(dt)

        tc = cross_kvs[0][0].shape[1]
        smask = (jnp.broadcast_to(src_mask[:, 0, 0, :], (batch, tc)).T
                 if src_mask is not None
                 else jnp.zeros((tc, batch), bool)).astype(jnp.int32)

        stacks = [per_layer(wqkv), per_layer(wout), per_layer(wqc),
                  per_layer(woc), per_layer(w1), per_layer(w2)]
        scales = None
        if self.stream_weight_dtype == "int8":
            # int8 weight streaming: quantize the stacks once HERE, outside
            # the caller's decode loop; the kernel streams half the weight
            # bytes and feeds the raw int8 blocks to the MXU
            stacks, scales = map(list, zip(*[quantize_stack(w)
                                             for w in stacks]))
        return {
            "lns": per_layer(lns), "stacks": tuple(stacks),
            "scales": None if scales is None else tuple(scales),
            "ckc": ckv([ck for ck, _ in cross_kvs]),
            "cvc": ckv([cv for _, cv in cross_kvs]),
            "smask": smask, "b1": per_layer(b1), "b2": per_layer(b2),
        }

    def _step_stream(self, x_t, caches, prep, pos,
                     skip_final_ln: bool = False, key_pad=None):
        """Whole-stack streaming decode step: one Pallas kernel over
        grid (layers, stages) with weights/caches pipelined HBM→VMEM
        (ops/pallas/decode_stream.py).  ``prep`` is the loop-invariant
        bundle from :meth:`stream_prep`; per step only the kernel and one
        cache ``dynamic_update_slice`` run.  ``key_pad`` [B, Lmax] bool
        (compat_decode_pad_mask) masks pad-token keys in-kernel; the
        current position's row is sliced out here since its key rides
        in-flight rather than in the cache."""
        from blt_vqg_tpu.ops.pallas.decode_stream import (decode_stack_step,
                                                          pick_stages)
        h = self.num_heads
        hc, fc = pick_stages(h, self.pwffn_dim)
        k_all, v_all = caches[0]
        s_wqkv, s_wout, s_wqc, s_woc, s_w1, s_w2 = prep["stacks"]
        kp = kp_cur = None
        if key_pad is not None:
            kp = key_pad.astype(jnp.float32).T                   # [Lmax, B]
            kp_cur = jax.lax.dynamic_slice_in_dim(kp, pos, 1, axis=0)
        x_out, k_new, v_new = decode_stack_step(
            x_t[:, 0], pos, prep["lns"], s_wqkv,
            s_wout, k_all, v_all, s_wqc, s_woc,
            prep["ckc"], prep["cvc"],
            prep["smask"], s_w1, prep["b1"], s_w2,
            prep["b2"], num_heads=h, cross_stages=hc, ffn_stages=fc,
            bucketed_cache=self.stream_bucketed_cache,
            weight_scales=prep["scales"],
            key_pad=kp, key_pad_cur=kp_cur)
        k_all = jax.lax.dynamic_update_slice(
            k_all, k_new[:, :, None], (0, 0, pos, 0, 0))
        v_all = jax.lax.dynamic_update_slice(
            v_all, v_new[:, :, None], (0, 0, pos, 0, 0))
        if skip_final_ln:
            return x_out[:, None], [(k_all, v_all)]
        return self.final_ln(x_out[:, None]), [(k_all, v_all)]
