"""The jitted train/eval steps.

One compiled program per phase (``latent_mode`` is static — reference
mutates ``self.latent_transformer`` mid-training instead, train_iq.py:108-111).
The step is pure: (state, batch, rng) → (state, metrics); the harness
donates ``state`` so parameters/optimizer state update in-place in HBM.

Sharding: the caller passes a Mesh; batch arrays shard their leading axis
over ``data``, params follow parallel/sharding.py rules, and XLA inserts the
gradient all-reduce (and any TP collectives) over ICI automatically.

Batch contract (canonical keys mapped from the reference's 8-key collate
dict, reference data_loader.py:175):
  images    [B, H, W, 3] float32 (already augmented/normalized on device)
  context   [B, Tc] int32 — answers or category tokens per ``input_mode``
  posterior [B, Tp] int32
  target    [B, Tq] int32 — the question
"""

from __future__ import annotations

import functools
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from blt_vqg_tpu.core.config import Config
from blt_vqg_tpu.train.losses import compute_losses
from blt_vqg_tpu.train.state import TrainState


def _loss_fn(params, state: TrainState, batch: Dict[str, jnp.ndarray],
             rng: jax.Array, cfg: Config, latent_mode: bool):
    # Frozen-backbone semantics exactly like the reference's
    # requires_grad=False (encoder_cnn.py:18-19): torch never builds the
    # conv backward graph.  stop_gradient removes the entire ResNet backward
    # from the XLA program too (the optimizer mask alone would still compute
    # those gradients and throw them away — ~2x the backbone FLOPs wasted).
    from blt_vqg_tpu.train.state import _is_frozen_path
    params = jax.tree_util.tree_map_with_path(
        lambda p, x: jax.lax.stop_gradient(x) if _is_frozen_path(p) else x,
        params)
    rngs = {"latent": jax.random.fold_in(rng, 0),
            "dropout": jax.random.fold_in(rng, 1)}
    # MoE layers sow their load-balance/router-z losses into the "moe"
    # collection (ops/moe.py); making it mutable here is what records them
    mutable = (["batch_stats", "moe"] if cfg.moe_num_experts > 1
               else ["batch_stats"])
    (logits, z_logit, kld, image_recon), updates = state.apply_fn(
        {"params": params, "batch_stats": state.batch_stats},
        batch["images"], batch["context"], batch["posterior"], batch["target"],
        latent_mode=latent_mode, train=True,
        rngs=rngs, mutable=mutable)
    out = compute_losses(
        logits, batch["target"], image_recon, kld, z_logit,
        kliter=state.kliter, latent_mode=latent_mode,
        kl_ceiling=cfg.kl_ceiling, aux_ceiling=cfg.aux_ceiling,
        image_recon_lambda=cfg.image_recon_lambda,
        full_kl_step=cfg.full_kl_step, kl_floor=cfg.kl_floor)
    loss = out.loss
    extra = {}
    if cfg.moe_num_experts > 1:
        balance, router_z = _collect_moe_losses(updates.get("moe", {}))
        loss = (loss + cfg.moe_aux_weight * balance
                + cfg.moe_router_z_weight * router_z)
        extra = {"moe_balance": balance, "moe_router_z": router_z,
                 "loss": loss}
    return loss, (out, updates["batch_stats"], extra)


def _collect_moe_losses(moe_tree) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Means of the sown per-MoE-layer balance / router-z losses (means,
    not sums, so the weights don't scale with depth)."""
    balances, zs = [], []

    def walk(path, leaf):
        # sow wraps values in tuples, so the metric name is a dict key
        # somewhere on the path, not necessarily last
        names = {str(getattr(p, "key", "")) for p in path}
        (balances if "balance" in names else zs).append(
            jnp.asarray(leaf, jnp.float32))

    jax.tree_util.tree_map_with_path(walk, moe_tree)
    mean = lambda xs: (sum(xs) / len(xs) if xs else jnp.zeros((), jnp.float32))
    return mean(balances), mean(zs)


def _step_core(state: TrainState, batch: Dict[str, jnp.ndarray],
               rng: jax.Array, cfg: Config, latent_mode: bool
               ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
    grad_fn = jax.value_and_grad(_loss_fn, has_aux=True)
    (_, (out, new_stats, extra)), grads = grad_fn(
        state.params, state, batch, rng, cfg, latent_mode)
    if cfg.grad_dtype != "float32":
        # bf16 grad storage (diet knob): the cast fuses into each dW GEMM's
        # epilogue, so the f32 gradient tree never round-trips HBM; the
        # optimizer promotes back to f32 for the moment/master math
        # (train/fused_adam.py update_params, and optax's own promotion)
        gd = jnp.dtype(cfg.grad_dtype)
        grads = jax.tree_util.tree_map(lambda g: g.astype(gd), grads)
    new_state, gnorm = state.apply_gradients_with_norm(
        grads, new_batch_stats=new_stats,
        kliter_inc=1 if latent_mode else 0)
    metrics = dict(out.as_dict())
    metrics.update(extra)  # MoE aux terms + the aux-inclusive total loss
    if cfg.log_grad_norm:
        # free in fused mode: the clip already computed the global norm
        metrics["grad_norm"] = gnorm
    if cfg.guard_nonfinite:
        from blt_vqg_tpu.core.debug import guarded_update
        # keep step/kliter advancing even on a skipped update
        guarded, metrics = guarded_update(state, new_state, metrics)
        new_state = guarded.replace(step=new_state.step,
                                    kliter=new_state.kliter)
    return new_state, metrics


def make_train_step(cfg: Config, latent_mode: bool,
                    mesh: Optional[Mesh] = None) -> Callable:
    """Returns jitted ``step(state, batch, rng) -> (state, metrics)``."""

    def step(state: TrainState, batch: Dict[str, jnp.ndarray],
             rng: jax.Array) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        return _step_core(state, batch, rng, cfg, latent_mode)

    # No explicit out_shardings: outputs inherit layouts from the sharded
    # inputs (params carry their NamedShardings; the batch is sharded by the
    # data pipeline's device_put).  Explicit output shardings additionally
    # wedge this image's experimental remote-compile path.
    del mesh
    return jax.jit(step, donate_argnums=(0,))


def make_multi_step(cfg: Config, latent_mode: bool,
                    mesh: Optional[Mesh] = None) -> Callable:
    """G train steps in ONE dispatch: ``multi(state, batches, rng)`` where
    ``batches`` is the single-step batch dict with a leading [G, ...] axis.

    The host round trip per jitted call costs multiple milliseconds on a
    tunneled/latency-bound host; a ``lax.scan`` over G steps amortizes it
    G-fold, turning the dispatch-bound small-batch train loop back into a
    compute-bound one.  Step i uses ``fold_in(rng, i)`` — identical to
    calling the single step with those keys (tested).  Returns the last
    step's metrics (the logging cadence samples, like the reference's
    per-step self.log, train_iq.py:122-128).
    """

    def multi(state: TrainState, batches: Dict[str, jnp.ndarray],
              rng: jax.Array) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        g = jax.tree_util.tree_leaves(batches)[0].shape[0]

        def body(s, xs):
            i, b = xs
            return _step_core(s, b, jax.random.fold_in(rng, i), cfg,
                              latent_mode)

        state, ms = jax.lax.scan(body, state, (jnp.arange(g), batches))
        return state, jax.tree_util.tree_map(lambda x: x[-1], ms)

    del mesh
    return jax.jit(multi, donate_argnums=(0,))


def make_eval_step(cfg: Config, latent_mode: bool,
                   mesh: Optional[Mesh] = None) -> Callable:
    """Validation forward: same losses, no grad, batch stats frozen."""

    def step(state: TrainState, batch: Dict[str, jnp.ndarray],
             rng: jax.Array) -> Dict[str, jnp.ndarray]:
        rngs = {"latent": jax.random.fold_in(rng, 0)}
        logits, z_logit, kld, image_recon = state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch["images"], batch["context"], batch["posterior"],
            batch["target"], latent_mode=latent_mode, train=False, rngs=rngs)
        out = compute_losses(
            logits, batch["target"], image_recon, kld, z_logit,
            kliter=state.kliter, latent_mode=latent_mode,
            kl_ceiling=cfg.kl_ceiling, aux_ceiling=cfg.aux_ceiling,
            image_recon_lambda=cfg.image_recon_lambda,
            full_kl_step=cfg.full_kl_step, kl_floor=cfg.kl_floor)
        metrics = dict(out.as_dict())
        if latent_mode and z_logit is not None:
            # z-head probe (VERDICT r3 #2): does the z-classifier's argmax
            # land on a word of THIS example's question?  The aux loss
            # (reference train_iq.py:92-94) trains exactly that
            za = jnp.argmax(z_logit, axis=-1)                    # [B]
            hit = jnp.any((za[:, None] == batch["target"])
                          & (batch["target"] != 0), axis=1)
            metrics["aux_acc"] = jnp.mean(hit.astype(jnp.float32))
        return metrics

    return jax.jit(step)


def make_decode_step(cfg: Config, model, latent_mode: bool,
                     with_probe: bool = True) -> Callable:
    """Jitted greedy decode: (state, images, context, rng) -> dict.

    ``with_probe=False`` is the serving variant: no per-step top-6 probe
    (the probe exists for the validation sample printer, reference
    train_iq.py:189-193)."""

    import inspect
    kwargs = {}
    sig = inspect.signature(type(model).decode_greedy).parameters
    if cfg.decode_early_stop and "early_stop" in sig:
        kwargs["early_stop"] = True
    if not with_probe and "with_probe" in sig:
        kwargs["with_probe"] = False
    zs = getattr(cfg, "decode_z_source", "prior_sample")
    if zs != "prior_sample" and "z_source" in sig:
        kwargs["z_source"] = zs
    sampling = getattr(cfg, "decode_sampling", False) and "sample" in sig
    if sampling:
        kwargs.update(sample=True, temperature=cfg.decode_temperature,
                      top_k=cfg.decode_top_k, top_p=cfg.decode_top_p)

    @functools.partial(jax.jit, static_argnums=())
    def step(state: TrainState, images, context, rng):
        rngs = {"latent": rng}
        if sampling:
            # independent stream: the token draws must not correlate with
            # the prior z draw
            rngs["sample"] = jax.random.fold_in(rng, 0x5A)
        return model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            images, context, max_decode_length=cfg.max_decode_length,
            latent_mode=latent_mode,
            method=type(model).decode_greedy,
            rngs=rngs, **kwargs)

    return step


def make_diag_decode_step(cfg: Config, model, z_source: str) -> Callable:
    """Latent-mode greedy decode with an explicit z source — the
    posterior-vs-prior decode gap instrument (VERDICT r3 #2).  Signature
    ``step(state, images, context, posterior, rng) -> {"tokens": [B, L]}``;
    ``posterior`` is ignored for prior-side sources (pass anything)."""

    uses_post = z_source.startswith("posterior")

    @functools.partial(jax.jit, static_argnums=())
    def step(state: TrainState, images, context, posterior, rng):
        return model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            images, context, max_decode_length=cfg.max_decode_length,
            latent_mode=True, with_probe=False, z_source=z_source,
            posterior=(posterior if uses_post else None),
            method=type(model).decode_greedy,
            rngs={"latent": rng})

    return step


def make_latent_diag_step(cfg: Config, model) -> Callable:
    """Jitted z-distribution diagnostics:
    ``step(state, images, context, posterior) -> dict`` (see
    IQ.latent_diagnostics)."""

    @functools.partial(jax.jit, static_argnums=())
    def step(state: TrainState, images, context, posterior):
        return model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            images, context, posterior,
            method=type(model).latent_diagnostics)

    return step


def make_beam_decode_step(cfg: Config, model, latent_mode: bool) -> Callable:
    """Jitted beam-search decode: (state, images, context, rng) -> dict with
    ``tokens`` [B, L] (best beam) and ``scores`` [B].  Used by eval paths
    when ``cfg.beam_size > 1`` (capability extension over the reference's
    greedy-only validation, train_iq.py:159-206)."""

    @functools.partial(jax.jit, static_argnums=())
    def step(state: TrainState, images, context, rng):
        return model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            images, context, beam_size=cfg.beam_size,
            max_decode_length=cfg.max_decode_length,
            latent_mode=latent_mode,
            method=type(model).decode_beam,
            rngs={"latent": rng})

    return step


def optax_global_norm(tree) -> jnp.ndarray:
    leaves = jax.tree_util.tree_leaves(tree)
    return jnp.sqrt(sum(jnp.sum(jnp.square(x.astype(jnp.float32)))
                        for x in leaves))
