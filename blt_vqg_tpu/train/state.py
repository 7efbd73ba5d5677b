"""Train state: one pytree carrying params, batch stats, optimizer state,
step counters, and the KL-anneal counter.

The optimizer is Adam + global-norm clip 5 (reference train_iq.py:259-261,
372) on the Noam schedule (train/schedule.py), with the frozen ResNet
backbone excluded by a path mask — the TPU-native equivalent of the
reference's ``requires_grad=False`` freeze (reference encoder_cnn.py:18-19).

The two-phase switch (reference train_iq.py:105-111): ``kliter`` counts
latent-phase steps for the KL anneal, and ``reset_optimizer`` re-initializes
Adam moments at the phase boundary — the reference *intends* this restart
(its ``configure_optimizers()`` call at the boundary; SURVEY.md §2.7 notes
the returned optimizer is never installed — an acknowledged quirk we
implement by intent, not by bug).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from blt_vqg_tpu.core.config import Config
from blt_vqg_tpu.train.schedule import noam_schedule


def _is_frozen_path(path) -> bool:
    """The CNN backbone is frozen; only its fc head + feature BN train."""
    keys = [getattr(p, "key", None) for p in path]
    return "encoder_cnn" in keys and "backbone" in keys


def _is_f32_consumed_path(path) -> bool:
    """Leaves whose module computes in f32 (the vocab heads,
    models/iq.py:84-92 ``dtype=jnp.float32``) — these stay f32 under the
    ``param_dtype="bfloat16"`` mixed-precision diet, because bf16 storage
    WOULD change their math.  Every other module computes in bf16, so it
    sees bf16(param) either way and the forward is value-identical."""
    keys = [getattr(p, "key", None) for p in path]
    return "output_proj" in keys or "z_classifier" in keys


def make_optimizer(cfg: Config, params: Any):
    """Clip + Adam moments; the Noam LR is applied in ``apply_gradients``
    from the GLOBAL step (exactly the reference's per-step param_group poke,
    train_iq.py:130, 252-257) — so the phase-boundary Adam restart resets
    moments but the LR keeps decaying on the global clock, as it does when
    the reference pokes ``self.trainer.global_step`` into a fresh Adam.

    Default is the FUSED clip+Adam+LR+apply pass (train/fused_adam.py):
    one read-modify-write per tensor instead of the optax chain's many tree
    passes — bit-parity-tested against the chain, which remains available
    via ``cfg.fused_adam=False``."""
    mu_dtype = jnp.dtype(getattr(cfg, "adam_mu_dtype", "float32"))
    mixed = jnp.dtype(getattr(cfg, "param_dtype", "float32")) == jnp.bfloat16
    if getattr(cfg, "fused_adam", True):
        from blt_vqg_tpu.train.fused_adam import FusedClipAdam
        # param_dtype="bfloat16": store params bf16, keep an f32 master in
        # the optimizer for every bf16-stored trainable leaf; the f32-
        # consumed vocab heads stay f32 (forward stays value-identical —
        # only grad/optimizer precision changes).  HBM diet: halves the
        # param reads of fwd+bwd and the grad write/read.
        return FusedClipAdam(
            cfg.grad_clip, _is_frozen_path, mu_dtype=mu_dtype,
            master_fn=((lambda p: not _is_f32_consumed_path(p)) if mixed
                       else None),
            factored_nu=getattr(cfg, "adam_factored_nu", False))
    if mixed:
        raise ValueError("param_dtype='bfloat16' requires fused_adam=True "
                         "(the optax chain has no f32 master copy)")
    if getattr(cfg, "adam_factored_nu", False):
        raise ValueError("adam_factored_nu requires fused_adam=True "
                         "(the optax chain has no factored second moment)")
    label = jax.tree_util.tree_map_with_path(
        lambda path, _: "frozen" if _is_frozen_path(path) else "train", params)
    trainable = optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip),
        optax.scale_by_adam(mu_dtype=mu_dtype),
        optax.scale(-1.0),
    )
    return optax.multi_transform(
        {"train": trainable, "frozen": optax.set_to_zero()}, label)


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    kliter: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    apply_fn: Callable = struct.field(pytree_node=False)
    lr_fn: Callable = struct.field(pytree_node=False)

    def apply_gradients(self, grads: Any, new_batch_stats: Optional[Any] = None,
                        kliter_inc: int = 0) -> "TrainState":
        state, _ = self.apply_gradients_with_norm(grads, new_batch_stats,
                                                  kliter_inc)
        return state

    def apply_gradients_with_norm(
            self, grads: Any, new_batch_stats: Optional[Any] = None,
            kliter_inc: int = 0) -> tuple:
        """Returns ``(new_state, grad_norm)``.  In fused mode the global
        grad norm is a byproduct of the clip — logging it is free."""
        from blt_vqg_tpu.train.fused_adam import FusedClipAdam, global_norm
        # LR from the global step — the reference's per-step lr poke
        lr = self.lr_fn(self.step)
        if isinstance(self.tx, FusedClipAdam):
            new_params, new_opt_state, gnorm = self.tx.update_params(
                self.params, grads, self.opt_state, lr)
        else:
            updates, new_opt_state = self.tx.update(
                grads, self.opt_state, self.params)
            updates = jax.tree_util.tree_map(
                lambda u: (lr * u.astype(jnp.float32)).astype(u.dtype),
                updates)
            new_params = optax.apply_updates(self.params, updates)
            # Trainable-leaf norm only (the frozen CNN's nonzero grads are
            # excluded), matching both the norm the masked optax clip
            # actually used and the fused path's metric.
            gnorm = global_norm(jax.tree_util.tree_map_with_path(
                lambda pth, g: None if _is_frozen_path(pth) else g, grads))
        new_state = self.replace(
            step=self.step + 1,
            kliter=self.kliter + kliter_inc,
            params=new_params,
            batch_stats=(new_batch_stats if new_batch_stats is not None
                         else self.batch_stats),
            opt_state=new_opt_state,
        )
        return new_state, gnorm

    def reset_optimizer(self) -> "TrainState":
        """Adam restart at the pretrain→latent phase boundary.  Mixed-
        precision masters survive the restart (only the moments reset) —
        re-deriving them from bf16 storage would drop accumulated
        precision."""
        from blt_vqg_tpu.train.fused_adam import FusedAdamState
        new_opt = self.tx.init(self.params)
        if (isinstance(new_opt, FusedAdamState)
                and isinstance(self.opt_state, FusedAdamState)):
            new_opt = new_opt._replace(master=self.opt_state.master)
        return self.replace(opt_state=new_opt)


def create_train_state(cfg: Config, model, rng: jax.Array,
                       sample_batch: dict, glove_table=None) -> TrainState:
    """Initializes params (through the FULL latent path so both phases share
    one pytree) and the optimizer.

    ``glove_table`` applies the GloVe embedding surgery (reference
    iq.py:57-74) BEFORE the optimizer snapshot, so mixed-precision f32
    masters are built from the final full-precision values."""
    init_rngs = {"params": rng,
                 "latent": jax.random.fold_in(rng, 1),
                 "dropout": jax.random.fold_in(rng, 2)}

    # jit the init: eager init dispatches thousands of tiny ops (very slow
    # over a tunneled TPU); compiled init materializes params in one program
    @jax.jit
    def _init(rngs, images, context, posterior, target):
        return model.init(rngs, images, context, posterior, target,
                          latent_mode=True, train=False)

    variables = _init(
        init_rngs,
        sample_batch["images"], sample_batch["context"],
        sample_batch["posterior"], sample_batch["target"])
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    if glove_table is not None:
        from blt_vqg_tpu.models.iq import apply_glove_table
        params = apply_glove_table(params, glove_table)
    tx = make_optimizer(cfg, params)
    opt_state = tx.init(params)  # masters snapshot the f32 params
    if hasattr(tx, "cast_params"):
        params = tx.cast_params(params)  # bf16 storage (no-op for f32 cfg)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        kliter=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=opt_state,
        tx=tx,
        apply_fn=model.apply,
        lr_fn=noam_schedule(cfg.hidden_dim, cfg.warmup_steps),
    )
