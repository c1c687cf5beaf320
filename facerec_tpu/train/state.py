"""Train state + optimizer construction.

Functional redesign of the reference's mutable training plumbing: the
ArcFace progressive-margin epoch (reference face_models.py:431-433), the
two-phase backbone freeze (face_models.py:492-505), plateau LR changes
(training_utils.py:120-130) and adaptive clipping (training_utils.py:151-176)
all become *injected hyperparameters* or scalars in an immutable TrainState —
the jitted train step never retraces when they change.
"""

from __future__ import annotations

from typing import Any, Callable

import flax.struct
import jax
import jax.numpy as jnp
import optax

from facerec_tpu.config import OptimizerConfig

# Model-aware default clip norms (reference training_utils.py:151-176).
MODEL_CLIP_NORMS = {"siamese": 0.5, "attention": 0.75, "arcface": 0.3}
BACKBONE_KEYS = ("backbone",)


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    epoch: jnp.ndarray  # traced scalar driving ArcFace progressive margin
    params: Any
    batch_stats: Any
    opt_state: Any
    rng: jax.Array
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)

    def apply_gradients(self, grads):
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(
            step=self.step + 1,
            params=optax.apply_updates(self.params, updates),
            opt_state=new_opt,
        )


def _scale_backbone_grads() -> optax.GradientTransformation:
    """Multiply gradients of any subtree named in BACKBONE_KEYS by a scalar.

    With scale=0.0 this implements phase-1 backbone freezing (and, being first
    in the chain, keeps Adam moments from accumulating for frozen params —
    matching requires_grad=False semantics in the reference)."""

    def init(params):
        del params
        return optax.EmptyState()

    def update(updates, state, params=None, *, scale):
        del params

        def _scale(path, u):
            is_backbone = any(getattr(p, "key", getattr(p, "name", None)) in BACKBONE_KEYS for p in path)
            return u * scale if is_backbone else u

        return jax.tree_util.tree_map_with_path(_scale, updates), state

    return optax.GradientTransformation(init, update)


def _base_optimizer(config: OptimizerConfig, learning_rate) -> optax.GradientTransformation:
    name = config.name.lower()
    if name == "adam":
        return optax.adam(learning_rate, b1=config.beta1, b2=config.beta2)
    if name == "adamw":
        if config.amsgrad:
            # AdamW + AMSGrad (reference training.py:340-352 uses this for
            # arcface): amsgrad moments + decoupled weight decay.
            return optax.chain(
                optax.scale_by_amsgrad(b1=config.beta1, b2=config.beta2),
                optax.add_decayed_weights(config.weight_decay),
                optax.scale_by_learning_rate(learning_rate),
            )
        return optax.adamw(learning_rate, b1=config.beta1, b2=config.beta2,
                           weight_decay=config.weight_decay)
    if name == "radam":
        return optax.radam(learning_rate, b1=config.beta1, b2=config.beta2)
    if name == "sgd":
        return optax.sgd(learning_rate, momentum=config.momentum)
    raise ValueError(f"Unknown optimizer: {config.name}")


def make_optimizer(config: OptimizerConfig, model_type: str = "baseline") -> optax.GradientTransformation:
    """Build the full transform chain with injected hyperparams:
    ``learning_rate`` (scheduler-driven), ``max_norm`` (adaptive clipping),
    ``backbone_scale`` (two-phase freeze)."""

    default_clip = MODEL_CLIP_NORMS.get(model_type, config.grad_clip_norm)

    def _make(learning_rate, max_norm, backbone_scale):
        chain = [_wrap_backbone(backbone_scale)]
        if config.use_grad_clip:
            chain.append(optax.clip_by_global_norm(max_norm))
        chain.append(_base_optimizer(config, learning_rate))
        return optax.chain(*chain)

    def _wrap_backbone(scale):
        inner = _scale_backbone_grads()
        return optax.GradientTransformation(
            inner.init, lambda u, s, p=None: inner.update(u, s, p, scale=scale)
        )

    return optax.inject_hyperparams(_make)(
        learning_rate=config.learning_rate, max_norm=default_clip, backbone_scale=1.0
    )


def set_hyperparam(opt_state, name: str, value: float):
    """Update an injected hyperparam in-place-functionally (host-side, between
    epochs)."""
    opt_state.hyperparams[name] = jnp.asarray(value, jnp.float32)
    return opt_state


def create_train_state(
    model,
    init_batch: dict,
    config,
    model_type: str,
    rng: jax.Array,
    apply_fn: Callable | None = None,
) -> TrainState:
    params_rng, dropout_rng, state_rng = jax.random.split(rng, 3)
    init_rngs = {"params": params_rng, "dropout": dropout_rng}
    if model_type == "siamese":
        variables = model.init(init_rngs, init_batch["image_a"], init_batch["image_b"], train=True)
    elif model_type == "arcface":
        variables = model.init(init_rngs, init_batch["image"], labels=init_batch["label"], train=True)
    else:
        variables = model.init(init_rngs, init_batch["image"], train=True)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    tx = make_optimizer(config.optimizer, model_type)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        epoch=jnp.zeros((), jnp.float32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        rng=state_rng,
        tx=tx,
    )
