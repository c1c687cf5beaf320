"""Jitted train/eval steps, shared by the trainer, tuner, CV and LR finder.

One compiled function per (model_type, shapes); all per-epoch knobs (LR,
clip norm, backbone freeze, ArcFace margin epoch) are traced values, so the
whole run compiles exactly twice (train + eval). Data parallelism is GSPMD:
the batch arrives sharded over the mesh's ``data`` axis and XLA inserts the
gradient all-reduce (the psum the reference never had — SURVEY.md section 2.2
DP row).
"""

from __future__ import annotations

import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from facerec_tpu.models import get_criterion
from facerec_tpu.models.losses import pairwise_distance
from facerec_tpu.train.state import TrainState


def _masked_sum_count(values: jnp.ndarray, mask: jnp.ndarray | None):
    if mask is None:
        return jnp.sum(values), jnp.asarray(values.size, jnp.float32)
    m = mask.astype(jnp.float32)
    return jnp.sum(values * m), jnp.sum(m)


def _forward(model, model_type: str, params, batch_stats, batch, train: bool,
             epoch, dropout_rng=None):
    variables = {"params": params}
    if batch_stats:
        variables["batch_stats"] = batch_stats
    kwargs: dict[str, Any] = {"train": train}
    if train:
        kwargs["rngs"] = {"dropout": dropout_rng}
        kwargs["mutable"] = ["batch_stats"]
    if model_type == "siamese":
        out = model.apply(variables, batch["image_a"], batch["image_b"], **kwargs)
    elif model_type == "arcface":
        if train:
            out = model.apply(variables, batch["image"], labels=batch["label"], epoch=epoch, **kwargs)
        else:
            out = model.apply(variables, batch["image"], labels=batch["label"], **kwargs)
    else:
        out = model.apply(variables, batch["image"], **kwargs)
    if train:
        out, mutated = out
        return out, mutated.get("batch_stats", batch_stats)
    return out, batch_stats


def _batch_metrics(model_type: str, outputs, batch, threshold: float = 0.5):
    """Correct-count + count for accuracy; plus siamese same/diff splits
    (reference training.py:588-590, 659-675)."""
    mask = batch.get("mask")
    if model_type == "siamese":
        ea, eb = outputs
        dist = pairwise_distance(ea, eb)
        preds = (dist < threshold).astype(jnp.int32)
        correct = (preds == batch["pair_label"]).astype(jnp.float32)
        c, n = _masked_sum_count(correct, mask)
        same = batch["pair_label"].astype(jnp.float32)
        m = mask.astype(jnp.float32) if mask is not None else jnp.ones_like(same)
        same_c = jnp.sum(correct * same * m)
        same_n = jnp.sum(same * m)
        diff_c = jnp.sum(correct * (1 - same) * m)
        diff_n = jnp.sum((1 - same) * m)
        return {"correct": c, "count": n, "same_correct": same_c, "same_count": same_n,
                "diff_correct": diff_c, "diff_count": diff_n}
    preds = jnp.argmax(outputs, axis=-1)
    correct = (preds == batch["label"]).astype(jnp.float32)
    c, n = _masked_sum_count(correct, mask)
    return {"correct": c, "count": n}


def make_train_step(model, model_type: str, siamese_threshold: float = 0.5) -> Callable:
    loss_fn = get_criterion(model_type)

    def train_step(state: TrainState, batch: dict):
        dropout_rng = jax.random.fold_in(state.rng, state.step)

        def compute_loss(params):
            outputs, new_stats = _forward(model, model_type, params, state.batch_stats,
                                          batch, True, state.epoch, dropout_rng)
            loss = loss_fn(outputs, batch, batch.get("mask"))
            metrics = _batch_metrics(model_type, outputs, batch, siamese_threshold)
            return loss, (new_stats, metrics)

        (loss, (new_stats, metrics)), grads = jax.value_and_grad(compute_loss, has_aux=True)(state.params)
        grads = jax.tree_util.tree_map(lambda g: jnp.where(jnp.isfinite(g), g, 0.0), grads)
        new_state = state.apply_gradients(grads).replace(batch_stats=new_stats)
        gnorm = jnp.sqrt(sum(jnp.sum(g.astype(jnp.float32) ** 2) for g in jax.tree_util.tree_leaves(grads)))
        metrics = dict(metrics)
        metrics["loss_sum"] = loss * metrics["count"]
        metrics["grad_norm"] = gnorm
        return new_state, metrics

    return train_step


def make_eval_step(model, model_type: str, siamese_threshold: float = 0.5,
                   return_outputs: bool = False) -> Callable:
    loss_fn = get_criterion(model_type)

    def eval_step(state: TrainState, batch: dict):
        outputs, _ = _forward(model, model_type, state.params, state.batch_stats,
                              batch, False, state.epoch)
        loss = loss_fn(outputs, batch, batch.get("mask"))
        metrics = _batch_metrics(model_type, outputs, batch, siamese_threshold)
        metrics = dict(metrics)
        metrics["loss_sum"] = loss * metrics["count"]
        if return_outputs:
            if model_type == "siamese":
                ea, eb = outputs
                metrics["distances"] = pairwise_distance(ea, eb)
            else:
                metrics["probs"] = jax.nn.softmax(outputs.astype(jnp.float32), axis=-1)
        return metrics

    return eval_step


def jit_steps(model, model_type: str, mesh: Mesh, siamese_threshold: float = 0.5,
              return_eval_outputs: bool = False):
    """Compile train/eval steps with GSPMD shardings: state replicated, batch
    sharded on the data axis, donated state buffers."""
    repl = NamedSharding(mesh, P())

    train_step = jax.jit(
        make_train_step(model, model_type, siamese_threshold),
        donate_argnums=0,
        out_shardings=(None, repl),
    )
    eval_step = jax.jit(
        make_eval_step(model, model_type, siamese_threshold, return_eval_outputs),
    )
    return train_step, eval_step
