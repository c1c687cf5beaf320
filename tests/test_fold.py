"""Serve-time BatchNorm folding (models/fold.py): the folded eval path must
reproduce the unfolded eval path exactly (up to float rounding) with the BN
running statistics baked into the producer kernels."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from facerec_tpu.models import ResNet18, get_model
from facerec_tpu.models.fold import fold_batchnorm


def _randomize_bn(variables, rng):
    """Give BN layers non-trivial running stats and affine params so the fold
    is load-bearing (fresh inits are mean=0/var=1/scale=1/bias=0 — identity)."""

    def walk(params, stats):
        for k, v in list(params.items()):
            if isinstance(v, dict) and "scale" in v and k in stats and "mean" in stats[k]:
                n = np.asarray(v["scale"]).shape[0]
                v["scale"] = jnp.asarray(rng.uniform(0.5, 1.5, n).astype(np.float32))
                v["bias"] = jnp.asarray(rng.normal(0, 0.3, n).astype(np.float32))
                stats[k]["mean"] = jnp.asarray(rng.normal(0, 0.5, n).astype(np.float32))
                stats[k]["var"] = jnp.asarray(rng.uniform(0.3, 2.0, n).astype(np.float32))
            elif isinstance(v, dict):
                walk(v, stats.get(k, {}))

    walk(variables["params"], variables["batch_stats"])
    return variables


def test_resnet18_fold_matches_eval():
    rng = np.random.default_rng(0)
    model = ResNet18()
    x = jnp.asarray(rng.normal(0, 1, (2, 64, 64, 3)).astype(np.float32))
    variables = model.init(jax.random.key(0), x)
    variables = _randomize_bn(
        {"params": jax.tree.map(np.asarray, variables["params"]),
         "batch_stats": jax.tree.map(np.asarray, variables["batch_stats"])}, rng)
    ref = model.apply(variables, x, train=False)
    folded_vars = fold_batchnorm(variables)
    assert not folded_vars.get("batch_stats")
    folded_model = ResNet18(folded=True)
    out = folded_model.apply(folded_vars, x, train=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4, rtol=2e-4)


def test_arcface_embed_fold_matches_eval():
    rng = np.random.default_rng(1)
    model = get_model("arcface", num_classes=6)
    x = jnp.asarray(rng.normal(0, 1, (3, 64, 64, 3)).astype(np.float32))
    variables = model.init(
        {"params": jax.random.key(1), "dropout": jax.random.key(2)},
        x, labels=jnp.zeros(3, jnp.int32), train=True)
    variables = _randomize_bn(
        {"params": jax.tree.map(np.asarray, variables["params"]),
         "batch_stats": jax.tree.map(np.asarray, variables["batch_stats"])}, rng)
    ref = model.apply({"params": variables["params"],
                       "batch_stats": variables["batch_stats"]}, x, method="embed")
    folded_vars = fold_batchnorm(variables)
    folded_model = get_model("arcface", num_classes=6, arcface_kwargs={"folded": True})
    out = folded_model.apply(folded_vars, x, method="embed")
    # embeddings are L2-normalized; cosine agreement is the serving contract
    cos = np.sum(np.asarray(out) * np.asarray(ref), axis=-1)
    assert float(np.min(cos)) > 1 - 1e-6
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_folded_model_rejects_train():
    model = get_model("arcface", num_classes=4, arcface_kwargs={"folded": True})
    x = jnp.zeros((1, 32, 32, 3))
    with pytest.raises(ValueError, match="eval-only"):
        model.init({"params": jax.random.key(0), "dropout": jax.random.key(1)},
                   x, labels=jnp.zeros(1, jnp.int32), train=True)


def test_fold_rejects_orphan_bn():
    with pytest.raises(ValueError, match="no foldable producer"):
        fold_batchnorm({
            "params": {"bn1": {"scale": np.ones(4), "bias": np.zeros(4)}},
            "batch_stats": {"bn1": {"mean": np.zeros(4), "var": np.ones(4)}},
        })


def test_fold_rejects_missing_stats():
    """A stats-less tree (e.g. a checkpoint without batch_stats) must raise,
    not silently skip the fold and serve wrong embeddings."""
    model = get_model("arcface", num_classes=4)
    x = jnp.zeros((1, 32, 32, 3))
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        x, labels=jnp.zeros(1, jnp.int32), train=True)
    with pytest.raises(ValueError, match="no batch_stats"):
        fold_batchnorm({"params": variables["params"]})
    with pytest.raises(ValueError, match="no batch_stats"):
        fold_batchnorm({"params": variables["params"], "batch_stats": {}})


def test_folded_arcface_helper_matches_eval():
    """folded_arcface (the shared serve recipe) == the manual fold path."""
    from facerec_tpu.models.fold import folded_arcface

    rng = np.random.default_rng(2)
    model = get_model("arcface", num_classes=5)
    x = jnp.asarray(rng.normal(0, 1, (2, 64, 64, 3)).astype(np.float32))
    variables = model.init(
        {"params": jax.random.key(5), "dropout": jax.random.key(6)},
        x, labels=jnp.zeros(2, jnp.int32), train=True)
    variables = _randomize_bn(
        {"params": jax.tree.map(np.asarray, variables["params"]),
         "batch_stats": jax.tree.map(np.asarray, variables["batch_stats"])}, rng)
    ref = model.apply({"params": variables["params"],
                       "batch_stats": variables["batch_stats"]}, x, method="embed")
    folded_model, folded_vars = folded_arcface(5, variables, compute_dtype="float32")
    out = folded_model.apply(folded_vars, x, method="embed")
    cos = np.sum(np.asarray(out) * np.asarray(ref), axis=-1)
    assert float(np.min(cos)) > 1 - 1e-6


def test_facenet_fold_matches_eval():
    """InceptionResnetV1 (facenet-pytorch BN eps=1e-3) folded-vs-eval parity
    on a reduced-repeat network."""
    from facerec_tpu.models.facenet import InceptionResnetV1

    rng = np.random.default_rng(4)
    net = InceptionResnetV1(repeats=(1, 1, 1))
    x = jnp.asarray(rng.normal(0, 1, (2, 160, 160, 3)).astype(np.float32) * 60 + 120)
    variables = net.init(jax.random.key(3), x)
    variables = _randomize_bn(
        {"params": jax.tree.map(np.asarray, variables["params"]),
         "batch_stats": jax.tree.map(np.asarray, variables["batch_stats"])}, rng)
    ref = net.apply(variables, x)
    folded_vars = fold_batchnorm(variables, eps=1e-3)
    out = InceptionResnetV1(repeats=(1, 1, 1), folded=True).apply(folded_vars, x)
    cos = np.sum(np.asarray(out) * np.asarray(ref), axis=-1)
    assert float(np.min(cos)) > 1 - 1e-6
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)
