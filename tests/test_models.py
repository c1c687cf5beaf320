"""Model-zoo unit tests: shapes, determinism, embedding contracts, ArcFace
margin math vs a NumPy oracle (SURVEY.md section 4 recommended strategy)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from facerec_tpu.models import MODEL_TYPES, get_criterion, get_model
from facerec_tpu.ops.arcface import arc_margin_logits, cosine_logits, progressive_factors

B, H, C = 4, 64, 5


def _init_and_apply(model_type, x, labels=None):
    m = get_model(model_type, num_classes=C)
    rngs = {"params": jax.random.key(0), "dropout": jax.random.key(1)}
    if model_type == "siamese":
        v = m.init(rngs, x, x, train=True)
        out, _ = m.apply(v, x, x, train=True, rngs={"dropout": jax.random.key(2)}, mutable=["batch_stats"])
    elif model_type == "arcface":
        v = m.init(rngs, x, labels=labels, train=True)
        out, _ = m.apply(v, x, labels=labels, epoch=2.0, train=True,
                         rngs={"dropout": jax.random.key(2)}, mutable=["batch_stats"])
    else:
        v = m.init(rngs, x, train=True)
        out, _ = m.apply(v, x, train=True, rngs={"dropout": jax.random.key(2)}, mutable=["batch_stats"])
    return m, v, out


@pytest.fixture(scope="module")
def x():
    return jnp.asarray(np.random.default_rng(0).normal(size=(B, H, H, 3)).astype(np.float32))


@pytest.fixture(scope="module")
def labels():
    return jnp.asarray([0, 1, 2, 3])


@pytest.mark.parametrize("model_type", ["baseline", "cnn", "attention", "hybrid"])
def test_classifier_shapes(model_type, x):
    m, v, out = _init_and_apply(model_type, x)
    assert out.shape == (B, C)
    emb = m.apply(v, x, method="embed")
    assert emb.shape == (B, 512)
    # eval forward is deterministic
    a = m.apply(v, x, train=False)
    b = m.apply(v, x, train=False)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_siamese_contract(x):
    m, v, (ea, eb) = _init_and_apply("siamese", x)
    assert ea.shape == (B, 256) and eb.shape == (B, 256)
    # embeddings are L2-normalized (reference face_models.py:179)
    e = m.apply(v, x, method="embed")
    np.testing.assert_allclose(np.linalg.norm(np.asarray(e), axis=-1), 1.0, atol=1e-5)
    # twin shares weights: same input -> same embedding
    oa, ob = m.apply(v, x, x, train=False)
    np.testing.assert_allclose(np.asarray(oa), np.asarray(ob), atol=1e-6)


def test_arcface_paths(x, labels):
    m, v, logits = _init_and_apply("arcface", x, labels)
    assert logits.shape == (B, C)
    emb = m.apply(v, x)  # eval, no labels -> normalized embeddings
    assert emb.shape == (B, 512)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(emb), axis=-1), 1.0, atol=1e-5)
    ev = m.apply(v, x, labels=labels)  # eval logits = cosine vs centers
    assert ev.shape == (B, C)
    assert np.all(np.abs(np.asarray(ev)) <= 1.0 + 1e-5)


def test_ensemble(x):
    m = get_model("ensemble", num_classes=C)
    v = m.init({"params": jax.random.key(0)}, x)
    out = m.apply(v, x)
    assert out.shape == (B, C)
    emb = m.apply(v, x, method="embed")
    assert emb.shape == (B, 512 * 3)


def test_arc_margin_numpy_oracle():
    """Fused margin op vs a straight NumPy transcription of the reference
    semantics (face_models.py:334-427)."""
    rng = np.random.default_rng(1)
    emb = rng.normal(size=(8, 16)).astype(np.float32)
    w = rng.normal(size=(C, 16)).astype(np.float32)
    y = rng.integers(0, C, size=8)
    margin, scale, epoch, warm = 0.5, 32.0, 4, 10

    got, stats = arc_margin_logits(jnp.asarray(emb), jnp.asarray(w), jnp.asarray(y),
                                   float(epoch), margin=margin, scale=scale,
                                   easy_margin=False, progressive=True,
                                   warmup_epochs=warm, training=True)

    xn = emb / np.linalg.norm(emb, axis=1, keepdims=True)
    wn = w / np.linalg.norm(w, axis=1, keepdims=True)
    cos = np.clip(xn @ wn.T, -1 + 1e-7, 1 - 1e-7)
    progress = epoch / warm
    mf = min(0.9, progress * progress)
    sf = min(0.8, 0.3 + 0.5 * progress)
    theta = np.arccos(cos)
    phi = np.cos(np.minimum(np.pi - 1e-4, theta + margin * mf))
    one_hot = np.eye(C, dtype=bool)[y]
    out = np.where(one_hot, phi, cos)
    eff_scale = min(scale, 24.0) * min(0.8, sf)
    if margin > 0.4:
        eff_scale *= 0.8 - 0.5 * mf
    expect = out * eff_scale

    np.testing.assert_allclose(np.asarray(got), expect, rtol=1e-5, atol=1e-5)
    assert abs(float(stats.margin_factor) - mf) < 1e-6
    assert abs(float(stats.scale_factor) - sf) < 1e-6


def test_arc_margin_eval_is_scaled_cosine():
    rng = np.random.default_rng(2)
    emb = rng.normal(size=(4, 16)).astype(np.float32)
    w = rng.normal(size=(C, 16)).astype(np.float32)
    got, _ = arc_margin_logits(jnp.asarray(emb), jnp.asarray(w), None, 0.0,
                               margin=0.5, scale=32.0, training=False)
    cosd = cosine_logits(jnp.asarray(emb), jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(got), np.clip(np.asarray(cosd), -1 + 1e-7, 1 - 1e-7) * 24.0,
                               rtol=1e-5, atol=1e-5)


def test_progressive_factors_post_warmup():
    mf, sf = progressive_factors(jnp.asarray(25.0), 10)
    assert float(mf) == pytest.approx(0.9)
    assert float(sf) == pytest.approx(0.8)


def test_criterion_selection():
    for t in MODEL_TYPES:
        assert callable(get_criterion(t))
    with pytest.raises(ValueError):
        get_criterion("nope")


def test_inception_resnet_v1_contract():
    from facerec_tpu.models.facenet import InceptionResnetV1, fixed_standardize

    m = InceptionResnetV1()
    x = jnp.asarray(np.random.default_rng(0).uniform(0, 255, (2, 160, 160, 3)).astype(np.float32))
    v = m.init({"params": jax.random.key(0), "dropout": jax.random.key(1)}, fixed_standardize(x))
    emb = m.apply(v, fixed_standardize(x))
    assert emb.shape == (2, 512)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(emb), axis=-1), 1.0, atol=1e-4)


def test_pretrained_ensemble_from_checkpoints(tmp_path):
    """create_pretrained_ensemble grafts each member's best checkpoint into
    the ensemble tree; the ensemble's average logits equal the mean of the
    members' own logits (VERDICT round-1 item 8)."""
    import jax

    from facerec_tpu.models import get_model
    from facerec_tpu.models.ensemble import create_pretrained_ensemble
    from facerec_tpu.train.checkpoints import save_checkpoint

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)
    member_types = {"baseline": "b_v1", "cnn": "c_v1"}
    member_out = []
    for i, (mt, name) in enumerate(member_types.items()):
        m = get_model(mt, num_classes=3)
        v = m.init({"params": jax.random.key(i), "dropout": jax.random.key(10 + i)},
                   x, train=False)
        save_checkpoint(tmp_path / name, "best", v["params"], v.get("batch_stats", {}))
        member_out.append(np.asarray(m.apply(v, x, train=False)))

    ens, variables = create_pretrained_ensemble(member_types, 3, checkpoints_root=tmp_path,
                                                image_size=32)
    got = np.asarray(ens.apply(variables, x, train=False))
    np.testing.assert_allclose(got, np.mean(member_out, axis=0), atol=1e-5)
