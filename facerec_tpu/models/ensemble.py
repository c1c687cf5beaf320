"""EnsembleModel — multi-architecture prediction combiner
(reference face_models.py:843-957).

Methods: 'average', 'weighted' (softmaxed learnable weights), 'max'
(per-class max of member probabilities, returned as log-probs), 'attention'
(small MLP over member weights -> softmax). ArcFace members contribute cosine
logits vs their normalized class centers (reference :889-893); Siamese
members are skipped (:894-897). ``embed`` concatenates member embeddings
(:922-940).

All members run in eval mode inside the ensemble (reference :880-882), i.e.
BatchNorm running averages and no dropout — only the combiner weights train.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp


class EnsembleModel(nn.Module):
    members: Sequence[nn.Module]
    member_types: Sequence[str]
    ensemble_method: str = "average"
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    def setup(self):
        n = len(self.members)
        if self.ensemble_method in ("weighted", "attention"):
            self.weights = self.param("weights", lambda k, s: jnp.full(s, 1.0 / n), (n,), self.param_dtype)
        if self.ensemble_method == "attention":
            self.attn1 = nn.Dense(64, dtype=self.dtype, param_dtype=self.param_dtype, name="attn1")
            self.attn2 = nn.Dense(n, dtype=self.dtype, param_dtype=self.param_dtype, name="attn2")

    def _member_logits(self, x) -> list[jnp.ndarray]:
        outputs = []
        for m, t in zip(self.members, self.member_types):
            if t == "siamese":  # verification-only member: no class logits
                continue
            if t == "arcface":
                outputs.append(m(x, labels=jnp.zeros(x.shape[0], jnp.int32), train=False))
            else:
                outputs.append(m(x, train=False))
        return outputs

    def __call__(self, x, train: bool = False):
        outputs = self._member_logits(x)
        if len(outputs) == 1:
            return outputs[0]
        stacked = jnp.stack(outputs)  # [M, B, C]
        if self.ensemble_method == "average":
            return jnp.mean(stacked, axis=0)
        if self.ensemble_method == "weighted":
            w = nn.softmax(self.weights, axis=0)
            return jnp.einsum("m,mbc->bc", w, stacked)
        if self.ensemble_method == "attention":
            w = nn.softmax(self.attn2(nn.relu(self.attn1(nn.softmax(self.weights)))), axis=0)
            return jnp.einsum("m,mbc->bc", w, stacked)
        if self.ensemble_method == "max":
            probs = nn.softmax(stacked, axis=-1)
            return jnp.log(jnp.max(probs, axis=0) + 1e-12)
        raise ValueError(f"Unknown ensemble method: {self.ensemble_method}")

    def embed(self, x, train: bool = False):
        embs = [m.embed(x, train=False) for m in self.members]
        return jnp.concatenate(embs, axis=-1)


def create_pretrained_ensemble(
    member_names: dict[str, str],
    num_classes: int,
    checkpoints_root=None,
    ensemble_method: str = "average",
    compute_dtype: str = "float32",
    image_size: int = 224,
):
    """Build an ensemble whose members carry their own trained ``best``
    checkpoints — the reference's *intent* for ensembles (pretrained members,
    face_models.py:942-957), which its from-scratch construction never
    delivered (training an ensemble end-to-end with eval-mode members leaves
    the members frozen at random init — documented in docs/COMPARE.md).

    ``member_names``: model_type -> model_name (checkpoint dir under
    ``checkpoints_root``). Returns ``(model, variables)`` ready for
    evaluation or combiner-only fine-tuning.
    """
    import jax

    from facerec_tpu.config import CHECKPOINTS_DIR
    from facerec_tpu.models import create_ensemble
    from facerec_tpu.train.checkpoints import load_checkpoint

    from pathlib import Path

    root = Path(checkpoints_root or CHECKPOINTS_DIR)
    model_types = list(member_names)
    ens = create_ensemble(model_types, num_classes, ensemble_method, compute_dtype)
    x = jnp.zeros((1, image_size, image_size, 3), jnp.float32)
    variables = ens.init({"params": jax.random.key(0), "dropout": jax.random.key(1)}, x, train=False)
    params = dict(variables["params"])
    stats = dict(variables.get("batch_stats", {}))
    for i, (mt, name) in enumerate(member_names.items()):
        ck = load_checkpoint(root / name)  # best -> final fallback
        params[f"members_{i}"] = ck["params"]
        if ck.get("batch_stats"):
            stats[f"members_{i}"] = ck["batch_stats"]
    return ens, {"params": params, "batch_stats": stats}
