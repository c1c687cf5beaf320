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
