"""Reference-face gallery store (reference app.py:67-123 save_refs/load_refs).

Host-side bookkeeping around a capacity-padded, **device-resident** embedding
matrix: entries occupy a valid prefix of ``capacity`` (compacted on delete) so
the matching kernel's ``count`` mask stays a prefix (ops/gallery.py). The
matrix lives in HBM (optionally sharded over the mesh's ``model`` axis) and is
updated functionally on add/remove — ``identify()`` never re-uploads it
(a host-numpy gallery passed as a jit argument re-transferred ~2 MB per frame
batch, the exact measurement trap CLAUDE.md documents). Persistence keeps the
reference's on-disk contract: a pickle mapping name -> embedding plus one JPEG
per reference face in ``face_references/``.
"""

from __future__ import annotations

import pickle
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from facerec_tpu.config import FACE_REFERENCES_DIR


class GalleryStore:
    """``sharding``: optional :class:`jax.sharding.NamedSharding` (e.g.
    ``parallel.mesh.gallery_sharding``) pinning the matrix layout; mutations
    re-place the matrix so the sharding survives functional updates."""

    def __init__(self, capacity: int = 1024, dim: int = 512, sharding=None,
                 dtype=jnp.float32):
        self.capacity = capacity
        self.dim = dim
        self.sharding = sharding
        # Device-resident storage dtype. bf16 halves the HBM bytes the match
        # kernel sweeps per batch (the bound stage at production gallery
        # scale); normalization always happens in f32 on host, and the
        # on-disk pickle contract stays f32 (save() upcasts).
        self.dtype = jnp.dtype(dtype)
        self.embeddings = self._place(jnp.zeros((capacity, dim), self.dtype))
        self.names: list[str] = []
        self._count_dev = jnp.asarray(0, jnp.int32)

    def _place(self, arr: jnp.ndarray) -> jnp.ndarray:
        return jax.device_put(arr, self.sharding) if self.sharding is not None else arr

    @property
    def count(self) -> int:
        return len(self.names)

    @property
    def count_device(self) -> jnp.ndarray:
        """Device-resident valid-prefix length (avoids a per-call H->D scalar
        transfer in the serve step)."""
        return self._count_dev

    def _set_count(self) -> None:
        self._count_dev = jnp.asarray(self.count, jnp.int32)

    def add(self, name: str, embedding: np.ndarray) -> int:
        if self.count >= self.capacity:
            raise ValueError(f"gallery full (capacity {self.capacity})")
        emb = np.asarray(embedding, np.float32).reshape(-1)
        if emb.shape[0] != self.dim:
            raise ValueError(f"expected dim {self.dim}, got {emb.shape[0]}")
        emb = emb / max(np.linalg.norm(emb), 1e-12)
        self.embeddings = self._place(
            self.embeddings.at[self.count].set(jnp.asarray(emb, self.dtype)))
        self.names.append(name)
        self._set_count()
        return self.count - 1

    def add_many(self, names: list[str], embeddings: np.ndarray) -> list[int]:
        """Bulk enrollment with ONE device upload + ONE fused update.

        ``add()`` costs one eager ``.at[].set`` dispatch per reference —
        enrolling a 512-identity gallery that way is ~512 runtime round
        trips. Here the whole block is normalized on host, uploaded once,
        and spliced into the valid prefix with a single dynamic_update_slice
        (mirrors ``load()``'s bulk path for the enrollment case)."""
        if not names:
            return []
        embs = np.asarray(embeddings, np.float32).reshape(len(names), -1)
        if embs.shape[1] != self.dim:
            raise ValueError(f"expected dim {self.dim}, got {embs.shape[1]}")
        if self.count + len(names) > self.capacity:
            raise ValueError(
                f"gallery full: {self.count}+{len(names)} > capacity {self.capacity}")
        embs = embs / np.maximum(np.linalg.norm(embs, axis=1, keepdims=True), 1e-12)
        start = self.count
        self.embeddings = self._place(jax.lax.dynamic_update_slice_in_dim(
            self.embeddings, jnp.asarray(embs, self.dtype), start, 0))
        self.names.extend(str(n) for n in names)
        self._set_count()
        return list(range(start, self.count))

    def add_many_device(self, names: list[str], embeddings: jnp.ndarray) -> list[int]:
        """Bulk enrollment from DEVICE-resident embeddings.

        The natural source of embeddings at enrollment time is the serve
        pipeline's own embed stage, whose output already lives in HBM —
        round-tripping it through host numpy (``add_many``) costs two
        transfers per enrollment. At production scale the difference is the
        whole game: a 1,048,576 x 512 f32 gallery is a 2 GB host upload
        (~3 min through the remote-attached tunnel) vs milliseconds of
        on-device normalize + splice. Normalization runs in f32 on device,
        mirroring ``add_many``'s host math."""
        if not names:
            return []
        if embeddings.ndim != 2 or embeddings.shape != (len(names), self.dim):
            raise ValueError(
                f"expected [{len(names)}, {self.dim}] embeddings, got {embeddings.shape}")
        if self.count + len(names) > self.capacity:
            raise ValueError(
                f"gallery full: {self.count}+{len(names)} > capacity {self.capacity}")
        emb = embeddings.astype(jnp.float32)
        emb = emb / jnp.maximum(jnp.linalg.norm(emb, axis=1, keepdims=True), 1e-12)
        start = self.count
        self.embeddings = self._place(jax.lax.dynamic_update_slice_in_dim(
            self.embeddings, emb.astype(self.dtype), start, 0))
        self.names.extend(str(n) for n in names)
        self._set_count()
        return list(range(start, self.count))

    def remove(self, name: str) -> bool:
        if name not in self.names:
            return False
        i = self.names.index(name)
        c = self.count
        # compact: shift the tail down one slot so valid entries stay a prefix
        if i < c - 1:
            tail = jax.lax.dynamic_slice_in_dim(self.embeddings, i + 1, c - 1 - i, 0)
            self.embeddings = jax.lax.dynamic_update_slice_in_dim(self.embeddings, tail, i, 0)
        self.embeddings = self._place(self.embeddings.at[c - 1].set(0.0))
        self.names.pop(i)
        self._set_count()
        return True

    def rename(self, old: str, new: str) -> bool:
        if old not in self.names:
            return False
        self.names[self.names.index(old)] = new
        return True

    def clear(self) -> None:
        self.names.clear()
        self.embeddings = self._place(jnp.zeros_like(self.embeddings))
        self._set_count()

    def name_of(self, index: int) -> str:
        return self.names[index] if 0 <= index < self.count else "Unknown"

    # -- persistence (reference face_references/ contract) ---------------------
    def save(self, directory: str | Path | None = None, images: dict[str, np.ndarray] | None = None) -> Path:
        d = Path(directory or FACE_REFERENCES_DIR)
        d.mkdir(parents=True, exist_ok=True)
        host = np.asarray(jax.device_get(
            self.embeddings[: self.count].astype(jnp.float32)))
        refs = {n: host[i].copy() for i, n in enumerate(self.names)}
        with (d / "face_references.pkl").open("wb") as f:
            pickle.dump(refs, f)
        if images:
            from PIL import Image

            for n, img in images.items():
                Image.fromarray(np.asarray(img, np.uint8)).save(d / f"{n}.jpg")
        return d

    @classmethod
    def load(cls, directory: str | Path | None = None, capacity: int = 1024,
             sharding=None, dtype=jnp.float32) -> "GalleryStore":
        d = Path(directory or FACE_REFERENCES_DIR)
        pkl = d / "face_references.pkl"
        if not pkl.exists():
            return cls(capacity=capacity, sharding=sharding, dtype=dtype)
        with pkl.open("rb") as f:
            refs = pickle.load(f)
        store: "GalleryStore" | None = None
        rows: list[np.ndarray] = []
        for name, emb in refs.items():
            emb = np.asarray(emb, np.float32).reshape(-1)
            if store is None:
                store = cls(capacity=capacity, dim=emb.shape[0], sharding=sharding,
                            dtype=dtype)
            n = emb / max(float(np.linalg.norm(emb)), 1e-12)
            rows.append(n)
            store.names.append(str(name))
        if store is None:
            return cls(capacity=capacity, sharding=sharding, dtype=dtype)
        # one bulk upload instead of per-row .at[].set dispatches
        mat = np.zeros((store.capacity, store.dim), np.float32)
        mat[: len(rows)] = np.stack(rows)
        store.embeddings = store._place(jnp.asarray(mat, store.dtype))
        store._set_count()
        return store
