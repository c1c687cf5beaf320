"""Reference-face gallery store (reference app.py:67-123 save_refs/load_refs).

Host-side bookkeeping around a capacity-padded, HBM-resident embedding matrix:
entries occupy a valid prefix of ``capacity`` (compacted on delete) so the
matching kernel's ``count`` mask stays a prefix (ops/gallery.py). Persistence
keeps the reference's on-disk contract: a pickle mapping name -> embedding
plus one JPEG per reference face in ``face_references/``.
"""

from __future__ import annotations

import pickle
from pathlib import Path

import numpy as np

from facerec_tpu.config import FACE_REFERENCES_DIR


class GalleryStore:
    def __init__(self, capacity: int = 1024, dim: int = 512):
        self.capacity = capacity
        self.dim = dim
        self.embeddings = np.zeros((capacity, dim), np.float32)
        self.names: list[str] = []

    @property
    def count(self) -> int:
        return len(self.names)

    def add(self, name: str, embedding: np.ndarray) -> int:
        if self.count >= self.capacity:
            raise ValueError(f"gallery full (capacity {self.capacity})")
        emb = np.asarray(embedding, np.float32).reshape(-1)
        if emb.shape[0] != self.dim:
            raise ValueError(f"expected dim {self.dim}, got {emb.shape[0]}")
        emb = emb / max(np.linalg.norm(emb), 1e-12)
        self.embeddings[self.count] = emb
        self.names.append(name)
        return self.count - 1

    def remove(self, name: str) -> bool:
        if name not in self.names:
            return False
        i = self.names.index(name)
        # compact: shift the tail down one slot so valid entries stay a prefix
        self.embeddings[i : self.count - 1] = self.embeddings[i + 1 : self.count]
        self.embeddings[self.count - 1] = 0
        self.names.pop(i)
        return True

    def rename(self, old: str, new: str) -> bool:
        if old not in self.names:
            return False
        self.names[self.names.index(old)] = new
        return True

    def clear(self) -> None:
        self.names.clear()
        self.embeddings[:] = 0

    def name_of(self, index: int) -> str:
        return self.names[index] if 0 <= index < self.count else "Unknown"

    # -- persistence (reference face_references/ contract) ---------------------
    def save(self, directory: str | Path | None = None, images: dict[str, np.ndarray] | None = None) -> Path:
        d = Path(directory or FACE_REFERENCES_DIR)
        d.mkdir(parents=True, exist_ok=True)
        refs = {n: self.embeddings[i].copy() for i, n in enumerate(self.names)}
        with (d / "face_references.pkl").open("wb") as f:
            pickle.dump(refs, f)
        if images:
            from PIL import Image

            for n, img in images.items():
                Image.fromarray(np.asarray(img, np.uint8)).save(d / f"{n}.jpg")
        return d

    @classmethod
    def load(cls, directory: str | Path | None = None, capacity: int = 1024) -> "GalleryStore":
        d = Path(directory or FACE_REFERENCES_DIR)
        pkl = d / "face_references.pkl"
        store: "GalleryStore" | None = None
        if pkl.exists():
            with pkl.open("rb") as f:
                refs = pickle.load(f)
            for name, emb in refs.items():
                emb = np.asarray(emb, np.float32).reshape(-1)
                if store is None:
                    store = cls(capacity=capacity, dim=emb.shape[0])
                store.add(str(name), emb)
        return store or cls(capacity=capacity)
