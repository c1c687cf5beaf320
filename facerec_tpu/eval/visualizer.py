"""Embedding-space visualizer (reference src/visualizer.py:28-388).

Extracts up to ``max_samples`` embeddings with the trained model, projects via
PCA(50) -> t-SNE 2D/3D (reference :144-158), and exports CSVs (the reference
also exports CSVs in lieu of plots, :166-296) plus the exp(-distance)
similarity matrix (:257-296). PCA is first-party (numpy SVD); t-SNE uses
sklearn when present, else falls back to the PCA projection.
"""

from __future__ import annotations

import csv
from pathlib import Path
from typing import Any

import jax
import numpy as np

from facerec_tpu.config import VIZ_DIR, logger


def pca(x: np.ndarray, n_components: int) -> np.ndarray:
    x = x - x.mean(axis=0, keepdims=True)
    _, _, vt = np.linalg.svd(x, full_matrices=False)
    return x @ vt[:n_components].T


def project_embeddings(emb: np.ndarray, dims: int = 2, seed: int = 0) -> np.ndarray:
    """PCA(50) -> t-SNE(dims); falls back to PCA(dims)."""
    reduced = pca(emb, min(50, emb.shape[1], emb.shape[0] - 1))
    try:
        from sklearn.manifold import TSNE

        perplexity = max(2, min(30, (len(emb) - 1) // 3))
        return TSNE(n_components=dims, random_state=seed, perplexity=perplexity,
                    init="pca").fit_transform(reduced)
    except Exception:
        return reduced[:, :dims]


class EmbeddingVisualizer:
    def __init__(self, model, variables, model_type: str, image_size: int = 224,
                 max_samples: int = 300, batch_size: int = 32):
        self.model = model
        self.variables = variables
        self.model_type = model_type
        self.image_size = image_size
        self.max_samples = max_samples
        self.batch_size = batch_size

    def extract_embeddings(self, index) -> tuple[np.ndarray, np.ndarray, list[str]]:
        from facerec_tpu.data.datasets import ClassificationBatcher

        b = ClassificationBatcher(index, self.batch_size, self.image_size, shuffle=False)
        embed = jax.jit(lambda x: self.model.apply(self.variables, x, method="embed"))
        embs, labels = [], []
        n = 0
        for batch in b.epoch(0):
            e = np.asarray(jax.device_get(embed(batch["image"])))
            m = batch["mask"].astype(bool)
            embs.append(e[m])
            labels.append(batch["label"][m])
            n += int(m.sum())
            if n >= self.max_samples:
                break
        emb = np.concatenate(embs)[: self.max_samples]
        lab = np.concatenate(labels)[: self.max_samples]
        return emb, lab, index.class_names

    def export(self, index, out_dir: str | Path | None = None, seed: int = 0) -> dict[str, Any]:
        out = Path(out_dir or (VIZ_DIR / self.model_type))
        out.mkdir(parents=True, exist_ok=True)
        emb, lab, names = self.extract_embeddings(index)
        result = {"num_embeddings": len(emb), "out_dir": str(out)}
        for dims in (2, 3):
            proj = project_embeddings(emb, dims, seed)
            path = out / f"tsne_{dims}d.csv"
            with path.open("w", newline="") as f:
                w = csv.writer(f)
                w.writerow([f"dim{i}" for i in range(dims)] + ["label", "person"])
                for row, l in zip(proj, lab):
                    w.writerow(list(map(float, row)) + [int(l), names[int(l)]])
            result[f"tsne_{dims}d"] = str(path)
        # similarity matrix exp(-||a-b||) over class centroids (reference :257-296)
        centroids = np.stack([emb[lab == c].mean(axis=0) for c in np.unique(lab)])
        d = np.linalg.norm(centroids[:, None] - centroids[None, :], axis=-1)
        sim = np.exp(-d)
        with (out / "similarity_matrix.csv").open("w", newline="") as f:
            w = csv.writer(f)
            present = [names[c] for c in np.unique(lab)]
            w.writerow([""] + present)
            for name, row in zip(present, sim):
                w.writerow([name] + [f"{v:.4f}" for v in row])
        result["similarity_matrix"] = str(out / "similarity_matrix.csv")
        logger.info("visualization exported to %s (%d embeddings)", out, len(emb))
        return result


def generate_visualization_report(model, variables, model_type: str, test_dir: str | Path,
                                  image_size: int = 224, out_dir: str | Path | None = None) -> dict:
    """reference visualizer.py:313-368."""
    from facerec_tpu.data.datasets import ImageFolderIndex

    index = ImageFolderIndex.build(test_dir)
    viz = EmbeddingVisualizer(model, variables, model_type, image_size)
    return viz.export(index, out_dir)


if __name__ == "__main__":  # reference visualizer.py:371-388 CLI
    import argparse

    from facerec_tpu.cli.main import main as cli_main

    p = argparse.ArgumentParser()
    p.add_argument("--model-type", default="siamese")
    p.add_argument("--model-name", default=None)
    p.add_argument("--dataset", required=True)
    a = p.parse_args()
    cli_main(["visualize", "--model-type", a.model_type, "--dataset", a.dataset]
             + (["--model-name", a.model_name] if a.model_name else []))
