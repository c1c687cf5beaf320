"""Checkpoint save/load/prune on orbax (reference training_utils.py:179-298,
special_architectures.py:166-188 resume, training.py:713-717 best-model).

Layout (mirrors the reference's per-model artifact contract):
  outputs/checkpoints/<model_name>/
    best/            orbax tree of {params, batch_stats, metadata}
    final/
    epoch_<n>/       periodic full state (resume source)
    metrics/*.csv
    model_info.json
"""

from __future__ import annotations

import json
import re
import shutil
import time
from pathlib import Path
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp


def _to_saveable(tree: Any) -> Any:
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(
    ckpt_dir: str | Path,
    name: str,
    params: Any,
    batch_stats: Any = None,
    opt_state: Any = None,
    metadata: dict | None = None,
) -> Path:
    """Save a checkpoint tree. ``opt_state`` included only for resumable
    checkpoints (epoch_<n>); best/final hold params+stats only."""
    path = (Path(ckpt_dir) / name).resolve()
    if path.exists():
        shutil.rmtree(path)
    tree = {"params": _to_saveable(params)}
    if batch_stats is not None:
        tree["batch_stats"] = _to_saveable(batch_stats)
    if opt_state is not None:
        tree["opt_state"] = _to_saveable(opt_state)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, tree)
    meta = dict(metadata or {})
    meta.setdefault("timestamp", time.strftime("%Y-%m-%dT%H:%M:%S"))
    meta.setdefault("has_opt_state", opt_state is not None)
    (path / "metadata.json").write_text(json.dumps(meta, indent=2, default=str))
    return path


def load_checkpoint(ckpt_dir: str | Path, name: str | None = None, target: Any = None) -> dict:
    """Load a checkpoint; when ``name`` is None, prefer best -> final
    (reference testing.py:118-129 fallback order)."""
    base = Path(ckpt_dir)
    if name is None:
        for cand in ("best", "final"):
            if (base / cand).exists():
                name = cand
                break
        else:
            raise FileNotFoundError(f"no best/final checkpoint under {base}")
    path = (base / name).resolve()
    with ocp.StandardCheckpointer() as ckptr:
        tree = ckptr.restore(path, target) if target is not None else ckptr.restore(path)
    meta_file = path / "metadata.json"
    if isinstance(tree, dict) and meta_file.exists():
        tree = dict(tree)
        tree["metadata"] = json.loads(meta_file.read_text())
    return tree


def restore_into(ckpt_dir: str | Path, name: str, params: Any, batch_stats: Any,
                 opt_state: Any = None) -> tuple[dict, dict]:
    """Restore a checkpoint INTO the given pytree structures (required for
    ``opt_state``: optax states are namedtuples, and a target-free restore
    would flatten them to sorted dicts). Returns ``(tree, metadata)``; the
    tree has key ``opt_state`` only when both the caller asked for it and the
    checkpoint recorded one (``has_opt_state`` in its metadata)."""
    path = (Path(ckpt_dir) / name).resolve()
    meta_file = path / "metadata.json"
    meta = json.loads(meta_file.read_text()) if meta_file.exists() else {}
    target = {"params": _to_saveable(params), "batch_stats": _to_saveable(batch_stats)}
    if opt_state is not None and meta.get("has_opt_state"):
        target["opt_state"] = _to_saveable(opt_state)
    with ocp.StandardCheckpointer() as ckptr:
        tree = ckptr.restore(path, target)
    return tree, meta


def latest_epoch_checkpoint(ckpt_dir: str | Path) -> tuple[int, Path] | None:
    """Find the newest ``epoch_<n>`` checkpoint for resume
    (reference special_architectures.py:166-188)."""
    base = Path(ckpt_dir)
    if not base.exists():
        return None
    best: tuple[int, Path] | None = None
    for p in base.iterdir():
        m = re.fullmatch(r"epoch_(\d+)", p.name)
        if m and (best is None or int(m.group(1)) > best[0]):
            best = (int(m.group(1)), p)
    return best


def prune_checkpoints(ckpt_dir: str | Path, keep: int = 3) -> list[Path]:
    """Keep the newest N epoch checkpoints (reference training_utils.py:277-298)."""
    base = Path(ckpt_dir)
    if not base.exists():
        return []
    epochs = sorted(
        (p for p in base.iterdir() if re.fullmatch(r"epoch_\d+", p.name)),
        key=lambda p: int(p.name.split("_")[1]),
    )
    removed = []
    for p in epochs[:-keep] if keep > 0 else epochs:
        shutil.rmtree(p)
        removed.append(p)
    return removed
