"""Leslie Smith LR range test (reference src/lr_finder.py:15-338,
training.py:70-156 find_optimal_lr).

Reuses the jitted train step with the learning rate injected per batch (one
compile, LR is a traced hyperparam), so the sweep costs one pass over the
loader. Model-specific behaviors reproduced: end-LR caps (arcface 0.01 with
divergence threshold 2.0, siamese 0.1 — lr_finder.py:36-48), divergence stop
at 4x best loss or non-finite (:173), Savitzky-Golay smoothing -> steepest
negative gradient (:254-259), min-loss/3x analysis for max_lr (:264-270), and
per-model suggested-LR clamps (:276-289).
"""

from __future__ import annotations

import json
import math
from pathlib import Path
from typing import Any, Iterable

import jax
import numpy as np

MODEL_LR_LIMITS = {
    # model_type -> (end_lr, divergence_factor, suggested_cap)
    "arcface": (0.01, 2.0, 5e-4),
    "siamese": (0.1, 4.0, 5e-3),
}
DEFAULTS = (1.0, 4.0, 1e-2)


class LearningRateFinder:
    def __init__(self, model_type: str = "baseline", start_lr: float = 1e-7,
                 end_lr: float | None = None, num_steps: int = 100):
        end_cap, div, cap = MODEL_LR_LIMITS.get(model_type, DEFAULTS)
        self.model_type = model_type
        self.start_lr = start_lr
        self.end_lr = end_lr if end_lr is not None else end_cap
        self.divergence_factor = div
        self.suggested_cap = cap
        self.num_steps = num_steps
        self.lrs: list[float] = []
        self.losses: list[float] = []

    def find(self, state, train_step, batches: Iterable[dict], set_lr) -> dict[str, Any]:
        """Sweep LR exponentially from start to end over ``num_steps`` batches.

        ``set_lr(opt_state, lr)`` injects the LR (train/state.py
        set_hyperparam); the mutated state is discarded afterwards — the
        caller keeps its pre-sweep state (the reference snapshots/restores
        model+optimizer, lr_finder.py:61,191; our functional state makes the
        restore free).
        """
        mult = (self.end_lr / self.start_lr) ** (1.0 / max(self.num_steps - 1, 1))
        lr = self.start_lr
        best = math.inf
        it = iter(batches)
        for i in range(self.num_steps):
            try:
                batch = next(it)
            except StopIteration:
                break
            set_lr(state.opt_state, lr)
            state, metrics = train_step(state, batch)
            loss = float(jax.device_get(metrics["loss_sum"])) / max(float(jax.device_get(metrics["count"])), 1.0)
            self.lrs.append(lr)
            self.losses.append(loss)
            if not math.isfinite(loss) or loss > self.divergence_factor * 4 * min(best, loss):
                break
            if loss > 4.0 * best:  # hard divergence stop (lr_finder.py:173)
                break
            best = min(best, loss)
            lr *= mult
        return self.analyze()

    def analyze(self) -> dict[str, Any]:
        if len(self.losses) < 5:
            return {"suggested_lr": self.suggested_cap / 10, "max_lr": self.suggested_cap,
                    "lrs": self.lrs, "losses": self.losses, "valid": False}
        losses = np.asarray(self.losses)
        lrs = np.asarray(self.lrs)
        try:
            from scipy.signal import savgol_filter

            window = min(len(losses) // 2 * 2 - 1, 11)
            smooth = savgol_filter(losses, max(window, 5), 3) if len(losses) >= 5 else losses
        except Exception:
            k = np.ones(5) / 5
            smooth = np.convolve(losses, k, mode="same")
        grads = np.gradient(smooth, np.log10(lrs))
        steepest = int(np.argmin(grads))
        suggested = float(lrs[steepest])
        # max_lr: LR where loss rises to 3x the minimum (lr_finder.py:264-270)
        i_min = int(np.argmin(smooth))
        max_lr = float(lrs[-1])
        for j in range(i_min, len(smooth)):
            if smooth[j] > 3.0 * smooth[i_min]:
                max_lr = float(lrs[j])
                break
        suggested = min(suggested, self.suggested_cap)
        return {"suggested_lr": suggested, "max_lr": max_lr, "steepest_idx": steepest,
                "min_loss_lr": float(lrs[i_min]), "lrs": self.lrs, "losses": self.losses,
                "valid": True}

    def save_results(self, path: str | Path, analysis: dict) -> Path:
        path = Path(path)
        path.parent.mkdir(parents=True, exist_ok=True)
        payload = {k: v for k, v in analysis.items()}
        payload["model_type"] = self.model_type
        path.write_text(json.dumps(payload, indent=2))
        return path


def find_optimal_lr(model, model_type: str, state, mesh, batcher, num_steps: int = 100) -> dict[str, Any]:
    """Convenience wrapper mirroring reference training.py:70-156."""
    from facerec_tpu.data.pipeline import prefetch_to_device
    from facerec_tpu.train.state import set_hyperparam
    from facerec_tpu.train.steps import jit_steps

    train_step, _ = jit_steps(model, model_type, mesh)
    finder = LearningRateFinder(model_type, num_steps=num_steps)

    def batches():
        epoch = 0
        while True:
            yield from prefetch_to_device(batcher.epoch(epoch), mesh)
            epoch += 1

    return finder.find(state, train_step, batches(), lambda os, lr: set_hyperparam(os, "learning_rate", lr))
