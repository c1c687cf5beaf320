#!/usr/bin/env python
"""A/B: recover wide-draw few-shot accuracy (VERDICT r3 item 6).

Variants, each trained/evaluated with the verify drive recipe (baseline,
3 epochs, 4 classes x 12 imgs, 64px) across seeds 1/2/3:
  base      — committed pipeline (wide hue-preserving draw)
  exposure  — per-image exposure normalization before ImageNet normalize
              (the embed-side analog of the detect-path lowlight remap)
  scalecap  — ADVICE r3: cap the hue-preserving scale so no channel clips
  both      — exposure + scalecap

Run ON TPU (the verify recipe's platform): floors move knife-edge between
CPU/TPU numerics.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def run_recipe(root: str, seed: int, tag: str) -> float:
    from facerec_tpu.config import EvalConfig, OptimizerConfig, TrainConfig
    from facerec_tpu.data.synthetic import write_synthetic_imagefolder
    from facerec_tpu.eval.engine import evaluate_model
    from facerec_tpu.train.engine import train_model

    ds = Path(root) / f"ds_{tag}_{seed}"
    write_synthetic_imagefolder(ds, num_classes=4, per_class=12, size=64, seed=seed)
    cfg = TrainConfig(model_type="baseline", batch_size=16, epochs=3, image_size=64,
                      early_stopping=False, checkpoint_every=0,
                      optimizer=OptimizerConfig(learning_rate=3e-3))
    train_model(cfg, ds, checkpoints_root=Path(root) / f"ck_{tag}_{seed}", model_name="m")
    res = evaluate_model(EvalConfig(model_type="baseline", model_name="m", image_size=64),
                         ds, checkpoints_root=Path(root) / f"ck_{tag}_{seed}",
                         outputs_root=Path(root) / f"out_{tag}_{seed}")
    return float(res["accuracy"])


def exposure_normalize(x: np.ndarray) -> np.ndarray:
    """Per-image canonical exposure (float 0..255 domain): mean->110, std->48,
    clipped to pixel range — the embed-side analog of detect/mtcnn.py
    lowlight_norm, but per image and ungated."""
    xf = x.astype(np.float32)
    m = xf.mean(axis=(1, 2, 3), keepdims=True)
    s = xf.std(axis=(1, 2, 3), keepdims=True)
    return np.clip((xf - m) * (48.0 / np.maximum(s, 4.0)) + 110.0, 0.0, 255.0)


def main():
    import facerec_tpu.data.datasets as dsm
    import facerec_tpu.data.synthetic as synth

    variants = sys.argv[1:] or ["base", "exposure", "scalecap", "both"]
    orig_norm = dsm._imagenet_normalize
    orig_render = synth.render_face

    def exp_norm(x):
        return orig_norm(exposure_normalize(x))

    def render_capped(params, size, jitter_rng=None):
        p = dict(params)
        if p.get("skin_lum") is not None:
            skin = np.asarray(p["skin"], np.float32)
            base = float(p["skin_lum"])
            scale = min(base / max(float(skin.mean()), 1e-3), 1.0 / max(float(skin.max()), 1e-3))
            p["skin"] = np.clip(skin * scale, 0.05, 1.0)
            p["skin_lum"] = None  # render uses the pre-scaled channels as-is
        return orig_render(p, size, jitter_rng)

    for tag in variants:
        dsm._imagenet_normalize = exp_norm if tag in ("exposure", "both") else orig_norm
        synth.render_face = render_capped if tag in ("scalecap", "both") else orig_render
        accs = [run_recipe("/tmp/abwide", s, tag) for s in (1, 2, 3)]
        print(json.dumps({"variant": tag, "acc_by_seed": accs,
                          "min": min(accs), "mean": round(float(np.mean(accs)), 4)}))
    dsm._imagenet_normalize = orig_norm
    synth.render_face = orig_render


if __name__ == "__main__":
    main()
