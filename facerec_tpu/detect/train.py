"""MTCNN trainer on synthetic scenes.

The reference relies on facenet-pytorch's pretrained MTCNN weights, which are
not available offline. This trainer produces working detector weights
hermetically: synthetic face scenes with exact box/landmark ground truth
(data/synthetic.py render_scene) drive the classic MTCNN training recipe
(Zhang et al. 2016): per-net sample mining into positives (IoU>=0.65,
classification + box regression), parts (0.4<=IoU<0.65, regression only) and
negatives (IoU<0.3, classification only); O-Net adds 5-point landmark
regression. Each net trains independently with Adam under jit.

Outputs land in ``outputs/detector/{pnet,rnet,onet}.npz`` — the default
weight path (detect/weights.py), used by preprocessing, serving and the demo.
"""

from __future__ import annotations

import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax

from facerec_tpu.config import logger
from facerec_tpu.data.synthetic import _identity_params, render_scene
from facerec_tpu.detect.mtcnn import ONet, PNet, RNet
from facerec_tpu.detect.weights import DEFAULT_DIR, save_detector_params


def _iou(box_a: np.ndarray, box_b: np.ndarray) -> float:
    x1 = max(box_a[0], box_b[0]); y1 = max(box_a[1], box_b[1])
    x2 = min(box_a[2], box_b[2]); y2 = min(box_a[3], box_b[3])
    inter = max(x2 - x1, 0) * max(y2 - y1, 0)
    aa = (box_a[2] - box_a[0]) * (box_a[3] - box_a[1])
    ab = (box_b[2] - box_b[0]) * (box_b[3] - box_b[1])
    return inter / max(aa + ab - inter, 1e-9)


def _crop(img: np.ndarray, box: np.ndarray, size: int) -> np.ndarray:
    """Crop with EDGE REPLICATION for out-of-frame boxes — matching the
    runtime crop (ops/warp_fast._bilinear_weights clips sample positions to
    the frame, i.e. replicates edges), so regression targets on edge-cut
    faces stay geometrically exact."""
    from PIL import Image

    x1, y1, x2, y2 = [int(round(v)) for v in box]
    h, w = img.shape[:2]
    pad_l, pad_t = max(-x1, 0), max(-y1, 0)
    pad_r, pad_b = max(x2 - w, 0), max(y2 - h, 0)
    if pad_l or pad_t or pad_r or pad_b:
        img = np.pad(img, ((pad_t, pad_b), (pad_l, pad_r), (0, 0)), mode="edge")
        x1 += pad_l; x2 += pad_l; y1 += pad_t; y2 += pad_t
    x2, y2 = max(x2, x1 + 1), max(y2, y1 + 1)
    patch = img[y1:y2, x1:x2]
    return np.asarray(Image.fromarray(patch).resize((size, size), Image.BILINEAR), np.uint8)


def _augment_crop(patch: np.ndarray, rng: np.random.Generator) -> np.ndarray:
    """Per-crop photometric domain randomization (uint8 -> uint8): tint,
    gamma, contrast, low light, blur, noise. R-Net/O-Net see crops whose
    statistics vary independently of the scene — measured to be what closes
    the confidence gap on real photographs (P-Net generalized first; R/O-Net
    sat at 0.1-0.5 on real faces until crops were augmented)."""
    img = patch.astype(np.float32) / 255.0
    # Correlated "tiny dark JPEG source" mode: the degradations below fire
    # independently at 0.3-0.35 each, so their CO-occurrence — which is what
    # the hardest real gallery photo actually is (random3_00000003.jpg: a
    # 33x42 near-black low-quality JPEG upsampled 4.8x at serving, then
    # gain-4.2 re-exposed by lowlight_norm) — carries ~1% of training mass.
    # Committed R/O-Net score its full-face crop 0.007/0.02 while a human
    # reads eyes/nose/mouth from the same 24px crop. In this mode the full
    # stack fires together, in the real data-generating ORDER: darken ->
    # downscale -> JPEG at the TINY resolution (blocks get magnified by the
    # upsample, not stamped at patch scale) -> upscale -> re-expose.
    degraded = rng.uniform() < 0.25 and patch.shape[0] >= 24
    img = img * rng.uniform(0.85, 1.15, 3).astype(np.float32)
    if rng.uniform() < 0.4:  # strong warm/cool cast (indoor tungsten / blue
        # daylight: the reference JPEGs carry casts far beyond +-15%)
        t = rng.uniform(-0.35, 0.35)
        img = img * np.asarray([1 + t, 1.0, 1 - t], np.float32)
    img = np.clip(img, 0, 1) ** rng.uniform(0.6, 1.6)
    m = img.mean()
    img = np.clip((img - m) * rng.uniform(0.7, 1.3) + m, 0, 1)
    if degraded or rng.uniform() < 0.35:  # low light, down to near-black (the
        # reference gallery's darkest crop has mean luminance 0.15)
        img = img * (rng.uniform(0.08, 0.35) if degraded
                     else rng.uniform(0.08, 0.7))
    if (degraded or rng.uniform() < 0.35) and patch.shape[0] >= 24:
        # low source resolution: the gallery JPEGs are as small as 33x42 and
        # get upsampled to 160x160 at serving — simulate by down-up resample
        import io

        from PIL import Image

        f = rng.uniform(3.5, 6.5) if degraded else rng.uniform(2.0, 6.0)
        s = patch.shape[0]
        small = max(int(s / f), 4)
        pil = Image.fromarray((img * 255).astype(np.uint8))
        pil = pil.resize((small, small), Image.BILINEAR)
        if degraded:  # compress at the tiny resolution, like the source file
            buf = io.BytesIO()
            pil.save(buf, "JPEG", quality=int(rng.integers(18, 55)))
            buf.seek(0)
            pil = Image.open(buf)
        img = np.asarray(pil.resize((s, s), Image.BILINEAR), np.float32) / 255
    if not degraded and rng.uniform() < 0.3:
        # JPEG blocking/ringing (every reference photo is a low-quality JPEG)
        import io

        from PIL import Image

        buf = io.BytesIO()
        Image.fromarray((img * 255).astype(np.uint8)).save(
            buf, "JPEG", quality=int(rng.integers(25, 75)))
        buf.seek(0)
        img = np.asarray(Image.open(buf), np.float32) / 255
    if rng.uniform() < 0.3 and patch.shape[0] >= 24:
        from PIL import Image, ImageFilter

        pil = Image.fromarray((img * 255).astype(np.uint8))
        img = np.asarray(pil.filter(ImageFilter.GaussianBlur(rng.uniform(0.3, 1.0))),
                         np.float32) / 255
    img = np.clip(img + rng.normal(0, rng.uniform(0, 0.03), img.shape), 0, 1)
    # Serve-side exposure-remap appearance (detect/mtcnn.py lowlight_norm):
    # frames darker than per-frame std 24 are affinely stretched back to
    # ~std 48 / mean 110 BEFORE the cascade, so at serving the nets never
    # see raw near-black crops — they see re-exposed ones whose uint8
    # quantization / JPEG-block noise is amplified by the ~2-6x gain (the
    # one remaining uncovered gallery photo, random3_00000003.jpg, is a
    # 33x42 source at frame std 11.5 -> gain 4.2). Quantize first so the
    # banding is real, and jitter the target stats: the serve remap uses
    # FRAME statistics while a face crop inside it has its own.
    q = np.round(img * 255.0).astype(np.float32)
    if q.std() < 24.0 and rng.uniform() < 0.7:
        gain = rng.uniform(36.0, 60.0) / max(float(q.std()), 4.0)
        img = np.clip((q - q.mean()) * gain + rng.uniform(90.0, 130.0),
                      0.0, 255.0) / 255.0
    return (img * 255).astype(np.uint8)


def make_training_samples(
    n_scenes: int, size: int, seed: int = 0, with_landmarks: bool = False,
    canvas: int = 128, augment_p: float = 0.7, closeup_p: float = 0.35,
    subpart_n: int = 2, subpart_scale: tuple[float, float] = (0.2, 0.45),
    subpart_jitter: float = 0.15,
) -> dict[str, np.ndarray]:
    """Mine pos/part/neg patches from synthetic scenes.

    Returns arrays: image [N,size,size,3] f32 (MTCNN normalization applied),
    cls_label [N] (1 face / 0 nonface), cls_mask, reg_target [N,4], reg_mask,
    (lmk_target [N,10], lmk_mask when with_landmarks).
    """
    rng = np.random.default_rng(seed)
    imgs, cls_l, cls_m, reg_t, reg_m, lmk_t, lmk_m = [], [], [], [], [], [], []

    def add(patch, cls, cm, reg=(0, 0, 0, 0), rm=0.0, lmk=None):
        if augment_p and rng.uniform() < augment_p:
            patch = _augment_crop(patch, rng)
        imgs.append((patch.astype(np.float32) - 127.5) / 128.0)
        cls_l.append(cls)
        cls_m.append(cm)
        reg_t.append(reg)
        reg_m.append(rm)
        lmk_t.append(lmk if lmk is not None else np.zeros(10, np.float32))
        lmk_m.append(0.0 if lmk is None else 1.0)

    for _ in range(n_scenes):
        # closeup_p extreme close-up portraits (face 90-145% of the canvas,
        # cut at the frame boundary — the reference gallery JPEGs crop at
        # forehead AND chin), else the general distribution up to ~125%
        if rng.uniform() < closeup_p:
            fr = (int(canvas * 0.9), int(canvas * 1.45))
        else:
            fr = (32, int(canvas * 1.25))
        # wide-appearance identities: skin luminance 0.25-1.0 (the default
        # render distribution stops at 0.58 — light/medium tones only) and
        # full-beard jaw darkening. The one reference-gallery photo whose
        # full-face box every trained O-Net rejects is a dark-skinned
        # bearded subject the narrow distribution never renders.
        img, box, lmk = render_scene(
            rng, canvas=canvas, face_size_range=fr,
            params=_identity_params(rng, skin_lum_range=(0.25, 1.0)))
        bw, bh = box[2] - box[0], box[3] - box[1]
        side = max(bw, bh)
        cx, cy = (box[0] + box[2]) / 2, (box[1] + box[3]) / 2
        # positives + parts: jittered square crops around the face
        for _ in range(3):
            js = side * rng.uniform(0.85, 1.15)
            jx = cx + rng.uniform(-0.2, 0.2) * side
            jy = cy + rng.uniform(-0.2, 0.2) * side
            crop_box = np.asarray([jx - js / 2, jy - js / 2, jx + js / 2, jy + js / 2])
            iou = _iou(crop_box, box)
            if iou < 0.4:
                continue
            patch = _crop(img, crop_box, size)
            # regression targets: true box offsets relative to crop (normalized)
            reg = np.asarray([
                (box[0] - crop_box[0]) / js, (box[1] - crop_box[1]) / js,
                (box[2] - crop_box[2]) / js, (box[3] - crop_box[3]) / js,
            ], np.float32)
            if iou >= 0.65:
                lm = None
                if with_landmarks:
                    lm = np.concatenate([
                        (lmk[:, 0] - crop_box[0]) / js, (lmk[:, 1] - crop_box[1]) / js,
                    ]).astype(np.float32)
                add(patch, 1, 1.0, reg, 1.0, lm)
            else:  # part face: regression only
                add(patch, 0, 0.0, reg, 1.0)
        # interior-window positives for truncated faces: when the GT box
        # sticks out of the canvas, a serving-time window (P-Net's receptive
        # field lives INSIDE the frame) can never reach IoU 0.65 with the
        # unclipped box — so face-filling frames were never taught as
        # positives. Label such windows by IoU against the VISIBLE (clipped)
        # box — the standard truncated-object criterion — while the
        # regression target still points at the true box, teaching the nets
        # to extrapolate beyond the frame (the reference gallery's close-ups
        # crop at forehead AND chin).
        vis = np.asarray([max(box[0], 0.0), max(box[1], 0.0),
                          min(box[2], float(canvas)), min(box[3], float(canvas))])
        box_area = max(box[2] - box[0], 1e-6) * max(box[3] - box[1], 1e-6)
        vis_area = max(vis[2] - vis[0], 0.0) * max(vis[3] - vis[1], 0.0)
        if vis_area < 0.8 * box_area and vis_area > 0:
            for _ in range(2):
                ws = canvas * rng.uniform(0.75, 1.0)
                wx = rng.uniform(0, canvas - ws)
                wy = rng.uniform(0, canvas - ws)
                wbox = np.asarray([wx, wy, wx + ws, wy + ws])
                iou_v = _iou(wbox, vis)
                if iou_v < 0.4:
                    continue
                patch = _crop(img, wbox, size)
                reg = np.asarray([
                    (box[0] - wbox[0]) / ws, (box[1] - wbox[1]) / ws,
                    (box[2] - wbox[2]) / ws, (box[3] - wbox[3]) / ws,
                ], np.float32)
                if iou_v >= 0.65:
                    lm = None
                    if with_landmarks:
                        lm = np.concatenate([
                            (lmk[:, 0] - wbox[0]) / ws, (lmk[:, 1] - wbox[1]) / ws,
                        ]).astype(np.float32)
                    add(patch, 1, 1.0, reg, 1.0, lm)
                else:
                    add(patch, 0, 0.0, reg, 1.0)
        # sub-part hard negatives: small windows centered on a landmark (an
        # eye, the nose, a mouth corner). At serving these fine-scale windows
        # were the detector's dominant false-positive mode on real portraits
        # (a 0.91-confidence box on a nose); mining them as explicit
        # negatives teaches "a facial part is not a face".
        for _ in range(subpart_n):
            li = int(rng.integers(0, len(lmk)))
            ps = side * rng.uniform(*subpart_scale)
            px = lmk[li, 0] + rng.uniform(-subpart_jitter, subpart_jitter) * ps
            py = lmk[li, 1] + rng.uniform(-subpart_jitter, subpart_jitter) * ps
            pbox = np.asarray([px - ps / 2, py - ps / 2, px + ps / 2, py + ps / 2])
            if _iou(pbox, box) < 0.3:
                add(_crop(img, pbox, size), 0, 1.0)
        # negatives: random crops with low IoU
        tries = 0
        negs = 0
        while negs < 3 and tries < 20:
            tries += 1
            js = rng.uniform(12, canvas * 0.6)
            jx = rng.uniform(0, canvas - js)
            jy = rng.uniform(0, canvas - js)
            crop_box = np.asarray([jx, jy, jx + js, jy + js])
            if _iou(crop_box, box) < 0.3:
                add(_crop(img, crop_box, size), 0, 1.0)
                negs += 1
    out = {
        "image": np.stack(imgs), "cls_label": np.asarray(cls_l, np.int32),
        "cls_mask": np.asarray(cls_m, np.float32),
        "reg_target": np.asarray(reg_t, np.float32), "reg_mask": np.asarray(reg_m, np.float32),
    }
    if with_landmarks:
        out["lmk_target"] = np.stack(lmk_t)
        out["lmk_mask"] = np.asarray(lmk_m, np.float32)
    return out


def _net_loss(outputs, batch, with_landmarks: bool):
    if with_landmarks:
        prob, reg, lmk = outputs
    else:
        prob, reg = outputs
        lmk = None
    if prob.ndim > 1:  # P-Net fully-conv: center cell
        prob = prob.reshape(prob.shape[0], -1)[:, 0]
        reg = reg.reshape(reg.shape[0], -1, 4)[:, 0]
    eps = 1e-7
    p = jnp.clip(prob, eps, 1 - eps)
    y = batch["cls_label"].astype(jnp.float32)
    cls = -(y * jnp.log(p) + (1 - y) * jnp.log(1 - p))
    cls = jnp.sum(cls * batch["cls_mask"]) / jnp.maximum(jnp.sum(batch["cls_mask"]), 1)
    reg_l = jnp.sum((reg - batch["reg_target"]) ** 2, axis=-1)
    reg_l = jnp.sum(reg_l * batch["reg_mask"]) / jnp.maximum(jnp.sum(batch["reg_mask"]), 1)
    loss = cls + 0.5 * reg_l
    if lmk is not None and "lmk_target" in batch:
        lmk_l = jnp.sum((lmk - batch["lmk_target"]) ** 2, axis=-1)
        lmk_l = jnp.sum(lmk_l * batch["lmk_mask"]) / jnp.maximum(jnp.sum(batch["lmk_mask"]), 1)
        loss = loss + lmk_l
    return loss, cls


def train_net(net, size: int, n_scenes: int, steps: int, batch_size: int = 256,
              lr: float = 1e-3, seed: int = 0, with_landmarks: bool = False,
              init_params=None, sample_kwargs: dict | None = None):
    data = make_training_samples(n_scenes, size, seed, with_landmarks,
                                 **(sample_kwargs or {}))
    n = len(data["image"])
    params = (init_params if init_params is not None
              else net.init(jax.random.key(seed), jnp.zeros((1, size, size, 3)))["params"])
    # cosine decay to lr/10: the final params otherwise sit wherever the last
    # noisy Adam step left them — decay measurably reduces run-to-run recall
    # variance on the real-photo validation set
    tx = optax.adam(optax.cosine_decay_schedule(lr, steps, alpha=0.1))
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, data_dev, idx):
        # batch gather happens ON DEVICE (data_dev is a device-resident jit
        # ARGUMENT — closing over it would inline ~hundreds of MB into the
        # HLO as a constant and bust the compile cache)
        batch = {k: v[idx] for k, v in data_dev.items()}

        def loss_fn(p):
            out = net.apply({"params": p}, batch["image"])
            return _net_loss(out, batch, with_landmarks)

        (loss, cls), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state2 = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state2, loss, cls

    rng = np.random.default_rng(seed)
    t0 = time.time()
    # dataset lives ON DEVICE, uploaded ONCE; batches are gathered there by
    # index. Host-side per-step batch assembly re-uploaded ~7 MB/step through
    # the transfer tunnel and dominated wall time (measured 2.4 s/step for
    # O-Net vs ~0.1 s compute) — CLAUDE.md trap #5.
    data_dev = jax.device_put(data)

    for i in range(steps):
        idx = jnp.asarray(rng.integers(0, n, batch_size))
        params, opt_state, loss, cls = step(params, opt_state, data_dev, idx)
        if (i + 1) % max(steps // 5, 1) == 0:
            logger.info("  step %d/%d loss=%.4f cls=%.4f", i + 1, steps, float(loss), float(cls))
    logger.info("trained %s in %.1fs (%d samples)", type(net).__name__, time.time() - t0, n)
    return params


def train_detector(
    out_dir: str | Path = DEFAULT_DIR,
    n_scenes: int = 2500,
    steps: int = 800,
    seed: int = 0,
) -> Path:
    """Train all three nets and save weights to the default detector path."""
    logger.info("training P-Net...")
    pnet = train_net(PNet(), 12, n_scenes, steps, seed=seed)
    logger.info("training R-Net...")
    rnet = train_net(RNet(), 24, n_scenes, steps, seed=seed + 1)
    logger.info("training O-Net...")
    onet = train_net(ONet(), 48, n_scenes, steps, seed=seed + 2, with_landmarks=True)
    path = save_detector_params({"pnet": pnet, "rnet": rnet, "onet": onet}, out_dir)
    logger.info("detector weights saved to %s", path)
    return path


def finetune_refiners(
    out_dir: str | Path,
    n_scenes: int = 1500,
    steps: int = 400,
    lr: float = 2e-4,
    seed: int = 10,
    closeup_p: float = 0.5,
    subpart_n: int = 4,
) -> Path:
    """Fine-tune R-Net and O-Net from the committed weights on a close-up-
    heavy, part-negative-heavy mix; P-Net is kept verbatim.

    Targets the measured part-vs-whole confusion on the reference gallery
    close-ups (tests/test_real_photos.py): O-Net scores a real cheek/eye
    crop 0.92 and the containing full face 0.70, so the final min-mode NMS
    (which merges nested detections, keeping the higher score) discards the
    covering box. The fix is score ordering, not NMS semantics — the
    reference's pretrained O-Net ranks whole above part on these photos.

    Writes a CANDIDATE weight set to ``out_dir`` (never the default path):
    adopt only after tools/detector_eval.py clears BOTH domains (CLAUDE.md
    seed-variance rule)."""
    from facerec_tpu.detect.weights import load_detector_params

    base = load_detector_params()
    sk = {"closeup_p": closeup_p, "subpart_n": subpart_n,
          "subpart_scale": (0.2, 0.55), "subpart_jitter": 0.35}
    logger.info("fine-tuning R-Net (closeup_p=%.2f subpart_n=%d)...", closeup_p, subpart_n)
    rnet = train_net(RNet(), 24, n_scenes, steps, lr=lr, seed=seed,
                     init_params=base["rnet"], sample_kwargs=sk)
    logger.info("fine-tuning O-Net...")
    onet = train_net(ONet(), 48, n_scenes, steps, lr=lr, seed=seed + 1,
                     with_landmarks=True, init_params=base["onet"], sample_kwargs=sk)
    path = save_detector_params({"pnet": base["pnet"], "rnet": rnet, "onet": onet}, out_dir)
    logger.info("candidate refiner weights saved to %s", path)
    return path


def finetune_pnet(
    out_dir: str | Path,
    n_scenes: int = 1500,
    steps: int = 400,
    lr: float = 2e-4,
    seed: int = 30,
) -> Path:
    """Fine-tune P-Net from the committed weights on the (now wide-
    appearance) scene distribution; R-Net and O-Net are kept verbatim.

    The refiner fine-tunes (finetune_refiners) kept P-Net verbatim as a
    safety choice, so after the wide-appearance refiner adoption the
    PROPOSAL stage was still narrow-trained: matched-GT diagnosis on
    wide-appearance bench frames showed dark faces (skin luminance
    0.28-0.39) with best P-Net candidate IoU ~0 — never proposed, so the
    wide-trained refiners never saw them. Writes a CANDIDATE set; adopt
    only after tools/detector_eval.py clears BOTH domains ON TPU."""
    from facerec_tpu.detect.weights import load_detector_params

    base = load_detector_params()
    logger.info("fine-tuning P-Net (wide-appearance scenes)...")
    pnet = train_net(PNet(), 12, n_scenes, steps, lr=lr, seed=seed,
                     init_params=base["pnet"])
    path = save_detector_params({"pnet": pnet, "rnet": base["rnet"],
                                 "onet": base["onet"]}, out_dir)
    logger.info("candidate P-Net weights saved to %s", path)
    return path


if __name__ == "__main__":
    import sys

    if len(sys.argv) > 1 and sys.argv[1] == "finetune":
        finetune_refiners(sys.argv[2] if len(sys.argv) > 2 else "outputs/detector_candidate")
    elif len(sys.argv) > 1 and sys.argv[1] == "finetune-pnet":
        finetune_pnet(sys.argv[2] if len(sys.argv) > 2 else "outputs/detector_candidate_p")
    else:
        train_detector()
