"""ctypes bindings + build helper for the native C++ image loader
(facerec_tpu/data/native/loader.cpp).

``NativeClassificationBatcher`` is a drop-in for
:class:`facerec_tpu.data.datasets.ClassificationBatcher` (same ``epoch(i)``
batch-dict contract) backed by a libjpeg thread pool instead of per-image
PIL decodes. Falls back cleanly: :func:`available` reports whether the
shared library could be built/loaded (g++ and libjpeg headers are in the
image; environments without them use the Python batcher).
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_SRC = Path(__file__).parent / "native" / "loader.cpp"
_SO = Path(__file__).parent / "native" / "libfacerec_loader.so"
_lib = None
_build_error: str | None = None


def build(force: bool = False) -> Path:
    """Compile the loader shared library (cached next to the source)."""
    if _SO.exists() and not force and _SO.stat().st_mtime >= _SRC.stat().st_mtime:
        return _SO
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", str(_SRC),
           "-ljpeg", "-lpthread", "-o", str(_SO)]
    subprocess.run(cmd, check=True, capture_output=True, text=True)
    return _SO


def _load():
    global _lib, _build_error
    if _lib is not None:
        return _lib
    try:
        build()
        lib = ctypes.CDLL(str(_SO))
    except Exception as e:  # missing toolchain/libjpeg -> python fallback
        _build_error = str(e)
        raise
    lib.loader_create.restype = ctypes.c_void_p
    lib.loader_create.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]
    lib.loader_start_epoch.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    lib.loader_num_batches.restype = ctypes.c_int64
    lib.loader_num_batches.argtypes = [ctypes.c_void_p]
    lib.loader_next_batch.restype = ctypes.c_int
    lib.loader_next_batch.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.loader_destroy.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def available() -> bool:
    try:
        _load()
        return True
    except Exception:
        return False


class NativeClassificationBatcher:
    """Same contract as ClassificationBatcher: iterating ``epoch(e)`` yields
    ``{"image" [B,S,S,3] f32, "label" [B] i32, "mask" [B] f32}``."""

    def __init__(self, index, batch_size: int, image_size: int, shuffle: bool = True,
                 seed: int = 0, normalize: bool = True, num_threads: int = 6,
                 queue_depth: int = 4):
        lib = _load()
        self.index = index
        self.batch_size = batch_size
        self.image_size = image_size
        self.shuffle = shuffle
        self.seed = seed
        paths = [str(p).encode() for p in index.paths]
        self._path_buf = (ctypes.c_char_p * len(paths))(*paths)
        self._labels = np.ascontiguousarray(index.labels, np.int32)
        self._handle = lib.loader_create(
            self._path_buf, self._labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            len(paths), batch_size, image_size, num_threads, int(normalize), queue_depth)
        self._lib = lib
        self._epoch = 0

    def __len__(self) -> int:
        return -(-len(self.index.paths) // self.batch_size)

    def epoch(self, epoch: int | None = None):
        if epoch is None:
            epoch = self._epoch
            self._epoch += 1
        lib = self._lib
        seed = (self.seed * 100_003 + epoch) if self.shuffle else -1
        lib.loader_start_epoch(self._handle, seed)
        n = lib.loader_num_batches(self._handle)
        s = self.image_size
        for _ in range(n):
            images = np.empty((self.batch_size, s, s, 3), np.float32)
            labels = np.empty(self.batch_size, np.int32)
            mask = np.empty(self.batch_size, np.float32)
            ok = lib.loader_next_batch(
                self._handle,
                images.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                mask.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
            if not ok:
                return
            yield {"image": images, "label": labels, "mask": mask}

    def __iter__(self):
        return self.epoch()

    def __del__(self):
        try:
            if getattr(self, "_handle", None):
                self._lib.loader_destroy(self._handle)
                self._handle = None
        except Exception:
            pass


if __name__ == "__main__":
    print("built:", build(force=True))
