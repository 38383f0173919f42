"""ctypes binding for the native C++ batch sampler (native/batcher.cpp).

``NativeBatcher`` is a drop-in for :class:`TrainBatcher` (same batch dict,
same semantics: crop + flip/rot with MV fixups + center-MV expansion) with
the per-sample python loop replaced by one OpenMP-parallel C++ call.
Falls back cleanly: ``available()`` is False until tools/build_native.sh
has produced ``_native.so``.
"""
from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "_native.so")
_lib = None


def available() -> bool:
    return os.path.exists(_LIB_PATH)


def _load():
    global _lib
    if _lib is None:
        _lib = ctypes.CDLL(_LIB_PATH)
        u8 = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        i8 = np.ctypeslib.ndpointer(np.int8, flags="C_CONTIGUOUS")
        f32 = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        _lib.sample_batch.argtypes = [
            u8, u8, u8, i8, u8, i8, i8,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_uint64, ctypes.c_int, ctypes.c_int,
            f32, f32, f32, f32, f32, f32, f32,
        ]
        _lib.sample_batch.restype = None
    return _lib


class NativeBatcher:
    def __init__(self, ds, batch_size: int, crop: int = 64, seed: int = 4,
                 zero_mvl1: Optional[bool] = None, augment: bool = True,
                 nframes: int = 7):
        if not available():
            raise RuntimeError(
                "native batcher not built; run tools/build_native.sh")
        self.ds = ds
        self.b = batch_size
        self.crop = crop
        self.n = nframes
        self.augment = augment
        self.zero_mvl1 = (ds.cfg.zero_mvl1_in_train
                          if zero_mvl1 is None else zero_mvl1)
        self._seed = np.uint64(seed)
        # contiguous copies once (mmap'd caches may be non-writable views)
        self._lr = np.ascontiguousarray(ds.lr)
        self._hr = np.ascontiguousarray(ds.hr)
        self._pm = np.ascontiguousarray(ds.pm)
        self._rm = np.ascontiguousarray(ds.rm, dtype=np.int8)
        self._uf_raw = np.ascontiguousarray(ds.uf)
        # the 272-row unfiltered frames align with 270-row LR on rows 0..269
        if self._uf_raw.shape[2] != self._lr.shape[2]:
            self._uf_raw = np.ascontiguousarray(
                self._uf_raw[:, :, : self._lr.shape[2], :])
        self._mv0 = np.ascontiguousarray(ds.mv0, dtype=np.int8)
        self._mv1 = np.ascontiguousarray(ds.mv1, dtype=np.int8)

    def sample_batch(self) -> dict:
        lib = _load()
        s, t, h, w = self._lr.shape
        b, n, cr = self.b, self.n, self.crop
        out_lr = np.empty((b, n, cr, cr, 1), np.float32)
        out_hr = np.empty((b, 4 * cr, 4 * cr, 1), np.float32)
        out_pm = np.empty_like(out_lr)
        out_rm = np.empty_like(out_lr)
        out_uf = np.empty_like(out_lr)
        out_mv0 = np.empty((b, n, cr, cr, 2), np.float32)
        out_mv1 = np.empty_like(out_mv0)
        lib.sample_batch(
            self._lr, self._hr, self._pm, self._rm, self._uf_raw,
            self._mv0, self._mv1,
            s, t, h, w, b, n, cr,
            self._seed, int(self.augment), int(self.zero_mvl1),
            out_lr, out_hr, out_pm, out_rm, out_uf, out_mv0, out_mv1)
        self._seed = np.uint64(int(self._seed) + 0x10001)
        return {"lrs": out_lr, "mvs0": out_mv0, "mvs1": out_mv1,
                "pms": out_pm, "rms": out_rm, "ufs": out_uf, "hr": out_hr}

    def __iter__(self):
        while True:
            yield self.sample_batch()

    def prefetch(self, depth: int = 2):
        import queue
        import threading

        q: queue.Queue = queue.Queue(maxsize=depth)

        def worker():
            while True:
                q.put(self.sample_batch())

        threading.Thread(target=worker, daemon=True).start()
        while True:
            yield q.get()
