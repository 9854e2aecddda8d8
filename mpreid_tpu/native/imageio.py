"""ctypes wrapper + on-demand build for the native batch image loader.

One C call decodes (libjpeg/libpng) and bicubic-resizes a whole batch with
OpenMP — the native equivalent of the reference's PIL + torchvision Resize
data path (ref ``datasets/make_dataloader.py:46-61``) and of our threaded
``data/loader.py::decode_resize``.

``native_imageio_available()`` is True only when the library builds AND a
runtime self-check passes: a synthetic image is resized by both the native
code and PIL and must match **byte-for-byte** (the C++ reimplements
Pillow's fixed-point Resample.c exactly). This makes it safe for callers
to switch paths automatically — if this host's libjpeg were to disagree
with PIL's bundled decoder, the check simply disables the native path.

Per-image decode failures are reported via a status vector; callers fall
back to the PIL path for those images only (matching the bounded-retry
semantics of the Python reader).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "imageio.cpp")
_LIB = os.path.join(_DIR, "_imageio.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_failed = False


def _build() -> Optional[ctypes.CDLL]:
    global _failed
    if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
        cmd = ["g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
               _SRC, "-ljpeg", "-lpng", "-o", _LIB]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        except (subprocess.SubprocessError, FileNotFoundError):
            _failed = True
            return None
    try:
        lib = ctypes.CDLL(_LIB)
    except OSError:
        _failed = True
        return None
    lib.decode_resize_batch.restype = ctypes.c_int
    lib.decode_resize_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_ubyte),
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.pil_resize_rgb8.restype = ctypes.c_int
    lib.pil_resize_rgb8.argtypes = [
        ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int, ctypes.c_int,
    ]
    if not _self_check(lib):
        _failed = True
        return None
    return lib


def _self_check(lib) -> bool:
    """Native path must be byte-identical to PIL before it may be enabled.

    Two layers are verified: (1) the resize kernel on an in-memory array,
    and (2) the *codecs* — a synthetic image is encoded to JPEG and PNG by
    PIL, decoded+resized through the native batch entry point, and required
    to match PIL's own decode+resize byte-for-byte. A system libjpeg whose
    IDCT differs from Pillow's bundled libjpeg-turbo fails here and simply
    disables the native path instead of feeding divergent pixels.
    """
    try:
        from PIL import Image
    except ImportError:
        return False
    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, (37, 23, 3), dtype=np.uint8)
    out_h, out_w = 24, 12
    pil = np.asarray(
        Image.fromarray(img).resize((out_w, out_h), Image.BICUBIC), np.uint8
    )
    got = np.empty((out_h, out_w, 3), np.uint8)
    rc = lib.pil_resize_rgb8(
        np.ascontiguousarray(img).ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        37, 23,
        got.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)), out_h, out_w,
    )
    if rc != 0 or not np.array_equal(got, pil):
        return False

    # codec parity: smooth gradient (JPEG is lossy — both sides decode the
    # SAME file, so any decoder divergence still shows as a byte mismatch)
    yy, xx = np.mgrid[0:37, 0:23]
    smooth = np.stack(
        [(yy * 5) % 256, (xx * 9) % 256, (yy + xx) * 3 % 256], axis=-1
    ).astype(np.uint8)
    import tempfile

    with tempfile.TemporaryDirectory(prefix="mpreid_imageio_check_") as tmp:
        paths = []
        for ext in ("jpg", "png"):
            p = os.path.join(tmp, f"check.{ext}")
            Image.fromarray(smooth).save(p)
            paths.append(p)
        n = len(paths)
        out = np.empty((n, out_h, out_w, 3), np.uint8)
        status = np.zeros(n, np.int32)
        arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
        lib.decode_resize_batch(
            arr, n, out_h, out_w,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
            status.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        )
        if np.any(status != 0):
            return False
        for i, p in enumerate(paths):
            ref = np.asarray(
                Image.open(p).convert("RGB").resize(
                    (out_w, out_h), Image.BICUBIC
                ),
                np.uint8,
            )
            if not np.array_equal(out[i], ref):
                return False
    return True


def _get_lib() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is None and not _failed:
        with _lock:
            if _lib is None and not _failed:
                _lib = _build()
    return _lib


def native_imageio_available() -> bool:
    return _get_lib() is not None


def resize_rgb8_native(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """PIL-exact bicubic resize of one (H, W, 3) uint8 array (for tests)."""
    lib = _get_lib()
    if lib is None:
        raise RuntimeError("native imageio unavailable")
    img = np.ascontiguousarray(img, np.uint8)
    out = np.empty((out_h, out_w, 3), np.uint8)
    rc = lib.pil_resize_rgb8(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        img.shape[0], img.shape[1],
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)), out_h, out_w,
    )
    if rc != 0:
        raise RuntimeError(f"native resize failed ({rc})")
    return out


def decode_resize_batch_native(
    paths: List[str], size_hw: Tuple[int, int]
) -> Tuple[np.ndarray, np.ndarray]:
    """→ ((N, H, W, 3) uint8 batch, (N,) int32 status; 0 = ok).

    Failed rows are zeroed — the caller decides whether to PIL-fallback
    them (data/loader.py does, per image)."""
    lib = _get_lib()
    if lib is None:
        raise RuntimeError("native imageio unavailable")
    h, w = size_hw
    n = len(paths)
    out = np.empty((n, h, w, 3), np.uint8)
    status = np.zeros(n, np.int32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    lib.decode_resize_batch(
        arr, n, h, w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        status.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
    )
    return out, status
