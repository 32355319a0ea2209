"""ctypes bindings for the native C++ batch JPEG decoder.

Builds ``native/libframe_decoder.so`` on demand (g++ + libjpeg are part of
the target image) and exposes :func:`decode_frames`. Falls back to PIL when
the library can't be built/loaded or when a file isn't a plain baseline JPEG
of the expected geometry — the pipeline never hard-fails on the native path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO, "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libframe_decoder.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_lib_failed = False


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR],
                       check=True, capture_output=True, timeout=120)
        return os.path.isfile(_LIB_PATH)
    except Exception:
        return False


def get_library() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the decoder library; None if unavailable."""
    global _lib, _lib_failed
    with _lock:
        if _lib is not None or _lib_failed:
            return _lib
        if not os.path.isfile(_LIB_PATH) and not _build():
            _lib_failed = True
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
            lib.decode_jpeg_frames.restype = ctypes.c_int
            lib.decode_jpeg_frames.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
                ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int, ctypes.c_int,
                ctypes.c_int]
            assert lib.frame_decoder_version() == 1
            _lib = lib
        except Exception:
            _lib_failed = True
        return _lib


def decode_frames(paths: Sequence[str], height: int, width: int,
                  n_threads: int = 8) -> np.ndarray:
    """Decode JPEG ``paths`` into a uint8 ``[N, H, W, 3]`` array.

    Uses the native threaded decoder when every file decodes cleanly at the
    expected geometry; otherwise falls back to PIL for the whole batch.
    """
    n = len(paths)
    out = np.empty((n, height, width, 3), dtype=np.uint8)
    lib = get_library()
    if lib is not None and n > 0:
        arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
        rc = lib.decode_jpeg_frames(
            arr, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
            height, width, n_threads)
        if rc == 0:
            return out
    # PIL fallback (also covers non-256 dumps and non-JPEG formats)
    from PIL import Image

    for i, p in enumerate(paths):
        with Image.open(p) as im:
            im = im.convert("RGB")
            if im.size != (width, height):
                # aspect-preserving resize + center crop (the documented
                # Resize(short-side)+crop geometry, reference
                # video_reader.py:104) — NOT an anisotropic stretch, which
                # would silently distort mixed-resolution dumps
                w0, h0 = im.size
                scale = max(width / w0, height / h0)
                im = im.resize((max(width, round(w0 * scale)),
                                max(height, round(h0 * scale))))
                w1, h1 = im.size
                left, top = (w1 - width) // 2, (h1 - height) // 2
                im = im.crop((left, top, left + width, top + height))
            out[i] = np.asarray(im, dtype=np.uint8)
    return out
