"""ctypes bindings to the native host runtime
(theoremsearch_tpu/native/theoremsearch_native.cpp).

Loads libtheoremsearch_native.so (building it with make on first use when
a toolchain is present); every entry point has a numpy fallback so the
framework never hard-depends on the native build. The C++ source and
Makefile ship inside the package, so an installed wheel builds the
native path the same way the repo checkout does.
"""

from __future__ import annotations

import ctypes
import subprocess
import threading
from pathlib import Path

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parents[1] / "native"
_LIB_PATH = _NATIVE_DIR / "libtheoremsearch_native.so"
_SRC_PATH = _NATIVE_DIR / "theoremsearch_native.cpp"
_lib = None
_tried = False
_load_lock = threading.Lock()


def _stale() -> bool:
    try:
        return (
            not _LIB_PATH.exists()
            or _SRC_PATH.stat().st_mtime > _LIB_PATH.stat().st_mtime
        )
    except OSError:
        return True


def _load():
    """Build (or REBUILD when the source is newer than the .so — a stale
    binary silently ignoring source edits is worse than a rebuild) and
    dlopen once, under a lock: concurrent first callers must not race
    make against CDLL of a half-written library."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    with _load_lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            if _stale():
                subprocess.run(
                    ["make", "-B", "-C", str(_NATIVE_DIR)],
                    check=True, capture_output=True, timeout=120,
                )
            lib = ctypes.CDLL(str(_LIB_PATH))
            lib.ts_l2_normalize.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
            ]
            lib.ts_quantize_int8.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int8), ctypes.POINTER(ctypes.c_float),
            ]
            lib.ts_absmax.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
            ]
            lib.ts_absmax.restype = ctypes.c_float
            lib.ts_quantize_global_int8.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
                ctypes.c_float, ctypes.POINTER(ctypes.c_int8),
            ]
            lib.ts_merge_topk.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
            ]
            lib.ts_strip_comments.argtypes = [
                ctypes.c_char_p, ctypes.c_int64, ctypes.c_char_p,
            ]
            lib.ts_strip_comments.restype = ctypes.c_int64
            _lib = lib
        except Exception:
            _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _iptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def l2_normalize_(x: np.ndarray) -> np.ndarray:
    """Row L2 normalization. In place ONLY for contiguous float32 input;
    otherwise ascontiguousarray copies and the normalized COPY is
    returned — always rebind (`x = native.l2_normalize_(x)`), never rely
    on mutation."""
    lib = _load()
    x = np.ascontiguousarray(x, np.float32)
    if lib is None:
        n = np.linalg.norm(x, axis=1, keepdims=True)
        x /= np.maximum(n, 1e-12)
        return x
    lib.ts_l2_normalize(_fptr(x), x.shape[0], x.shape[1])
    return x


def quantize_int8(x: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(codes int8 (N,D), scales f32 (N,)) — native when available."""
    lib = _load()
    x = np.ascontiguousarray(x, np.float32)
    if lib is None:
        absmax = np.abs(x).max(axis=-1)
        scales = np.where(absmax > 0, absmax / 127.0, 1.0).astype(np.float32)
        codes = np.clip(np.rint(x / scales[:, None]), -127, 127).astype(np.int8)
        return codes, scales
    n, d = x.shape
    codes = np.empty((n, d), np.int8)
    scales = np.empty(n, np.float32)
    lib.ts_quantize_int8(
        _fptr(x), n, d, codes.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)), _fptr(scales)
    )
    return codes, scales


def quantize_global_int8(
    x: np.ndarray, scale: float | None = None
) -> tuple[np.ndarray, float]:
    """(codes int8 (N,D), global scale) — threaded native path; chunked
    numpy fallback (the naive round/clip/astype chain allocates three
    full-size f32 temporaries, ~12 GB at 4M x 1024)."""
    lib = _load()
    x = np.ascontiguousarray(x, np.float32)
    n, d = x.shape
    if lib is not None:
        if scale is None:
            amax = float(lib.ts_absmax(_fptr(x), n, d))
            scale = amax / 127.0 if amax > 0 else 1.0
        codes = np.empty((n, d), np.int8)
        lib.ts_quantize_global_int8(
            _fptr(x), n, d, ctypes.c_float(scale),
            codes.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
        )
        return codes, float(scale)
    if scale is None:
        amax = float(np.abs(x).max()) if x.size else 0.0
        scale = amax / 127.0 if amax > 0 else 1.0
    codes = np.empty((n, d), np.int8)
    step = max(1, (1 << 24) // max(d, 1))  # ~64 MB f32 temporaries
    for i in range(0, n, step):
        codes[i : i + step] = np.clip(
            np.rint(x[i : i + step] / scale), -127, 127
        ).astype(np.int8)
    return codes, float(scale)


def merge_topk(scores: np.ndarray, ids: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    """Host-side exact k-way merge: (B, C) candidates -> (B, k) desc."""
    lib = _load()
    scores = np.ascontiguousarray(scores, np.float32)
    ids = np.ascontiguousarray(ids, np.int32)
    b, c = scores.shape
    if lib is None:
        sel = np.argsort(-scores, axis=1, kind="stable")[:, :k]
        s = np.take_along_axis(scores, sel, 1)
        i = np.take_along_axis(ids, sel, 1)
        if k > c:   # match the native contract: pad out to (B, k)
            s = np.pad(s, ((0, 0), (0, k - c)), constant_values=-np.inf)
            i = np.pad(i, ((0, 0), (0, k - c)), constant_values=-1)
        return s, i
    out_s = np.empty((b, k), np.float32)
    out_i = np.empty((b, k), np.int32)
    lib.ts_merge_topk(_fptr(scores), _iptr(ids), b, c, k, _fptr(out_s), _iptr(out_i))
    return out_s, out_i


def strip_comments(src: str) -> str:
    """Native LaTeX comment stripper (line comments only; the Python layer
    handles verbatim environments)."""
    lib = _load()
    if lib is None:
        i, n, buf = 0, len(src), []
        while i < n:
            ch = src[i]
            if ch == "\\" and i + 1 < n:
                buf.append(src[i : i + 2]); i += 2; continue
            if ch == "%":
                j = src.find("\n", i); i = n if j < 0 else j; continue
            buf.append(ch); i += 1
        return "".join(buf)
    raw = src.encode("utf-8")
    dst = ctypes.create_string_buffer(len(raw) + 1)
    out_len = lib.ts_strip_comments(raw, len(raw), dst)
    return dst.raw[:out_len].decode("utf-8", errors="replace")
