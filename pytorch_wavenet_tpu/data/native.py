"""ctypes bindings for the native featurization library (native/audio_native.cc).

Builds the shared library on demand with g++ and falls back to numpy
implementations when a toolchain isn't available — the framework never hard
-requires the native path, it's a host-side throughput optimization (the
reference's equivalent hot loops run in python inside DataLoader workers,
reference: audio_data.py:91-123, wavenet_training.py:55-59).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "audio_native.cc")
_LIB_PATH = os.path.join(_REPO_ROOT, "native", "libaudio_native.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> str | None:
    if os.path.exists(_LIB_PATH) and os.path.getmtime(_LIB_PATH) >= os.path.getmtime(_SRC):
        return _LIB_PATH
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-fPIC", "-shared", "-o", _LIB_PATH, _SRC],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return _LIB_PATH
    except (OSError, subprocess.SubprocessError):
        return None


def get_lib():
    """Load (building if needed) the native library, or None."""
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SRC):
            return None
        path = _build()
        if path is None:
            return None
        try:
            lib = ctypes.CDLL(path)
        except OSError:
            return None
        c_i64 = ctypes.c_int64
        c_i32 = ctypes.c_int32
        p_f32 = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        p_u8 = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        p_i16 = np.ctypeslib.ndpointer(np.int16, flags="C_CONTIGUOUS")
        p_i32 = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        p_i64 = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
        lib.mu_law_encode.argtypes = [p_f32, p_f32, c_i64, c_i32]
        lib.mu_law_expand.argtypes = [p_f32, p_f32, c_i64, c_i32]
        lib.mu_law_quantize.argtypes = [p_f32, p_u8, c_i64, c_i32]
        lib.mu_law_dequantize.argtypes = [p_u8, p_f32, c_i64, c_i32]
        lib.pcm16_to_float_mono.argtypes = [p_i16, p_f32, c_i64, c_i32]
        lib.gather_windows.argtypes = [
            p_u8, c_i64, p_i64, c_i32, c_i32, c_i32, p_i32, p_i32,
        ]
        lib.native_abi_version.restype = c_i32
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None


def mu_law_quantize(x: np.ndarray, classes: int) -> np.ndarray:
    """Native quantizer with numpy fallback (reference semantics:
    audio_data.py:133-137)."""
    lib = get_lib()
    x = np.ascontiguousarray(x, np.float32)
    if lib is None:
        from ..ops.mulaw import quantize_data

        return quantize_data(x, classes).astype(np.uint8)
    out = np.empty(x.shape, np.uint8)
    lib.mu_law_quantize(x.reshape(-1), out.reshape(-1), x.size, classes)
    return out


def mu_law_dequantize(q: np.ndarray, classes: int) -> np.ndarray:
    lib = get_lib()
    q = np.ascontiguousarray(q, np.uint8)
    if lib is None:
        from ..ops.mulaw import dequantize_data

        return dequantize_data(q, classes).astype(np.float32)
    out = np.empty(q.shape, np.float32)
    lib.mu_law_dequantize(q.reshape(-1), out.reshape(-1), q.size, classes)
    return out


def pcm16_to_float_mono(pcm: np.ndarray, channels: int) -> np.ndarray:
    lib = get_lib()
    pcm = np.ascontiguousarray(pcm, np.int16)
    frames = pcm.size // channels
    if lib is None:
        x = pcm.astype(np.float32).reshape(frames, channels) / 32768.0
        return x.mean(axis=1) if channels > 1 else x[:, 0]
    out = np.empty(frames, np.float32)
    lib.pcm16_to_float_mono(pcm.reshape(-1), out, frames, channels)
    return out


def gather_windows(
    stream: np.ndarray, starts: np.ndarray, item_len: int, target_len: int
) -> tuple[np.ndarray, np.ndarray]:
    """Batched window gather over the flat class stream."""
    lib = get_lib()
    stream = np.ascontiguousarray(stream, np.uint8)
    starts = np.ascontiguousarray(starts, np.int64)
    b = len(starts)
    if lib is None:
        x = np.empty((b, item_len), np.int32)
        y = np.empty((b, target_len), np.int32)
        for i, s in enumerate(starts):
            x[i] = stream[s : s + item_len]
            y[i] = stream[s + item_len + 1 - target_len : s + item_len + 1]
        return x, y
    x = np.empty((b, item_len), np.int32)
    y = np.empty((b, target_len), np.int32)
    lib.gather_windows(stream, stream.size, starts, b, item_len, target_len, x, y)
    return x, y
