"""ctypes bindings for the native host library (native/l3host.cpp).

Loads native/libl3host.so, building it on first use when a C++ compiler
is available; every entry point has a numpy fallback so the framework is
fully functional without the native library (`available()` reports which
path is active). These are the host-side hot ops of the sample factory
and input pipeline — the accelerator-side compute is JAX/XLA/Pallas.
"""

from __future__ import annotations

import ctypes
import logging
import os
import shutil
import subprocess

import numpy as np

LOGGER = logging.getLogger("l3embedding_tpu.native")

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "libl3host.so")

_lib = None
_tried = False


def _build() -> bool:
    cxx = shutil.which("g++") or shutil.which("c++")
    if cxx is None:
        return False
    try:
        subprocess.run(
            [cxx, "-O3", "-fPIC", "-shared", "-std=c++17",
             "-o", _LIB_PATH, os.path.join(_NATIVE_DIR, "l3host.cpp")],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except (subprocess.CalledProcessError, subprocess.TimeoutExpired) as e:
        LOGGER.warning("native build failed: %s", e)
        return False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH) and not _build():
        LOGGER.info("libl3host.so unavailable; using numpy fallbacks")
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.l3host_abi_version.restype = ctypes.c_int
        if lib.l3host_abi_version() != 1:
            raise OSError("ABI version mismatch")
        lib.pcm16_to_float.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64]
        lib.u8_to_pm1.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64]
        lib.augment_frame_u8.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int, ctypes.c_double, ctypes.c_double, ctypes.c_int]
        lib.gain_i16.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_double]
        lib.resize_nn_u8.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64]
        _lib = lib
    except OSError as e:
        LOGGER.warning("could not load libl3host.so: %s", e)
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def pcm16_to_float(x: np.ndarray) -> np.ndarray:
    """int16 → float32 in [-1, 1)."""
    x = np.ascontiguousarray(x, dtype=np.int16)
    lib = _load()
    if lib is None:
        return (x.astype(np.float32) / 32768.0)
    out = np.empty(x.shape, np.float32)
    lib.pcm16_to_float(x.ctypes.data, out.ctypes.data, x.size)
    return out


def u8_to_pm1(x: np.ndarray) -> np.ndarray:
    """uint8 → float32 in [-1, 1]."""
    x = np.ascontiguousarray(x, dtype=np.uint8)
    lib = _load()
    if lib is None:
        return 2.0 * (x.astype(np.float32) / 255.0) - 1.0
    out = np.empty(x.shape, np.float32)
    lib.u8_to_pm1(x.ctypes.data, out.ctypes.data, x.size)
    return out


def augment_frame(
    frame: np.ndarray,
    flip: bool,
    saturation_factor: float,
    brightness_delta: float,
    sat_first: bool,
) -> np.ndarray:
    """Fused flip + saturation + brightness on a uint8 (H, W, 3) frame.

    Equivalent to the reference chain horiz_flip → adjust_saturation →
    adjust_brightness (order per sat_first) on float images
    (reference sample.py:236-276)."""
    frame = np.ascontiguousarray(frame, dtype=np.uint8)
    lib = _load()
    if lib is None:
        from ..ops import image as I

        f = I.img_as_float(frame)
        if flip:
            f = I.horiz_flip(f)
        if sat_first:
            f = I.adjust_saturation(f, saturation_factor)
            f = I.adjust_brightness(f, brightness_delta)
        else:
            f = I.adjust_brightness(f, brightness_delta)
            f = I.adjust_saturation(f, saturation_factor)
        return I.img_as_ubyte(f)
    h, w, _ = frame.shape
    out = np.empty_like(frame)
    lib.augment_frame_u8(
        frame.ctypes.data, out.ctypes.data, h, w,
        int(flip), float(saturation_factor), float(brightness_delta),
        int(sat_first),
    )
    return out


def gain_i16(x: np.ndarray, gain: float) -> np.ndarray:
    x = np.ascontiguousarray(x, dtype=np.int16)
    lib = _load()
    if lib is None:
        return np.clip(x.astype(np.float64) * gain, -32768, 32767).astype(
            np.int16
        )
    out = np.empty(x.shape, np.int16)
    lib.gain_i16(x.ctypes.data, out.ctypes.data, x.size, float(gain))
    return out


def resize_nn(frame: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    frame = np.ascontiguousarray(frame, dtype=np.uint8)
    in_h, in_w, _ = frame.shape
    lib = _load()
    if lib is None:
        yi = np.minimum(in_h - 1, np.arange(out_h) * in_h // out_h)
        xi = np.minimum(in_w - 1, np.arange(out_w) * in_w // out_w)
        return frame[yi][:, xi]
    out = np.empty((out_h, out_w, 3), np.uint8)
    lib.resize_nn_u8(frame.ctypes.data, in_h, in_w, out.ctypes.data,
                     out_h, out_w)
    return out
