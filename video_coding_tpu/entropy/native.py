"""ctypes bindings for the native entropy engine (native/entropy.cpp).

Loads (and if necessary builds) libvctentropy.so. All entry points have
pure-Python fallbacks in scan.py, so absence of a toolchain degrades
gracefully.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libvctentropy.so")

# Must match native/entropy.cpp vct_version() — bump both together.
_ABI_VERSION = 7

_lib = None


def _try_build() -> bool:
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True, timeout=120)
        return os.path.exists(_SO_PATH)
    except Exception:
        return False


def _stale() -> bool:
    src = os.path.join(_NATIVE_DIR, "entropy.cpp")
    try:
        return os.path.getmtime(src) > os.path.getmtime(_SO_PATH)
    except OSError:
        return True


def load():
    """Load the shared library, (re)building when missing or older than
    its source. Returns the ctypes lib or None."""
    global _lib
    if _lib is not None:
        return _lib
    if (not os.path.exists(_SO_PATH) or _stale()) and not _try_build():
        if not os.path.exists(_SO_PATH):
            return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
    except OSError:
        return None
    # A stale prebuilt .so (e.g. rebuilt failed for lack of a toolchain)
    # may predate the symbols bound below; verify the ABI version first
    # and fall back to the pure-Python tiers rather than raising from
    # load()/available().
    try:
        lib.vct_version.restype = ctypes.c_int32
        if lib.vct_version() != _ABI_VERSION:
            return None
    except AttributeError:
        return None

    i64 = ctypes.c_int64
    i32 = ctypes.c_int32
    p_u8 = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    p_i32 = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    p_i64 = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    p_u16 = np.ctypeslib.ndpointer(np.uint16, flags="C_CONTIGUOUS")
    p_u8t = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")

    lib.vct_decode_blocks.restype = i64
    lib.vct_decode_blocks.argtypes = [
        p_u8, p_i64, i64,          # data, seg_offsets, n_segments
        p_i32, i64, i64, i32,      # comp_idx, n_blocks, blocks/seg, n_comp
        p_i32, p_i32, p_i64,       # dc maxbits, lut, offsets
        p_i32, p_i32, p_i64,       # ac maxbits, lut, offsets
        p_i32, i32,                # out_coefs, n_threads
    ]

    lib.vct_decode_blocks_resync.restype = i64
    lib.vct_decode_blocks_resync.argtypes = [
        p_u8, p_i64, i64,          # data, seg_offsets, n_segments
        p_i32, i64, i64, i32,      # comp_idx, n_blocks, blocks/seg, n_comp
        p_i32, p_i32, p_i64,       # dc maxbits, lut, offsets
        p_i32, p_i32, p_i64,       # ac maxbits, lut, offsets
        p_i32, p_i64, i32,         # out_coefs, seg_status, n_threads
    ]

    lib.vct_encode_blocks.restype = i64
    lib.vct_encode_blocks.argtypes = [
        p_i32, p_i32, i64, i64, i64, i32,   # qcoefs, comp_idx, n_blocks, b/seg, n_seg, n_comp
        p_u16, p_u8t, p_u16, p_u8t,         # dc bits/len, ac bits/len
        p_u8, i64, p_i64, i32,              # out, seg_stride, seg_lens, n_threads
    ]

    p_i16 = np.ctypeslib.ndpointer(np.int16, flags="C_CONTIGUOUS")
    lib.vct_encode_blocks_i16.restype = i64
    lib.vct_encode_blocks_i16.argtypes = [
        p_i16, p_i32, i64, i64, i64, i32,   # qcoefs, comp_idx, n_blocks, b/seg, n_seg, n_comp
        p_u16, p_u8t, p_u16, p_u8t,         # dc bits/len, ac bits/len
        p_u8, i64, p_i64, i32,              # out, seg_stride, seg_lens, n_threads
    ]

    lib.vct_assemble_stream.restype = i64
    lib.vct_assemble_stream.argtypes = [p_u8, i64, p_i64, i64, p_u8]

    lib.vct_index_scan.restype = i64
    lib.vct_index_scan.argtypes = [
        p_u8, i64,                 # data, data_len
        p_i32, i64, i32,           # comp_idx, n_blocks, n_comp
        p_i32, p_i32, p_i64,       # dc maxbits, lut, offsets
        p_i32, p_i32, p_i64,       # ac maxbits, lut, offsets
        i64, p_i64, p_i32,         # stride, bit_offsets, dc_preds
    ]

    lib.vct_destuff_segments.restype = i64
    lib.vct_destuff_segments.argtypes = [p_u8, i64, p_u8, p_i64, i64]

    lib.vct_destuff_segments_m.restype = i64
    lib.vct_destuff_segments_m.argtypes = [p_u8, i64, p_u8, p_i64, p_i64, i64]

    lib.vct_pack_lanes.restype = None
    lib.vct_pack_lanes.argtypes = [
        p_u8, p_i64, p_i64, p_i32,  # flat, starts, lens, order
        i64, i64, p_u8,             # n_segments, stride, out
    ]

    _lib = lib
    return _lib


def available() -> bool:
    return load() is not None
