"""ctypes bindings for the native batch packer (native/pack.cc).

Auto-builds `native/libcvc_pack.so` with g++ on first use; every entry
point has a numpy fallback so the framework works without a toolchain.
The ABI takes per-example pointer tables, so Python does no staging
copies — each example's arrays are read in place by the OpenMP loop.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libcvc_pack.so")
_lock = threading.Lock()
_lib = None
_tried = False

_FP = ctypes.POINTER(ctypes.c_float)
_IP = ctypes.POINTER(ctypes.c_int32)


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            if not os.path.exists(_LIB_PATH):
                subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                               capture_output=True)
            lib = ctypes.CDLL(_LIB_PATH)
            lib.cvc_pack_batch.argtypes = [
                ctypes.POINTER(_FP), ctypes.POINTER(_FP), ctypes.POINTER(_IP),
                _IP, _IP,
                ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
                ctypes.c_int32,
                _FP, _FP, _IP, _FP,
            ]
            lib.cvc_pack_tokens.argtypes = [
                ctypes.POINTER(_IP), _IP,
                ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
                ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
                _IP, _FP,
            ]
            lib.cvc_pack_version.restype = ctypes.c_int32
            assert lib.cvc_pack_version() == 2
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def available() -> bool:
    return _load() is not None


def _ptr(a, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def pack_batch_native(examples, num_frames: int, num_regions: int,
                      feat_dim: int):
    """examples: list of (feats [F,N,D] or [N,D], boxes [.,4], classes [.]).
    Returns (feats [B,S,D], geom [B,S,5], cls [B,S], mask [B,S]) or None
    if the native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    B = len(examples)
    S = num_frames * num_regions
    keep = []          # keeps contiguous views alive through the call
    fptrs, bptrs, cptrs = (_FP * B)(), (_FP * B)(), (_IP * B)()
    frames = np.empty((B,), np.int32)
    regions = np.empty((B,), np.int32)
    for i, (f, b, c) in enumerate(examples):
        if f.ndim == 2:
            f, b, c = f[None], b[None], c[None]
        F, N = f.shape[0], f.shape[1]
        if f.shape[-1] != feat_dim:
            f = f[..., :feat_dim]
        fa = np.ascontiguousarray(f, np.float32)
        ba = np.ascontiguousarray(b, np.float32)
        ca = np.ascontiguousarray(c, np.int32)
        keep.extend((fa, ba, ca))
        fptrs[i] = _ptr(fa, ctypes.c_float)
        bptrs[i] = _ptr(ba, ctypes.c_float)
        cptrs[i] = _ptr(ca, ctypes.c_int32)
        frames[i], regions[i] = F, N

    out_feats = np.empty((B, S, feat_dim), np.float32)
    out_geom = np.empty((B, S, 5), np.float32)
    out_cls = np.empty((B, S), np.int32)
    out_mask = np.empty((B, S), np.float32)
    lib.cvc_pack_batch(
        fptrs, bptrs, cptrs,
        _ptr(frames, ctypes.c_int32), _ptr(regions, ctypes.c_int32),
        B, num_frames, num_regions, feat_dim,
        _ptr(out_feats, ctypes.c_float), _ptr(out_geom, ctypes.c_float),
        _ptr(out_cls, ctypes.c_int32), _ptr(out_mask, ctypes.c_float))
    del keep
    return out_feats, out_geom, out_cls, out_mask


def pack_tokens_native(id_lists, seq_length: int, max_tokens: int,
                       bos: int, eos: int, pad: int):
    """id_lists: list of int lists (already vocab-mapped, unpadded).
    Returns (tokens [B,T] int32, mask [B,T] f32) or None."""
    lib = _load()
    if lib is None:
        return None
    B = len(id_lists)
    lengths = np.empty((B,), np.int32)
    arrs = []
    ptrs = (_IP * B)()
    for i, ids in enumerate(id_lists):
        a = np.ascontiguousarray(ids if len(ids) else [0], np.int32)
        arrs.append(a)
        ptrs[i] = _ptr(a, ctypes.c_int32)
        lengths[i] = len(ids)
    out_tokens = np.empty((B, max_tokens), np.int32)
    out_mask = np.empty((B, max_tokens), np.float32)
    lib.cvc_pack_tokens(
        ptrs, _ptr(lengths, ctypes.c_int32),
        B, seq_length, max_tokens, bos, eos, pad,
        _ptr(out_tokens, ctypes.c_int32), _ptr(out_mask, ctypes.c_float))
    del arrs
    return out_tokens, out_mask
