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
_CIDER_PATH = os.path.join(_NATIVE_DIR, "libcvc_cider.so")
_lock = threading.Lock()
_lib = None
_tried = False
_cider_lib = None
_cider_tried = False

_FP = ctypes.POINTER(ctypes.c_float)
_IP = ctypes.POINTER(ctypes.c_int32)
_LP = ctypes.POINTER(ctypes.c_int64)
_DP = ctypes.POINTER(ctypes.c_double)


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


# ---------------------------------------------------------------------------
# Native CIDEr-D scorer (native/cider.cc)
# ---------------------------------------------------------------------------

def _load_cider():
    global _cider_lib, _cider_tried
    with _lock:
        if _cider_lib is not None or _cider_tried:
            return _cider_lib
        _cider_tried = True
        try:
            if not os.path.exists(_CIDER_PATH):
                subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                               capture_output=True)
            lib = ctypes.CDLL(_CIDER_PATH)
            lib.cvc_cider_df_build.restype = ctypes.c_void_p
            lib.cvc_cider_df_build.argtypes = [_IP, _LP, _LP,
                                               ctypes.c_int32,
                                               ctypes.c_int32]
            lib.cvc_cider_df_free.argtypes = [ctypes.c_void_p]
            lib.cvc_cider_score.argtypes = [
                _IP, _LP, _IP, _LP, _LP, ctypes.c_int32, ctypes.c_int32,
                ctypes.c_double, ctypes.c_void_p, _DP,
            ]
            lib.cvc_cider_version.restype = ctypes.c_int32
            assert lib.cvc_cider_version() == 1
            _cider_lib = lib
        except Exception:
            _cider_lib = None
        return _cider_lib


def cider_available() -> bool:
    return _load_cider() is not None


def _flatten_ids(seqs):
    """list of id-lists -> (flat int32 array, offsets int64 [n+1])."""
    off = np.zeros((len(seqs) + 1,), np.int64)
    for i, s in enumerate(seqs):
        off[i + 1] = off[i] + len(s)
    flat = (np.concatenate([np.asarray(s, np.int32) for s in seqs])
            if off[-1] else np.zeros((0,), np.int32))
    return np.ascontiguousarray(flat), off


def _flatten_ref_sets(ref_sets):
    """list (per image) of list of id-lists -> (flat, ref_off, img_off)."""
    all_refs = [r for refs in ref_sets for r in refs]
    flat, ref_off = _flatten_ids(all_refs)
    img_off = np.zeros((len(ref_sets) + 1,), np.int64)
    for i, refs in enumerate(ref_sets):
        img_off[i + 1] = img_off[i] + len(refs)
    return flat, ref_off, img_off


class NativeCiderDf:
    """Owns a C++ corpus document-frequency table (SCST train-corpus DF)."""

    def __init__(self, ref_sets_ids):
        lib = _load_cider()
        if lib is None:
            raise RuntimeError("native cider unavailable")
        flat, ref_off, img_off = _flatten_ref_sets(ref_sets_ids)
        self._lib = lib
        self._handle = lib.cvc_cider_df_build(
            _ptr(flat, ctypes.c_int32), _ptr(ref_off, ctypes.c_int64),
            _ptr(img_off, ctypes.c_int64), len(ref_sets_ids), 4)

    def __del__(self):
        try:
            if getattr(self, "_handle", None):
                self._lib.cvc_cider_df_free(self._handle)
        except Exception:
            pass


def cider_score_native(cand_ids, ref_sets_ids, sigma: float = 6.0,
                       max_n: int = 4, df: "NativeCiderDf | None" = None):
    """cand_ids: per-image token-id list; ref_sets_ids: per-image list of
    reference id lists.  Returns np.ndarray [n_images] of CIDEr-D*10
    scores, or None if the native library is unavailable."""
    lib = _load_cider()
    if lib is None:
        return None
    n = len(cand_ids)
    cflat, coff = _flatten_ids(cand_ids)
    rflat, roff, imgoff = _flatten_ref_sets(ref_sets_ids)
    out = np.empty((n,), np.float64)
    lib.cvc_cider_score(
        _ptr(cflat, ctypes.c_int32), _ptr(coff, ctypes.c_int64),
        _ptr(rflat, ctypes.c_int32), _ptr(roff, ctypes.c_int64),
        _ptr(imgoff, ctypes.c_int64), n, max_n, sigma,
        df._handle if df is not None else None, out.ctypes.data_as(_DP))
    return out
