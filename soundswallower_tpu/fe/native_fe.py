"""ctypes binding for the native (C++) MFCC front end.

`NativeFrontend` wraps native/libsst_fe.so and is bit-exact with
`Frontend.mfcc` (and therefore with the reference C front end,
src/fe_sigproc.c): all precomputed tables are taken straight from a
`Frontend` instance so table construction arithmetic is shared, and the
per-frame compute follows the same IEEE f64/f32 operation sequences
(the .so is built with -ffp-contract=off).

Used by the aligner's host-FE fast path: on a tunnel-attached TPU,
uploading 13-dim cepstra instead of raw 16 kHz audio cuts host->device
bytes ~6.7x, which is the end-to-end throughput bound.  Returns None
from `load()` when the .so is missing (pure-JAX fallback).

Caveat: remove_dc=True uses a left-to-right f64 sum for the frame mean
where XLA may use a different reduction order; parity is guaranteed for
the default remove_dc=False.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_LIB_TRIED = False

_TRANSFORM_ID = {"legacy": 0, "dct": 1, "htk": 2}


def _cpu_has_avx512f() -> bool:
    """Runtime ISA probe (Linux): the AVX-512 build is only loaded on
    hosts whose cpuinfo advertises avx512f — the portable build is the
    fallback everywhere else (advisor r3: a hard -mavx512f requirement
    SIGILLed on older x86 and broke ARM)."""
    try:
        with open("/proc/cpuinfo") as fh:
            return "avx512f" in fh.read()
    except OSError:
        return False


def _lib():
    global _LIB, _LIB_TRIED
    if _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    from ..utils.native_build import load_native
    lib = None
    if _cpu_has_avx512f():
        lib = load_native("libsst_fe_avx512.so")
    if lib is None:
        lib = load_native("libsst_fe.so")
    if lib is None:
        return None
    c = ctypes
    lib.sst_fe_create.restype = c.c_void_p
    lib.sst_fe_create.argtypes = [
        c.c_int, c.c_int, c.c_int, c.c_int, c.c_int,        # shift/size/nfft/ncep/nfilt
        c.c_double, c.c_int, c.c_int, c.c_int,              # alpha/transform/noise/dc
        c.POINTER(c.c_double), c.POINTER(c.c_double),       # window, ccc
        c.POINTER(c.c_double), c.POINTER(c.c_int32),        # sss, perm
        c.POINTER(c.c_int32), c.POINTER(c.c_int32),         # spec_start, widths
        c.POINTER(c.c_float), c.c_int,                      # coeff, maxw
        c.POINTER(c.c_float), c.POINTER(c.c_float),         # mel_cosine, lifter
        c.c_float, c.c_float,                               # sqrt_inv_n, sqrt_inv_2n
    ]
    lib.sst_fe_free.argtypes = [c.c_void_p]
    lib.sst_fe_process_batch.argtypes = [
        c.c_void_p, c.POINTER(c.c_int16), c.c_int, c.c_int64,
        c.POINTER(c.c_int32), c.c_int, c.POINTER(c.c_float), c.c_int,
    ]
    lib.sst_fe_process_batch_i16p.argtypes = [
        c.c_void_p, c.POINTER(c.c_int16), c.c_int, c.c_int64,
        c.POINTER(c.c_int32), c.c_int, c.POINTER(c.c_uint8), c.c_float,
        c.c_int,
    ]
    lib.sst_fe_process_batch_i16p_ptrs.argtypes = [
        c.c_void_p, c.POINTER(c.POINTER(c.c_int16)),
        c.POINTER(c.c_int32), c.c_int, c.c_int, c.POINTER(c.c_uint8),
        c.c_float, c.c_int,
    ]
    _LIB = lib
    return lib


def _ptr(arr: np.ndarray, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


class NativeFrontend:
    """Host-side batch MFCC, bit-exact with `Frontend`.  Construct via
    `NativeFrontend.load(frontend)`; returns None if the .so is absent
    or the config is unsupported."""

    def __init__(self, fe, lib):
        self._lib = lib
        self.ncep = fe.num_cepstra
        # keep table arrays alive for the C side (copied at create, but
        # keep references anyway for the ctypes call)
        window = np.ascontiguousarray(fe._window, np.float64)
        ccc = np.ascontiguousarray(fe._ccc, np.float64)
        sss = np.ascontiguousarray(fe._sss, np.float64)
        perm = np.ascontiguousarray(fe._perm, np.int32)
        spec_start = np.ascontiguousarray(fe._spec_start, np.int32)
        widths = np.ascontiguousarray(fe._widths, np.int32)
        coeff = np.ascontiguousarray(fe._coeff_mat, np.float32)
        mc = np.ascontiguousarray(fe._mel_cosine, np.float32)
        lifter = (np.ascontiguousarray(fe._lifter, np.float32)
                  if fe._lifter is not None else None)
        self._h = lib.sst_fe_create(
            fe.frame_shift, fe.frame_size, fe.fft_size, fe.num_cepstra,
            fe.num_filters,
            # alpha is f32-rounded before the f64 multiply, matching
            # Frontend.mfcc_chunk's jnp.asarray(np.float32(alpha), f64)
            float(np.float32(fe.pre_emphasis_alpha)),
            _TRANSFORM_ID[fe.transform],
            int(bool(fe.remove_noise)), int(bool(fe.remove_dc)),
            _ptr(window, ctypes.c_double), _ptr(ccc, ctypes.c_double),
            _ptr(sss, ctypes.c_double), _ptr(perm, ctypes.c_int32),
            _ptr(spec_start, ctypes.c_int32), _ptr(widths, ctypes.c_int32),
            _ptr(coeff, ctypes.c_float), fe._maxw,
            _ptr(mc, ctypes.c_float),
            _ptr(lifter, ctypes.c_float) if lifter is not None else None,
            float(fe._sqrt_inv_n), float(fe._sqrt_inv_2n),
        )
        if not self._h:
            raise RuntimeError("sst_fe_create failed")

    @classmethod
    def load(cls, fe) -> "NativeFrontend | None":
        if fe.transform not in _TRANSFORM_ID or fe.fft_size > 4096:
            return None
        if fe.remove_dc:
            # remove_dc parity is not guaranteed (XLA may reorder the f64
            # frame-mean reduction); fall back to the device FE so the
            # single-utterance and batch paths always agree.
            return None
        lib = _lib()
        if lib is None:
            return None
        return cls(fe, lib)

    def __del__(self):
        h = getattr(self, "_h", None)
        if h and self._lib is not None:
            self._lib.sst_fe_free(h)
            self._h = None

    def process_batch(self, audio: np.ndarray, n_samps: np.ndarray,
                      Tmax: int, nthreads: int = 0) -> np.ndarray:
        """audio int16 [B, N] (rows zero-padded), n_samps [B] ->
        cep float32 [B, Tmax, ncep] (rows >= n_frames zeroed)."""
        audio = np.ascontiguousarray(audio, np.int16)
        if audio.ndim != 2:
            raise ValueError("audio must be [B, N] int16")
        B, N = audio.shape
        ns = np.ascontiguousarray(n_samps, np.int32)
        out = np.empty((B, Tmax, self.ncep), np.float32)
        self._lib.sst_fe_process_batch(
            self._h, _ptr(audio, ctypes.c_int16), B, N,
            _ptr(ns, ctypes.c_int32), Tmax, _ptr(out, ctypes.c_float),
            nthreads)
        return out

    def process_batch_i16p(self, audio: np.ndarray, n_samps: np.ndarray,
                           Tmax: int, scale: float = 256.0,
                           nthreads: int = 0) -> np.ndarray:
        """Wire-quantized batch MFCC: uint8 [2, B, Tmax, ncep] byte
        planes of round(cep * scale) int16 (plane 0 = low byte).  The
        low-entropy high-byte plane makes the tunnel transport's
        compression ~3x more effective than raw f32 cepstra; dequant
        (hi << 8 | lo) / scale on device is exact for power-of-two
        scales."""
        audio = np.ascontiguousarray(audio, np.int16)
        if audio.ndim != 2:
            raise ValueError("audio must be [B, N] int16")
        B, N = audio.shape
        ns = np.ascontiguousarray(n_samps, np.int32)
        out = np.empty((2, B, Tmax, self.ncep), np.uint8)
        self._lib.sst_fe_process_batch_i16p(
            self._h, _ptr(audio, ctypes.c_int16), B, N,
            _ptr(ns, ctypes.c_int32), Tmax, _ptr(out, ctypes.c_uint8),
            float(scale), nthreads)
        return out

    def process_list_i16p(self, audios: list, Tmax: int,
                          scale: float = 256.0,
                          nthreads: int = 0) -> np.ndarray:
        """Like process_batch_i16p but straight from a list of int16
        arrays (no padded [B, N] copy -- the batch assembly memcpy was
        ~10% of per-batch host CPU)."""
        B = len(audios)
        arrs = [np.ascontiguousarray(a, np.int16) for a in audios]
        ptrs = (ctypes.POINTER(ctypes.c_int16) * B)(
            *[_ptr(a, ctypes.c_int16) for a in arrs])
        ns = np.array([len(a) for a in arrs], np.int32)
        out = np.empty((2, B, Tmax, self.ncep), np.uint8)
        self._lib.sst_fe_process_batch_i16p_ptrs(
            self._h, ptrs, _ptr(ns, ctypes.c_int32), B, Tmax,
            _ptr(out, ctypes.c_uint8), float(scale), nthreads)
        return out
