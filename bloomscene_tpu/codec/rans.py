"""rANS entropy coder: ctypes bindings to the native C++ coder.

Replaces torchac (the reference's CPU arithmetic coder,
utils/encodings.py:84-174). The native library is compiled on first use
from native/rans.cpp (g++ -O3); a pure-python rANS fallback keeps
everything functional without a toolchain.

API mirrors what the scene codec needs:
- ``encode_with_cdf(symbols, cdf_float)`` / ``decode_with_cdf`` — per-symbol
  float CDF rows (like torchac.encode_float_cdf).
- ``encode_gaussian`` / ``decode_gaussian`` — gaussian-conditioned coding of
  quantized values (reference encoder_gaussian/decoder_gaussian,
  encodings.py:84-138).
- ``encode_binary`` / ``decode_binary`` — Bernoulli coding of {-1,+1} or
  {0,1} tensors (reference encoder/decoder, encodings.py:141-174).
"""
from __future__ import annotations

import ctypes
import math
import os
import subprocess

import numpy as np

_PROB_BITS = 16
_PROB_SCALE = 1 << _PROB_BITS

_lib = None
_lib_tried = False


def _native_lib():
    global _lib, _lib_tried
    if _lib_tried:
        return _lib
    _lib_tried = True
    here = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    src = os.path.join(here, 'native', 'rans.cpp')
    so = os.path.join(here, 'native', 'build', 'librans.so')
    try:
        if (not os.path.exists(so)
                or os.path.getmtime(so) < os.path.getmtime(src)):
            os.makedirs(os.path.dirname(so), exist_ok=True)
            # -ffp-contract=off: the gaussian fast path recomputes CDF
            # edges that must be bit-identical to numpy's (no FMA fusion)
            subprocess.run(['g++', '-O3', '-ffp-contract=off', '-shared',
                            '-fPIC', '-o', so, src],
                           check=True, capture_output=True)
        lib = ctypes.CDLL(so)
        lib.rans_encode.restype = ctypes.c_int64
        lib.rans_encode.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_uint16),
            ctypes.c_int64, ctypes.c_int32, ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int64]
        lib.rans_decode.restype = ctypes.c_int32
        lib.rans_decode.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint16), ctypes.c_int64,
            ctypes.c_int32, ctypes.POINTER(ctypes.c_int32)]
        dbl_p = ctypes.POINTER(ctypes.c_double)
        lib.rans_encode_gaussian.restype = ctypes.c_int64
        lib.rans_encode_gaussian.argtypes = [
            ctypes.POINTER(ctypes.c_int32), dbl_p, dbl_p, dbl_p,
            ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
            dbl_p, ctypes.c_int64, ctypes.c_double, ctypes.c_double,
            ctypes.c_double,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64]
        lib.rans_decode_gaussian.restype = ctypes.c_int32
        lib.rans_decode_gaussian.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
            dbl_p, dbl_p, dbl_p,
            ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
            dbl_p, ctypes.c_int64, ctypes.c_double, ctypes.c_double,
            ctypes.c_double,
            ctypes.POINTER(ctypes.c_int32)]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def quantize_cdf(cdf_float: np.ndarray) -> np.ndarray:
    """Float CDF rows [N, K+1] in [0,1] -> uint16 rows with strictly
    increasing values, 0 start, total 2^16 (final entry stored as 0).

    Same guarantee scheme as torchac: each symbol keeps >= 1/2^16 mass.
    """
    cdf_float = np.asarray(cdf_float, np.float64)
    n, kp1 = cdf_float.shape
    k = kp1 - 1
    cdf = np.clip(cdf_float, 0.0, 1.0)
    cdf = np.maximum.accumulate(cdf, axis=1)
    # scale to (2^16 - K) then add ramp to force strict monotonicity
    q = np.round(cdf * (_PROB_SCALE - k)).astype(np.int64)
    q = q + np.arange(kp1, dtype=np.int64)[None, :]
    q[:, 0] = 0
    q[:, -1] = _PROB_SCALE
    q = np.maximum.accumulate(q, axis=1)
    return (q & 0xFFFF).astype(np.uint16)   # 65536 -> 0 in the last entry


# ---------------- pure-python fallback ----------------

def _row_bounds(row: np.ndarray, sym: int, k: int):
    lo = int(row[sym])
    hi = _PROB_SCALE if sym + 1 == k else int(row[sym + 1])
    if hi == 0 and lo != 0:
        hi = _PROB_SCALE
    return lo, hi - lo


def _py_encode(symbols: np.ndarray, cdf_q: np.ndarray) -> bytes:
    n, kp1 = cdf_q.shape
    k = kp1 - 1
    L = 1 << 23
    state = L
    out = bytearray()
    for i in range(n - 1, -1, -1):
        lo, freq = _row_bounds(cdf_q[i], int(symbols[i]), k)
        x_max = ((L >> _PROB_BITS) << 8) * freq
        while state >= x_max:
            out.append(state & 0xFF)
            state >>= 8
        state = ((state // freq) << _PROB_BITS) + (state % freq) + lo
    head = state.to_bytes(4, 'little')
    return head + bytes(reversed(out))


def _py_decode(data: bytes, cdf_q: np.ndarray, n: int) -> np.ndarray:
    kp1 = cdf_q.shape[1]
    k = kp1 - 1
    L = 1 << 23
    state = int.from_bytes(data[:4], 'little')
    pos = 4
    out = np.empty(n, np.int32)
    for i in range(n):
        slot = state & (_PROB_SCALE - 1)
        row = cdf_q[i]
        lo_i, hi_i = 0, k - 1
        while lo_i < hi_i:
            mid = (lo_i + hi_i + 1) >> 1
            v = int(row[mid])
            if mid < k and v == 0 and mid > 0:
                v = _PROB_SCALE
            if v <= slot:
                lo_i = mid
            else:
                hi_i = mid - 1
        sym = lo_i
        lo, freq = _row_bounds(row, sym, k)
        out[i] = sym
        state = freq * (state >> _PROB_BITS) + slot - lo
        while state < L and pos < len(data):
            state = (state << 8) | data[pos]
            pos += 1
    return out


# ---------------- public API ----------------

def _encode_q(symbols: np.ndarray, cdf_q: np.ndarray) -> bytes:
    """symbols int32 [N] + PRE-QUANTIZED uint16 rows -> bitstream."""
    symbols = np.ascontiguousarray(symbols, np.int32)
    cdf_q = np.ascontiguousarray(cdf_q)
    n, kp1 = cdf_q.shape
    assert symbols.shape == (n,)
    lib = _native_lib()
    if lib is None:
        return _py_encode(symbols, cdf_q)
    out = np.empty(4 * n + 64, np.uint8)
    written = lib.rans_encode(
        symbols.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        cdf_q.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        n, kp1, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out.size)
    if written < 0:
        raise ValueError(f"rans_encode failed: {written}")
    return out[:written].tobytes()


def _decode_q(data: bytes, cdf_q: np.ndarray) -> np.ndarray:
    cdf_q = np.ascontiguousarray(cdf_q)
    n, kp1 = cdf_q.shape
    lib = _native_lib()
    if lib is None:
        return _py_decode(data, cdf_q, n)
    buf = np.frombuffer(data, np.uint8)
    out = np.empty(n, np.int32)
    rc = lib.rans_decode(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), buf.size,
        cdf_q.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        n, kp1, out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    if rc != 0:
        raise ValueError(f"rans_decode failed: {rc}")
    return out


def encode_with_cdf(symbols: np.ndarray, cdf_float: np.ndarray) -> bytes:
    """symbols int [N], cdf_float [N, K+1] -> bitstream bytes."""
    return _encode_q(symbols, quantize_cdf(cdf_float))


def decode_with_cdf(data: bytes, cdf_float: np.ndarray) -> np.ndarray:
    """bitstream + the same CDF rows -> symbols int32 [N]."""
    return _decode_q(data, quantize_cdf(cdf_float))


try:
    from scipy.special import ndtr as _norm_cdf          # Phi(z)
except Exception:                                        # pragma: no cover
    def _norm_cdf(z):
        v = np.vectorize(lambda t: 0.5 * (1.0 + math.erf(t / math.sqrt(2))))
        return v(z)


# Uniform-grid linear-interp LUT for Phi(z): the CDF table build is the
# host-side codec bottleneck and is pure erf volume. PL interp on a
# 1/1024-step grid has error ~3e-8 — far below the 1/65536 CDF quantum —
# and a gather+FMA is several times cheaper than erf. Both coder sides
# use the same table, so streams stay self-consistent regardless.
_LUT_Z0, _LUT_Z1, _LUT_N = -8.5, 8.5, 17408
_LUT_INV_H = _LUT_N / (_LUT_Z1 - _LUT_Z0)
_LUT_TMAX = _LUT_N * (1 - 1e-12)
_LUT_TABLE = None


def _phi_table() -> np.ndarray:
    global _LUT_TABLE
    if _LUT_TABLE is None:
        _LUT_TABLE = np.ascontiguousarray(
            _norm_cdf(np.linspace(_LUT_Z0, _LUT_Z1, _LUT_N + 1)))
    return _LUT_TABLE


def _norm_cdf_fast(z: np.ndarray) -> np.ndarray:
    """Linear-interp Phi; operation-for-operation identical to the C++
    phi_lut (native/rans.cpp), so fallback and native streams match."""
    T = _phi_table()
    t = (z - _LUT_Z0) * _LUT_INV_H
    np.clip(t, 0.0, _LUT_TMAX, out=t)
    i = t.astype(np.int64)
    t -= i                                   # frac, in place
    lo = T[i]
    lo += (T[i + 1] - lo) * t
    return lo


def _gaussian_cdf_rows(mean, scale, q, min_v: int, max_v: int):
    """CDF rows over integer symbols [min_v, max_v] for round(x/Q) coding
    (reference encoder_gaussian, encodings.py:84-114)."""
    mean = np.asarray(mean, np.float64).ravel()
    scale = np.maximum(np.asarray(scale, np.float64).ravel(), 1e-9)
    q = np.asarray(q, np.float64).ravel()
    samples = np.arange(min_v, max_v + 2, dtype=np.float64)  # K+1 edges
    edges = (samples[None, :] - 0.5) * q[:, None]
    z = (edges - mean[:, None]) / scale[:, None]
    return _norm_cdf(z)


def _gaussian_cdf_q_rows(mean, scale, q, min_v: int, max_v: int,
                         chunk: int = 32768) -> np.ndarray:
    """Quantized uint16 CDF rows, built fused + CHUNKED.

    The float builder + separate quantize_cdf pass allocates three
    [N, K+1] float64 temporaries (~520 MB each at 1M symbols x 64
    symbols) and was 600x slower than the native coder it feeds; this
    builds cache-resident chunks and quantizes in-place (gaussian CDF
    rows are monotone by construction, so quantize_cdf's pre-sorting
    passes are unnecessary). Encode and decode both use this builder, so
    the rows stay bit-identical across the round trip.
    """
    mean = np.asarray(mean, np.float64).ravel()
    scale = np.maximum(np.asarray(scale, np.float64).ravel(), 1e-9)
    qf = np.broadcast_to(np.asarray(q, np.float64).ravel(), mean.shape)
    kp1 = max_v - min_v + 2
    k = kp1 - 1
    samples = np.arange(min_v, max_v + 2, dtype=np.float64) - 0.5
    n = mean.shape[0]
    out = np.empty((n, kp1), np.uint16)
    ramp = np.arange(kp1, dtype=np.int32)

    def build(i):
        sl = slice(i, min(i + chunk, n))
        z = samples[None, :] * (qf[sl] / scale[sl])[:, None] \
            - (mean[sl] / scale[sl])[:, None]
        c = _norm_cdf_fast(z)
        qi = np.round(c * float(_PROB_SCALE - k)).astype(np.int32)
        qi += ramp
        qi[:, 0] = 0
        qi[:, -1] = _PROB_SCALE
        np.maximum.accumulate(qi, axis=1, out=qi)
        out[sl] = (qi & 0xFFFF).astype(np.uint16)

    starts = range(0, n, chunk)
    if n > 4 * chunk:
        # scipy/numpy ufuncs release the GIL: the erf evaluations (the
        # dominant cost) parallelize across cores
        from concurrent.futures import ThreadPoolExecutor
        with ThreadPoolExecutor(max_workers=min(8, os.cpu_count() or 1)) \
                as pool:
            list(pool.map(build, starts))
    else:
        for i in starts:
            build(i)
    return out


# thresholds on r = scale/Q for width-bucketing gaussian streams: the CDF
# table a row needs is ~ +-5*scale/Q symbols wide, so rows are grouped by
# r in powers of two and each group gets a snug shared table instead of
# the whole stream paying for its widest row
_BUCKET_EDGES = 2.0 ** np.arange(-1, 13)     # 0.5 .. 4096 -> 15 buckets


def _bucket_ids(scale: np.ndarray, q_arr: np.ndarray) -> np.ndarray:
    """Deterministic width-bucket assignment from (scale, Q) only — both
    coder sides have these, so no per-row side info is transmitted."""
    return np.digitize(scale / q_arr, _BUCKET_EDGES)


def _encode_gauss_run(sym0: np.ndarray, mean_eff: np.ndarray,
                      scale: np.ndarray, q_arr: np.ndarray,
                      min_v: int, max_v: int) -> bytes:
    """One gaussian-coded run: native table-free path when available
    (2 on-the-fly CDF edges per symbol), else the table-building
    fallback. Both produce bit-identical streams (shared Phi LUT)."""
    lib = _native_lib()
    n = sym0.shape[0]
    if lib is not None:
        T = _phi_table()
        out = np.empty(4 * n + 64, np.uint8)
        written = lib.rans_encode_gaussian(
            np.ascontiguousarray(sym0, np.int32).ctypes.data_as(
                ctypes.POINTER(ctypes.c_int32)),
            np.ascontiguousarray(mean_eff).ctypes.data_as(
                ctypes.POINTER(ctypes.c_double)),
            np.ascontiguousarray(scale).ctypes.data_as(
                ctypes.POINTER(ctypes.c_double)),
            np.ascontiguousarray(q_arr).ctypes.data_as(
                ctypes.POINTER(ctypes.c_double)),
            n, min_v, max_v - min_v + 1,
            T.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), T.size,
            _LUT_Z0, _LUT_INV_H, _LUT_TMAX,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), out.size)
        if written < 0:
            raise ValueError(f"rans_encode_gaussian failed: {written}")
        return out[:written].tobytes()
    cdf_q = _gaussian_cdf_q_rows(mean_eff, scale, q_arr, min_v, max_v)
    return _encode_q(sym0.astype(np.int32), cdf_q)


def _decode_gauss_run(data: bytes, mean_eff: np.ndarray, scale: np.ndarray,
                      q_arr: np.ndarray, min_v: int,
                      max_v: int) -> np.ndarray:
    """Inverse of _encode_gauss_run; returns symbols in [0, K-1]."""
    lib = _native_lib()
    n = mean_eff.shape[0]
    if lib is not None:
        T = _phi_table()
        buf = np.frombuffer(data, np.uint8)
        out = np.empty(n, np.int32)
        rc = lib.rans_decode_gaussian(
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), buf.size,
            np.ascontiguousarray(mean_eff).ctypes.data_as(
                ctypes.POINTER(ctypes.c_double)),
            np.ascontiguousarray(scale).ctypes.data_as(
                ctypes.POINTER(ctypes.c_double)),
            np.ascontiguousarray(q_arr).ctypes.data_as(
                ctypes.POINTER(ctypes.c_double)),
            n, min_v, max_v - min_v + 1,
            T.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), T.size,
            _LUT_Z0, _LUT_INV_H, _LUT_TMAX,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        if rc != 0:
            raise ValueError(f"rans_decode_gaussian failed: {rc}")
        return out
    cdf_q = _gaussian_cdf_q_rows(mean_eff, scale, q_arr, min_v, max_v)
    return _decode_q(data, cdf_q)


def encode_gaussian(x, mean, scale, q) -> bytes:
    """Quantize x to round(x/Q) and code with the gaussian model.

    Returns a self-contained bitstream blob. Mirrors encoder_gaussian
    (encodings.py:84-114) with two structural changes that keep the coded
    probabilities identical but collapse the CDF-table cost (the host-side
    bottleneck: each table row materializes one erf per symbol edge):

    - MEAN-CENTERING: sym = round(x/Q) - round(mean/Q), coded against a
      gaussian at mean - round(mean/Q)*Q. The shared table range shrinks
      from the global value span to the residual spread (a 126K-anchor
      scene's scaling stream was ~8600 symbols wide uncentered -> ~1h
      host encode; centered it is a few hundred).
    - WIDTH BUCKETING: rows are grouped by scale/Q (power-of-two buckets,
      recomputed identically on decode) and each bucket's table spans only
      ITS residual range, so one wide-sigma outlier row no longer widens
      every other row's table.

    Blob layout: u8 bucket count, then per bucket {i32 min, i32 max,
    u32 nbytes}, then the concatenated per-bucket rANS streams.
    """
    import struct
    x = np.asarray(x, np.float64).ravel()
    q_arr = np.ascontiguousarray(
        np.broadcast_to(np.asarray(q, np.float64).ravel(), x.shape))
    mean = np.asarray(mean, np.float64).ravel()
    scale = np.maximum(np.asarray(scale, np.float64).ravel(), 1e-9)
    center = np.round(mean / q_arr)          # decode recomputes this
    mean_eff = mean - center * q_arr
    sym_val = (np.round(x / q_arr) - center).astype(np.int64)

    bid = _bucket_ids(scale, q_arr)
    nb = len(_BUCKET_EDGES) + 1
    header = [struct.pack('<B', nb)]
    streams = []
    for b in range(nb):
        sel = np.nonzero(bid == b)[0]
        if sel.size == 0:
            header.append(struct.pack('<iiI', 0, -1, 0))
            continue
        s = sym_val[sel]
        min_v, max_v = int(s.min()), int(s.max())
        data = _encode_gauss_run((s - min_v).astype(np.int32),
                                 mean_eff[sel], scale[sel], q_arr[sel],
                                 min_v, max_v)
        header.append(struct.pack('<iiI', min_v, max_v, len(data)))
        streams.append(data)
    return b''.join(header) + b''.join(streams)


def decode_gaussian(data: bytes, mean, scale, q) -> np.ndarray:
    """Inverse of encode_gaussian -> dequantized float64 values.

    The bucket assignment and the centering round(mean/Q) are recomputed
    from (mean, scale, Q) — identical float64 math to the encode side —
    so the output (residual + center) * Q matches round(x/Q) * Q exactly.
    """
    import struct
    mean = np.asarray(mean, np.float64).ravel()
    q_arr = np.ascontiguousarray(
        np.broadcast_to(np.asarray(q, np.float64).ravel(), mean.shape))
    scale = np.maximum(np.asarray(scale, np.float64).ravel(), 1e-9)
    center = np.round(mean / q_arr)
    mean_eff = mean - center * q_arr
    bid = _bucket_ids(scale, q_arr)

    nb = struct.unpack_from('<B', data, 0)[0]
    metas = [struct.unpack_from('<iiI', data, 1 + 12 * b)
             for b in range(nb)]
    pos = 1 + 12 * nb
    out = np.empty(mean.shape[0], np.float64)
    for b, (min_v, max_v, nbytes) in enumerate(metas):
        sel = np.nonzero(bid == b)[0]
        if sel.size == 0:
            pos += nbytes
            continue
        sym = _decode_gauss_run(data[pos:pos + nbytes], mean_eff[sel],
                                scale[sel], q_arr[sel], min_v,
                                max_v).astype(np.int64) + min_v
        out[sel] = (sym.astype(np.float64) + center[sel]) * q_arr[sel]
        pos += nbytes
    return out


def encode_binary(x, p_one) -> bytes:
    """Bernoulli-code a {-1,+1} (or {0,1}) array given P(one).

    Mirrors the reference's encoder (encodings.py:141-157): symbol =
    floor((x+1)/2) with cdf rows [0, 1-p, 1]."""
    x = np.asarray(x).ravel()
    sym = (x > 0).astype(np.int32)
    p = np.broadcast_to(np.asarray(p_one, np.float64), x.shape).ravel()
    cdf = np.stack([np.zeros_like(p), 1.0 - p, np.ones_like(p)], -1)
    return encode_with_cdf(sym, cdf)


def decode_binary(data, p_one, n: int, as_pm1: bool = True) -> np.ndarray:
    p = np.broadcast_to(np.asarray(p_one, np.float64), (n,)).ravel()
    cdf = np.stack([np.zeros_like(p), 1.0 - p, np.ones_like(p)], -1)
    sym = decode_with_cdf(data, cdf)
    return (sym * 2 - 1).astype(np.float32) if as_pm1 \
        else sym.astype(np.float32)
