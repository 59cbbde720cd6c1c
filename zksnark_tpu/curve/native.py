"""ctypes bridge to the native BN254 pairing library (native/libbn254.so).

Provides drop-in fast host paths with automatic fallback to the pure-Python
curve module when the shared library is absent or fails to build:

- `pairing_check(pairs)`: prod e(P_i, Q_i) == 1 (single final exp)
- `multi_pairing(pairs)`: the GT product itself
- `available()`: whether the native library loaded

Byte layout (see native/bn254.cc): 32-byte little-endian plain-form field
elements; G1 = x||y, G2 = x0||x1||y0||y1; infinity = all-zero.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Sequence, Tuple

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), "native")


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    so = os.path.join(_NATIVE_DIR, "libbn254.so")
    if not os.path.exists(so):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR, "libbn254.so"],
                           check=True, capture_output=True, timeout=300)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(so)
        lib.bn254_pairing_check.restype = ctypes.c_int
        lib.bn254_pairing_check.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int]
        lib.bn254_multi_pairing.restype = None
        lib.bn254_multi_pairing.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int, ctypes.c_char_p]
        lib.bn254_g1_scalar_mul.restype = None
        lib.bn254_g1_scalar_mul.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p]
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


def available() -> bool:
    return _load() is not None


def _g1_bytes(p) -> bytes:
    if p is None:
        return b"\x00" * 64
    return p[0].to_bytes(32, "little") + p[1].to_bytes(32, "little")


def _g2_bytes(p) -> bytes:
    if p is None:
        return b"\x00" * 128
    (x0, x1), (y0, y1) = p
    return (x0.to_bytes(32, "little") + x1.to_bytes(32, "little") +
            y0.to_bytes(32, "little") + y1.to_bytes(32, "little"))


def pairing_check(pairs: Sequence[Tuple[object, object]]) -> bool:
    """prod e(P_i, Q_i) == 1; native when available, python otherwise."""
    lib = _load()
    if lib is None:
        from . import bn254 as c

        return c.multi_pairing(pairs) == c.FQ12_ONE
    g1s = b"".join(_g1_bytes(p) for p, _ in pairs)
    g2s = b"".join(_g2_bytes(q) for _, q in pairs)
    return bool(lib.bn254_pairing_check(g1s, g2s, len(pairs)))


def multi_pairing(pairs: Sequence[Tuple[object, object]]):
    """GT element prod e(P_i, Q_i) as the python Fq12 tuple layout."""
    lib = _load()
    if lib is None:
        from . import bn254 as c

        return c.multi_pairing(pairs)
    g1s = b"".join(_g1_bytes(p) for p, _ in pairs)
    g2s = b"".join(_g2_bytes(q) for _, q in pairs)
    out = ctypes.create_string_buffer(12 * 32)
    lib.bn254_multi_pairing(g1s, g2s, len(pairs), out)
    raw = out.raw
    coeffs: List[Tuple[int, int]] = []
    for i in range(6):
        c0 = int.from_bytes(raw[64 * i:64 * i + 32], "little")
        c1 = int.from_bytes(raw[64 * i + 32:64 * i + 64], "little")
        coeffs.append((c0, c1))
    return tuple(coeffs)


def g1_scalar_mul(p, k: int):
    lib = _load()
    if lib is None:
        from . import bn254 as c

        return c.g1_scalar_mul(p, k)
    out = ctypes.create_string_buffer(64)
    lib.bn254_g1_scalar_mul(
        _g1_bytes(p), (k % (1 << 256)).to_bytes(32, "little"), out)
    x = int.from_bytes(out.raw[:32], "little")
    y = int.from_bytes(out.raw[32:], "little")
    if x == 0 and y == 0:
        return None
    return (x, y)
