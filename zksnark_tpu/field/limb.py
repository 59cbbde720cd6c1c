"""Vectorized Montgomery arithmetic over fixed 32x8-bit digits in float32.

This is the device-tier replacement for the reference's external bigint
arithmetic (the ``bn``/``bigint`` crates, /root/reference/Cargo.toml:12-17),
re-designed for TPU hardware rather than translated:

- **Why float32**: the TPU VPU has no native 32-bit integer multiplier —
  integer multiplies are emulated and measured ~100-1000x off the f32 rate
  on real hardware.  f32 arithmetic is EXACT on integers below 2^24, so
  8-bit digits give exact products (a_i*b_j <= 255^2 < 2^16) and exact
  32-term accumulations (< 2^21).  Every digit op runs at full VPU rate.
- **Layout**: a field element is a little-endian vector of 32 digits of 8
  bits held in f32 lanes, shape ``(..., 32)``.  Any leading batch shape
  vectorizes over the VPU; `ops/montmul.py` provides the lane-major Pallas
  kernel of the same pipeline for the hot paths.
- **Convolution by skewing**: the schoolbook product is ONE outer product
  (batch, 32, 32) plus the pad/reshape "skew" trick that aligns row i at
  offset i, then a single sum over rows — a handful of XLA ops, all f32.
- **Carry resolution**: two fold passes (split each digit with an exact
  floor-multiply by 2^-8) bring every digit below 320, after which
  generate (d >= 256) and propagate (d == 255) are mutually exclusive per
  digit.  The g/p bits of all digits are packed into u32 words (via exact
  f32 dot products with power-of-two weights) and ONE integer add ripples
  every carry chain at once: ``c = ((G << 1) + P) ^ P`` has bit i set iff
  a carry enters digit i.  Only cheap integer add/shift/xor ops touch the
  u32 domain — never an integer multiply.
- **Montgomery (separated SOS)**: t = a*b;  m = t_lo * (-p^-1 mod R) mod R;
  result = (t + m*p) / R, one conditional subtract (result < 2p).

Every function takes a `MontCtx` (per-modulus constants) so Fr and Fq share
one implementation.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import params
from .params import LIMB_BITS, NUM_LIMBS

L = NUM_LIMBS            # 32 digits
BASE = float(1 << LIMB_BITS)       # 256.0
INV_BASE = 1.0 / BASE
DT = jnp.float32
_MONT_R = 1 << (LIMB_BITS * L)     # 2^256


class MontCtx:
    """Precomputed per-modulus constants, as host ints and device arrays."""

    def __init__(self, p: int, name: str = "p"):
        self.p = p
        self.name = name
        r_mod, r2_mod, _ = params.mont_constants(p)
        self.r_int = r_mod
        self.r2_int = r2_mod
        self.nprime_int = (-pow(p, -1, _MONT_R)) % _MONT_R  # -p^-1 mod R
        self.p_np = np.array(params.to_limbs(p), dtype=np.float32)
        self.p_limbs = jnp.asarray(self.p_np)
        self.r_limbs = jnp.asarray(
            np.array(params.to_limbs(r_mod), dtype=np.float32))
        self.r2_limbs = jnp.asarray(
            np.array(params.to_limbs(r2_mod), dtype=np.float32))
        self.nprime_limbs = jnp.asarray(
            np.array(params.to_limbs(self.nprime_int), dtype=np.float32))
        # digits of 2^256 - p (for the conditional subtract / borrow test)
        self.pcomp_limbs = jnp.asarray(np.array(
            params.to_limbs((_MONT_R - p) % _MONT_R), dtype=np.float32))
        # exponent bits of p-2 (MSB first), for Fermat inversion
        self.p_minus_2_bits = jnp.asarray(
            np.array([int(b) for b in bin(p - 2)[2:]], dtype=np.uint32))

    # -- host-side codecs ---------------------------------------------------
    def to_limbs_np(self, xs) -> np.ndarray:
        """ints (any nested list/array of python ints) -> (..., L) f32."""
        arr = np.asarray(xs, dtype=object)
        buf = b"".join(
            (int(x) % self.p).to_bytes(L, "little")
            for x in arr.reshape(-1))
        out = np.frombuffer(buf, dtype=np.uint8).astype(np.float32)
        return out.reshape(arr.shape + (L,))

    def from_limbs_np(self, arr) -> np.ndarray:
        """(..., L) digit array -> object ndarray of python ints."""
        a = np.asarray(arr)
        bytes8 = np.rint(a).astype(np.int64).astype(np.uint8)
        flat = bytes8.reshape(-1, L)
        out = np.empty(a.shape[:-1], dtype=object)
        oflat = out.reshape(-1)
        raw = flat.tobytes()
        for i in range(oflat.shape[0]):
            oflat[i] = int.from_bytes(raw[L * i:L * (i + 1)], "little")
        return out

    def to_mont_np(self, xs) -> np.ndarray:
        """ints -> Montgomery-form digit array (host conversion)."""
        arr = np.asarray(xs, dtype=object)
        mont = [(int(x) << (LIMB_BITS * L)) % self.p for x in arr.reshape(-1)]
        return self.to_limbs_np(mont).reshape(arr.shape + (L,))

    def from_mont_np(self, arr) -> np.ndarray:
        """Montgomery-form digit array -> object ndarray of python ints."""
        vals = self.from_limbs_np(arr)
        r_inv = pow(_MONT_R, -1, self.p)
        flat = vals.reshape(-1)
        for i in range(flat.shape[0]):
            flat[i] = (flat[i] * r_inv) % self.p
        return vals

    def zero(self, shape=()) -> jnp.ndarray:
        return jnp.zeros(shape + (L,), dtype=DT)

    def one_mont(self, shape=()) -> jnp.ndarray:
        return jnp.broadcast_to(self.r_limbs, shape + (L,))


# ---------------------------------------------------------------------------
# carry machinery: exact f32 folds + packed-u32 carry ripple
# ---------------------------------------------------------------------------

def _split(v: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact (lo, hi) split of integer-valued f32 digits: v = lo + 256*hi."""
    hi = jnp.floor(v * INV_BASE)
    return v - hi * BASE, hi


def _fold(t: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One carry-fold pass; returns (digits, carry_out_of_top_digit)."""
    lo, hi = _split(t)
    v = lo.at[..., 1:].add(hi[..., :-1])
    return v, hi[..., -1]


# power-of-two weights for packing 16 g/p bits into one exact f32 value
_W16 = jnp.asarray((1 << np.arange(16)).astype(np.float32))


def _pack16(bits_f: jnp.ndarray, k0: int, k: int) -> jnp.ndarray:
    """Pack f32 0/1 bits [k0, min(k0+16, k)) into an i32 word (exact)."""
    hi = min(k0 + 16, k)
    w = _W16[:hi - k0]
    return jnp.sum(bits_f[..., k0:hi] * w, axis=-1).astype(jnp.int32)


def _carry_resolve(v: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Resolve single-bit carry chains on digits v <= 510 (g/p exclusive).

    Returns (canonical digits, carry_out).  The only integer ops are
    adds/shifts/xors on one packed u32 word per 32 digits."""
    k = v.shape[-1]
    g = (v >= BASE).astype(DT)            # generate
    p_ = (v == BASE - 1).astype(DT)       # propagate (exclusive with g)
    n_words = -(-k // 32)
    carry_bits = []
    cin_word = jnp.zeros(v.shape[:-1], jnp.uint32)  # carry into word's bit 0
    for w in range(n_words):
        k0 = w * 32
        gw = (_pack16(g, k0, k).astype(jnp.uint32)
              | (_pack16(g, k0 + 16, k).astype(jnp.uint32) << 16))
        pw = (_pack16(p_, k0, k).astype(jnp.uint32)
              | (_pack16(p_, k0 + 16, k).astype(jnp.uint32) << 16))
        x = (gw << 1) + cin_word
        s = x + pw
        c = s ^ pw                         # bit i: carry into digit k0+i
        carry_bits.append(c)
        # carry into the next word's digit 0: true bit 32 of (g<<1)+p+cin
        addc = (s < x).astype(jnp.uint32)
        cin_word = (gw >> 31) + addc
    # unpack carry-in bits back to f32 digits (one vector shift per word)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    cin = jnp.concatenate(
        [((w[..., None] >> shifts) & 1).astype(DT) for w in carry_bits],
        axis=-1)[..., :k]
    out = v - g * BASE + cin - (p_ * cin) * BASE
    return out, cin_word.astype(DT)


def _normalize(t: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Digits <= ~2^22 -> canonical 8-bit digits + carry_out."""
    v, c0 = _fold(t)
    v, c1 = _fold(v)   # now every digit <= 319: single-bit carry regime
    out, c2 = _carry_resolve(v)
    return out, c0 + c1 + c2


def _sub_with_borrow(a: jnp.ndarray, b: jnp.ndarray):
    """(a - b) on canonical digit vectors; returns (diff, borrow)."""
    v = a + ((BASE - 1.0) - b)   # a + ~b, digits <= 510
    v = v.at[..., 0].add(1.0)    # +1 completes two's complement
    out, carry = _normalize(v)
    borrow = 1.0 - carry         # carry out <=> a >= b
    return out, borrow


def _cond_sub_p(ctx: MontCtx, a: jnp.ndarray) -> jnp.ndarray:
    """a - p if a >= p else a (canonical digits, a < 2p)."""
    diff, borrow = _sub_with_borrow(a, jnp.broadcast_to(ctx.p_limbs, a.shape))
    return jnp.where((borrow != 0)[..., None], a, diff)


# ---------------------------------------------------------------------------
# convolution by skewing
# ---------------------------------------------------------------------------

def _skew_sum(m: jnp.ndarray, width: int) -> jnp.ndarray:
    """Sum rows of (..., L, L) with row i shifted right by i -> (..., width).

    Uses the pad/flatten/reshape alignment trick: padding rows to 2L+1 and
    reshaping to (L, 2L) lands element (i, j) at column i+j.
    """
    nb = m.ndim - 2
    padded = jnp.pad(m, [(0, 0)] * nb + [(0, 0), (0, L + 1)])
    flat = padded.reshape(padded.shape[:-2] + (L * (2 * L + 1),))
    flat = flat[..., :L * 2 * L]
    skewed = flat.reshape(flat.shape[:-1] + (L, 2 * L))
    out = jnp.sum(skewed, axis=-2)
    return out[..., :width]


def _conv(a: jnp.ndarray, b: jnp.ndarray, width: int = 2 * L) -> jnp.ndarray:
    """Schoolbook product digits: out[k] = sum_{i+j=k} a_i b_j — all f32,
    exact (products < 2^16, row sums < 2^21).  UN-normalized, `width`."""
    prod = a[..., :, None] * b[..., None, :]  # (..., L, L) exact f32
    return _skew_sum(prod, width)


# ---------------------------------------------------------------------------
# field ops (all shapes (..., L) f32 digits; broadcast across leading dims)
# ---------------------------------------------------------------------------

def add(ctx: MontCtx, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    s, _ = _carry_resolve(a + b)  # digits <= 510; sum < 2p: no carry out
    return _cond_sub_p(ctx, s)


def sub(ctx: MontCtx, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    diff, borrow = _sub_with_borrow(a, b)
    plus_p, _ = _normalize(diff + ctx.p_limbs)
    return jnp.where((borrow != 0)[..., None], plus_p, diff)


def neg(ctx: MontCtx, a: jnp.ndarray) -> jnp.ndarray:
    return sub(ctx, ctx.zero(a.shape[:-1]), a)


def is_zero(a: jnp.ndarray) -> jnp.ndarray:
    return jnp.all(a == 0, axis=-1)


def eq(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.all(a == b, axis=-1)


def mont_mul(ctx: MontCtx, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Montgomery product a*b*R^-1 mod p (separated SOS; see module doc)."""
    a, b = jnp.broadcast_arrays(a, b)
    t = _conv(a, b)                       # 2L digits, < 2^21
    t, _ = _normalize(t)                  # ab < 2^508: no carry out
    m = _conv(t[..., :L], ctx.nprime_limbs, width=L)
    m, _ = _normalize(m)                  # mod R: carry out discarded
    u = _conv(m, ctx.p_limbs)             # 2L digits, < 2^21
    s, _ = _normalize(t + u)              # ab + mp < 2^511: no carry out
    # low L digits of s are exactly zero; the quotient is the high half
    return _cond_sub_p(ctx, s[..., L:])


def mont_sqr(ctx: MontCtx, a: jnp.ndarray) -> jnp.ndarray:
    return mont_mul(ctx, a, a)


def to_mont(ctx: MontCtx, a: jnp.ndarray) -> jnp.ndarray:
    return mont_mul(ctx, a, ctx.r2_limbs)


def from_mont(ctx: MontCtx, a: jnp.ndarray) -> jnp.ndarray:
    one = jnp.zeros_like(a).at[..., 0].set(1.0)
    return mont_mul(ctx, a, one)


def mont_pow_fixed(ctx: MontCtx, a: jnp.ndarray,
                   exp_bits: jnp.ndarray) -> jnp.ndarray:
    """a^e for a *fixed* exponent bit array (MSB first) — lax.scan ladder."""
    acc0 = ctx.one_mont(a.shape[:-1])

    def body(acc, bit):
        acc = mont_sqr(ctx, acc)
        acc = jnp.where(bit[..., None].astype(bool),
                        mont_mul(ctx, acc, a), acc)
        return acc, None

    acc, _ = jax.lax.scan(body, acc0, exp_bits)
    return acc


def mont_inv(ctx: MontCtx, a: jnp.ndarray) -> jnp.ndarray:
    """Batched inversion via Fermat: a^(p-2) (Montgomery in/out).
    Zero maps to zero (no trap on device)."""
    return mont_pow_fixed(ctx, a, ctx.p_minus_2_bits)


# jit'd convenience entry points (ctx is static by identity)
@partial(jax.jit, static_argnums=0)
def mont_mul_jit(ctx, a, b):
    return mont_mul(ctx, a, b)


@partial(jax.jit, static_argnums=0)
def add_jit(ctx, a, b):
    return add(ctx, a, b)


# Shared contexts
FR_CTX = MontCtx(params.R, "Fr")
FQ_CTX = MontCtx(params.Q, "Fq")
