"""Vectorized Montgomery arithmetic over fixed 16x16-bit limbs (JAX).

This is the device-tier replacement for the reference's external bigint
arithmetic (the ``bn``/``bigint`` crates, /root/reference/Cargo.toml:12-17),
re-designed for TPU semantics instead of translated:

- **Layout**: a field element is a little-endian vector of 16 limbs of 16
  bits held in uint32 lanes, shape ``(..., 16)``.  Any leading batch shape
  vectorizes over the VPU.
- **Why 16-bit limbs**: TPUs have no native 64-bit integer ALU.  With b-bit
  limbs a schoolbook partial product needs 2b bits; b=16 keeps every
  ``a_i * b_j`` exact in uint32, and diagonal sums of 16 split-off 16-bit
  halves stay < 2^21 — no accumulation step can overflow.
- **Convolution by skewing**: the schoolbook product is ONE outer product
  (batch, L, L) plus the pad/reshape "skew" trick that aligns row i at
  offset i, then a single sum over rows — a handful of XLA ops instead of
  2L shift-adds (compile time on a 2-core host made this matter as much as
  runtime).
- **SWAR packed carries**: after one fold, every limb is < 2^17 - 1, so
  generate (limb >= 2^16) and propagate (low half == 0xFFFF) are mutually
  exclusive per limb.  Packing the g/p bits of all limbs into ONE uint32
  lane lets a single integer add ripple every carry chain at once:
  ``c = (((G << 1) + P) ^ P)`` has bit i set iff a carry enters limb i.
  This replaces a log2(L)-round Kogge-Stone network — fewer ops at runtime
  and an ~4x smaller XLA graph (compile time on the 2-core host and via the
  remote TPU tunnel scales with graph size, so this matters doubly).
- **Montgomery (separated SOS)**: t = a*b;  m = t_lo * (-p^-1 mod R) mod R;
  result = (t + m*p) / R, one conditional subtract (result < 2p).

The same code path runs under jit on TPU and CPU; `ops/montmul.py` provides
the Pallas-kernel version of the hot loop with identical semantics.

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
from .params import LIMB_BITS, LIMB_MASK, NUM_LIMBS

L = NUM_LIMBS
MASK = jnp.uint32(LIMB_MASK)
_MONT_R = 1 << (LIMB_BITS * L)


class MontCtx:
    """Precomputed per-modulus constants, as host ints and device arrays."""

    def __init__(self, p: int, name: str = "p"):
        self.p = p
        self.name = name
        r_mod, r2_mod, n0inv = params.mont_constants(p)
        self.r_int = r_mod
        self.r2_int = r2_mod
        self.nprime_int = (-pow(p, -1, _MONT_R)) % _MONT_R  # -p^-1 mod R
        self.p_np = np.array(params.to_limbs(p), dtype=np.uint32)
        self.p_limbs = jnp.asarray(self.p_np)
        self.r_limbs = jnp.asarray(
            np.array(params.to_limbs(r_mod), dtype=np.uint32))
        self.r2_limbs = jnp.asarray(
            np.array(params.to_limbs(r2_mod), dtype=np.uint32))
        self.nprime_limbs = jnp.asarray(
            np.array(params.to_limbs(self.nprime_int), dtype=np.uint32))
        # exponent bits of p-2 (MSB first), for Fermat inversion
        self.p_minus_2_bits = jnp.asarray(
            np.array([int(b) for b in bin(p - 2)[2:]], dtype=np.uint32))

    # -- host-side codecs ---------------------------------------------------
    def to_limbs_np(self, xs) -> np.ndarray:
        """ints (any nested list/array of python ints) -> (..., L) uint32."""
        arr = np.asarray(xs, dtype=object)
        buf = b"".join(
            (int(x) % self.p).to_bytes(2 * L, "little")
            for x in arr.reshape(-1))
        out = np.frombuffer(buf, dtype="<u2").astype(np.uint32)
        return out.reshape(arr.shape + (L,))

    def from_limbs_np(self, arr) -> np.ndarray:
        """(..., L) uint32 -> object ndarray of python ints."""
        a = np.ascontiguousarray(np.asarray(arr), dtype=np.uint32)
        flat16 = a.reshape(-1, L).astype("<u2")
        out = np.empty(a.shape[:-1], dtype=object)
        oflat = out.reshape(-1)
        raw = flat16.tobytes()
        for i in range(oflat.shape[0]):
            oflat[i] = int.from_bytes(raw[2 * L * i:2 * L * (i + 1)], "little")
        return out

    def to_mont_np(self, xs) -> np.ndarray:
        """ints -> Montgomery-form limb array (host conversion)."""
        arr = np.asarray(xs, dtype=object)
        mont = [(int(x) << (LIMB_BITS * L)) % self.p for x in arr.reshape(-1)]
        return self.to_limbs_np(mont).reshape(arr.shape + (L,))

    def from_mont_np(self, arr) -> np.ndarray:
        """Montgomery-form limb array -> object ndarray of python ints."""
        vals = self.from_limbs_np(arr)
        r_inv = pow(_MONT_R, -1, self.p)
        flat = vals.reshape(-1)
        for i in range(flat.shape[0]):
            flat[i] = (flat[i] * r_inv) % self.p
        return vals

    def zero(self, shape=()) -> jnp.ndarray:
        return jnp.zeros(shape + (L,), dtype=jnp.uint32)

    def one_mont(self, shape=()) -> jnp.ndarray:
        return jnp.broadcast_to(self.r_limbs, shape + (L,))


# ---------------------------------------------------------------------------
# carry machinery (SWAR packed carries)
# ---------------------------------------------------------------------------

_BIT_W = jnp.asarray(
    (np.uint64(1) << np.arange(32, dtype=np.uint64)).astype(np.uint32)
)  # 2^i weights for bit packing (2^i mod 2^32)
_BIT_I = jnp.asarray(np.arange(32, dtype=np.uint32))


def _normalize(t: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Reduce limbs with up to 32-bit values to canonical 16-bit limbs.

    One fold brings the slack to single-bit carries (every limb <= 0x1FFFE,
    so generate and propagate are exclusive); the remaining carry chains are
    resolved by packing the per-limb generate/propagate bits into one uint32
    and letting a single integer add ripple them: with G = packed generates,
    P = packed propagates, ``c = ((G << 1) + P) ^ P`` has bit i set iff a
    carry enters limb i.  Returns (limbs, carry_out); requires k <= 32 and
    no carry out of limb 31 when k == 32 (true for all call sites: products
    are < 2^508).
    """
    k = t.shape[-1]
    # fold multi-bit carries one position up
    lo = t & MASK
    hi = t >> LIMB_BITS
    v = lo.at[..., 1:].add(hi[..., :-1])
    carry0 = hi[..., -1]  # carry out of the top limb from the fold
    # now v <= 0xFFFF + 0xFFFF = 0x1FFFE: single-bit, g/p exclusive
    g = (v >> LIMB_BITS).astype(jnp.uint32)           # generate (0/1)
    p_ = ((v & MASK) == MASK).astype(jnp.uint32)      # propagate (0/1)
    w = _BIT_W[:k]
    gp = jnp.sum(g * w, axis=-1, dtype=jnp.uint32)    # packed G
    pp = jnp.sum(p_ * w, axis=-1, dtype=jnp.uint32)   # packed P
    c = ((gp << 1) + pp) ^ pp                         # bit i: carry into i
    carry_in = (c[..., None] >> _BIT_I[:k]) & jnp.uint32(1)
    out = (v + carry_in) & MASK
    if k < 32:
        carry_out = carry0 + ((c >> k) & jnp.uint32(1))
    else:
        carry_out = carry0  # no carry out of limb 31 at any call site
    return out, carry_out


def _sub_with_borrow(a: jnp.ndarray, b: jnp.ndarray):
    """(a - b) on canonical 16-bit limb vectors; returns (diff, borrow)."""
    k = a.shape[-1]
    v = a + (MASK - b)  # a + ~b, limbs <= 2*mask < 2^17
    v = v.at[..., 0].add(1)  # +1 completes two's complement
    out, carry = _normalize(v)
    borrow = jnp.uint32(1) - carry  # carry out <=> a >= b
    return out, borrow


def _cond_sub_p(ctx: MontCtx, a: jnp.ndarray) -> jnp.ndarray:
    """a - p if a >= p else a (canonical 16-limb input, a < 2p)."""
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
    out = jnp.sum(skewed, axis=-2, dtype=jnp.uint32)
    return out[..., :width]


def _conv(a: jnp.ndarray, b: jnp.ndarray, width: int = 2 * L) -> jnp.ndarray:
    """Schoolbook product digits: out[k] = sum_{i+j=k} a_i b_j, accumulated
    as split 16-bit halves so every lane stays < 2^21.  Output is an
    UN-normalized digit vector of length `width`."""
    prod = a[..., :, None] * b[..., None, :]  # (..., L, L) exact uint32
    lo = _skew_sum(prod & MASK, width)
    hi = _skew_sum(prod >> LIMB_BITS, width)
    return lo.at[..., 1:].add(hi[..., :-1])


# ---------------------------------------------------------------------------
# field ops (all shapes (..., L) uint32; broadcast across leading dims)
# ---------------------------------------------------------------------------

def add(ctx: MontCtx, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    s, _ = _normalize(a + b)  # sum < 2p < 2^256: carry out is 0
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
    # low L limbs of s are exactly zero; the quotient is the high half
    return _cond_sub_p(ctx, s[..., L:])


def mont_sqr(ctx: MontCtx, a: jnp.ndarray) -> jnp.ndarray:
    return mont_mul(ctx, a, a)


def to_mont(ctx: MontCtx, a: jnp.ndarray) -> jnp.ndarray:
    return mont_mul(ctx, a, ctx.r2_limbs)


def from_mont(ctx: MontCtx, a: jnp.ndarray) -> jnp.ndarray:
    one = jnp.zeros_like(a).at[..., 0].set(1)
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
