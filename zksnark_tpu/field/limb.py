"""Vectorized Montgomery arithmetic over fixed 16x16-bit limbs (JAX).

This is the device-tier replacement for the reference's external bigint
arithmetic (the ``bn``/``bigint`` crates, /root/reference/Cargo.toml:12-17),
re-designed for TPU semantics instead of translated:

- **Layout**: a field element is a little-endian vector of 16 limbs of 16
  bits held in uint32 lanes, shape ``(..., 16)``.  Any leading batch shape
  vectorizes over the VPU; all carry chains are short static Python loops
  (unrolled at trace time) over the limb axis.
- **Why 16-bit limbs**: TPUs have no native 64-bit integer ALU.  With b-bit
  limbs a schoolbook partial product needs 2b bits; b=16 keeps every
  ``a_i * b_j`` exact in uint32, and accumulating <= 32 such 16-bit-split
  terms stays far below 2^32, so no accumulation step can overflow
  (max ~2^22 — see the inline bounds).
- **Montgomery form**: R = 2^256.  ``mont_mul`` is SOS multiply + word-wise
  reduction interleaved with a single carry lane; the end is one conditional
  subtract (t/R < 2p).

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


class MontCtx:
    """Precomputed per-modulus constants, as host ints and device arrays."""

    def __init__(self, p: int, name: str = "p"):
        self.p = p
        self.name = name
        r_mod, r2_mod, n0inv = params.mont_constants(p)
        self.r_int = r_mod
        self.r2_int = r2_mod
        self.n0inv_int = n0inv
        self.p_np = np.array(params.to_limbs(p), dtype=np.uint32)
        self.p_limbs = jnp.asarray(self.p_np)
        self.r_limbs = jnp.asarray(
            np.array(params.to_limbs(r_mod), dtype=np.uint32))
        self.r2_limbs = jnp.asarray(
            np.array(params.to_limbs(r2_mod), dtype=np.uint32))
        self.n0inv = jnp.uint32(n0inv)
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
        r_inv = pow(1 << (LIMB_BITS * L), -1, self.p)
        flat = vals.reshape(-1)
        for i in range(flat.shape[0]):
            flat[i] = (flat[i] * r_inv) % self.p
        return vals

    def zero(self, shape=()) -> jnp.ndarray:
        return jnp.zeros(shape + (L,), dtype=jnp.uint32)

    def one_mont(self, shape=()) -> jnp.ndarray:
        return jnp.broadcast_to(self.r_limbs, shape + (L,))


# ---------------------------------------------------------------------------
# carry / borrow helpers
# ---------------------------------------------------------------------------

def _carry_propagate(t: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Normalize limbs to 16 bits; returns (limbs, final_carry)."""
    outs = []
    carry = jnp.zeros(t.shape[:-1], dtype=jnp.uint32)
    for i in range(t.shape[-1]):
        v = t[..., i] + carry
        outs.append(v & MASK)
        carry = v >> LIMB_BITS
    return jnp.stack(outs, axis=-1), carry


def _sub_with_borrow(a: jnp.ndarray, b: jnp.ndarray):
    """(a - b) limb-wise; returns (diff, borrow_out) — all values 16-bit."""
    outs = []
    borrow = jnp.zeros(a.shape[:-1], dtype=jnp.uint32)
    for i in range(L):
        # a_i + 2^16 - b_i - borrow; bit 16 tells us if a borrow occurred
        v = a[..., i] + (jnp.uint32(1) << LIMB_BITS) - b[..., i] - borrow
        outs.append(v & MASK)
        borrow = jnp.uint32(1) - (v >> LIMB_BITS)
    return jnp.stack(outs, axis=-1), borrow


def _cond_sub_p(ctx: MontCtx, a: jnp.ndarray) -> jnp.ndarray:
    """a - p if a >= p else a (a < 2p, 16 limbs)."""
    diff, borrow = _sub_with_borrow(a, jnp.broadcast_to(ctx.p_limbs, a.shape))
    keep = (borrow != 0)[..., None]
    return jnp.where(keep, a, diff)


# ---------------------------------------------------------------------------
# field ops (all shapes (..., L) uint32; broadcast across leading dims)
# ---------------------------------------------------------------------------

def add(ctx: MontCtx, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    s, _ = _carry_propagate(a + b)  # sum < 2p < 2^256: carry is 0
    return _cond_sub_p(ctx, s)


def sub(ctx: MontCtx, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    diff, borrow = _sub_with_borrow(a, b)
    # if borrowed, add p back
    plus_p, _ = _carry_propagate(diff + ctx.p_limbs)
    return jnp.where((borrow != 0)[..., None], plus_p, diff)


def neg(ctx: MontCtx, a: jnp.ndarray) -> jnp.ndarray:
    return sub(ctx, ctx.zero(a.shape[:-1]), a)


def is_zero(a: jnp.ndarray) -> jnp.ndarray:
    return jnp.all(a == 0, axis=-1)


def eq(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.all(a == b, axis=-1)


def mont_mul(ctx: MontCtx, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Montgomery product a*b*R^-1 mod p.

    SOS schoolbook accumulate (every t[k] < 2^22, see module doc) followed by
    word-wise Montgomery reduction with a single rolling carry.
    """
    a, b = jnp.broadcast_arrays(a, b)
    batch = a.shape[:-1]
    t = jnp.zeros(batch + (2 * L + 1,), dtype=jnp.uint32)

    for i in range(L):
        pij = a[..., i:i + 1] * b  # exact in uint32
        lo = pij & MASK
        hi = pij >> LIMB_BITS
        t = t.at[..., i:i + L].add(lo)
        t = t.at[..., i + 1:i + L + 1].add(hi)

    p_limbs = ctx.p_limbs
    for i in range(L):
        m = (t[..., i] * ctx.n0inv) & MASK
        mp = m[..., None] * p_limbs  # exact in uint32
        t = t.at[..., i:i + L].add(mp & MASK)
        t = t.at[..., i + 1:i + L + 1].add(mp >> LIMB_BITS)
        # t[i] is now 0 mod 2^16; roll its carry into t[i+1]
        t = t.at[..., i + 1].add(t[..., i] >> LIMB_BITS)

    res = t[..., L:2 * L + 1]
    norm, _ = _carry_propagate(res)
    # t/R < 2p < 2^255, so the 17th limb is 0 after propagation
    return _cond_sub_p(ctx, norm[..., :L])


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
