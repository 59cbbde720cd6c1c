"""Digit-major Montgomery field core: parallel carries + MXU convolutions.

This is the round-5 rewrite of the multiply primitive that every hot path
(Pallas montmul kernel, fused point kernels, and through them the MSMs
that are ~86% of prove) bottoms out in.  The round-4 kernels computed all
three separated-SOS convolution passes on the VPU and resolved carries
with a 64-step *serial* ripple per pass — ~700 dependency-chained vector
ops per multiply, which measured at single-digit percent of the VPU
roofline with the MXU completely idle.  This module replaces both halves:

- **MXU for the fixed-operand convolutions.**  Of the three SOS passes,
  two multiply by *constants of the modulus*: ``m = t_lo * n' mod R`` and
  ``u = m * p``.  A digit convolution against a fixed vector is a banded
  Toeplitz matmul — ``m = N' @ t_lo`` with ``N'[k, i] = n'[k-i]`` — so
  both passes run as (L, L) x (L, batch) MXU matmuls
  (``preferred_element_type=float32``; digit values stay in the exact-f32
  range by construction).  Only the bilinear ``t = a * b`` pass (both
  operands vary per batch element) stays on the VPU as an outer product
  plus the pad/reshape skew alignment.

- **Parallel carry resolution.**  Serial ripples are replaced by
  (a) *fold* passes — one exact floor-split plus a one-digit shifted add,
  all digits at once — which bring any <=2^22 digit vector into the
  <=~320 range in two passes, and (b) a *Kogge-Stone* prefix over the
  single-bit generate/propagate vectors (log2(D) steps of shift+and+or on
  booleans) for canonical form and exact carry-out tests.  No step has a
  dependency chain longer than ~log2(D).

- **The mod-R half-sum trick.**  After folding, ``s = t + m*p`` has its
  low L digits ≡ 0 mod R with value < 2R, so the carry into the high half
  is exactly ``any(s_lo != 0)`` — no 64-digit resolve needed.

Layout is digit-major: a field element batch is a ``(D, B)`` f32 array,
digit rows on the sublane axis, batch on the lane axis.  Every function
is plain jnp, so the same code runs inside Pallas kernel bodies (refs
read into arrays), under XLA on CPU (the test tier), and in interpret
harnesses.  Constants cannot be captured by Pallas kernels as array
literals, so they are packed into one (3L, 128) table (`pack_consts`)
passed as a kernel input and sliced back out with `unpack_consts`.

Bound bookkeeping (all digits are integer-valued f32; f32 is exact below
2^24): canonical inputs <= 255 -> conv products <= 255^2, 32-term sums
< 2^21; three folds -> <= 256 (bf16-exact, feeding the MXU); Toeplitz
matmul sums <= 32*255*256 < 2^21; three folds -> <= 256; result value
< p^2/R + 1.004p < 1.26p, so ONE conditional subtract of p restores the
canonical [0, p) contract.  The
public ops are therefore bit-exact drop-ins for `field.limb`
(`tests/test_fieldcore.py` pins this against the host oracle).

Replaces the multiply strategy of the reference's external ``bn`` crate
(/root/reference/Cargo.toml:12-17, 64-bit scalar Montgomery) with one
shaped for the TPU's MXU/VPU split; no counterpart code exists in the
reference to translate.
"""

from __future__ import annotations

from functools import lru_cache
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..field import params

L = params.NUM_LIMBS                  # 32 digits
BASE = float(1 << params.LIMB_BITS)   # 256.0
INV_BASE = 1.0 / BASE
CONST_ROWS = 3 * L + 8                # packed constant table rows
CONST_COLS = 128


class CoreConsts(NamedTuple):
    """Per-modulus constants in digit-major matrix form.

    np_mat: (L, L)  lower-triangular Toeplitz of n' = -p^-1 mod R
    p_mat:  (2L, L) banded Toeplitz of p (u[k] = sum_i p[k-i] m[i])
    p_col:  (L, 1)  digits of p (broadcasts over the batch axis)
    pcomp_col: (L, 1) digits of 2^256 - p (conditional-subtract adder)
    r_col:  (L, 1)  digits of R mod p (the Montgomery one)
    w_mat:  (4, 2L) carry-pack weights (modulus-independent): rows
            [w0lo, w1lo, w0hi, w1hi] with W[w?, i] = 2^(bit of digit i
            inside its 16-bit half) — one matmul packs 64 g/p bits into
            16-bit halves for the u32 carry ripple
    """

    np_mat: jnp.ndarray
    p_mat: jnp.ndarray
    p_col: jnp.ndarray
    pcomp_col: jnp.ndarray
    r_col: jnp.ndarray
    w_mat: jnp.ndarray


def _toeplitz(vec: np.ndarray, out_rows: int) -> np.ndarray:
    """M[k, i] = vec[k - i] for 0 <= k - i < len(vec), else 0."""
    m = np.zeros((out_rows, L), dtype=np.float32)
    for k in range(out_rows):
        for i in range(L):
            d = k - i
            if 0 <= d < len(vec):
                m[k, i] = vec[d]
    return m


def _pack_weights_np() -> np.ndarray:
    """(4, 2L) carry-pack weight rows [w0lo, w1lo, w0hi, w1hi]: digit i
    belongs to word i//32, half (i//16)%2, bit i%16."""
    w = np.zeros((4, 2 * L), dtype=np.float32)
    for i in range(2 * L):
        word, half, bit = i // 32, (i // 16) % 2, i % 16
        w[2 * half + word, i] = float(1 << bit)
    return w


@lru_cache(maxsize=None)
def _consts_np(p: int):
    nprime = (-pow(p, -1, 1 << 256)) % (1 << 256)
    np_digits = np.array(params.to_limbs(nprime), dtype=np.float32)
    p_digits = np.array(params.to_limbs(p), dtype=np.float32)
    pcomp = np.array(params.to_limbs((1 << 256) - p), dtype=np.float32)
    r_mod, _, _ = params.mont_constants(p)
    r_digits = np.array(params.to_limbs(r_mod), dtype=np.float32)
    return (
        _toeplitz(np_digits, L),
        _toeplitz(p_digits, 2 * L),
        p_digits.reshape(L, 1),
        pcomp.reshape(L, 1),
        r_digits.reshape(L, 1),
        _pack_weights_np(),
    )


def make_consts(ctx) -> CoreConsts:
    """CoreConsts for a `field.limb.MontCtx` as device arrays."""
    return CoreConsts(*(jnp.asarray(a) for a in _consts_np(ctx.p)))


def pack_consts_np(p: int) -> np.ndarray:
    """One (3L, 128) f32 table a Pallas kernel can take as an input ref:

    rows [0, L),  cols [0, L):   np_mat
    rows [L, 3L), cols [0, L):   p_mat
    rows [0, L),  col L:   p digits     col L+1: pcomp    col L+2: R mod p
    rows [3L, 3L+4), cols [0, 2L): carry-pack weights
    """
    np_mat, p_mat, p_col, pcomp_col, r_col, w_mat = _consts_np(p)
    out = np.zeros((CONST_ROWS, CONST_COLS), dtype=np.float32)
    out[:L, :L] = np_mat
    out[L:3 * L, :L] = p_mat
    out[:L, L] = p_col[:, 0]
    out[:L, L + 1] = pcomp_col[:, 0]
    out[:L, L + 2] = r_col[:, 0]
    out[3 * L:3 * L + 4, :2 * L] = w_mat
    return out


def unpack_consts(table) -> CoreConsts:
    """Slice a pack_consts table (array or kernel ref value) back out."""
    return CoreConsts(
        np_mat=table[:L, :L],
        p_mat=table[L:3 * L, :L],
        p_col=table[:L, L:L + 1],
        pcomp_col=table[:L, L + 1:L + 2],
        r_col=table[:L, L + 2:L + 3],
        w_mat=table[3 * L:3 * L + 4, :2 * L],
    )


# ---------------------------------------------------------------------------
# carry machinery (digit axis = axis 0; everything parallel over digits)
# ---------------------------------------------------------------------------

# Inside a Pallas kernel body, digit-axis shifts lower to the native
# sublane rotate (pltpu.roll); under plain XLA (CPU tier, tests) they are
# pad+slice concats.  Kernel entry points flip this during tracing (the
# trace is single-threaded, so a module flag is safe).
_KERNEL_MODE = False


class kernel_mode:
    """Context manager: use pltpu.roll for digit shifts while tracing a
    Pallas kernel body."""

    def __enter__(self):
        global _KERNEL_MODE
        self._prev = _KERNEL_MODE
        _KERNEL_MODE = True

    def __exit__(self, *exc):
        global _KERNEL_MODE
        _KERNEL_MODE = self._prev
        return False


def _roll_down(x: jnp.ndarray, s: int) -> jnp.ndarray:
    """Circular shift down (row r <- row r-s mod D).  ONLY safe when the
    caller knows the wrapped rows are zero (e.g. zero-padded operands) or
    masks them itself."""
    if s == 0:
        return x
    if _KERNEL_MODE:
        from jax.experimental.pallas import tpu as pltpu

        return pltpu.roll(x, s, axis=0)
    return jnp.roll(x, s, axis=0)


def _shift_down(x: jnp.ndarray, s: int) -> jnp.ndarray:
    """x[i - s] with zeros below (axis 0); dtype-preserving."""
    if s == 0:
        return x
    if _KERNEL_MODE:
        rolled = _roll_down(x, s)
        row = jax.lax.broadcasted_iota(jnp.int32, (x.shape[0], 1), 0)
        return jnp.where(row >= s, rolled, jnp.zeros_like(rolled))
    pad = jnp.zeros((s,) + x.shape[1:], x.dtype)
    return jnp.concatenate([pad, x[:-s]], axis=0)


def _last_row(x: jnp.ndarray) -> jnp.ndarray:
    """x[-1] via a static slice (Mosaic lowers lax.slice, not the
    gather/dynamic_slice jnp integer indexing can produce)."""
    d = x.shape[0]
    return jax.lax.slice_in_dim(x, d - 1, d, axis=0).reshape(x.shape[1:])


def fold(t: jnp.ndarray):
    """One carry-fold pass: exact floor-split then a one-digit shifted
    add.  Digits <= 2^23 in, <= 255 + in/256 out.  Returns (digits,
    carry_out_of_top_digit)."""
    hi = jnp.floor(t * INV_BASE)
    lo = t - hi * BASE
    return lo + _shift_down(hi, 1), _last_row(hi)


def carry_resolve_ks(v: jnp.ndarray):
    """Canonicalize digits v <= 510 (generate/propagate exclusive) via a
    Kogge-Stone prefix on the g/p bit vectors.  Returns (canonical
    digits, carry_out f32 0/1 (B,)).

    The masks are f32 0/1 values combined with max (OR) and * (AND) —
    Mosaic cannot shift/concatenate i1 vregs, and the products are exact
    (0/1 * 0/1).  The packed variant below is ~3x cheaper; this one
    needs no constant table and remains the cross-check oracle."""
    d = v.shape[0]
    gen = jnp.where(v >= BASE, 1.0, 0.0).astype(v.dtype)
    prop = jnp.where(v == BASE - 1.0, 1.0, 0.0).astype(v.dtype)
    g, p = gen, prop
    s = 1
    while s < d:
        g = jnp.maximum(g, p * _shift_down(g, s))
        p = p * _shift_down(p, s)
        s *= 2
    cin = _shift_down(g, 1)
    out = v - gen * BASE + cin - (prop * cin) * BASE
    return out, _last_row(g)


def carry_resolve(v: jnp.ndarray, cc: "CoreConsts"):
    """Canonicalize digits v <= 510 (generate/propagate exclusive) by
    PACKING the g/p bits into u32 words and rippling every carry chain
    with ONE integer add per word (field.limb._carry_resolve, vectorized
    for the digit-major kernel layout):

        c = ((G << 1) + cin + P) ^ P    # bit i: carry into digit i

    The pack is one tiny MXU matmul (power-of-two weights, exact in
    bf16); the unpack is a broadcast + per-row variable shift.  ~11
    full-tensor ops total vs ~40 for the Kogge-Stone variant.  Returns
    (canonical digits, carry_out f32 0/1 (B,))."""
    d = v.shape[0]
    nw = d // 32
    gen = jnp.where(v >= BASE, 1.0, 0.0).astype(v.dtype)
    prop = jnp.where(v == BASE - 1.0, 1.0, 0.0).astype(v.dtype)
    w = cc.w_mat[:, :d]                      # (4, d) pack weights
    # f32 -> i32 -> u32: Mosaic has no direct f32->u32 convert
    gh = _matmul(w, gen).astype(jnp.int32).astype(jnp.uint32)
    ph = _matmul(w, prop).astype(jnp.int32).astype(jnp.uint32)
    gw = gh[:nw] | (gh[2:2 + nw] << 16)      # (nw, B) u32 words
    pw = ph[:nw] | (ph[2:2 + nw] << 16)

    cin_w = jnp.zeros(gw.shape[1:], jnp.uint32)[None]
    carry_words = []
    for wi in range(nw):
        g_w = jax.lax.slice_in_dim(gw, wi, wi + 1, axis=0)
        p_w = jax.lax.slice_in_dim(pw, wi, wi + 1, axis=0)
        x = (g_w << 1) + cin_w
        sfull = x + p_w
        carry_words.append(sfull ^ p_w)      # bit i: carry into digit i
        addc = (sfull < x).astype(jnp.uint32)
        cin_w = (g_w >> 31) + addc           # carry into next word's bit 0
    carry_out = cin_w.astype(jnp.int32).astype(v.dtype).reshape(
        v.shape[1:])

    rows = jax.lax.broadcasted_iota(jnp.int32, (d, 1), 0)
    bit = (rows & 31).astype(jnp.uint32)
    word = jnp.broadcast_to(carry_words[0], (d,) + v.shape[1:])
    if nw == 2:
        word = jnp.where(rows < 32, word,
                         jnp.broadcast_to(carry_words[1],
                                          (d,) + v.shape[1:]))
    cin = ((word >> bit) & jnp.uint32(1)).astype(jnp.int32).astype(
        v.dtype)
    out = v - gen * BASE + cin - (prop * cin) * BASE
    return out, carry_out


def normalize(t: jnp.ndarray, cc: "CoreConsts"):
    """Digits <= ~2^22 -> canonical 8-bit digits.  Returns (digits,
    carry_out f32 (B,)) — carry_out counts everything shifted past the
    top digit (folds + resolve)."""
    v, c0 = fold(t)
    v, c1 = fold(v)
    out, c2 = carry_resolve(v, cc)
    return out, c0 + c1 + c2


# ---------------------------------------------------------------------------
# convolution: bilinear pass on the VPU (outer product + skew alignment)
# ---------------------------------------------------------------------------

def conv(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Digit convolution of (La, B) x (Lb, B) -> (La+Lb, B) raw digit
    sums (un-normalized, exact f32 for canonical 8-bit inputs).

    Shift-and-add over a's digit rows: out += shift_down(b, i) * a_i.
    2D ops only — a 3D outer-product + reshape skew is a relayout storm
    in Mosaic (measured: 256 s kernel compiles, 0.75x runtime); rolls on
    the sublane axis are native."""
    la, lb = a.shape[0], b.shape[0]
    v = la + lb
    bx = jnp.concatenate(
        [b, jnp.zeros((v - lb,) + b.shape[1:], b.dtype)], axis=0)
    t = jnp.zeros((v,) + a.shape[1:], a.dtype)
    for i in range(la):
        ai = jax.lax.slice_in_dim(a, i, i + 1, axis=0)   # (1, B)
        # maskless circular roll: rows that wrap land on bx's zero pad
        # (row r < i reads bx[v-i+r], and v-i+r >= lb for all i <= la)
        t = t + _roll_down(bx, i) * ai
    return t


def _matmul(m: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """(R, K) @ (K, B) on the MXU in bf16 with f32 accumulation.

    EXACT by construction: both operands are integers <= 256 (8-bit
    mantissa: every integer up to 2^8 is bf16-representable), products
    <= 256*255, and 32-term f32 accumulations < 2^21 < 2^24.  Explicit
    bf16 casts rather than f32 inputs because the TPU's default f32
    matmul precision truncates operands to bf16 — exact only if the
    values already are, which three folds guarantee."""
    return jax.lax.dot_general(
        m.astype(jnp.bfloat16), x.astype(jnp.bfloat16),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


# ---------------------------------------------------------------------------
# field ops (digit-major (L, B); canonical [0, p) in and out)
# ---------------------------------------------------------------------------

def cond_sub_p(res: jnp.ndarray, cc: CoreConsts) -> jnp.ndarray:
    """res < 2p canonical-digits -> res mod p.  Adds 2^256 - p; the exact
    carry-out of the Kogge-Stone resolve is the res >= p test."""
    cur, ge = carry_resolve(res + cc.pcomp_col, cc)
    return jnp.where((ge != 0)[None, :], cur, res)


def mont_mul_dm(a: jnp.ndarray, b: jnp.ndarray,
                cc: CoreConsts) -> jnp.ndarray:
    """Montgomery product a*b*R^-1 mod p on (L, B) digit-major arrays.

    Separated SOS with the two fixed-operand passes on the MXU; see the
    module docstring for the bound bookkeeping."""
    t = conv(a, b)                                # (2L, B) raw
    t, _ = fold(t)
    t, _ = fold(t)
    t, _ = fold(t)                                # <= 256: bf16-exact
    m = _matmul(cc.np_mat, t[:L])                 # mod R via truncation
    m, _ = fold(m)
    m, _ = fold(m)
    m, _ = fold(m)                                # <= 256, value < 1.004R
    u = _matmul(cc.p_mat, m)                      # (2L, B) raw
    s = t + u
    s, _ = fold(s)
    s, _ = fold(s)                                # <= 287
    # low half ≡ 0 mod R, value in {0, R}: carry into the high half is
    # exactly "low half nonzero"
    low, high = s[:L], s[L:]
    # digits are >= 0, so "any nonzero" == "column sum > 0" (sums are
    # exact: <= 32 * 320 < 2^14) — an f32 test, no i1 reduction
    carry = jnp.where(jnp.sum(low, axis=0) > 0, 1.0, 0.0).astype(s.dtype)
    row0 = jax.lax.broadcasted_iota(jnp.int32, (L, 1), 0) == 0
    high = jnp.where(row0, high + carry[None, :], high)
    res, _ = carry_resolve(high, cc)              # value < 1.26p < R
    return cond_sub_p(res, cc)


def add_dm(a: jnp.ndarray, b: jnp.ndarray, cc: CoreConsts) -> jnp.ndarray:
    """(a + b) mod p, canonical in/out."""
    s, _ = carry_resolve(a + b, cc)               # a + b < 2p < R
    return cond_sub_p(s, cc)


def sub_dm(a: jnp.ndarray, b: jnp.ndarray, cc: CoreConsts) -> jnp.ndarray:
    """(a - b) mod p via two's complement; borrow <=> no carry-out."""
    v = a + ((BASE - 1.0) - b)
    row0 = jax.lax.broadcasted_iota(jnp.int32, (L, 1), 0) == 0
    v = jnp.where(row0, v + 1.0, v)
    d, carry = carry_resolve(v, cc)
    plus_p, _ = carry_resolve(d + cc.p_col, cc)
    return jnp.where((carry != 0)[None, :], d, plus_p)


def dbl_dm(a: jnp.ndarray, cc: CoreConsts) -> jnp.ndarray:
    return add_dm(a, a, cc)


def is_zero_dm(a: jnp.ndarray) -> jnp.ndarray:
    """Canonical digits -> (B,) bool."""
    return jnp.all(a == 0, axis=0)
