"""Field-op adapters that make curve kernels generic over Fq and Fq2.

A point kernel (curve/jacobian.py) only sees this interface; instantiating
it with `FqOps` gives G1 arithmetic and with `Fq2Ops` gives G2 arithmetic on
the twist — one implementation, both groups (the reference needed two copies
of everything through the ``bn`` crate's separate G1/G2 types).

Element layout:
    Fq:  (..., L)      f32 8-bit-digit Montgomery vectors
    Fq2: (..., 2, L)   c0 = [..., 0, :], c1 = [..., 1, :]
"""

from __future__ import annotations

import jax.numpy as jnp

from ..field import params
from ..field.limb import (
    DT, FQ_CTX, MontCtx, add as l_add, eq as l_eq, is_zero as l_is_zero,
    mont_mul, neg as l_neg, sub as l_sub,
)


class FqOps:
    elem_ndim = 1

    def __init__(self, ctx: MontCtx = FQ_CTX):
        self.ctx = ctx

    def mul(self, a, b):
        return mont_mul(self.ctx, a, b)

    def sqr(self, a):
        return mont_mul(self.ctx, a, a)

    def add(self, a, b):
        return l_add(self.ctx, a, b)

    def sub(self, a, b):
        return l_sub(self.ctx, a, b)

    def neg(self, a):
        return l_neg(self.ctx, a)

    def dbl(self, a):
        return l_add(self.ctx, a, a)

    def is_zero(self, a):
        return l_is_zero(a)

    def eq(self, a, b):
        return l_eq(a, b)

    def zero(self, shape=()):
        return jnp.zeros(shape + (params.NUM_LIMBS,), dtype=DT)

    def one(self, shape=()):
        return jnp.broadcast_to(
            self.ctx.r_limbs, shape + (params.NUM_LIMBS,))

    def bmask(self, mask):
        """(...,) bool -> broadcastable over an element."""
        return mask[..., None]

    def select(self, mask, a, b):
        """mask ? a : b (mask shape = batch shape)."""
        return jnp.where(self.bmask(mask), a, b)

    # host codecs
    def to_mont_np(self, xs):
        return self.ctx.to_mont_np(xs)

    def from_mont_np(self, arr):
        return self.ctx.from_mont_np(arr)


class Fq2Ops:
    """Fq2 = Fq[u]/(u^2+1) on limb vectors; 3-mul Karatsuba."""

    elem_ndim = 2

    def __init__(self, ctx: MontCtx = FQ_CTX):
        self.ctx = ctx
        self.base = FqOps(ctx)

    def mul(self, a, b):
        c = self.ctx
        a0, a1 = a[..., 0, :], a[..., 1, :]
        b0, b1 = b[..., 0, :], b[..., 1, :]
        t0 = mont_mul(c, a0, b0)
        t1 = mont_mul(c, a1, b1)
        t2 = mont_mul(c, l_add(c, a0, a1), l_add(c, b0, b1))
        r0 = l_sub(c, t0, t1)
        r1 = l_sub(c, l_sub(c, t2, t0), t1)
        return jnp.stack([r0, r1], axis=-2)

    def sqr(self, a):
        c = self.ctx
        a0, a1 = a[..., 0, :], a[..., 1, :]
        r0 = mont_mul(c, l_add(c, a0, a1), l_sub(c, a0, a1))
        r1 = mont_mul(c, l_add(c, a0, a0), a1)
        return jnp.stack([r0, r1], axis=-2)

    def add(self, a, b):
        return jnp.stack([
            l_add(self.ctx, a[..., 0, :], b[..., 0, :]),
            l_add(self.ctx, a[..., 1, :], b[..., 1, :]),
        ], axis=-2)

    def sub(self, a, b):
        return jnp.stack([
            l_sub(self.ctx, a[..., 0, :], b[..., 0, :]),
            l_sub(self.ctx, a[..., 1, :], b[..., 1, :]),
        ], axis=-2)

    def neg(self, a):
        return jnp.stack([
            l_neg(self.ctx, a[..., 0, :]),
            l_neg(self.ctx, a[..., 1, :]),
        ], axis=-2)

    def dbl(self, a):
        return self.add(a, a)

    def is_zero(self, a):
        return jnp.all(a == 0, axis=(-1, -2))

    def eq(self, a, b):
        return jnp.all(a == b, axis=(-1, -2))

    def zero(self, shape=()):
        return jnp.zeros(shape + (2, params.NUM_LIMBS), dtype=DT)

    def one(self, shape=()):
        z = jnp.zeros(shape + (2, params.NUM_LIMBS), dtype=DT)
        return z.at[..., 0, :].set(self.ctx.r_limbs)

    def bmask(self, mask):
        return mask[..., None, None]

    def select(self, mask, a, b):
        return jnp.where(self.bmask(mask), a, b)

    # host codecs: values are (c0, c1) int pairs
    def to_mont_np(self, xs):
        import numpy as np

        arr = np.asarray(xs, dtype=object)  # (..., 2)
        flat = arr.reshape(-1)
        limbs = self.ctx.to_mont_np(list(flat))
        return limbs.reshape(arr.shape + (params.NUM_LIMBS,))

    def from_mont_np(self, arr):
        return self.ctx.from_mont_np(arr)  # (..., 2) of ints


FQ_OPS = FqOps()
FQ2_OPS = Fq2Ops()
