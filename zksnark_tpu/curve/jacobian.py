"""Batched Jacobian-coordinate point kernels, generic over Fq/Fq2.

The device-side replacement for the ``bn`` crate's G1/G2 group ops
(/root/reference/src/groth16/fr.rs:175-223): complete (edge-case-masked)
add/double over arrays of points, built only from vectorized field ops so
the same code is the G1 kernel (FqOps) and the G2 kernel (Fq2Ops).

A point batch is a `JPoint` pytree (X, Y, Z) of element arrays with a shared
leading batch shape.  Infinity is encoded Z == 0 — the doubling formula then
propagates infinity for free, and `add` resolves every special case with
masks (no data-dependent branches, as XLA requires).

Formulas: EFD dbl-2009-l and add-2007-bl (a = 0 curves).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp


class JPoint(NamedTuple):
    x: jnp.ndarray
    y: jnp.ndarray
    z: jnp.ndarray


def infinity(ops, shape=()) -> JPoint:
    return JPoint(ops.one(shape), ops.one(shape), ops.zero(shape))


def from_affine(ops, x, y) -> JPoint:
    return JPoint(x, y, ops.one(x.shape[:-ops.elem_ndim]))


def is_infinity(ops, p: JPoint):
    return ops.is_zero(p.z)


def compress_z(p: JPoint) -> JPoint:
    """Store Z as uint8 digits.  ONLY valid on batch_normalize output
    (Z in {0, one}: every digit is in [0, 255], so the cast is exact).
    A normalized point set carries one bit of Z information per point;
    keeping Z as f32 digit vectors costs 4x that again in physical HBM
    (the 32-wide f32 minor dim tiles as T(8, 128)).  Device-resident CRS
    point sets use this; `field_z` restores the field dtype at use."""
    return JPoint(p.x, p.y, p.z.astype(jnp.uint8))


def field_z(p: JPoint) -> JPoint:
    """Inverse of `compress_z`: cast Z back to the field digit dtype of
    X (exact — uint8 values are f32-representable).  No-op when Z is
    already field-typed."""
    if p.z.dtype == p.x.dtype:
        return p
    return JPoint(p.x, p.y, p.z.astype(p.x.dtype))


def select(ops, mask, a: JPoint, b: JPoint) -> JPoint:
    """mask ? a : b (mask shape = batch shape)."""
    return JPoint(ops.select(mask, a.x, b.x), ops.select(mask, a.y, b.y),
                  ops.select(mask, a.z, b.z))


def neg(ops, p: JPoint) -> JPoint:
    return JPoint(p.x, ops.neg(p.y), p.z)


def _batch_size(p: JPoint, elem_ndim: int) -> int:
    n = 1
    for s in p.z.shape[:p.z.ndim - elem_ndim]:
        n *= s
    return n


# Dispatch floor for the fused Pallas kernels.  1: on TPU backends EVERY
# point op routes to Mosaic, including single-point ops (MSM Horner tail,
# Abel doubling chains).  Mosaic compiles a point kernel in ~3 s; the
# straight-line XLA fallback inlines ~25k (G1) / ~77k (G2) optimized HLO
# lines per call site, and the axon remote XLA endpoint compiles such
# graphs at ~100 s per montmul-sized body — a single sub-256-batch chain
# of 13 doublings costs an HOUR of XLA compile vs seconds of Mosaic.
# Runtime cost of padding a 1-point op to one (8, 128) tile is one VPU
# pass (~us) — irrelevant next to the compile economics.
_PALLAS_MIN = 1


def double(ops, p: JPoint) -> JPoint:
    """dbl-2009-l; infinity (Z=0) propagates automatically (Z3 = 2YZ = 0)."""
    from ..ops import curve_pallas as cp
    from . import tape

    if _batch_size(p, ops.elem_ndim) >= _PALLAS_MIN and cp.enabled():
        return cp.jac_double(ops, p)
    if tape.enabled():
        return tape.jac_double(ops, p)
    return _double_xla(ops, p)


def _double_xla(ops, p: JPoint) -> JPoint:
    a = ops.sqr(p.x)
    b = ops.sqr(p.y)
    c = ops.sqr(b)
    d = ops.sub(ops.sqr(ops.add(p.x, b)), ops.add(a, c))
    d = ops.dbl(d)
    e = ops.add(ops.dbl(a), a)
    f = ops.sqr(e)
    x3 = ops.sub(f, ops.dbl(d))
    c8 = ops.dbl(ops.dbl(ops.dbl(c)))
    y3 = ops.sub(ops.mul(e, ops.sub(d, x3)), c8)
    z3 = ops.dbl(ops.mul(p.y, p.z))
    return JPoint(x3, y3, z3)


def add(ops, p: JPoint, q: JPoint) -> JPoint:
    """Complete addition: handles P=inf, Q=inf, P=Q, P=-Q via masks.

    Dispatches to the fused Pallas kernel (ops/curve_pallas.py) for big
    batches on TPU backends; the XLA path below is the oracle and the
    CPU-mesh fallback."""
    from ..ops import curve_pallas as cp
    from . import tape

    if (_batch_size(p, ops.elem_ndim) >= _PALLAS_MIN
            and p.z.shape == q.z.shape and cp.enabled()):
        return cp.jac_add(ops, p, q)
    if tape.enabled():
        return tape.jac_add(ops, p, q)
    return _add_xla(ops, p, q)


def madd(ops, p: JPoint, q: JPoint) -> JPoint:
    """Complete mixed addition: q MUST be affine-or-infinity (q.z is the
    Montgomery one, or exactly zero) — the `batch_normalize` invariant.

    On TPU this dispatches to a fused Pallas kernel specialized to
    Z2 in {0, 1}: ~16 field muls instead of the 23 of the general
    complete add (skips Z2^2, U1, S1, the general Z3 and the projective
    doubling branch).  Everywhere else it is exactly `add` — the
    precondition only ever *enables* cheaper formulas."""
    from ..ops import curve_pallas as cp

    if (_batch_size(p, ops.elem_ndim) >= _PALLAS_MIN
            and p.z.shape == q.z.shape and cp.enabled()):
        return cp.jac_madd(ops, p, q)
    return add(ops, p, q)


def _add_xla(ops, p: JPoint, q: JPoint) -> JPoint:
    z1z1 = ops.sqr(p.z)
    z2z2 = ops.sqr(q.z)
    u1 = ops.mul(p.x, z2z2)
    u2 = ops.mul(q.x, z1z1)
    s1 = ops.mul(ops.mul(p.y, q.z), z2z2)
    s2 = ops.mul(ops.mul(q.y, p.z), z1z1)

    h = ops.sub(u2, u1)
    i = ops.sqr(ops.dbl(h))
    j = ops.mul(h, i)
    r = ops.dbl(ops.sub(s2, s1))
    v = ops.mul(u1, i)
    x3 = ops.sub(ops.sub(ops.sqr(r), j), ops.dbl(v))
    y3 = ops.sub(ops.mul(r, ops.sub(v, x3)), ops.dbl(ops.mul(s1, j)))
    z3 = ops.mul(
        ops.sub(ops.sqr(ops.add(p.z, q.z)), ops.add(z1z1, z2z2)), h)
    gen = JPoint(x3, y3, z3)

    h_zero = ops.is_zero(h)
    r_zero = ops.is_zero(ops.sub(s2, s1))
    p_inf = ops.is_zero(p.z)
    q_inf = ops.is_zero(q.z)

    res = select(ops, h_zero & r_zero, _double_xla(ops, p), gen)
    res = select(ops, h_zero & ~r_zero & ~p_inf & ~q_inf,
                 infinity(ops, h_zero.shape), res)
    res = select(ops, q_inf, p, res)
    res = select(ops, p_inf, q, res)
    return res


def _fast_mul(ops, a, b):
    """Field multiply routed through the Pallas montmul kernel on TPU
    (Karatsuba on top of it for Fq2); the batch_normalize hot path."""
    from ..ops.montmul import mont_mul_auto

    c = ops.ctx
    if ops.elem_ndim == 1:
        return mont_mul_auto(c, a, b)
    from ..field.limb import add as l_add, sub as l_sub

    a0, a1 = a[..., 0, :], a[..., 1, :]
    b0, b1 = b[..., 0, :], b[..., 1, :]
    t0 = mont_mul_auto(c, a0, b0)
    t1 = mont_mul_auto(c, a1, b1)
    t2 = mont_mul_auto(c, l_add(c, a0, a1), l_add(c, b0, b1))
    return jnp.stack([l_sub(c, t0, t1),
                      l_sub(c, l_sub(c, t2, t0), t1)], axis=-2)


def _prefix_prod(ops, x):
    """Inclusive prefix products of a (n, elem) field array: two-level
    chunked scan (64 sequential positions, n/64 vector lanes), ~2n muls."""
    import jax

    n = x.shape[0]
    c = min(64, n)
    b = -(-n // c)
    if b * c != n:
        x = jnp.concatenate([x, jnp.broadcast_to(
            ops.one(), (b * c - n,) + x.shape[1:])])
    grid = jnp.moveaxis(x.reshape((b, c) + x.shape[1:]), 1, 0)

    def body(carry, col):
        nxt = _fast_mul(ops, carry, col)
        return nxt, nxt

    totals, within = jax.lax.scan(body, jnp.broadcast_to(
        ops.one(), (b,) + x.shape[1:]), grid)
    within = jnp.moveaxis(within, 0, 1)          # (b, c, elem)
    if b > 1:
        shifted = jnp.concatenate(
            [jnp.broadcast_to(ops.one(), (1,) + x.shape[1:]),
             totals[:-1]])
        carry = _prefix_prod(ops, shifted)       # (b,) exclusive carries
        within = _fast_mul(
            ops, jnp.broadcast_to(jnp.expand_dims(carry, 1), within.shape),
            within)
    return within.reshape((b * c,) + x.shape[1:])[:n]


def batch_normalize(ops, p: JPoint) -> JPoint:
    """Batched Jacobian -> affine-or-infinity (Z in {0, one}) with ONE
    field inversion: Montgomery's trick as two device prefix-product
    scans plus a single host inverse.  Establishes the precondition for
    `madd` — the prover normalizes every CRS point set once at setup so
    each MSM's million point-adds run the cheap mixed formulas.

    NOT jit-safe: the single inversion is a HOST round-trip
    (np.asarray on the grand product + python pow), so calling this
    under jax.jit raises TracerArrayConversionError by design — it runs
    eagerly between jitted stages (setup, checkpoint load) where the
    one blocking sync is amortized over the whole point set."""
    import numpy as np

    batch_shape = p.z.shape[:p.z.ndim - ops.elem_ndim]
    n = 1
    for s in batch_shape:
        n *= s
    flat = JPoint(*(a.reshape((n,) + a.shape[len(batch_shape):])
                    for a in p))
    # stage 1 (jitted: one dispatch instead of ~100 eager ops — eager
    # dispatch through a remote-TPU tunnel costs an RPC round-trip each)
    inf, z, pre, suf, total = _bn_scan(ops, flat.z)

    # single host inversion of the grand product
    q = ops.ctx.p
    t = ops.from_mont_np(np.asarray(total))
    try:
        if ops.elem_ndim == 1:
            tinv = pow(int(t), -1, q)
        else:
            t0, t1 = int(t[0]), int(t[1])
            ni = pow((t0 * t0 + t1 * t1) % q, -1, q)
            tinv = (t0 * ni % q, (-t1) * ni % q)
    except ValueError as e:
        # a non-canonical zero encoding (digits != 0 but value = 0 mod p)
        # passes the exact-digit is_zero screen above and zeroes the
        # grand product — possible only with a corrupt/malformed input
        raise ValueError(
            "batch_normalize: grand Z-product is 0 mod p — some point "
            "has a malformed Z encoding (Z = 0 mod p but nonzero "
            "digits), e.g. from a corrupt checkpoint") from e
    tinv_m = jnp.asarray(ops.to_mont_np([tinv])[0])

    # stage 2 (jitted)
    x, y, zz = _bn_apply(ops, flat.x, flat.y, inf, pre, suf, tinv_m)
    return JPoint(*(a.reshape(batch_shape + a.shape[1:])
                    for a in JPoint(x, y, zz)))


@partial(jax.jit, static_argnums=0)
def _bn_scan(ops, flat_z):
    """batch_normalize stage 1: infinity mask + prefix/suffix Z products
    + grand total, in one compiled dispatch."""
    inf = ops.is_zero(flat_z)
    z = ops.select(inf, jnp.broadcast_to(ops.one(), flat_z.shape), flat_z)
    pre = _prefix_prod(ops, z)                       # P_i = z_0 .. z_i
    suf = _prefix_prod(ops, jnp.flip(z, 0))[::-1]    # S_i = z_i .. z_{n-1}
    return inf, z, pre, suf, pre[-1]


@partial(jax.jit, static_argnums=0)
def _bn_apply(ops, flat_x, flat_y, inf, pre, suf, tinv_m):
    """batch_normalize stage 2: per-element Z^-1 from the prefix/suffix
    products and the host-inverted grand total, then affine X, Y."""
    one = jnp.broadcast_to(ops.one(), pre.shape)
    pre_ex = jnp.concatenate([one[:1], pre[:-1]])    # prod_{j<i} z_j
    suf_ex = jnp.concatenate([suf[1:], one[:1]])     # prod_{j>i} z_j
    zinv = _fast_mul(ops, _fast_mul(ops, pre_ex, suf_ex), tinv_m[None])
    zi2 = _fast_mul(ops, zinv, zinv)
    zi3 = _fast_mul(ops, zi2, zinv)
    x = ops.select(inf, one, _fast_mul(ops, flat_x, zi2))
    y = ops.select(inf, one, _fast_mul(ops, flat_y, zi3))
    zz = ops.select(inf, jnp.zeros_like(one), one)
    return x, y, zz


def to_affine_np(ops, p: JPoint):
    """Host-side conversion of a (possibly batched) JPoint to affine python
    ints (None for infinity).  Test/IO path only."""
    import numpy as np

    from ..field import params as fp

    q = ops.ctx.p
    xs = ops.from_mont_np(np.asarray(p.x))
    ys = ops.from_mont_np(np.asarray(p.y))
    zs = ops.from_mont_np(np.asarray(p.z))

    def conv(x, y, z):
        if ops.elem_ndim == 1:
            if z == 0:
                return None
            zi = pow(int(z), -1, q)
            return (int(x) * zi * zi % q, int(y) * zi * zi * zi % q)
        else:
            z0, z1 = int(z[0]), int(z[1])
            if z0 == 0 and z1 == 0:
                return None
            # Fq2 inverse of z
            norm = (z0 * z0 + z1 * z1) % q
            ni = pow(norm, -1, q)
            zi = (z0 * ni % q, (-z1) * ni % q)

            def m(a, b):
                return ((a[0] * b[0] - a[1] * b[1]) % q,
                        (a[0] * b[1] + a[1] * b[0]) % q)

            zi2 = m(zi, zi)
            zi3 = m(zi2, zi)
            return (m((int(x[0]), int(x[1])), zi2),
                    m((int(y[0]), int(y[1])), zi3))

    batch_shape = np.asarray(p.z).shape[:-ops.elem_ndim]
    if batch_shape == ():
        return conv(xs, ys, zs)
    out = np.empty(batch_shape, dtype=object)
    flat = out.reshape(-1)
    xf = xs.reshape((-1,) + xs.shape[len(batch_shape):])
    yf = ys.reshape((-1,) + ys.shape[len(batch_shape):])
    zf = zs.reshape((-1,) + zs.shape[len(batch_shape):])
    for k in range(flat.shape[0]):
        flat[k] = conv(xf[k], yf[k], zf[k])
    return out
