"""Tape-compiled Jacobian point ops: the compile-economy backend.

Motivation (measured on a 2-CPU host): XLA compile time is ~proportional
to optimized-HLO size, and every straight-line `curve.jacobian._add_xla`
call site inlines the full formula — ~50 Montgomery multiplies at ~1k
optimized HLO lines each, i.e. ~25k lines per G1 add body and ~77k per G2
add body.  A multi-chip prove-step graph holds tens of such bodies, which
is minutes of XLA-CPU compile — the round-1/2 multichip-dryrun timeout.

This module removes the blowup *structurally* instead of shrinking the
digit machinery (which measurement showed does not help: compile cost per
mont_mul body is ~constant across limb layouts).  The complete add/double
formulas from `curve.jacobian` are recorded ONCE — through the exact same
generic `ops` interface the straight-line path uses, so the semantics
cannot drift — into a static register-machine tape, and each call site
executes the tape under one `lax.scan` whose body contains exactly ONE
mont_mul (+ one add, one sub, and the cheap mask ops).  A point-op call
site then costs ~2k optimized HLO lines regardless of formula size or
tower degree: G2 adds compile ~40x faster.

The trade: the scan serializes ~50 (G1) / ~150 (G2) steps per point op
and every step evaluates all opcode kernels, so runtime is a few times
slower than straight-line XLA.  That is the right trade exactly where
this backend is used — CPU meshes (tests, the driver's multi-chip dryrun)
— and the wrong one on TPU, where the straight-line/Pallas paths remain
the default (`enabled()` keys off the backend; ZK_POINT_TAPE=0/1
overrides).

Replaces the same `bn`-crate group ops as `curve/jacobian.py`
(/root/reference/src/groth16/fr.rs:175-223); the reference has no
compile-time axis at all (ahead-of-time rustc), this is a JAX-specific
subsystem.
"""

from __future__ import annotations

import os
from functools import lru_cache, partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..field.limb import (
    DT, MontCtx, add as l_add, is_zero as l_is_zero, mont_mul, sub as l_sub,
)
from ..field import params

L = params.NUM_LIMBS

# opcodes
_MUL, _ADD, _SUB, _SELECT, _ISZERO, _BAND, _BNOT = range(7)

# fixed registers
_REG_ZERO, _REG_ONE = 0, 1


def enabled() -> bool:
    """Tape backend on?  Env override ZK_POINT_TAPE=0/1; default: only on
    CPU backends (TPU keeps straight-line XLA / Pallas)."""
    env = os.environ.get("ZK_POINT_TAPE")
    if env is not None:
        return env == "1"
    return jax.default_backend() == "cpu"


# ---------------------------------------------------------------------------
# recording: run the jacobian formulas on symbolic register handles
# ---------------------------------------------------------------------------


class _Mask:
    """Boolean handle: a register holding 0/1 in every digit lane."""

    __slots__ = ("reg", "rec")
    shape = ()  # jacobian.infinity(ops, mask.shape) reads this

    def __init__(self, rec, reg: int):
        self.rec = rec
        self.reg = reg

    def __and__(self, other: "_Mask") -> "_Mask":
        return _Mask(self.rec, self.rec.emit(_BAND, self.reg, other.reg))

    def __invert__(self) -> "_Mask":
        return _Mask(self.rec, self.rec.emit(_BNOT, self.reg, 0))


class _Rec:
    def __init__(self):
        self.instrs: list = []
        self.n_regs = 2  # 0 = field zero, 1 = Montgomery one

    def new_reg(self) -> int:
        r = self.n_regs
        self.n_regs += 1
        return r

    def emit(self, op: int, a: int, b: int, c: int = 0) -> int:
        dst = self.new_reg()
        self.instrs.append((op, dst, a, b, c))
        return dst


class _TapeFqOps:
    """Same interface as curve.field_ops.FqOps, over register handles."""

    elem_ndim = 1

    def __init__(self, rec: _Rec):
        self.rec = rec

    def mul(self, a, b):
        return self.rec.emit(_MUL, a, b)

    def sqr(self, a):
        return self.rec.emit(_MUL, a, a)

    def add(self, a, b):
        return self.rec.emit(_ADD, a, b)

    def sub(self, a, b):
        return self.rec.emit(_SUB, a, b)

    def neg(self, a):
        return self.rec.emit(_SUB, _REG_ZERO, a)

    def dbl(self, a):
        return self.rec.emit(_ADD, a, a)

    def is_zero(self, a):
        return _Mask(self.rec, self.rec.emit(_ISZERO, a, 0))

    def select(self, mask: _Mask, a, b):
        return self.rec.emit(_SELECT, mask.reg, a, b)

    def zero(self, shape=()):
        return _REG_ZERO

    def one(self, shape=()):
        return _REG_ONE

    def new_elem(self) -> Tuple[int, ...]:
        return (self.rec.new_reg(),)

    @staticmethod
    def flatten(h):
        return (h,)


class _TapeFq2Ops:
    """Fq2 handles are (c0, c1) register pairs; mirrors field_ops.Fq2Ops
    (3-mul Karatsuba, squaring via (a0+a1)(a0-a1))."""

    elem_ndim = 2

    def __init__(self, rec: _Rec):
        self.rec = rec
        self.base = _TapeFqOps(rec)

    def mul(self, a, b):
        f = self.base
        t0 = f.mul(a[0], b[0])
        t1 = f.mul(a[1], b[1])
        t2 = f.mul(f.add(a[0], a[1]), f.add(b[0], b[1]))
        return (f.sub(t0, t1), f.sub(f.sub(t2, t0), t1))

    def sqr(self, a):
        f = self.base
        return (f.mul(f.add(a[0], a[1]), f.sub(a[0], a[1])),
                f.mul(f.add(a[0], a[0]), a[1]))

    def add(self, a, b):
        f = self.base
        return (f.add(a[0], b[0]), f.add(a[1], b[1]))

    def sub(self, a, b):
        f = self.base
        return (f.sub(a[0], b[0]), f.sub(a[1], b[1]))

    def neg(self, a):
        f = self.base
        return (f.neg(a[0]), f.neg(a[1]))

    def dbl(self, a):
        return self.add(a, a)

    def is_zero(self, a):
        f = self.base
        return f.is_zero(a[0]) & f.is_zero(a[1])

    def select(self, mask: _Mask, a, b):
        f = self.base
        return (f.select(mask, a[0], b[0]), f.select(mask, a[1], b[1]))

    def zero(self, shape=()):
        return (_REG_ZERO, _REG_ZERO)

    def one(self, shape=()):
        return (_REG_ONE, _REG_ZERO)

    def new_elem(self) -> Tuple[int, ...]:
        return (self.rec.new_reg(), self.rec.new_reg())

    @staticmethod
    def flatten(h):
        return tuple(h)


class Tape(NamedTuple):
    instrs: tuple          # ((op, dst, a, b, c), ...) — hashable
    n_regs: int
    in_regs: Tuple[int, ...]
    out_regs: Tuple[int, ...]


def _record(formula, elem_ndim: int, n_points: int) -> Tape:
    from . import jacobian as jac

    rec = _Rec()
    ops = _TapeFqOps(rec) if elem_ndim == 1 else _TapeFq2Ops(rec)
    pts, in_regs = [], []
    for _ in range(n_points):
        coords = [ops.new_elem() for _ in range(3)]
        for celem in coords:
            in_regs.extend(ops.flatten(celem))
        if elem_ndim == 1:
            coords = [c[0] for c in coords]
        pts.append(jac.JPoint(*coords))
    out = formula(ops, *pts)
    out_regs = (ops.flatten(out.x) + ops.flatten(out.y)
                + ops.flatten(out.z))
    return Tape(tuple(rec.instrs), rec.n_regs, tuple(in_regs),
                tuple(out_regs))


@lru_cache(maxsize=None)
def _tapes(elem_ndim: int) -> Tuple[Tape, Tape]:
    from . import jacobian as jac

    return (_record(jac._add_xla, elem_ndim, 2),
            _record(jac._double_xla, elem_ndim, 1))


# ---------------------------------------------------------------------------
# execution: one lax.scan over the tape, ONE mont_mul in the body
# ---------------------------------------------------------------------------


@lru_cache(maxsize=None)
def _executor(ctx: MontCtx, tape: Tape):
    # numpy (not jnp): the factory may first run inside a trace, and a
    # device constant created there would leak out through the cache
    instrs = np.array(tape.instrs, dtype=np.int32)

    def run(*inputs):
        batch = jnp.broadcast_shapes(*[v.shape[:-1] for v in inputs])
        regs = jnp.zeros((tape.n_regs,) + batch + (L,), DT)
        regs = regs.at[_REG_ONE].set(
            jnp.broadcast_to(ctx.r_limbs, batch + (L,)))
        for r, v in zip(tape.in_regs, inputs):
            regs = regs.at[r].set(jnp.broadcast_to(v, batch + (L,)))

        def body(regs, ins):
            op, dst, ia, ib, ic = (ins[0], ins[1], ins[2], ins[3], ins[4])
            va = jnp.take(regs, ia, axis=0)
            vb = jnp.take(regs, ib, axis=0)
            vc = jnp.take(regs, ic, axis=0)
            branches = [
                mont_mul(ctx, va, vb),                       # MUL
                l_add(ctx, va, vb),                          # ADD
                l_sub(ctx, va, vb),                          # SUB
                jnp.where(va[..., :1] != 0, vb, vc),         # SELECT
                jnp.broadcast_to(                            # ISZERO
                    l_is_zero(va)[..., None], va.shape).astype(DT),
                va * vb,                                     # BAND
                1.0 - va,                                    # BNOT
            ]
            out = branches[-1]
            for code in range(len(branches) - 2, -1, -1):
                out = jnp.where(op == code, branches[code], out)
            regs = jax.lax.dynamic_update_index_in_dim(regs, out, dst, 0)
            return regs, None

        regs, _ = jax.lax.scan(body, regs, instrs)
        return tuple(regs[r] for r in tape.out_regs)

    return run


def _coords_in(ops, p) -> list:
    if ops.elem_ndim == 1:
        return [p.x, p.y, p.z]
    return [p.x[..., 0, :], p.x[..., 1, :], p.y[..., 0, :], p.y[..., 1, :],
            p.z[..., 0, :], p.z[..., 1, :]]


def _point_out(ops, outs):
    from .jacobian import JPoint

    if ops.elem_ndim == 1:
        return JPoint(*outs)
    return JPoint(jnp.stack(outs[0:2], axis=-2),
                  jnp.stack(outs[2:4], axis=-2),
                  jnp.stack(outs[4:6], axis=-2))


def jac_add(ops, p, q):
    add_tape, _ = _tapes(ops.elem_ndim)
    run = _executor(ops.ctx, add_tape)
    return _point_out(ops, run(*_coords_in(ops, p), *_coords_in(ops, q)))


def jac_double(ops, p):
    _, dbl_tape = _tapes(ops.elem_ndim)
    run = _executor(ops.ctx, dbl_tape)
    return _point_out(ops, run(*_coords_in(ops, p)))
