"""Tape-compiled point ops (curve/tape.py) vs the straight-line XLA oracle.

The tape backend records the SAME `_add_xla`/`_double_xla` formulas through
the same generic ops interface, so parity must be bit-exact — including the
complete-addition edge cases (P=Q, P=-Q, P=inf, Q=inf).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from zksnark_tpu.curve import bn254 as hc, jacobian as jac, tape
from zksnark_tpu.curve.field_ops import FQ2_OPS, FQ_OPS
from zksnark_tpu.field import params as fp


def _g1_jp(pts, inf_at=()):
    x = jnp.asarray(FQ_OPS.to_mont_np([p[0] for p in pts]))
    y = jnp.asarray(FQ_OPS.to_mont_np([p[1] for p in pts]))
    z = FQ_OPS.one((len(pts),))
    for i in inf_at:
        z = z.at[i].set(0.0)
    return jac.JPoint(x, y, z)


def _g2_jp(pts, inf_at=()):
    x = jnp.asarray(FQ2_OPS.to_mont_np([list(p[0]) for p in pts]))
    y = jnp.asarray(FQ2_OPS.to_mont_np([list(p[1]) for p in pts]))
    z = FQ2_OPS.one((len(pts),))
    for i in inf_at:
        z = z.at[i].set(0.0)
    return jac.JPoint(x, y, z)


@pytest.fixture(scope="module")
def g1_batches():
    rng = np.random.default_rng(7)
    n = 8
    a = [hc.g1_scalar_mul(hc.G1_GEN_PT, int(rng.integers(1, 1 << 30)))
         for _ in range(n)]
    b = [hc.g1_scalar_mul(hc.G1_GEN_PT, int(rng.integers(1, 1 << 30)))
         for _ in range(n)]
    b[0] = a[0]                                     # P = Q
    b[1] = (a[1][0], (-a[1][1]) % fp.Q)             # P = -Q
    return _g1_jp(a, inf_at=(2,)), _g1_jp(b, inf_at=(3,))


@pytest.fixture(scope="module")
def g2_batches():
    rng = np.random.default_rng(8)
    n = 6
    a = [hc.g2_scalar_mul(hc.G2_GEN, int(rng.integers(1, 1 << 30)))
         for _ in range(n)]
    b = [hc.g2_scalar_mul(hc.G2_GEN, int(rng.integers(1, 1 << 30)))
         for _ in range(n)]
    b[0] = a[0]
    b[1] = (a[1][0], tuple((-c) % fp.Q for c in a[1][1]))
    return _g2_jp(a, inf_at=(2,)), _g2_jp(b, inf_at=(3,))


def test_tape_enabled_on_cpu():
    # conftest forces the CPU backend; the default dispatch must be tape
    assert tape.enabled()


def test_g1_add_parity(g1_batches):
    P, Q = g1_batches
    ref = jax.jit(lambda p, q: jac._add_xla(FQ_OPS, p, q))(P, Q)
    got = jax.jit(lambda p, q: tape.jac_add(FQ_OPS, p, q))(P, Q)
    ra = jac.to_affine_np(FQ_OPS, jac.JPoint(*ref))
    ga = jac.to_affine_np(FQ_OPS, jac.JPoint(*got))
    assert list(ra) == list(ga)


def test_g1_double_parity(g1_batches):
    P, _ = g1_batches
    ref = jax.jit(lambda p: jac._double_xla(FQ_OPS, p))(P)
    got = jax.jit(lambda p: tape.jac_double(FQ_OPS, p))(P)
    ra = jac.to_affine_np(FQ_OPS, jac.JPoint(*ref))
    ga = jac.to_affine_np(FQ_OPS, jac.JPoint(*got))
    assert list(ra) == list(ga)


def test_g2_add_parity(g2_batches):
    P, Q = g2_batches
    ref = jax.jit(lambda p, q: jac._add_xla(FQ2_OPS, p, q))(P, Q)
    got = jax.jit(lambda p, q: tape.jac_add(FQ2_OPS, p, q))(P, Q)
    ra = jac.to_affine_np(FQ2_OPS, jac.JPoint(*ref))
    ga = jac.to_affine_np(FQ2_OPS, jac.JPoint(*got))
    assert list(ra) == list(ga)


def test_g2_double_parity(g2_batches):
    P, _ = g2_batches
    ref = jax.jit(lambda p: jac._double_xla(FQ2_OPS, p))(P)
    got = jax.jit(lambda p: tape.jac_double(FQ2_OPS, p))(P)
    ra = jac.to_affine_np(FQ2_OPS, jac.JPoint(*ref))
    ga = jac.to_affine_np(FQ2_OPS, jac.JPoint(*got))
    assert list(ra) == list(ga)


def test_broadcasting_batch_shapes(g1_batches):
    """Scalar point + batch point broadcasts like the straight-line path."""
    P, Q = g1_batches
    single = jac.JPoint(P.x[0], P.y[0], P.z[0])
    ref = jax.jit(lambda p, q: jac._add_xla(FQ_OPS, p, q))(single, Q)
    got = jax.jit(lambda p, q: tape.jac_add(FQ_OPS, p, q))(single, Q)
    assert list(jac.to_affine_np(FQ_OPS, jac.JPoint(*ref))) == list(
        jac.to_affine_np(FQ_OPS, jac.JPoint(*got)))


def test_tape_sizes():
    """The whole point: bounded tape, ONE mul body per call site."""
    add_t, dbl_t = tape._tapes(1)
    add2_t, dbl2_t = tape._tapes(2)
    for t in (add_t, dbl_t, add2_t, dbl2_t):
        assert len(t.instrs) < 300
        assert t.n_regs == 2 + len(t.in_regs) + len(t.instrs)
