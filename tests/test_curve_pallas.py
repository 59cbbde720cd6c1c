"""The fused Pallas point kernels' MATH, tested on CPU.

`pallas_call` itself only runs on TPU (exercised by bench/profile runs);
here the kernel body helpers (`_add_core` / `_double_core` on lane-major
digit rows) are driven as plain jnp programs and compared bit-for-bit
against the XLA Jacobian path — covering the complete-add edge cases
(P=inf, Q=inf, P=Q, P=-Q) for both G1 and G2."""

import random

import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from zksnark_tpu.curve import bn254 as hc  # noqa: E402
from zksnark_tpu.curve import jacobian as jac  # noqa: E402
from zksnark_tpu.curve.field_ops import FQ2_OPS, FQ_OPS  # noqa: E402
from zksnark_tpu.field.params import R  # noqa: E402
from zksnark_tpu.ops import curve_pallas as cpal  # noqa: E402

rng = random.Random(99)


def _core_op(ops, fn, *pts):
    """Run an _add_core/_double_core on JPoints via the lane-major codec."""
    cpal._bind_kernel_consts()  # the pallas_call entry points do this
    nr = cpal._nrows(ops)
    K = cpal._KFq if nr == cpal.L else cpal._KFq2
    rows = []
    meta = None
    for p in pts:
        for arr in (p.x, p.y, p.z):
            lm, bs, n = cpal._to_lane_major(arr, nr)
            rows.append([lm[k] for k in range(nr)])
            meta = (bs, n)
    outs = fn(K, *rows)
    bs, n = meta
    return jac.JPoint(*[
        cpal._from_lane_major(jnp.stack(o), nr, bs, n) for o in outs])


def _g1_points(ks):
    pts = [hc.g1_scalar_mul(hc.G1_GEN_PT, k) for k in ks]
    return jac.from_affine(
        FQ_OPS,
        jnp.asarray(FQ_OPS.to_mont_np([p[0] for p in pts])),
        jnp.asarray(FQ_OPS.to_mont_np([p[1] for p in pts])))


def _g2_points(ks):
    pts = [hc.g2_scalar_mul(hc.G2_GEN, k) for k in ks]
    return jac.from_affine(
        FQ2_OPS,
        jnp.asarray(FQ2_OPS.to_mont_np([list(p[0]) for p in pts])),
        jnp.asarray(FQ2_OPS.to_mont_np([list(p[1]) for p in pts])))


@pytest.mark.parametrize("group", ["g1", "g2"])
def test_kernel_core_add_double_match_xla(group):
    ops = FQ_OPS if group == "g1" else FQ2_OPS
    mk = _g1_points if group == "g1" else _g2_points

    ks = [rng.randrange(1, R) for _ in range(6)]
    P = mk(ks)
    Q = mk([rng.randrange(1, R) for _ in range(6)])

    got = _core_op(ops, cpal._add_core, P, Q)
    want = jac._add_xla(ops, P, Q)
    assert jac.to_affine_np(ops, got).tolist() == \
        jac.to_affine_np(ops, want).tolist()

    got_d = _core_op(ops, cpal._double_core, P)
    want_d = jac._double_xla(ops, P)
    assert jac.to_affine_np(ops, got_d).tolist() == \
        jac.to_affine_np(ops, want_d).tolist()


@pytest.mark.parametrize("group", ["g1", "g2"])
def test_kernel_core_edge_cases(group):
    ops = FQ_OPS if group == "g1" else FQ2_OPS
    mk = _g1_points if group == "g1" else _g2_points

    A = mk([5, 5, 7, 9])
    # Q = [A, -A, inf, A] against P = [A, A, A, inf]
    negA = jac.neg(ops, mk([5]))
    inf = jac.infinity(ops, (1,))

    def cat(*ps):
        return jac.JPoint(
            jnp.concatenate([p.x for p in ps]),
            jnp.concatenate([p.y for p in ps]),
            jnp.concatenate([p.z for p in ps]))

    P = cat(mk([5]), mk([5]), mk([7]), inf)
    Q = cat(mk([5]), negA, inf, mk([9]))

    got = _core_op(ops, cpal._add_core, P, Q)
    want = jac._add_xla(ops, P, Q)
    assert jac.to_affine_np(ops, got).tolist() == \
        jac.to_affine_np(ops, want).tolist()
    # spot-check semantics: P+P = 2A, A + (-A) = inf, A+inf = A, inf+B = B
    aff = jac.to_affine_np(ops, got).tolist()
    assert aff[1] is None
    assert aff[2] == jac.to_affine_np(ops, mk([7])).tolist()[0]
    assert aff[3] == jac.to_affine_np(ops, mk([9])).tolist()[0]
