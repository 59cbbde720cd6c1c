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
    """Run an _add_core/_double_core on JPoints via the digit-major codec."""
    from zksnark_tpu.field.limb import FQ_CTX
    from zksnark_tpu.ops import fieldcore as fc

    nr = cpal._nrows(ops)
    cc = fc.make_consts(FQ_CTX)
    K = cpal._KFq(cc) if nr == cpal.L else cpal._KFq2(cc)
    args = []
    meta = None
    for p in pts:
        for arr in (p.x, p.y, p.z):
            lm, bs, n = cpal._to_lane_major(arr, nr)
            args.append(lm.T)            # kernels transpose in VMEM;
            meta = (bs, n)               # here we do it at the boundary
    outs = fn(K, *args)
    bs, n = meta
    return jac.JPoint(*[
        cpal._from_lane_major(o.T, nr, bs, n) for o in outs])


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


def _unnormalized(ops, pts):
    """A projectively-equivalent copy of `pts` with Z != one (doubling a
    point then adding the negation of itself would hit edge cases, so
    instead: P' = add(P, Q) - Q for random Q keeps values generic)."""
    # Simpler: scale (X, Y, Z) -> (l^2 X, l^3 Y, l Z) by a fixed lambda.
    lam = ops.to_mont_np([3])[0] if ops.elem_ndim == 1 else \
        ops.to_mont_np([[3, 0]])[0]
    lam = jnp.asarray(lam)
    l2 = ops.mul(lam, lam)
    l3 = ops.mul(l2, lam)
    return jac.JPoint(ops.mul(pts.x, l2[None]), ops.mul(pts.y, l3[None]),
                      ops.mul(pts.z, lam[None]))


@pytest.mark.parametrize("group", ["g1", "g2"])
def test_kernel_core_madd_matches_add_xla(group):
    """_madd_core (the mixed-add kernel behind every affine-MSM bucket
    combine and setup's _comb_encrypt) vs the general XLA add oracle.

    Q rows satisfy the batch_normalize invariant (Z in {0, one}); P rows
    cover generic, unnormalized-Z, P=Q, P=-Q, P=inf, Q=inf, both=inf."""
    ops = FQ_OPS if group == "g1" else FQ2_OPS
    mk = _g1_points if group == "g1" else _g2_points

    inf = jac.infinity(ops, (1,))
    negA = jac.neg(ops, mk([5]))

    def cat(*ps):
        return jac.JPoint(
            jnp.concatenate([p.x for p in ps]),
            jnp.concatenate([p.y for p in ps]),
            jnp.concatenate([p.z for p in ps]))

    ks = [rng.randrange(1, R) for _ in range(4)]
    qs = [rng.randrange(1, R) for _ in range(4)]
    # P: generic x4 (two with Z != one), then A, A, A, inf, inf
    P = cat(mk(ks[:2]), _unnormalized(ops, mk(ks[2:])),
            mk([5]), _unnormalized(ops, mk([5])), mk([5]), inf, inf)
    # Q: generic x4 affine, then A (P=Q), A (P=Q, P unnormalized),
    #    -A (P=-Q), B (P=inf), inf (both cases)
    Q = cat(mk(qs), mk([5]), mk([5]), negA, mk([9]), inf)
    # Q invariant check: Z exactly one-or-zero
    z_ok = jnp.logical_or(ops.is_zero(Q.z),
                          ops.is_zero(ops.sub(Q.z, ops.one(Q.z.shape[:1]))))
    assert bool(jnp.all(z_ok))

    got = _core_op(ops, cpal._madd_core, P, Q)
    want = jac._add_xla(ops, P, Q)
    aff_got = jac.to_affine_np(ops, got).tolist()
    aff_want = jac.to_affine_np(ops, want).tolist()
    assert aff_got == aff_want
    # semantic spot checks
    assert aff_got[4] == jac.to_affine_np(ops, mk([10])).tolist()[0]  # P=Q
    assert aff_got[5] == jac.to_affine_np(ops, mk([10])).tolist()[0]
    assert aff_got[6] is None                                   # P = -Q
    assert aff_got[7] == jac.to_affine_np(ops, mk([9])).tolist()[0]
    assert aff_got[8] is None                                   # inf+inf


@pytest.mark.parametrize("group", ["g1", "g2"])
def test_jacobian_madd_dispatch_matches_add(group):
    """curve.jacobian.madd (the dispatch wrapper) == add on CPU for
    affine-or-infinity Q, including a batch big enough to cross
    _PALLAS_MIN (on CPU both routes fall back to XLA, asserting the
    precondition-only-enables-cheaper-formulas contract)."""
    ops = FQ_OPS if group == "g1" else FQ2_OPS
    mk = _g1_points if group == "g1" else _g2_points
    ks = [rng.randrange(1, R) for _ in range(8)]
    P = _unnormalized(ops, mk(ks))
    Q = mk([rng.randrange(1, R) for _ in range(8)])
    got = jac.madd(ops, P, Q)
    want = jac.add(ops, P, Q)
    assert jac.to_affine_np(ops, got).tolist() == \
        jac.to_affine_np(ops, want).tolist()
