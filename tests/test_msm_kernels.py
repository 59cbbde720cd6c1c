"""Point kernels and MSM vs the host curve (small sizes; graphs come from
the persistent compilation cache after the first run)."""

import random

import pytest

jnp = pytest.importorskip("jax.numpy")

from zksnark_tpu.curve import bn254 as hc  # noqa: E402
from zksnark_tpu.curve import jacobian as jac  # noqa: E402
from zksnark_tpu.curve.field_ops import FQ2_OPS, FQ_OPS  # noqa: E402
from zksnark_tpu.field.limb import FR_CTX  # noqa: E402
from zksnark_tpu.field.params import R  # noqa: E402
from zksnark_tpu.ops import msm as msmod  # noqa: E402

rng = random.Random(77)


def _g1_batch(ks):
    pts = [hc.g1_scalar_mul(hc.G1_GEN_PT, k) for k in ks]
    return pts, jac.from_affine(
        FQ_OPS,
        jnp.asarray(FQ_OPS.to_mont_np([p[0] for p in pts])),
        jnp.asarray(FQ_OPS.to_mont_np([p[1] for p in pts])))


def test_g1_double_add_edge_cases():
    ks = [rng.randrange(1, R) for _ in range(8)]
    host, P = _g1_batch(ks)

    aff = jac.to_affine_np(FQ_OPS, jac.double(FQ_OPS, P))
    assert all(aff[i] == hc.g1_scalar_mul(hc.G1_GEN_PT, 2 * k % R)
               for i, k in enumerate(ks))

    # P + P (same point through the general-add path)
    aff = jac.to_affine_np(FQ_OPS, jac.add(FQ_OPS, P, P))
    assert all(aff[i] == hc.g1_scalar_mul(hc.G1_GEN_PT, 2 * k % R)
               for i, k in enumerate(ks))

    # P + (-P) = infinity
    assert all(v is None for v in jac.to_affine_np(
        FQ_OPS, jac.add(FQ_OPS, P, jac.neg(FQ_OPS, P))))

    # identity element
    inf = jac.infinity(FQ_OPS, (8,))
    assert list(jac.to_affine_np(FQ_OPS, jac.add(FQ_OPS, P, inf))) == \
        list(jac.to_affine_np(FQ_OPS, jac.add(FQ_OPS, inf, P))) == host


def test_g1_msm_vs_host():
    n = 23
    ks = [rng.randrange(1, R) for _ in range(n)]
    host, P = _g1_batch(ks)
    scalars = [rng.randrange(R) for _ in range(n)]
    slimbs = jnp.asarray(FR_CTX.to_limbs_np(scalars))
    expect = None
    for pt, s in zip(host, scalars):
        expect = hc.g1_add(expect, hc.g1_scalar_mul(pt, s))

    assert jac.to_affine_np(
        FQ_OPS, msmod.msm_naive(FQ_OPS, P, slimbs)) == expect
    assert jac.to_affine_np(
        FQ_OPS, msmod.msm(FQ_OPS, P, slimbs, window_bits=8)) == expect


def test_g1_msm_with_zero_scalars_and_infinity():
    n = 8
    ks = [rng.randrange(1, R) for _ in range(n)]
    host, P = _g1_batch(ks)
    scalars = [0, 1, 0, rng.randrange(R), 0, 2, 0, 0]
    slimbs = jnp.asarray(FR_CTX.to_limbs_np(scalars))
    expect = None
    for pt, s in zip(host, scalars):
        expect = hc.g1_add(expect, hc.g1_scalar_mul(pt, s))
    got = jac.to_affine_np(FQ_OPS, msmod.msm(FQ_OPS, P, slimbs,
                                             window_bits=8))
    assert got == expect


def test_g2_msm_vs_host():
    # 64-bit scalars with the static scalar_bits bound: identical math to
    # the full-width path (the dropped windows are all-zero), 4x less
    # tape runtime on the CPU harness, and the bound feature gets G2
    # coverage.  Full 254-bit windows are covered by test_g1_msm_vs_host.
    n = 9
    ks = [rng.randrange(1, R) for _ in range(n)]
    pts = [hc.g2_scalar_mul(hc.G2_GEN, k) for k in ks]
    P = jac.from_affine(
        FQ2_OPS,
        jnp.asarray(FQ2_OPS.to_mont_np([list(p[0]) for p in pts])),
        jnp.asarray(FQ2_OPS.to_mont_np([list(p[1]) for p in pts])))
    scalars = [rng.randrange(1 << 64) for _ in range(n)]
    slimbs = jnp.asarray(FR_CTX.to_limbs_np(scalars))
    expect = None
    for pt, s in zip(pts, scalars):
        expect = hc.g2_add(expect, hc.g2_scalar_mul(pt, s))
    got = jac.to_affine_np(FQ2_OPS, msmod.msm(FQ2_OPS, P, slimbs,
                                              window_bits=8,
                                              scalar_bits=64))
    assert got == expect


def test_msm_scalar_bits_matches_full_width():
    """scalar_bits=64 on 64-bit scalars == the full 256-bit window sweep
    (the skipped windows are all-zero)."""
    n = 8
    ks = [rng.randrange(1, R) for _ in range(n)]
    _, P = _g1_batch(ks)
    scalars = [rng.randrange(1 << 64) for _ in range(n)]
    slimbs = jnp.asarray(FR_CTX.to_limbs_np(scalars))
    full = jac.to_affine_np(FQ_OPS, msmod.msm(FQ_OPS, P, slimbs,
                                              window_bits=8))
    bounded = jac.to_affine_np(FQ_OPS, msmod.msm(FQ_OPS, P, slimbs,
                                                 window_bits=8,
                                                 scalar_bits=64))
    assert bounded == full


def test_batch_scalar_mul():
    n = 8
    ks = [rng.randrange(1, R) for _ in range(n)]
    host, P = _g1_batch(ks)
    scalars = [rng.randrange(R) for _ in range(n)]
    slimbs = jnp.asarray(FR_CTX.to_limbs_np(scalars))
    aff = jac.to_affine_np(FQ_OPS, msmod.batch_scalar_mul(FQ_OPS, P, slimbs))
    assert all(aff[i] == hc.g1_scalar_mul(host[i], scalars[i])
               for i in range(n))


def test_batch_normalize_and_affine_msm():
    """batch_normalize (Montgomery-trick inversion) preserves every point
    and emits Z in {0, one}; the MSM's affine fast path (mixed adds on
    TPU) agrees with the projective path and the host ground truth."""
    n = 37
    ks = [rng.randrange(1, R) for _ in range(n)]
    host, P = _g1_batch(ks)
    proj = jac.add(FQ_OPS, P, jac.double(FQ_OPS, P))  # 3P, projective Z
    mask = jnp.asarray([i % 11 == 0 for i in range(n)])
    mixed = jac.select(FQ_OPS, mask, jac.infinity(FQ_OPS, (n,)), proj)

    norm = jac.batch_normalize(FQ_OPS, mixed)
    import numpy as np

    zs = set(int(z) for z in FQ_OPS.from_mont_np(np.asarray(norm.z)))
    assert zs <= {0, 1}
    assert (jac.to_affine_np(FQ_OPS, norm)
            == jac.to_affine_np(FQ_OPS, mixed)).all()

    scalars = [rng.randrange(R) for _ in range(n)]
    slimbs = jnp.asarray(FR_CTX.to_limbs_np(scalars))
    expect = None
    for i, (k, s) in enumerate(zip(ks, scalars)):
        if i % 11 == 0:
            continue
        expect = hc.g1_add(expect, hc.g1_scalar_mul(
            hc.G1_GEN_PT, 3 * k * s % R))
    r_aff = jac.to_affine_np(FQ_OPS, msmod.msm(
        FQ_OPS, norm, slimbs, window_bits=4, affine=True))
    r_prj = jac.to_affine_np(FQ_OPS, msmod.msm(
        FQ_OPS, mixed, slimbs, window_bits=4))
    assert r_aff == r_prj == expect


def test_g2_batch_normalize():
    ks = [rng.randrange(1, R) for _ in range(9)]
    pts = [hc.g2_scalar_mul(hc.G2_GEN, k) for k in ks]
    P2 = jac.from_affine(
        FQ2_OPS,
        jnp.asarray(FQ2_OPS.to_mont_np([list(p[0]) for p in pts])),
        jnp.asarray(FQ2_OPS.to_mont_np([list(p[1]) for p in pts])))
    proj = jac.double(FQ2_OPS, P2)
    norm = jac.batch_normalize(FQ2_OPS, proj)
    assert (jac.to_affine_np(FQ2_OPS, norm)
            == jac.to_affine_np(FQ2_OPS, proj)).all()


def test_msm_adversarial_cancelling_buckets():
    """Point sets engineered so whole buckets (and run-end prefixes) sum
    to EXACTLY the point at infinity — the case the Abel forward-fill
    must survive (ops/msm.py validity-flag fill): a keep-last fill keyed
    on the infinity sentinel would inherit the previous bucket here."""
    # 8 pairs (P, -P) sharing one digit value per pair: every bucket sum
    # is infinity, so the MSM total is infinity.
    ks = [rng.randrange(1, R) for _ in range(8)]
    _, P = _g1_batch(ks)
    negP = jac.neg(FQ_OPS, P)
    pts = jac.JPoint(jnp.concatenate([P.x, negP.x]),
                     jnp.concatenate([P.y, negP.y]),
                     jnp.concatenate([P.z, negP.z]))
    s_vals = [3, 3, 7, 7, 11, 11, 200, 200]      # same digit per pair
    scalars = jnp.asarray(FR_CTX.to_limbs_np(s_vals + s_vals))
    out = msmod.msm(FQ_OPS, pts, scalars, window_bits=8)
    assert jac.to_affine_np(FQ_OPS, out) is None

    # one CANCELLING bucket in the middle of populated ones: buckets
    # 3 (cancelling), 5 and 9 (real).  E_3 fill must not leak into E_4.
    ks2 = [rng.randrange(1, R) for _ in range(6)]
    host2, P2 = _g1_batch(ks2)
    negP2 = jac.neg(FQ_OPS, jac.JPoint(P2.x[:2], P2.y[:2], P2.z[:2]))
    pts2 = jac.JPoint(jnp.concatenate([P2.x[:2], negP2.x, P2.x[2:]]),
                      jnp.concatenate([P2.y[:2], negP2.y, P2.y[2:]]),
                      jnp.concatenate([P2.z[:2], negP2.z, P2.z[2:]]))
    s2 = [3, 3, 3, 3, 5, 5, 9, 9]
    slimbs2 = jnp.asarray(FR_CTX.to_limbs_np(s2))
    got = jac.to_affine_np(FQ_OPS, msmod.msm(FQ_OPS, pts2, slimbs2,
                                             window_bits=8))
    want = jac.to_affine_np(
        FQ_OPS, msmod.msm_naive(FQ_OPS, pts2, slimbs2))
    assert got == want


def test_msm_adversarial_all_equal_and_top_scalar():
    """All points equal (single giant bucket run), scalar = r-1 (every
    window at its max digit), and a single point whose only nonzero
    digit sits in the TOP window."""
    _, P1 = _g1_batch([12345])
    n = 16
    pts = jac.JPoint(jnp.tile(P1.x, (n, 1)), jnp.tile(P1.y, (n, 1)),
                     jnp.tile(P1.z, (n, 1)))
    scalars = jnp.asarray(FR_CTX.to_limbs_np([R - 1] * n))
    got = jac.to_affine_np(FQ_OPS, msmod.msm(FQ_OPS, pts, scalars))
    assert got == hc.g1_scalar_mul(hc.G1_GEN_PT, 12345 * (n * (R - 1)) % R)

    # single nonzero bucket in the top window (scalar = digit << 248)
    top = 177 << 248
    ks = [rng.randrange(1, R) for _ in range(4)]
    host, P = _g1_batch(ks)
    svals = [top % R, 0, 0, 0]
    slimbs = jnp.asarray(FR_CTX.to_limbs_np(svals))
    got = jac.to_affine_np(FQ_OPS, msmod.msm(FQ_OPS, P, slimbs,
                                             window_bits=8))
    assert got == hc.g1_scalar_mul(hc.G1_GEN_PT, ks[0] * (top % R) % R)


def test_msm_many_matches_individual():
    """_msm_windowed_many (the prover's fused 4x G1 path) == per-instance
    msm on distinct point sets and scalars."""
    m, n = 3, 16
    sets = []
    for j in range(m):
        ks = [rng.randrange(1, R) for _ in range(n)]
        _, P = _g1_batch(ks)
        svals = [rng.randrange(R) for _ in range(n)]
        sets.append((P, jnp.asarray(FR_CTX.to_limbs_np(svals))))
    pts = jac.JPoint(jnp.stack([p.x for p, _ in sets]),
                     jnp.stack([p.y for p, _ in sets]),
                     jnp.stack([p.z for p, _ in sets]))
    scs = jnp.stack([s for _, s in sets])
    out = msmod._msm_windowed_many(FQ_OPS, pts, scs, 8, 0, False)
    for j, (P, s) in enumerate(sets):
        want = jac.to_affine_np(FQ_OPS, msmod.msm(FQ_OPS, P, s,
                                                  window_bits=8))
        got = jac.to_affine_np(
            FQ_OPS, jac.JPoint(out.x[j], out.y[j], out.z[j]))
        assert got == want, j
