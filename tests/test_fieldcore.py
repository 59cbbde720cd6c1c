"""The digit-major MXU field core, pinned bit-exact to the limb oracle.

`ops.fieldcore` is the round-5 multiply primitive (parallel carries, MXU
Toeplitz convolutions).  Every public op must agree digit-for-digit with
the `field.limb` XLA path (itself pinned to host python ints) on random
values and the adversarial edge set {0, 1, p-1, p-2, 2^256-mod-p wrap
neighbours, all-255 digit patterns}."""

import random

import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from zksnark_tpu.field import limb  # noqa: E402
from zksnark_tpu.field.limb import FQ_CTX, FR_CTX  # noqa: E402
from zksnark_tpu.ops import fieldcore as fc  # noqa: E402

rng = random.Random(20260821)


def _edge_values(p):
    vals = [0, 1, 2, p - 1, p - 2, (1 << 255) % p, (1 << 256) % p]
    # all-255 low digits: 2^k - 1 patterns stress propagate chains
    vals += [(1 << 128) - 1, (1 << 253) - 1]
    vals += [rng.randrange(p) for _ in range(23)]
    return [v % p for v in vals]


@pytest.mark.parametrize("ctx", [FR_CTX, FQ_CTX], ids=["Fr", "Fq"])
def test_mont_mul_dm_matches_limb(ctx):
    vals = _edge_values(ctx.p)
    n = len(vals)
    a_int = vals
    b_int = vals[::-1]
    am = jnp.asarray(ctx.to_mont_np(a_int))
    bm = jnp.asarray(ctx.to_mont_np(b_int))
    want = limb.mont_mul(ctx, am, bm)
    cc = fc.make_consts(ctx)
    got = fc.mont_mul_dm(am.T, bm.T, cc).T
    assert np.array_equal(np.asarray(want), np.asarray(got))
    # and the values are right (not just internally consistent)
    got_ints = ctx.from_mont_np(np.asarray(got))
    for x, y, z in zip(a_int, b_int, got_ints.tolist()):
        assert z == x * y % ctx.p


@pytest.mark.parametrize("ctx", [FR_CTX, FQ_CTX], ids=["Fr", "Fq"])
def test_add_sub_dm_match_limb(ctx):
    vals = _edge_values(ctx.p)
    am = jnp.asarray(ctx.to_mont_np(vals))
    bm = jnp.asarray(ctx.to_mont_np(vals[::-1]))
    cc = fc.make_consts(ctx)
    assert np.array_equal(
        np.asarray(limb.add(ctx, am, bm)),
        np.asarray(fc.add_dm(am.T, bm.T, cc).T))
    assert np.array_equal(
        np.asarray(limb.sub(ctx, am, bm)),
        np.asarray(fc.sub_dm(am.T, bm.T, cc).T))
    assert np.array_equal(
        np.asarray(limb.sub(ctx, bm, am)),
        np.asarray(fc.sub_dm(bm.T, am.T, cc).T))


def test_carry_machinery_bounds():
    """fold/carry_resolve on the worst-case digit patterns the pipeline
    can produce (all digits at the documented bounds), for BOTH the
    packed-u32 resolver and the Kogge-Stone oracle, on 32- and 64-digit
    vectors."""
    cc = fc.make_consts(FR_CTX)
    for d in (fc.L, 2 * fc.L):
        for fill in (0.0, 255.0, 320.0, 510.0, float(2**21), float(2**22)):
            v = jnp.full((d, 8), fill, jnp.float32)
            w = 256 ** np.arange(d, dtype=object)
            val_in = int(sum(int(fill) * x for x in w))
            if fill <= 510.0:
                out_p, carry_p = fc.carry_resolve(v, cc)
                out_k, carry_k = fc.carry_resolve_ks(v)
                assert np.array_equal(np.asarray(out_p), np.asarray(out_k))
                assert np.array_equal(
                    np.asarray(carry_p) != 0, np.asarray(carry_k) != 0)
                o = np.asarray(out_p)
                assert o.min() >= 0 and o.max() <= 255
                val_out = (int(sum(int(x) * y
                                   for x, y in zip(o[:, 0], w)))
                           + int(np.asarray(carry_p)[0]) * 256 ** d)
                assert val_in == val_out
            out, carry = fc.normalize(v, cc)
            o = np.asarray(out)
            assert o.min() >= 0 and o.max() <= 255
            val_out = (int(sum(int(x) * y for x, y in zip(o[:, 0], w)))
                       + int(np.asarray(carry)[0]) * 256 ** d)
            assert val_in == val_out


def test_carry_resolve_packed_vs_ks_random():
    """Random digit vectors <= 510 (g/p regime): packed == Kogge-Stone,
    including long 255-runs that exercise cross-word propagation."""
    cc = fc.make_consts(FR_CTX)
    r = np.random.default_rng(3)
    for d in (fc.L, 2 * fc.L):
        v = r.integers(0, 511, size=(d, 64)).astype(np.float32)
        v[:, 0] = 255.0                     # full propagate chain
        v[0, 1] = 256.0                     # generate at the bottom
        v[:, 1] = np.where(np.arange(d) == 0, 256.0, 255.0)
        vj = jnp.asarray(v)
        out_p, c_p = fc.carry_resolve(vj, cc)
        out_k, c_k = fc.carry_resolve_ks(vj)
        assert np.array_equal(np.asarray(out_p), np.asarray(out_k))
        assert np.array_equal(np.asarray(c_p) != 0, np.asarray(c_k) != 0)


def test_mont_mul_dm_randomized_sweep():
    """512 random Fr pairs in one batch, values cross-checked on host."""
    p = FR_CTX.p
    a_int = [rng.randrange(p) for _ in range(512)]
    b_int = [rng.randrange(p) for _ in range(512)]
    am = jnp.asarray(FR_CTX.to_mont_np(a_int))
    bm = jnp.asarray(FR_CTX.to_mont_np(b_int))
    cc = fc.make_consts(FR_CTX)
    got = fc.mont_mul_dm(am.T, bm.T, cc).T
    want = limb.mont_mul(FR_CTX, am, bm)
    assert np.array_equal(np.asarray(want), np.asarray(got))
