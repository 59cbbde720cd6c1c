"""Device limb arithmetic vs the host python-int fields (bit-exact)."""

import random

import pytest

jnp = pytest.importorskip("jax.numpy")
import numpy as np  # noqa: E402

from zksnark_tpu.field.limb import (  # noqa: E402
    FQ_CTX, FR_CTX, add, from_mont, mont_inv, mont_mul, neg, sub, to_mont,
)

rng = random.Random(99)


@pytest.mark.parametrize("ctx", [FR_CTX, FQ_CTX], ids=["Fr", "Fq"])
def test_mont_mul_matches_host(ctx):
    p = ctx.p
    xs = [rng.randrange(p) for _ in range(64)] + [0, 1, p - 1, p - 2]
    ys = [rng.randrange(p) for _ in range(64)] + [p - 1, 0, p - 1, 1]
    ax = jnp.asarray(ctx.to_mont_np(xs))
    ay = jnp.asarray(ctx.to_mont_np(ys))
    got = ctx.from_mont_np(np.asarray(mont_mul(ctx, ax, ay)))
    assert list(got) == [(x * y) % p for x, y in zip(xs, ys)]


@pytest.mark.parametrize("ctx", [FR_CTX, FQ_CTX], ids=["Fr", "Fq"])
def test_add_sub_neg(ctx):
    p = ctx.p
    xs = [rng.randrange(p) for _ in range(32)] + [0, p - 1]
    ys = [rng.randrange(p) for _ in range(32)] + [p - 1, p - 1]
    ax = jnp.asarray(ctx.to_mont_np(xs))
    ay = jnp.asarray(ctx.to_mont_np(ys))
    assert list(ctx.from_mont_np(np.asarray(add(ctx, ax, ay)))) == \
        [(x + y) % p for x, y in zip(xs, ys)]
    assert list(ctx.from_mont_np(np.asarray(sub(ctx, ax, ay)))) == \
        [(x - y) % p for x, y in zip(xs, ys)]
    assert list(ctx.from_mont_np(np.asarray(neg(ctx, ax)))) == \
        [(-x) % p for x in xs]


def test_mont_roundtrip_and_inverse():
    ctx = FR_CTX
    p = ctx.p
    xs = [rng.randrange(1, p) for _ in range(16)]
    ax = jnp.asarray(ctx.to_mont_np(xs))
    plain = jnp.asarray(ctx.to_limbs_np(xs))
    assert np.array_equal(np.asarray(to_mont(ctx, plain)), ctx.to_mont_np(xs))
    assert list(ctx.from_limbs_np(np.asarray(from_mont(ctx, ax)))) == xs
    inv = ctx.from_mont_np(np.asarray(mont_inv(ctx, ax)))
    assert all((v * x) % p == 1 for v, x in zip(inv, xs))


def test_carry_ripple_adversarial():
    """0xFFFF-pattern values exercise the Kogge-Stone propagate chains."""
    ctx = FR_CTX
    p = ctx.p
    special = [p - 1, (1 << 253) - 1, (1 << 208) - 1,
               0xFFFF * (1 + 2**16 + 2**32), 123, (1 << 160) - 1]
    sx = jnp.asarray(ctx.to_mont_np(special))
    got = ctx.from_mont_np(np.asarray(add(ctx, sx, sx)))
    assert list(got) == [(2 * x) % p for x in special]
    got = ctx.from_mont_np(np.asarray(mont_mul(ctx, sx, sx)))
    assert list(got) == [(x * x) % p for x in special]
