"""Pallas Montgomery-multiply kernel vs the XLA limb path (interpret mode).

The kernel (`ops/montmul.py`) must be a drop-in for `field.limb.mont_mul`
on (N, L) Montgomery inputs.  On the CPU test harness we run it in
interpret mode; the real-TPU path is exercised by bench.py.
"""

import random

import jax.numpy as jnp
import numpy as np
import pytest

from zksnark_tpu.field import params
from zksnark_tpu.field.limb import FR_CTX, mont_mul
from zksnark_tpu.ops.montmul import TILE, mont_mul_pallas

L = params.NUM_LIMBS


def _rand_elems(rng, n):
    return [rng.randrange(FR_CTX.p) for _ in range(n)]


@pytest.mark.parametrize("n", [1, 7, TILE, TILE + 3])
def test_pallas_matches_xla_path(n):
    rng = random.Random(1234 + n)
    a = _rand_elems(rng, n)
    b = _rand_elems(rng, n)
    am = jnp.asarray(FR_CTX.to_mont_np(a))
    bm = jnp.asarray(FR_CTX.to_mont_np(b))
    want = np.asarray(mont_mul(FR_CTX, am, bm))
    got = np.asarray(mont_mul_pallas(FR_CTX, am, bm, interpret=True))
    # both paths may differ by the canonical-vs-p+x representative only if
    # one skipped the final subtract; they both subtract, so exact equality
    np.testing.assert_array_equal(got, want)


def test_pallas_values_correct():
    """End-to-end value check: from_mont(pallas(aR, bR)) == a*b mod p."""
    rng = random.Random(99)
    n = 13
    a = _rand_elems(rng, n)
    b = _rand_elems(rng, n)
    am = jnp.asarray(FR_CTX.to_mont_np(a))
    bm = jnp.asarray(FR_CTX.to_mont_np(b))
    out = mont_mul_pallas(FR_CTX, am, bm, interpret=True)
    got = FR_CTX.from_mont_np(np.asarray(out))
    want = [(x * y) % FR_CTX.p for x, y in zip(a, b)]
    assert [int(g) for g in got] == want


def test_pallas_edge_values():
    """0, 1, p-1 products, including the conditional-subtract boundary."""
    vals = [0, 1, FR_CTX.p - 1, FR_CTX.p - 2, (FR_CTX.p - 1) // 2]
    pairs = [(x, y) for x in vals for y in vals]
    a = [x for x, _ in pairs]
    b = [y for _, y in pairs]
    am = jnp.asarray(FR_CTX.to_mont_np(a))
    bm = jnp.asarray(FR_CTX.to_mont_np(b))
    out = mont_mul_pallas(FR_CTX, am, bm, interpret=True)
    got = [int(g) for g in FR_CTX.from_mont_np(np.asarray(out))]
    want = [(x * y) % FR_CTX.p for x, y in pairs]
    assert got == want
