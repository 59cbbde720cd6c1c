"""NTT engine vs host oracles (naive DFT and dense polynomial division)."""

import random

import pytest

jnp = pytest.importorskip("jax.numpy")
import numpy as np  # noqa: E402

from zksnark_tpu.field.host import FR  # noqa: E402
from zksnark_tpu.field.limb import FR_CTX  # noqa: E402
from zksnark_tpu.ops import ntt as nttmod  # noqa: E402
from zksnark_tpu.poly import dense  # noqa: E402

rng = random.Random(5)
P = FR.p


def _to_mont(vals):
    return jnp.asarray(FR_CTX.to_mont_np(vals))


def _from_mont(arr):
    return list(FR_CTX.from_mont_np(np.asarray(arr)))


def test_ntt_matches_naive_dft():
    dom = nttmod.get_domain(4)
    coeffs = [rng.randrange(P) for _ in range(16)]
    got = _from_mont(nttmod.ntt(dom, _to_mont(coeffs)))
    assert got == FR.dft(coeffs, dom.omega)


def test_intt_roundtrip():
    dom = nttmod.get_domain(5)
    coeffs = [rng.randrange(P) for _ in range(32)]
    back = _from_mont(nttmod.intt(dom, nttmod.ntt(dom, _to_mont(coeffs))))
    assert back == coeffs


def test_coset_roundtrip():
    dom = nttmod.get_domain(4)
    coeffs = [rng.randrange(P) for _ in range(16)]
    back = _from_mont(
        nttmod.coset_intt(dom, nttmod.coset_ntt(dom, _to_mont(coeffs))))
    assert back == coeffs


def test_poly_mul_matches_dense():
    dom = nttmod.get_domain(4)
    a = [rng.randrange(P) for _ in range(8)]
    b = [rng.randrange(P) for _ in range(8)]
    prod = dense.mul(FR, a, b)
    got = _from_mont(
        nttmod.poly_mul(dom, _to_mont(a + [0] * 8), _to_mont(b + [0] * 8)))
    assert got[:len(prod)] == prod
    assert all(g == 0 for g in got[len(prod):])


def test_divide_by_vanishing_matches_long_division():
    dom = nttmod.get_domain(4)
    n = 16
    u_c = [rng.randrange(P) for _ in range(8)] + [0] * 8
    v_c = [rng.randrange(P) for _ in range(7)] + [0] * 9
    uv = dense.mul(FR, u_c, v_c)
    h_true = [rng.randrange(P) for _ in range(14)]
    zd = [P - 1] + [0] * (n - 1) + [1]
    w_poly = dense.sub(FR, uv, dense.mul(FR, zd, h_true))

    def evals(poly):
        return [dense.evaluate(FR, poly, pow(dom.omega, i, P))
                for i in range(n)]

    h_got = _from_mont(nttmod.divide_by_vanishing(
        dom, _to_mont(evals(u_c)), _to_mont(evals(v_c)),
        _to_mont(evals(w_poly))))

    _, wr = dense.polynomial_division(FR, w_poly, zd)
    q, r = dense.polynomial_division(FR, dense.sub(FR, uv, wr), zd)
    assert all(c == 0 for c in r)
    expect = q + [0] * (n - len(q))
    assert h_got == expect[:n]


def test_unrolled_butterflies_bit_identical():
    """The TPU-default unrolled butterfly path (reshape/slice stages,
    ops/ntt.py:_butterflies_unrolled) is bit-identical to the scan body
    it replaces, forward and inverse, across domain sizes."""
    import numpy as np

    from zksnark_tpu.ops.ntt import (
        _bitrev_take, _butterflies, _butterflies_unrolled,
    )

    for log_n in (1, 3, 6):
        dom = nttmod.get_domain(log_n)
        vals = [rng.randrange(P) for _ in range(dom.n)]
        a = _to_mont(vals)
        for table in (dom.t.tw_table, dom.t.tw_table_inv):
            x = _bitrev_take(log_n, a)
            got = np.asarray(_butterflies_unrolled(dom.ctx, log_n, table, x))
            want = np.asarray(_butterflies(dom.ctx, log_n, table, x))
            assert (got == want).all(), log_n
