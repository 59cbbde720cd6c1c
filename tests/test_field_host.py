"""Host-tier field tests, mirroring the reference's field/z251 test suites
(/root/reference/src/field/z251.rs:99-151, /root/reference/src/field/mod.rs:539-693).
"""

import random

import pytest

from zksnark_tpu.field import params
from zksnark_tpu.field.host import (
    FR, Z251, chinese_remainder, ext_euc_alg, from_field_bits, to_field_bits,
)


def test_z251_add_exhaustive():
    for i in range(251):
        for j in range(251):
            assert Z251.add(i, j) == (i + j) % 251


def test_z251_neg_exhaustive():
    for i in range(1, 251):
        assert Z251.add(i, Z251.neg(i)) == 0
    assert Z251.neg(0) == 0


def test_z251_mul_inv_exhaustive():
    for i in range(1, 251):
        assert Z251.mul(i, Z251.inv(i)) == 1
    with pytest.raises(ZeroDivisionError):
        Z251.inv(0)


def test_crt():
    # mirrors z251.rs:133-150
    ret = chinese_remainder([0, 3, 4], [3, 4, 5])
    assert ret % (3 * 4 * 5) == 39
    ret = chinese_remainder([1, 2, 3, 4], [2, 3, 5, 7])
    assert ret % (2 * 3 * 5 * 7) == 53


def test_ext_euc_alg():
    for _ in range(200):
        a = random.randrange(1, 10**6)
        b = random.randrange(1, 10**6)
        g, s, t = ext_euc_alg(a, b)
        assert g == s * a + t * b
        assert a % g == 0 and b % g == 0


def test_powers_golden():
    # mirrors field/mod.rs:591-604
    gen = Z251.powers(9)
    assert [next(gen) for _ in range(5)] == [1, 9, 81, 227, 35]


def test_dft_golden():
    # mirrors field/mod.rs:606-623: order-25 root 5 in Z251
    seq = [0] * 25
    seq[0], seq[1], seq[2] = 1, 2, 3
    expected = [6, 86, 169, 189, 203, 131, 237, 118, 115, 91, 248, 177, 8,
                48, 34, 136, 177, 203, 125, 57, 237, 81, 9, 30, 122]
    assert Z251.dft(seq, 5) == expected


def test_idft_roundtrip():
    seq = [0] * 25
    seq[0], seq[1], seq[2] = 1, 2, 3
    assert Z251.idft(Z251.dft(seq, 5), 5) == seq


def test_field_bits_roundtrip():
    rng = random.Random(0)
    for width in (8, 64):
        nums = [rng.randrange(0, 1 << width) for _ in range(20)]
        bits = to_field_bits(Z251, nums, width)
        assert from_field_bits(Z251, bits, width) == nums


def test_field_bits_golden():
    # mirrors the doctest at field/mod.rs:110-136
    bits = to_field_bits(Z251, [0b0000_0101], 8)
    assert bits == [1, 0, 1, 0, 0, 0, 0, 0]
    bits = to_field_bits(Z251, [32769], 64)
    assert bits[0] == 1 and bits[15] == 1 and len(bits) == 64
    assert from_field_bits(Z251, [1, 0, 1, 0, 0, 0, 0, 0], 8) == [5]


def test_fr_parameters():
    # 5 is a quadratic non-residue => generates the full 2-Sylow subgroup
    assert pow(params.FR_GENERATOR, (params.R - 1) // 2, params.R) == params.R - 1
    w = params.FR_ROOT_OF_UNITY
    assert pow(w, 1 << params.FR_TWO_ADICITY, params.R) == 1
    assert pow(w, 1 << (params.FR_TWO_ADICITY - 1), params.R) == params.R - 1


def test_fr_field_ops():
    rng = random.Random(1)
    for _ in range(50):
        a, b = FR.random_elem(rng), FR.random_elem(rng)
        assert FR.mul(a, FR.inv(a)) == 1
        assert FR.add(a, FR.neg(a)) == 0
        assert FR.mul(FR.div(a, b), b) == a
