"""Dense polynomial engine tests, mirroring the reference's CoefficientPoly
suite (/root/reference/src/groth16/coefficient_poly.rs:202-478) and the
polynomial_division tests (field/mod.rs:637-693).
"""

import random

import pytest

from zksnark_tpu.field.host import Z251
from zksnark_tpu.poly import dense

F = Z251


def test_degree_golden():
    assert dense.degree([3, 0, 0, 0, 179, 0, 0, 6]) == 7
    assert dense.degree([29, 112, 68]) == 2
    assert dense.degree([3, 0, 0, 0, 179, 0, 0, 6] + [0] * 7) == 7
    assert dense.degree([]) == 0
    assert dense.degree([0, 0]) == 0


def test_evaluate_golden():
    assert dense.evaluate(F, [1, 1, 1], 2) == 7
    assert dense.evaluate(F, [1, 1, 4], 2) == 19
    assert dense.evaluate(F, [1, 2, 3, 4], 3) == 142


def test_add_golden():
    assert dense.add(F, [4, 5, 6], [1, 2, 3, 0]) == [5, 7, 9, 0]
    assert dense.add(F, [234, 100, 6], [123, 234, 3]) == [106, 83, 9]
    assert dense.add(F, [], [1, 2, 3]) == [1, 2, 3]


def test_mul_golden():
    assert dense.mul(F, [4, 5, 6], [1, 2, 3, 0]) == [4, 13, 28, 27, 18]
    assert dense.mul(F, [234, 100, 6], [123, 234, 3]) == [168, 39, 242, 198, 18]
    assert all(c == 0 for c in dense.mul(F, [], []))
    assert all(c == 0 for c in dense.mul(F, [0], [1, 2, 3]))


def test_scalar_mul_golden():
    assert dense.scalar_mul(F, [1, 2, 3], 69) == [69, 138, 207]
    assert dense.scalar_mul(F, [20, 2, 3], 69) == [125, 138, 207]


def test_division_golden():
    # mirrors field/mod.rs:657-677
    a = [3, 0, 0, 0, 179, 0, 0, 6]
    b = [29, 112, 68]
    q, r = dense.polynomial_division(F, a, b)
    assert q == [209, 207, 78, 1, 131, 37]
    assert r == [217, 207]


def test_division_doctest_golden():
    # mirrors the doctest at field/mod.rs:34-42
    q, r = dense.polynomial_division(F, [1, 0, 3, 1], [0, 0, 9, 1])
    assert q == [1]
    assert r == [1, 0, 245]


def test_division_by_zero_raises():
    with pytest.raises(ZeroDivisionError):
        dense.polynomial_division(F, [3, 0, 0, 0, 179, 0, 0, 6], [0] * 8)


def test_division_roundtrip_random():
    rng = random.Random(2)
    for _ in range(500):
        a = dense.remove_leading_zeros(
            [rng.randrange(251) for _ in range(3)])
        b = [rng.randrange(251) for _ in range(3)]
        if not any(b):
            continue
        c = dense.mul(F, a, b)
        q = dense.div(F, c, b)
        assert dense.remove_leading_zeros(q) == dense.remove_leading_zeros(a)


def test_sub_roundtrip_random():
    rng = random.Random(3)
    for _ in range(500):
        a = [rng.randrange(251) for _ in range(3)]
        b = [rng.randrange(251) for _ in range(3)]
        c = dense.sub(F, a, b)
        assert dense.add(F, b, c) == a


def test_lagrange_basis_pointwise():
    # mirrors coefficient_poly.rs:429-445
    for mx in range(2, 15):
        for i in range(1, mx):
            roots = list(range(1, mx))
            poly = dense.lagrange_basis(F, roots, i)
            for j in range(1, mx):
                assert dense.evaluate(F, poly, j) == (1 if i == j else 0)


def test_interpolate_sparse_pointwise():
    # mirrors coefficient_poly.rs:447-467
    for mask in range(1, 256):
        roots = list(range(1, 9))
        points = [(i + 1, i + 2) for i in range(8) if (1 << i) & mask]
        poly = dense.interpolate(F, roots, points)
        for i in range(8):
            expected = i + 2 if (1 << i) & mask else 0
            assert dense.evaluate(F, poly, i + 1) == expected


def test_root_poly_vanishes():
    for i in range(2, 25):
        poly = dense.root_poly(F, list(range(1, i)))
        for j in range(1, i):
            assert dense.evaluate(F, poly, j) == 0
        assert dense.degree(poly) == i - 1
