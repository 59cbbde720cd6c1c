"""Dense coefficient-domain polynomials over a host PrimeField.

Semantics mirror the reference's ``CoefficientPoly``
(/root/reference/src/groth16/coefficient_poly.rs) and the free functions in
/root/reference/src/field/mod.rs (``polynomial_division``, ``Polynomial``
trait): this is the exact-parity tier used by golden tests and as the oracle
for the NTT evaluation-domain engine (`zksnark_tpu.poly.ntt`), which replaces
every O(n^2) routine here on the production path.

A polynomial is a plain list of int coefficients, index = power of x.
Trailing zeros are allowed (degree ignores them), as in the reference.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

from ..field.host import PrimeField

Poly = List[int]


def degree(poly: Sequence[int]) -> int:
    """Highest non-zero power; 0 for the zero/empty polynomial
    (mirrors field/mod.rs:291-297)."""
    d = len(poly)
    while d > 0 and poly[d - 1] == 0:
        d -= 1
    return d - 1 if d > 0 else 0


def remove_leading_zeros(poly: Sequence[int]) -> Poly:
    d = len(poly)
    while d > 0 and poly[d - 1] == 0:
        d -= 1
    return list(poly[:d])


def evaluate(field: PrimeField, poly: Sequence[int], x: int) -> int:
    """Horner evaluation (mirrors field/mod.rs:338-343)."""
    acc = 0
    for c in reversed(poly):
        acc = (acc * x + c) % field.p
    return acc


def add(field: PrimeField, a: Sequence[int], b: Sequence[int]) -> Poly:
    """Zip-with-zero-padding addition; result length = max(len(a), len(b))
    (mirrors coefficient_poly.rs:24-49 — length is preserved, not trimmed)."""
    n = max(len(a), len(b))
    return [
        ((a[i] if i < len(a) else 0) + (b[i] if i < len(b) else 0)) % field.p
        for i in range(n)
    ]


def neg(field: PrimeField, a: Sequence[int]) -> Poly:
    return [(-c) % field.p for c in a]


def sub(field: PrimeField, a: Sequence[int], b: Sequence[int]) -> Poly:
    return add(field, a, neg(field, b))


def scalar_mul(field: PrimeField, a: Sequence[int], s: int) -> Poly:
    return [(c * s) % field.p for c in a]


def mul(field: PrimeField, a: Sequence[int], b: Sequence[int]) -> Poly:
    """Schoolbook convolution after trimming; empty inputs give [0]*...
    (mirrors coefficient_poly.rs:93-130, which emits degree(a)+degree(b)+1
    coefficients counting empty/zero input as degree 0)."""
    ta, tb = remove_leading_zeros(a), remove_leading_zeros(b)
    da = len(ta) - 1 if ta else 0
    db = len(tb) - 1 if tb else 0
    out = [0] * (da + db + 1)
    for i, ca in enumerate(ta):
        if ca == 0:
            continue
        for j, cb in enumerate(tb):
            out[i + j] = (out[i + j] + ca * cb) % field.p
    return out


def polynomial_division(
    field: PrimeField, poly: Sequence[int], divisor: Sequence[int]
) -> Tuple[Poly, Poly]:
    """Long division -> (quotient, remainder).

    Mirrors /root/reference/src/field/mod.rs:428-469 including its edge
    cases: a zero divisor raises, and deg(divisor) > deg(poly) returns
    ([0], [0]).
    """
    if not any(c % field.p != 0 for c in divisor):
        raise ZeroDivisionError("Dividend must be non-zero")
    if degree(divisor) > degree(poly):
        return [0], [0]

    r = remove_leading_zeros(poly)
    d_poly = remove_leading_zeros(divisor)
    d = len(d_poly) - 1
    c_inv = field.inv(d_poly[-1])
    q = [0] * ((len(r) - 1 if r else 0) - d + 1)

    while len(r) - 1 >= d and r:
        s = (r[-1] * c_inv) % field.p
        q[len(r) - 1 - d] = s
        for k in range(d + 1):
            r[len(r) - 1 - k] = (r[len(r) - 1 - k] - s * d_poly[d - k]) % field.p
        r = remove_leading_zeros(r)

    return q, (r if r else [0])


def div(field: PrimeField, a: Sequence[int], b: Sequence[int]) -> Poly:
    """Quotient only — the reference's ``Div`` SILENTLY DROPS the remainder
    (coefficient_poly.rs:148-157); use `polynomial_division` to observe it.
    The prover exploits this: an unsatisfied witness just yields a proof that
    fails verification."""
    return polynomial_division(field, a, b)[0]


def lagrange_basis(field: PrimeField, roots: Sequence[int], x: int) -> Poly:
    """Product over roots r != x of (X - r)/(x - r)
    (mirrors coefficient_poly.rs:173-190)."""
    acc: Poly = [1]
    for m in roots:
        if m == x:
            continue
        scale = field.inv((x - m) % field.p)
        acc = scalar_mul(field, mul(field, acc, [(-m) % field.p, 1]), scale)
    return acc


def interpolate(
    field: PrimeField, roots: Sequence[int], points: Sequence[Tuple[int, int]]
) -> Poly:
    """Sum of y * lagrange_basis(roots, x) over sparse (x, y) points
    (mirrors CoefficientPoly::from((roots, points)),
    coefficient_poly.rs:159-171).  Empty points -> the zero polynomial [0]."""
    acc: Poly = [0]
    for x, y in points:
        acc = add(field, acc, scalar_mul(field, lagrange_basis(field, roots, x), y))
    return acc


def root_poly(field: PrimeField, roots: Sequence[int]) -> Poly:
    """Vanishing polynomial prod (X - r) (mirrors coefficient_poly.rs:192-200)."""
    acc: Poly = [1]
    for r in roots:
        acc = mul(field, acc, [(-r) % field.p, 1])
    return acc
