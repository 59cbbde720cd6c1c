"""Pairing backends for the Groth16 protocol.

The reference keeps the protocol generic over an ``EllipticEncryptable``
trait (/root/reference/src/groth16/mod.rs:30-51) and instantiates it twice:

- a *mock* Z251 self-encryption ("encryption" is multiplication by 69 in
  GF(251), pairing is field multiplication — groth16/mod.rs:339-359).  It is
  the load-bearing test fixture: CRS elements are algebraically invertible
  (divide by 69 to recover the toxic waste) and soundness statistics
  (~1/251 random-proof acceptance) can be measured over thousands of runs.
- the real BN254 pairing backend (fr.rs:101-123), with the quirky scaled
  generators 69*G1 and 96*G2 which we reproduce exactly.

Both are provided here behind one small Backend interface.
"""

from __future__ import annotations

import random
from typing import Optional

from ..field import params
from ..field.host import FR, PrimeField, Z251


class Z251Backend:
    """Mock backend over GF(251); G1 = G2 = GT = Z251, encrypt = *69.

    GT "addition" is field addition and pairing is field multiplication, so
    the verification equation becomes  alpha*beta + sum*gamma + C*delta ==
    A*B  over GF(251) (all scaled by 69^2) — exactly the reference mock.
    """

    name = "z251-mock"
    field: PrimeField = Z251

    def encrypt_g1(self, x: int) -> int:
        return (x * 69) % 251

    def encrypt_g2(self, x: int) -> int:
        return (x * 69) % 251

    def exp_g1(self, scalar: int, g1: int) -> int:
        return (scalar * g1) % 251

    def exp_g2(self, scalar: int, g2: int) -> int:
        return (scalar * g2) % 251

    def g1_zero(self) -> int:
        return 0

    def g2_zero(self) -> int:
        return 0

    def g1_add(self, a: int, b: int) -> int:
        return (a + b) % 251

    def g1_sub(self, a: int, b: int) -> int:
        return (a - b) % 251

    def g2_add(self, a: int, b: int) -> int:
        return (a + b) % 251

    def pairing(self, g1: int, g2: int) -> int:
        return (g1 * g2) % 251

    def gt_add(self, a: int, b: int) -> int:
        # GT of the mock is Z251 whose Add is plain field addition.
        return (a + b) % 251

    def gt_eq(self, a: int, b: int) -> bool:
        return a == b

    def pairing_check(self, pairs) -> bool:
        """prod e(P_i, Q_i) == identity (mock: sum of products == 0)."""
        acc = 0
        for g1, g2 in pairs:
            acc = (acc + g1 * g2) % 251
        return acc == 0

    def random_g1(self, rng: Optional[random.Random] = None) -> int:
        return self.field.random_elem(rng)

    def random_g2(self, rng: Optional[random.Random] = None) -> int:
        return self.field.random_elem(rng)


class BN254Backend:
    """Real pairing backend over BN254 (alt_bn128).

    encrypt_g1(x) = (69*G1)*x, encrypt_g2(x) = (96*G2)*x — the reference's
    generator convention (fr.rs:106-113).  Curve/pairing arithmetic lives in
    `zksnark_tpu.curve.bn254`; GT elements are Fq12 values and GT "addition"
    is Fq12 multiplication (fr.rs:225-231).
    """

    name = "bn254"
    field: PrimeField = FR

    def __init__(self):
        from ..curve import bn254 as _c

        self._c = _c
        self._g1_base = _c.g1_scalar_mul(_c.G1_GEN, params.ENCRYPT_G1_SCALE)
        self._g2_base = _c.g2_scalar_mul(_c.G2_GEN, params.ENCRYPT_G2_SCALE)

    def encrypt_g1(self, x: int):
        return self._c.g1_scalar_mul(self._g1_base, x)

    def encrypt_g2(self, x: int):
        return self._c.g2_scalar_mul(self._g2_base, x)

    def exp_g1(self, scalar: int, g1):
        return self._c.g1_scalar_mul(g1, scalar)

    def exp_g2(self, scalar: int, g2):
        return self._c.g2_scalar_mul(g2, scalar)

    def g1_zero(self):
        return self._c.G1_INF

    def g2_zero(self):
        return self._c.G2_INF

    def g1_add(self, a, b):
        return self._c.g1_add(a, b)

    def g1_sub(self, a, b):
        return self._c.g1_add(a, self._c.g1_neg(b))

    def g2_add(self, a, b):
        return self._c.g2_add(a, b)

    def pairing(self, g1, g2):
        return self._c.pairing(g1, g2)

    def gt_add(self, a, b):
        return self._c.fq12_mul(a, b)

    def gt_eq(self, a, b) -> bool:
        return a == b

    def pairing_check(self, pairs) -> bool:
        """prod e(P_i, Q_i) == 1 via the native library (single shared
        final exponentiation); python fallback when the .so is absent."""
        from ..curve import native

        return native.pairing_check(pairs)

    def random_g1(self, rng: Optional[random.Random] = None):
        return self.encrypt_g1(self.field.random_elem(rng))

    def random_g2(self, rng: Optional[random.Random] = None):
        return self.encrypt_g2(self.field.random_elem(rng))
