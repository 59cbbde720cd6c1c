"""Host-tier prime fields over plain Python ints.

This is the exact-semantics tier: the frontend compiler, the witness
interpreter, the reference-parity protocol path and all golden tests run on
it.  It mirrors the capability surface of the reference's ``Field`` trait and
helpers (/root/reference/src/field/mod.rs:62-537): identities, inverse via
extended Euclid, CRT, bit<->field codecs, an infinite powers generator and the
naive O(n^2) DFT/IDFT (kept, as in the reference, purely as a test oracle for
the fast NTT engine in `zksnark_tpu.poly.ntt`).

Elements are canonical residues in ``range(p)`` — plain ints, no wrapper
class — and a `PrimeField` instance carries the operations.  The heavy,
batched arithmetic lives in `zksnark_tpu.field.limb` (vectorized Montgomery
limbs on device); both tiers are bit-compared in tests.
"""

from __future__ import annotations

import random
from typing import Iterable, List, Optional, Sequence

from . import params


def ext_euc_alg(a: int, b: int):
    """Extended Euclid: returns (g, s, t) with g = gcd = s*a + t*b.

    Mirrors /root/reference/src/field/mod.rs:360-385.
    """
    r0, r1 = a, b
    s0, s1 = 1, 0
    t0, t1 = 0, 1
    while r1 != 0:
        q = r0 // r1
        r0, r1 = r1, r0 - q * r1
        s0, s1 = s1, s0 - q * s1
        t0, t1 = t1, t0 - q * t1
    return r0, s0, t0


def chinese_remainder(rems: Sequence[int], moduli: Sequence[int]) -> int:
    """CRT combination (mirrors /root/reference/src/field/mod.rs:387-409).

    Like the reference, the result is only defined modulo prod(moduli) and may
    be negative; callers normalize.
    """
    prod = 1
    for m in moduli:
        prod *= m
    acc = 0
    for rem, m in zip(rems, moduli):
        x = prod // m
        _, inv, _ = ext_euc_alg(x, m)
        acc += inv * x * rem
    return acc


class PrimeField:
    """A prime field GF(p) acting on canonical int residues."""

    def __init__(self, p: int, name: str = "GF(p)"):
        self.p = p
        self.name = name

    # -- identities ---------------------------------------------------------
    def zero(self) -> int:
        return 0

    def one(self) -> int:
        return 1

    # -- ring ops -----------------------------------------------------------
    def add(self, a: int, b: int) -> int:
        return (a + b) % self.p

    def sub(self, a: int, b: int) -> int:
        return (a - b) % self.p

    def neg(self, a: int) -> int:
        return (-a) % self.p

    def mul(self, a: int, b: int) -> int:
        return (a * b) % self.p

    def inv(self, a: int) -> int:
        if a % self.p == 0:
            raise ZeroDivisionError(f"{self.name}: inverse of zero")
        return pow(a, self.p - 2, self.p)

    def div(self, a: int, b: int) -> int:
        return self.mul(a, self.inv(b))

    def pow(self, a: int, e: int) -> int:
        return pow(a, e, self.p)

    # -- conversions --------------------------------------------------------
    def from_int(self, n: int) -> int:
        return n % self.p

    def parse(self, s: str) -> Optional[int]:
        """Parse a decimal literal; None on failure.

        Mirrors the reference's ``FromStr`` impls: Fr accepts any decimal
        (reduced mod p); subclasses may restrict (see Z251Field.parse).
        """
        try:
            return int(s, 10) % self.p
        except ValueError:
            return None

    # -- sampling -----------------------------------------------------------
    def random_elem(self, rng: Optional[random.Random] = None) -> int:
        """Uniform *nonzero* element (mirrors Random::random_elem —
        /root/reference/src/groth16/fr.rs:90-99 rejection-samples zero)."""
        r = rng or random
        return r.randrange(1, self.p)

    # -- misc ---------------------------------------------------------------
    def powers(self, x: int):
        """Infinite generator 1, x, x^2, ... (field/mod.rs:493-504)."""
        acc = 1
        while True:
            yield acc
            acc = self.mul(acc, x)

    def dft(self, seq: Sequence[int], root: int) -> List[int]:
        """Naive O(n^2) DFT given a root of unity of order len(seq).

        Test oracle only, mirroring /root/reference/src/field/mod.rs:508-520.
        """
        n = len(seq)
        out = []
        ri = 1
        for _ in range(n):
            acc, rj = 0, 1
            for a in seq:
                acc = (acc + a * rj) % self.p
                rj = (rj * ri) % self.p
            out.append(acc)
            ri = (ri * root) % self.p
        return out

    def idft(self, seq: Sequence[int], root: int) -> List[int]:
        """Inverse of `dft` (mirrors field/mod.rs:524-537)."""
        n = len(seq)
        n_inv = self.inv(n % self.p)
        out = self.dft(seq, self.inv(root))
        return [self.mul(v, n_inv) for v in out]

    def __repr__(self):
        return f"PrimeField({self.name})"


class Z251Field(PrimeField):
    """GF(251) — the reference's cheap test field (src/field/z251.rs)."""

    def __init__(self):
        super().__init__(251, "Z251")

    def parse(self, s: str) -> Optional[int]:
        # Z251's FromStr goes through From<usize> which asserts n < 251
        # (z251.rs:78-83, 91-97): out-of-range literals are a parse error.
        try:
            n = int(s, 10)
        except ValueError:
            return None
        if n < 0 or n >= 251:
            return None
        return n


Z251 = Z251Field()
FR = PrimeField(params.R, "BN254::Fr")
FQ = PrimeField(params.Q, "BN254::Fq")


# ---------------------------------------------------------------------------
# Bit <-> field codecs (mirror to_field_bits / from_field_bits,
# /root/reference/src/field/mod.rs:137-203).  Bits are little-endian per
# number; each number contributes exactly `width` bits.
# ---------------------------------------------------------------------------

def to_field_bits(field: PrimeField, nums: Iterable[int], width: int) -> List[int]:
    out: List[int] = []
    for num in nums:
        for i in range(width):
            out.append(field.one() if (num >> i) & 1 else field.zero())
    return out


def from_field_bits(field: PrimeField, bits: Sequence[int], width: int) -> List[int]:
    if len(bits) % width != 0:
        raise ValueError("bit stream length must be a multiple of width")
    out = []
    for off in range(0, len(bits), width):
        acc = 0
        for i, b in enumerate(bits[off:off + width]):
            if b == field.one():
                acc ^= 1 << i
            elif b != field.zero():
                raise ValueError(
                    "from_field_bits: element is neither zero() nor one()")
        out.append(acc)
    return out
