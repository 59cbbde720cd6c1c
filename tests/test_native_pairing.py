"""Native C++ pairing library vs the Python curve oracle, and the
verify_fast product-of-pairings path vs the reference-structured verify."""

import random

import pytest

from zksnark_tpu.curve import bn254 as c
from zksnark_tpu.curve import native
from zksnark_tpu.field.host import FR
from zksnark_tpu.field.params import R
from zksnark_tpu.frontend import compiler, witness
from zksnark_tpu.groth16 import protocol
from zksnark_tpu.groth16.backend import BN254Backend, Z251Backend
from zksnark_tpu.groth16.qap import from_r1cs

rng = random.Random(42)

needs_native = pytest.mark.skipif(
    not native.available(), reason="native libbn254.so not built")


@needs_native
def test_native_pairing_matches_python():
    a, b = rng.randrange(1, R), rng.randrange(1, R)
    P = c.g1_scalar_mul(c.G1_GEN_PT, a)
    Q = c.g2_scalar_mul(c.G2_GEN, b)
    assert native.multi_pairing([(P, Q)]) == c.pairing(P, Q)


@needs_native
def test_native_pairing_check_bilinearity():
    a, b = rng.randrange(1, R), rng.randrange(1, R)
    P = c.g1_scalar_mul(c.G1_GEN_PT, a)
    Q = c.g2_scalar_mul(c.G2_GEN, b)
    neg = c.g1_neg(c.g1_scalar_mul(c.G1_GEN_PT, a * b % R))
    assert native.pairing_check([(P, Q), (neg, c.G2_GEN)])
    assert not native.pairing_check(
        [(P, Q), (c.g1_scalar_mul(c.G1_GEN_PT, 5), c.G2_GEN)])


@needs_native
def test_native_infinity_handling():
    assert native.multi_pairing([(None, c.G2_GEN)]) == c.FQ12_ONE
    assert native.pairing_check([(None, None)])


@needs_native
def test_native_scalar_mul():
    k = rng.randrange(R)
    assert native.g1_scalar_mul(c.G1_GEN_PT, k) == \
        c.g1_scalar_mul(c.G1_GEN_PT, k)
    assert native.g1_scalar_mul(c.G1_GEN_PT, 0) is None


def test_verify_fast_agrees_z251():
    be = Z251Backend()
    code = open("test_programs/simple.zk").read()
    from zksnark_tpu.field.host import Z251

    qap = from_r1cs(Z251, compiler.parse(code, Z251))
    w = witness.weights(code, [3, 2, 4], Z251)
    r = random.Random(3)
    for _ in range(20):
        crs = protocol.setup(be, qap, rng=r)
        proof = protocol.prove(be, qap, crs, w, rng=r)
        assert protocol.verify_fast(be, crs, [2, 34], proof) == \
            protocol.verify(be, crs, [2, 34], proof)
        assert protocol.verify_fast(be, crs, [2, 25], proof) == \
            protocol.verify(be, crs, [2, 25], proof)


def test_verify_fast_agrees_bn254():
    be = BN254Backend()
    code = open("test_programs/simple.zk").read()
    qap = from_r1cs(FR, compiler.parse(code, FR))
    w = witness.weights(code, [3, 2, 4], FR)
    crs = protocol.setup(be, qap, trapdoor=(3, 5, 7, 11, 13))
    proof = protocol.prove(be, qap, crs, w, blinding=(17, 19))
    assert protocol.verify_fast(be, crs, [2, 34], proof)
    assert not protocol.verify_fast(be, crs, [2, 25], proof)
    assert protocol.verify(be, crs, [2, 34], proof)
