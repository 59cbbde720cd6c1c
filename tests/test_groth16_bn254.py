"""Groth16 over the real BN254 backend, mirroring the reference BN test
suite (/root/reference/src/groth16/fr.rs:233-417) with reduced trial counts
(the semantics, not the wall-clock, are the contract here).
"""

import random

import pytest

from zksnark_tpu.field.host import FR
from zksnark_tpu.frontend import compiler, witness
from zksnark_tpu.groth16 import protocol
from zksnark_tpu.groth16.backend import BN254Backend
from zksnark_tpu.groth16.qap import QAP, from_r1cs

BE = BN254Backend()


def test_exp_encrypted():
    # mirrors fr.rs:241-246: a.exp(E(b)) == E(a*b)
    rng = random.Random(3)
    for _ in range(5):
        a, b = FR.random_elem(rng), FR.random_elem(rng)
        assert BE.exp_g1(a, BE.encrypt_g1(b)) == BE.encrypt_g1(FR.mul(a, b))
        assert BE.exp_g2(a, BE.encrypt_g2(b)) == BE.encrypt_g2(FR.mul(a, b))


def test_single_mult_honest_bn():
    # mirrors fr.rs:249-271 (hand QAP, t = x + 250 over Fr)
    qap = QAP(
        u=[[0], [0], [1], [0]],
        v=[[0], [0], [0], [1]],
        w=[[0], [1], [0], [0]],
        t=[250, 1],
        input=2,
        degree=1,
        field=FR,
    )
    weights = [1, 51, 3, 17]
    rng = random.Random(5)
    for _ in range(2):
        crs = protocol.setup(BE, qap, rng=rng)
        proof = protocol.prove(BE, qap, crs, weights, rng=rng)
        assert protocol.verify(BE, crs, [51, 3], proof)


def test_bn_encrypt_quad():
    # mirrors fr.rs:274-302
    code = open("test_programs/lispesque_quad.zk").read()
    qap = from_r1cs(FR, compiler.parse(code, FR))
    rng = random.Random(7)
    for _ in range(2):
        x, a, b, c = (FR.random_elem(rng) for _ in range(4))
        share = FR.from_int(a * x * x + b * x + c)
        weights = [1, x, share, FR.mul(a, x), a,
                   FR.from_int(x * (a * x + b)), b, c]
        crs = protocol.setup(BE, qap, rng=rng)
        proof = protocol.prove(BE, qap, crs, weights, rng=rng)
        assert protocol.verify(BE, crs, [x, share], proof)


def test_bn_encrypt_cubic():
    # mirrors fr.rs:305-359
    code = open("test_programs/lispesque_cubic.zk").read()
    qap = from_r1cs(FR, compiler.parse(code, FR))
    rng = random.Random(11)
    x, a, b, c, d = (FR.random_elem(rng) for _ in range(5))
    share = FR.from_int(a * x**3 + b * x**2 + c * x + d)
    weights = [1, x, share, FR.mul(a, x), a,
               FR.from_int(x * (a * x + b)), b,
               FR.from_int(x * (x * (a * x + b) + c)), c, d]
    crs = protocol.setup(BE, qap, rng=rng)
    proof = protocol.prove(BE, qap, crs, weights, rng=rng)
    assert protocol.verify(BE, crs, [x, share], proof)


def test_bn_encrypt_deg_15():
    # mirrors fr.rs:362-416, witness via weights()
    code = open("test_programs/deg_15.zk").read()
    qap = from_r1cs(FR, compiler.parse(code, FR))
    rng = random.Random(13)
    inputs = [FR.random_elem(rng) for _ in range(17)]
    w = witness.weights(code, inputs, FR)
    crs = protocol.setup(BE, qap, rng=rng)
    proof = protocol.prove(BE, qap, crs, w, rng=rng)
    assert protocol.verify(BE, crs, w[1:3], proof)


def test_bn_simple_accept_reject():
    # mirrors lib.rs:156-190 over the real curve
    code = open("test_programs/simple.zk").read()
    qap = from_r1cs(FR, compiler.parse(code, FR))
    w = witness.weights(code, [3, 2, 4], FR)
    rng = random.Random(17)
    crs = protocol.setup(BE, qap, rng=rng)
    proof = protocol.prove(BE, qap, crs, w, rng=rng)
    assert protocol.verify(BE, crs, [2, 34], proof)
    assert not protocol.verify(BE, crs, [2, 25], proof)


def test_bn_pinned_determinism():
    """Pinned trapdoor/blinding -> identical CRS and proof across runs
    (the cross-implementation test-vector mechanism)."""
    code = open("test_programs/simple.zk").read()
    qap = from_r1cs(FR, compiler.parse(code, FR))
    w = witness.weights(code, [3, 2, 4], FR)
    td = (1001, 2002, 3003, 4004, 5005)
    bl = (6006, 7007)
    crs1 = protocol.setup(BE, qap, trapdoor=td)
    crs2 = protocol.setup(BE, qap, trapdoor=td)
    assert crs1 == crs2
    p1 = protocol.prove(BE, qap, crs1, w, blinding=bl)
    p2 = protocol.prove(BE, qap, crs2, w, blinding=bl)
    assert p1 == p2
    assert protocol.verify(BE, crs1, [2, 34], p1)


@pytest.mark.slow
def test_bn_encrypt_quad_full_strength():
    """10-iteration BN254 quad-share suite (fr.rs:273-302 verbatim
    count); the default tier runs 2 (2-CPU host economics)."""
    code = open("test_programs/lispesque_quad.zk").read()
    qap = from_r1cs(FR, compiler.parse(code, FR))
    rng = random.Random(7)
    for _ in range(10):
        x, a, b, c = (FR.random_elem(rng) for _ in range(4))
        share = FR.from_int(a * x * x + b * x + c)
        weights = [1, x, share, FR.mul(a, x), a,
                   FR.from_int(x * (a * x + b)), b, c]
        crs = protocol.setup(BE, qap, rng=rng)
        proof = protocol.prove(BE, qap, crs, weights, rng=rng)
        assert protocol.verify(BE, crs, [x, share], proof)


@pytest.mark.slow
def test_bn_encrypt_cubic_full_strength():
    """10-iteration BN254 cubic-share suite (fr.rs:304-359 count)."""
    code = open("test_programs/lispesque_cubic.zk").read()
    qap = from_r1cs(FR, compiler.parse(code, FR))
    rng = random.Random(9)
    for _ in range(10):
        x, a, b, c, d = (FR.random_elem(rng) for _ in range(5))
        share = FR.from_int(a * x * x * x + b * x * x + c * x + d)
        weights = [1, x, share, FR.mul(a, x), a,
                   FR.from_int(x * (a * x + b)), b,
                   FR.from_int(x * (x * (a * x + b) + c)), c, d]
        crs = protocol.setup(BE, qap, rng=rng)
        proof = protocol.prove(BE, qap, crs, weights, rng=rng)
        assert protocol.verify(BE, crs, [x, share], proof)
