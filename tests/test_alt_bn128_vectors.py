"""External alt_bn128 test vectors pinning the curve to the real one.

The pairing stack is otherwise validated only by internal properties
(bilinearity, non-degeneracy, C++<->Python agreement) — sound for *a*
pairing curve, but the reference's ``bn`` crate
(/root/reference/src/groth16/fr.rs:4) is the de-facto alt_bn128 of
EIP-196/197.  These vectors are the public Ethereum-precompile constants
(decimal forms as they appear in EIP-197 and the go-ethereum /
py_ecc bn128 implementations); any drift in field modulus, group order,
generators, or the group law breaks them.

Provenance:
- q, r: EIP-196 section "Definition of the groups" (field modulus and
  curve order of alt_bn128).
- G1 = (1, 2): EIP-196 (the P1 generator).
- G2 generator: EIP-197 "Definition of the groups" (the standard G2
  point over F_q^2 with i^2 = -1).
- 2*G1: doubling (1, 2) with the affine chord-tangent law — the value
  below appears verbatim in the py_ecc/go-ethereum bn128 test suites.
"""

import pytest

jnp = pytest.importorskip("jax.numpy")

from zksnark_tpu.curve import bn254 as hc  # noqa: E402
from zksnark_tpu.curve import native  # noqa: E402
from zksnark_tpu.field import params  # noqa: E402

# EIP-196: alt_bn128 field modulus and group order
Q_ALT_BN128 = 21888242871839275222246405745257275088696311157297823662689037894645226208583  # noqa: E501
R_ALT_BN128 = 21888242871839275222246405745257275088548364400416034343698204186575808495617  # noqa: E501

# EIP-197 G2 generator (x = x0 + x1*i, y = y0 + y1*i)
G2X0 = 10857046999023057135944570762232829481370756359578518086990519993285655852781  # noqa: E501
G2X1 = 11559732032986387107991004021392285783925812861821192530917403151452391805634  # noqa: E501
G2Y0 = 8495653923123431417604973247489272438418190587263600148770280649306958101930  # noqa: E501
G2Y1 = 4082367875863433681332203403145435568316851327593401208105741076214120093531  # noqa: E501

# 2 * (1, 2) on y^2 = x^3 + 3 mod q (py_ecc bn128 doubling vector)
TWO_G1 = (
    1368015179489954701390400359078579693043519447331113978918064868415326638035,   # noqa: E501
    9918110051302171585080402603319702774565515993150576347155970296011118125764,   # noqa: E501
)


def test_field_and_order_constants():
    assert params.Q == Q_ALT_BN128
    assert params.R == R_ALT_BN128


def test_g1_generator_and_doubling_vector():
    assert hc.G1_GEN_PT == (1, 2)
    assert hc.g1_add(hc.G1_GEN_PT, hc.G1_GEN_PT) == TWO_G1
    assert hc.g1_scalar_mul(hc.G1_GEN_PT, 2) == TWO_G1
    # group order annihilates the generator
    assert hc.g1_scalar_mul(hc.G1_GEN_PT, R_ALT_BN128) is None


def test_g2_generator_vector():
    assert tuple(hc.G2_GEN[0]) == (G2X0, G2X1)
    assert tuple(hc.G2_GEN[1]) == (G2Y0, G2Y1)
    assert hc.g2_scalar_mul(hc.G2_GEN, R_ALT_BN128) is None


def test_pairing_on_external_generators():
    """e(2*G1, G2) == e(G1, G2)^2 with the EXACT EIP-197 generator points
    plugged in as raw coordinates (not via our own generator constants),
    on the Python pairing; the native C++ library must agree."""
    g2 = ((G2X0, G2X1), (G2Y0, G2Y1))
    e1 = hc.pairing((1, 2), g2)
    e2 = hc.pairing(TWO_G1, g2)
    assert e2 == hc.fq12_mul(e1, e1)
    # the EIP-197 check shape: e(2G1, G2) * e(-G1, G2)^2 == 1
    assert native.pairing_check(
        [(TWO_G1, g2), (hc.g1_neg((1, 2)), g2), (hc.g1_neg((1, 2)), g2)])
    if native.available():
        n1 = native.multi_pairing([((1, 2), g2)])
        n2 = native.multi_pairing([(TWO_G1, g2)])
        assert n1 == e1 and n2 == e2
