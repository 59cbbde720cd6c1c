"""BN254 (alt_bn128) parameter constants.

The reference implementation (zksnark-rs) delegates all BN254 arithmetic to
the external Rust crate ``bn`` (see /root/reference/src/groth16/fr.rs:4); this
module is the root of our from-scratch replacement.  Everything downstream —
the host-tier big-int field (`field.host`), the vectorized limb arithmetic
(`field.limb`), the curve (`curve.bn254`) and the pairing — reads its
constants from here.

Curve: y^2 = x^3 + 3 over Fq, r = #E(Fq) prime, with the standard BN
parametrization  q = 36u^4 + 36u^3 + 24u^2 + 6u + 1,
               r = 36u^4 + 36u^3 + 18u^2 + 6u + 1,  u = 4965661367192848881.
"""

# BN parameter
BN_U = 4965661367192848881
# Optimal-ate Miller loop count
BN_SIX_U_PLUS_2 = 6 * BN_U + 2

# Base field modulus (Fq)
Q = 21888242871839275222246405745257275088696311157297823662689037894645226208583
# Scalar field modulus (Fr) — the circuit/witness field
R = 21888242871839275222246405745257275088548364400416034343698204186575808495617

assert Q == 36 * BN_U**4 + 36 * BN_U**3 + 24 * BN_U**2 + 6 * BN_U + 1
assert R == 36 * BN_U**4 + 36 * BN_U**3 + 18 * BN_U**2 + 6 * BN_U + 1

# Fr multiplicative-group structure: r - 1 = 2^TWO_ADICITY * FR_ODD_ORDER
FR_TWO_ADICITY = 28
FR_ODD_ORDER = (R - 1) >> FR_TWO_ADICITY
assert FR_ODD_ORDER % 2 == 1 and (FR_ODD_ORDER << FR_TWO_ADICITY) == R - 1
# Smallest multiplicative generator of Fr* (verified in tests:
# 5^((r-1)/2) == -1 and 5 generates the full 2-Sylow subgroup).
FR_GENERATOR = 5
# Canonical 2^28-th root of unity used by every radix-2 NTT domain.
FR_ROOT_OF_UNITY = pow(FR_GENERATOR, FR_ODD_ORDER, R)

# Curve coefficients
G1_B = 3
# G1 generator (the curve's canonical affine generator)
G1_GEN = (1, 2)

# The reference encrypts field elements against *scaled* generators:
# encrypt_g1(x) = (69 * G1) * x and encrypt_g2(x) = (96 * G2) * x
# (/root/reference/src/groth16/fr.rs:106-113).  We reproduce that convention.
ENCRYPT_G1_SCALE = 69
ENCRYPT_G2_SCALE = 96

# Fq2 = Fq[u] / (u^2 + 1); elements a + b*u written (a, b).
# G2: y^2 = x^3 + b/xi on the sextic twist, xi = 9 + u.
XI = (9, 1)

# G2 generator (standard alt_bn128 / EIP-197 generator)
G2_GEN_X = (
    10857046999023057135944570762232829481370756359578518086990519993285655852781,
    11559732032986387107991004021392285783925812861821192530917403151452391805634,
)
G2_GEN_Y = (
    8495653923123431417604973247489272438418190587263600148770280649306958101930,
    4082367875863433681332203403145435568316851327593401208105741076214120093531,
)

# ---------------------------------------------------------------------------
# Limb layout shared by the vectorized (device) arithmetic: 32 digits x 8
# bits stored in float32 lanes.  The TPU VPU has no native 32-bit integer
# multiplier, but f32 arithmetic is exact on integers < 2^24 — 8-bit digits
# keep every partial product (< 2^16) and every 32-term accumulation
# (< 2^21) exact while running at the full f32 vector rate.
# ---------------------------------------------------------------------------
LIMB_BITS = 8
NUM_LIMBS = 32
LIMB_MASK = (1 << LIMB_BITS) - 1
MONT_R = 1 << (LIMB_BITS * NUM_LIMBS)  # 2^256


def mont_constants(p: int):
    """(R mod p, R^2 mod p, -p^-1 mod 2^LIMB_BITS) for modulus p < 2^256."""
    r_mod = MONT_R % p
    r2_mod = (MONT_R * MONT_R) % p
    n0inv = (-pow(p, -1, 1 << LIMB_BITS)) % (1 << LIMB_BITS)
    return r_mod, r2_mod, n0inv


def to_limbs(x: int, n: int = NUM_LIMBS):
    """Little-endian LIMB_BITS-bit digit decomposition of a non-negative
    int."""
    return [(x >> (LIMB_BITS * i)) & LIMB_MASK for i in range(n)]


def from_limbs(limbs) -> int:
    acc = 0
    for i, l in enumerate(limbs):
        acc |= int(l) << (LIMB_BITS * i)
    return acc
