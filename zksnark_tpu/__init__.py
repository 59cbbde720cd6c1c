"""zksnark_tpu — a TPU-native Groth16 zkSNARK proving stack.

Built from scratch in JAX/XLA/Pallas with the full capability surface of the
Rust reference ``zksnark-rs`` (see SURVEY.md): the lisp-esque ``.zk`` circuit
DSL, a circuit-builder gadget API (gates, Word8/Word64, comparators,
in-circuit Keccak-256), R1CS -> QAP compilation and setup/prove/verify over
BN254, plus a Z251 mock backend for cheap algebraic testing.

Layer map (bottom-up, mirroring SURVEY.md §1):

    field/    host big-int fields + vectorized Montgomery limb arithmetic
    poly/     dense coefficient engine (parity oracle) + radix-2 NTT engine
    frontend/ .zk lexer/parser, R1CS, witness interpreter, legacy format
    curve/    BN254 G1/G2/pairing (host) + vectorized Jacobian point kernels
    groth16/  QAP, backends, protocol (host-exact) and the TPU prover
    builder/  imperative circuit builder: gates, words, comparators, keccak
    ops/      Pallas/JAX device kernels (Montgomery mul, NTT, MSM)
    parallel/ mesh sharding: distributed MSM/NTT via shard_map collectives
"""

from .field.host import FR, FQ, Z251, PrimeField  # noqa: F401
from .frontend import ast, compiler, legacy, witness  # noqa: F401
from .frontend.r1cs import R1CS  # noqa: F401
from .frontend.witness import weights  # noqa: F401
from .groth16 import backend, protocol, qap  # noqa: F401
from .groth16.backend import BN254Backend, Z251Backend  # noqa: F401
from .groth16.protocol import Proof, SigmaG1, SigmaG2, prove, setup, verify  # noqa: F401
from .groth16.qap import QAP, from_r1cs  # noqa: F401

__version__ = "0.1.0"


def parse_zk(code: str, field=None) -> R1CS:
    """Compile ``.zk`` source to an R1CS (ASTParser::try_parse equivalent)."""
    from .field.host import Z251 as _z

    return compiler.parse(code, field if field is not None else _z)
