"""CLI + serialization round-trip tests (subsystems absent in the
reference: SURVEY.md §5 checkpoint/config rows)."""

import os
import random

from zksnark_tpu.cli import main as cli_main
from zksnark_tpu.field.host import Z251
from zksnark_tpu.frontend import compiler, witness
from zksnark_tpu.groth16 import protocol
from zksnark_tpu.groth16.backend import Z251Backend
from zksnark_tpu.groth16.qap import from_r1cs
from zksnark_tpu.utils import serialization as ser

CODE = open("test_programs/simple.zk").read()


def test_proof_json_roundtrip_z251():
    be = Z251Backend()
    qap = from_r1cs(Z251, compiler.parse(CODE, Z251))
    w = witness.weights(CODE, [3, 2, 4], Z251)
    rng = random.Random(1)
    crs = protocol.setup(be, qap, rng=rng)
    proof = protocol.prove(be, qap, crs, w, rng=rng)

    proof2 = ser.proof_from_json(ser.proof_to_json(proof))
    assert proof2 == proof
    crs2 = ser.crs_from_json(ser.crs_to_json(*crs))
    assert crs2 == crs
    assert protocol.verify(be, crs2, [2, 34], proof2)


def test_proof_json_roundtrip_bn254_shapes():
    # structural round-trip with G1/G2 tuples (no pairing needed)
    p = protocol.Proof(
        a=(123, 456), b=((1, 2), (3, 4)), c=None)
    assert ser.proof_from_json(ser.proof_to_json(p)) == p


def test_witness_json_roundtrip():
    w = witness.weights(CODE, [3, 2, 4], Z251)
    assert ser.witness_from_json(ser.witness_to_json(w)) == w


def test_cli_full_flow(tmp_path):
    crs = str(tmp_path / "crs.json")
    proof = str(tmp_path / "proof.json")
    circ = "test_programs/simple.zk"

    assert cli_main(["compile", circ, "--field", "z251"]) == 0
    assert cli_main(["setup", circ, "--field", "z251", "--crs", crs]) == 0
    assert os.path.exists(crs)
    assert cli_main(["prove", circ, "--field", "z251", "--crs", crs,
                     "--inputs", "3,2,4", "--proof", proof]) == 0
    assert cli_main(["verify", circ, "--field", "z251", "--crs", crs,
                     "--proof", proof, "--public", "2,34"]) == 0
    assert cli_main(["verify", circ, "--field", "z251", "--crs", crs,
                     "--proof", proof, "--public", "2,25"]) == 1


def test_cli_legacy_format(tmp_path):
    crs = str(tmp_path / "crs.json")
    circ = "test_programs/quad_share.zk"
    assert cli_main(["compile", circ, "--field", "z251"]) == 0
    assert cli_main(["setup", circ, "--field", "z251", "--crs", crs]) == 0


def test_cli_check_witness_flag(tmp_path):
    crs = str(tmp_path / "crs.json")
    proof = str(tmp_path / "proof.json")
    circ = "test_programs/simple.zk"
    assert cli_main(["setup", circ, "--field", "z251", "--crs", crs]) == 0
    assert cli_main(["prove", circ, "--field", "z251", "--crs", crs,
                     "--inputs", "3,2,4", "--proof", proof,
                     "--check-witness"]) == 0


def test_check_satisfied_detects_bad_witness():
    """The failure-detection hook the reference lacks (SURVEY.md §5):
    a corrupted weight vector names the violated gate roots."""
    r1cs = compiler.parse(CODE, Z251)
    w = witness.weights(CODE, [3, 2, 4], Z251)
    assert r1cs.check_satisfied(w, Z251.p) == []
    bad = list(w)
    bad[-1] = (bad[-1] + 1) % Z251.p
    violated = r1cs.check_satisfied(bad, Z251.p)
    assert violated, "corrupted witness must violate some constraint"
    assert set(violated) <= set(r1cs.roots)
    # zero-extension matches the prover's padding semantics
    assert r1cs.check_satisfied(w + [0] * 3, Z251.p) == \
        r1cs.check_satisfied(w, Z251.p)
