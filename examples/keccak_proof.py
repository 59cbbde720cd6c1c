#!/usr/bin/env python
"""End-to-end zero-knowledge proof of a Keccak-256 preimage, on TPU.

The full stack in one script: circuit builder (in-circuit keccak) ->
CircuitInstance -> R1CS -> radix-2 device QAP -> device setup (powers of
tau) -> device prove (NTT + MSM) -> host pairing verify.

The prover shows knowledge of a preimage whose Keccak-256 digest (plus the
bit-validity checkers for the preimage bits) is the public input — the
workload the reference only ships as an #[ignore]d test
(/root/reference/src/lib.rs:284-321) because its O(n^2) pipeline cannot
handle the ~200k-gate circuit.  Here the gate count just sets the NTT
domain size.

Usage:  python examples/keccak_proof.py [preimage-bytes]   (default 4 bytes)
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

from zksnark_tpu.utils.jaxcfg import setup_cache  # noqa: E402

setup_cache()

from zksnark_tpu.builder.circuit import Circuit  # noqa: E402
from zksnark_tpu.builder.instance import CircuitInstance  # noqa: E402
from zksnark_tpu.builder.words import flatten_word8  # noqa: E402
from zksnark_tpu.field.host import FR  # noqa: E402
from zksnark_tpu.groth16 import protocol, prover  # noqa: E402
from zksnark_tpu.groth16.backend import BN254Backend  # noqa: E402
from zksnark_tpu.utils.keccak_host import keccak256  # noqa: E402


def main():
    n_bytes = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    preimage = [(37 * i + 11) & 0xFF for i in range(n_bytes)]
    digest = keccak256(preimage)
    print(f"preimage: {bytes(preimage).hex()}  digest: {digest.hex()}")

    t0 = time.time()
    c = Circuit(FR)
    inp = c.new_word8_vec(n_bytes)
    hash_words = c.keccak256(inp)
    bit_checkers = c.bit_check(flatten_word8(inp))
    verify_wires = flatten_word8(hash_words) + bit_checkers
    inst = CircuitInstance(c, verify_wires, flatten_word8(inp),
                           lambda sc: FR.from_int(sc + 1))
    print(f"circuit: {c.num_sub_circuits()} gates, {c.num_wires()} wires "
          f"({time.time()-t0:.1f}s to build)")

    t0 = time.time()
    bits = []
    for byte in preimage:
        bits.extend((byte >> i) & 1 for i in range(8))
    weights = inst.weights(bits)
    print(f"witness: {len(weights)} wires ({time.time()-t0:.1f}s)")

    t0 = time.time()
    r1cs = inst.r1cs()
    dqap = prover.compile_r1cs(r1cs)
    print(f"compiled: domain n={dqap.n} ({time.time()-t0:.1f}s)")

    t0 = time.time()
    dcrs = prover.device_setup(dqap, trapdoor=(101, 202, 303, 404, 505))
    print(f"device setup: {time.time()-t0:.1f}s")

    t0 = time.time()
    proof = prover.device_prove(dqap, dcrs, weights, blinding=(606, 707))
    print(f"device prove: {time.time()-t0:.1f}s")

    # public inputs: digest bits then zero checker values
    digest_bits = []
    for byte in digest:
        digest_bits.extend((byte >> i) & 1 for i in range(8))
    public = digest_bits + [0] * len(bit_checkers)

    be = BN254Backend()
    t0 = time.time()
    ok = protocol.verify_fast(be, (dcrs.sigmag1, dcrs.sigmag2), public,
                              proof)
    print(f"verify: {'ACCEPT' if ok else 'REJECT'} ({time.time()-t0:.2f}s)")

    bad = list(public)
    bad[0] ^= 1
    rej = protocol.verify_fast(be, (dcrs.sigmag1, dcrs.sigmag2), bad, proof)
    print(f"tampered digest: {'ACCEPT (BUG!)' if rej else 'REJECT'}")

    if os.environ.get("KECCAK_WARM"):
        # warm (compile-free) re-runs: the numbers a deployed prover sees
        t0 = time.time()
        dcrs2 = prover.device_setup(dqap, trapdoor=(101, 202, 303, 404,
                                                    505))
        print(f"device setup (warm): {time.time()-t0:.1f}s")
        t0 = time.time()
        proof2 = prover.device_prove(dqap, dcrs2, weights,
                                     blinding=(606, 707))
        print(f"device prove (warm): {time.time()-t0:.1f}s")
        ok2 = protocol.verify_fast(be, (dcrs2.sigmag1, dcrs2.sigmag2),
                                   public, proof2)
        print(f"warm proof: {'ACCEPT' if ok2 else 'REJECT'}")
        ok = ok and ok2
    return 0 if ok and not rej else 1


if __name__ == "__main__":
    sys.exit(main())
