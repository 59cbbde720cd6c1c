"""Command-line interface: compile/setup/prove/verify/bench on .zk circuits.

The reference has no CLI, no config system and no way to move artifacts
between processes (SURVEY.md §5); this provides all three:

    python -m zksnark_tpu.cli setup  circuit.zk --crs crs.json
    python -m zksnark_tpu.cli prove  circuit.zk --crs crs.json \
        --inputs 3,2,4 --proof proof.json
    python -m zksnark_tpu.cli verify circuit.zk --crs crs.json \
        --proof proof.json --public 2,34
    python -m zksnark_tpu.cli bench  circuit.zk

Fields: --field bn254 (default) | z251 (the cheap mock backend, useful for
quick logic checks).  --backend host (default) | device (the TPU prover:
device CRS saved as .npz next to --crs).
"""

from __future__ import annotations

import argparse
import sys
import time


def _field(name: str):
    from .field.host import FR, Z251

    return {"bn254": FR, "z251": Z251}[name]


def _backend(name: str):
    from .groth16.backend import BN254Backend, Z251Backend

    return {"bn254": BN254Backend, "z251": Z251Backend}[name]()


def _parse_ints(s: str):
    return [int(x, 0) for x in s.split(",")] if s else []


def _load_circuit(path: str, field):
    from .frontend import compiler, legacy

    code = open(path).read()
    if code.lstrip().startswith("("):
        return code, compiler.parse(code, field)
    return code, legacy.parse(code, field)


def main(argv=None):
    ap = argparse.ArgumentParser(prog="zksnark_tpu")
    ap.add_argument("command",
                    choices=["compile", "setup", "prove", "verify", "bench"])
    ap.add_argument("circuit", help=".zk circuit file")
    ap.add_argument("--field", default="bn254", choices=["bn254", "z251"])
    ap.add_argument("--backend", default="host", choices=["host", "device"])
    ap.add_argument("--crs", default="crs.json")
    ap.add_argument("--proof", default="proof.json")
    ap.add_argument("--inputs", default="", help="private+public inputs, csv")
    ap.add_argument("--public", default="", help="verify-wire values, csv")
    ap.add_argument("--trapdoor", default="",
                    help="pin the 5 toxic-waste values (testing only), csv")
    ap.add_argument("--check-witness", action="store_true",
                    help="verify the witness satisfies every constraint "
                    "before proving (the reference silently emits an "
                    "unverifiable proof instead)")
    args = ap.parse_args(argv)

    from .utils.jaxcfg import setup_cache

    setup_cache()

    field = _field(args.field)
    code, r1cs = _load_circuit(args.circuit, field)

    if args.command == "compile":
        print(f"wires={r1cs.num_wires} gates={r1cs.num_gates} "
              f"verify_wires={r1cs.input}")
        return 0

    from .groth16 import protocol
    from .groth16.qap import from_r1cs
    from .utils import serialization as ser

    be = _backend(args.field)
    trapdoor = tuple(_parse_ints(args.trapdoor)) or None

    if args.backend == "device":
        if args.field != "bn254":
            ap.error("--backend device requires --field bn254")
        return _device_flow(args, r1cs, code, field, be, trapdoor, ser)

    qap = from_r1cs(field, r1cs)

    if args.command == "setup":
        t0 = time.time()
        crs = protocol.setup(be, qap, trapdoor=trapdoor)
        open(args.crs, "w").write(ser.crs_to_json(*crs))
        print(f"setup: wrote {args.crs} ({time.time()-t0:.2f}s)")
        return 0

    if args.command == "prove":
        from .frontend.witness import weights as mk_weights

        crs = ser.crs_from_json(open(args.crs).read())
        w = mk_weights(code, _parse_ints(args.inputs), field)
        if args.check_witness:
            bad = r1cs.check_satisfied(w, field.p)
            if bad:
                print(f"prove: witness violates {len(bad)} constraint(s) "
                      f"at roots {bad[:8]}{'...' if len(bad) > 8 else ''}")
                return 3
        t0 = time.time()
        proof = protocol.prove(be, qap, crs, w)
        open(args.proof, "w").write(ser.proof_to_json(proof))
        print(f"prove: wrote {args.proof} ({time.time()-t0:.2f}s)")
        return 0

    if args.command == "verify":
        crs = ser.crs_from_json(open(args.crs).read())
        proof = ser.proof_from_json(open(args.proof).read())
        t0 = time.time()
        ok = protocol.verify(be, crs, _parse_ints(args.public), proof)
        print(f"verify: {'ACCEPT' if ok else 'REJECT'} "
              f"({time.time()-t0:.2f}s)")
        return 0 if ok else 1

    if args.command == "bench":
        from .frontend.witness import weights as mk_weights
        from .utils.profiling import PhaseTimer

        timer = PhaseTimer()
        with timer.phase("setup"):
            crs = protocol.setup(be, qap, trapdoor=trapdoor)
        inputs = _parse_ints(args.inputs) or None
        if inputs is None:
            print("bench: no --inputs given; timing setup only")
            print(timer.report())
            return 0
        w = mk_weights(code, inputs, field)
        with timer.phase("prove"):
            proof = protocol.prove(be, qap, crs, w)
        with timer.phase("verify"):
            ok = protocol.verify(be, crs, _parse_ints(args.public), proof)
        print(timer.report())
        print(f"verify: {'ACCEPT' if ok else 'REJECT'}")
        return 0
    return 2


def _device_flow(args, r1cs, code, field, be, trapdoor, ser):
    """setup/prove/verify through the TPU prover (device CRS as .npz)."""
    from .groth16 import protocol, prover

    dqap = prover.compile_r1cs(r1cs)
    npz = args.crs + ".npz" if not args.crs.endswith(".npz") else args.crs

    if args.command == "setup":
        t0 = time.time()
        dcrs = prover.device_setup(dqap, trapdoor=trapdoor)
        ser.device_crs_save(npz, dcrs)
        print(f"setup(device): wrote {npz} ({time.time()-t0:.2f}s)")
        return 0

    dcrs = ser.device_crs_load(npz)

    if args.command == "prove":
        from .frontend.witness import weights as mk_weights

        w = mk_weights(code, _parse_ints(args.inputs), field)
        if args.check_witness:  # host-side check, backend-independent
            bad = r1cs.check_satisfied(w, field.p)
            if bad:
                print(f"prove: witness violates {len(bad)} constraint(s) "
                      f"at roots {bad[:8]}{'...' if len(bad) > 8 else ''}")
                return 3
        t0 = time.time()
        proof = prover.device_prove(dqap, dcrs, w)
        open(args.proof, "w").write(ser.proof_to_json(proof))
        print(f"prove(device): wrote {args.proof} ({time.time()-t0:.2f}s)")
        return 0

    if args.command == "verify":
        proof = ser.proof_from_json(open(args.proof).read())
        ok = protocol.verify(be, (dcrs.sigmag1, dcrs.sigmag2),
                             _parse_ints(args.public), proof)
        print(f"verify: {'ACCEPT' if ok else 'REJECT'}")
        return 0 if ok else 1
    return 2


if __name__ == "__main__":
    sys.exit(main())
