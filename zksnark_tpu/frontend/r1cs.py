"""Sparse constraint system: the interchange format between frontends and the
QAP/prover layers.

`R1CS` mirrors the reference's ``DummyRep``
(/root/reference/src/groth16/circuit/dummy_rep.rs:7-13): per-wire sparse rows
of (root, value) points for u/v/w, the list of gate roots, and the number of
verify (public-input) wires.  On top of that it provides the array exports the
device tier consumes: dense (wires x gates) evaluation matrices and COO
(row, col, val) tensors ready to ship to the TPU.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field
from typing import List, Tuple

import numpy as np

Points = List[Tuple[int, int]]  # sparse (root, value) pairs for one wire


@dataclass
class R1CS:
    u: List[Points] = dc_field(default_factory=list)
    v: List[Points] = dc_field(default_factory=list)
    w: List[Points] = dc_field(default_factory=list)
    roots: List[int] = dc_field(default_factory=list)
    input: int = 0  # number of verify wires (unity wire NOT counted)

    @property
    def num_wires(self) -> int:
        return len(self.u)

    @property
    def num_gates(self) -> int:
        return len(self.roots)

    def __eq__(self, other) -> bool:
        return (
            isinstance(other, R1CS)
            and self.u == other.u
            and self.v == other.v
            and self.w == other.w
            and self.roots == other.roots
            and self.input == other.input
        )

    # -- array exports ------------------------------------------------------

    def dense_point_matrices(self):
        """(U, V, W) as object-dtype numpy matrices of shape
        (num_wires, num_gates): entry [i, j] is the value wire i contributes
        at root j (python ints; exact for any field size).

        Requires roots to be exactly the gate roots in order (the value at a
        root not in ``roots`` would be lost) — true for every frontend here.
        """
        root_index = {r: j for j, r in enumerate(self.roots)}
        shape = (self.num_wires, self.num_gates)
        out = []
        for rows in (self.u, self.v, self.w):
            m = np.zeros(shape, dtype=object)
            for i, points in enumerate(rows):
                for (root, val) in points:
                    m[i, root_index[root]] += val
            out.append(m)
        return tuple(out)

    # -- debug / failure detection ------------------------------------------

    def check_satisfied(self, weights, p: int):
        """Explicit witness-satisfaction check (debug mode).

        The reference cannot report an invalid witness — its polynomial
        division silently drops the remainder and the proof just fails to
        verify (/root/reference/src/groth16/coefficient_poly.rs:148-157).
        This is the failure-detection hook SURVEY.md §5 asks for: returns
        the list of violated gate roots ([] = satisfied).  Weights shorter
        than num_wires are zero-extended (matching the prover).
        """
        w_full = list(weights) + [0] * (self.num_wires - len(weights))
        sums = []
        for rows in (self.u, self.v, self.w):
            acc = {root: 0 for root in self.roots}
            for i, points in enumerate(rows):
                for (r, val) in points:
                    acc[r] = (acc[r] + val * w_full[i]) % p
            sums.append(acc)
        us, vs, ws = sums
        return [r for r in self.roots if us[r] * vs[r] % p != ws[r]]

    def coo(self):
        """Three COO tensors ((wire_idx, gate_idx, value) int arrays) for
        u, v, w — the sparse form the device witness-reduction kernels use."""
        root_index = {r: j for j, r in enumerate(self.roots)}
        out = []
        for rows in (self.u, self.v, self.w):
            wires, gates, vals = [], [], []
            for i, points in enumerate(rows):
                for (root, val) in points:
                    wires.append(i)
                    gates.append(root_index[root])
                    vals.append(val)
            out.append(
                (
                    np.asarray(wires, dtype=np.int32),
                    np.asarray(gates, dtype=np.int32),
                    vals,  # python ints (may exceed int64 for BN254)
                )
            )
        return tuple(out)
