"""Per-phase timing harness + work counters.

The reference's only observability is println! timing inside tests
(SURVEY.md §5).  Here: a structured phase timer (wall clock with
block_until_ready fencing for device phases) and roofline-style work
counters (limb-multiplies, butterflies, group ops) so kernel throughput can
be compared against the VPU integer-multiply roofline.
"""

from __future__ import annotations

import json
import time
from contextlib import contextmanager
from dataclasses import dataclass, field
from typing import Dict, Optional


@dataclass
class PhaseTimer:
    phases: Dict[str, float] = field(default_factory=dict)
    counters: Dict[str, float] = field(default_factory=dict)

    @contextmanager
    def phase(self, name: str, block_on=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if block_on is not None:
                import jax

                jax.block_until_ready(block_on)
            self.phases[name] = self.phases.get(name, 0.0) + (
                time.perf_counter() - t0)

    def count(self, name: str, value: float) -> None:
        self.counters[name] = self.counters.get(name, 0.0) + value

    def rate(self, counter: str, phase: str) -> Optional[float]:
        if phase not in self.phases or self.phases[phase] == 0:
            return None
        return self.counters.get(counter, 0.0) / self.phases[phase]

    def report(self) -> str:
        out = {"phases_s": {k: round(v, 4) for k, v in self.phases.items()},
               "counters": self.counters}
        return json.dumps(out, indent=2)


def msm_work(n_points: int, window_bits: int) -> Dict[str, float]:
    """Approximate point-op / digit-multiply counts for one MSM (for
    Gexp/s-style roofline reporting).

    Point-add cost: the bucket scans run mixed adds (~16 field muls,
    ops/curve_pallas._madd_core); each 254-bit field mul is one 32x32
    8-bit-digit convolution plus two 32x32 Toeplitz passes (field/limb.py
    layout: 32 digits of 8 bits) = 3*32*32 digit MACs."""
    n_windows = -(-256 // window_bits)
    # chunked scan ~1 madd/point + carry fixup; bucket side ~4 general adds
    point_adds = n_windows * (n_points + 4 * (1 << window_bits))
    digit_muls = point_adds * 16 * (3 * 32 * 32)
    return {"point_adds": point_adds, "limb_muls": digit_muls,
            "gexp_equiv": n_points}


def ntt_work(n: int) -> Dict[str, float]:
    import math

    butterflies = n // 2 * int(math.log2(n))
    # one field mul per butterfly: 3 passes of 32x32 8-bit digit MACs
    return {"butterflies": butterflies,
            "limb_muls": butterflies * 3 * 32 * 32}
