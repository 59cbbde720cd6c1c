#!/usr/bin/env python
"""Micro-profile the MSM pipeline stages at bench shapes on the live
backend (TPU under axon).  Chained-repeat timing with a hard host-
transfer sync (bench.py _sync rationale: block_until_ready does not
block through the remote tunnel).

Usage: python scripts/profile_msm.py [log_n]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from zksnark_tpu.utils.jaxcfg import setup_cache  # noqa: E402

setup_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from zksnark_tpu.curve import jacobian as jac  # noqa: E402
from zksnark_tpu.curve.field_ops import FQ_OPS  # noqa: E402
from zksnark_tpu.curve.jacobian import JPoint  # noqa: E402
from zksnark_tpu.field.limb import FR_CTX  # noqa: E402
from zksnark_tpu.ops import msm as msmod  # noqa: E402

LOG_N = int(sys.argv[1]) if len(sys.argv) > 1 else 19
N = 1 << LOG_N


def sync(x):
    # slice ONE element on device first: np.asarray of the full output
    # would drag the whole array through the ~55 MB/s tunnel and swamp
    # the kernel time being measured
    return float(np.asarray(x.ravel()[0]))


def timed(label, fn, *args, reps=3):
    out = fn(*args)
    sync(out[0] if isinstance(out, (tuple, list, JPoint)) else out)
    best = 1e9
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        sync(out[0] if isinstance(out, (tuple, list, JPoint)) else out)
        best = min(best, time.time() - t0)
    print(f"{label:42s} {best * 1e3:9.1f} ms", flush=True)
    return out


def main():
    print(f"devices={jax.devices()} n=2^{LOG_N}")
    rng = np.random.default_rng(0)
    # synthetic normalized-looking points (field validity irrelevant for
    # stage timing; same shapes/dtypes as the real CRS)
    xs = jnp.asarray(rng.integers(0, 256, (N, 32)).astype(np.float32))
    ys = jnp.asarray(rng.integers(0, 256, (N, 32)).astype(np.float32))
    zs = jnp.asarray(FR_CTX.to_mont_np([1] * N))
    pts = JPoint(xs, ys, zs)
    scal = jnp.asarray(rng.integers(0, 256, (N, 32)).astype(np.float32))

    wb = msmod.pick_window_bits(N)
    wg = msmod.pick_win_group(FQ_OPS, N)
    n_win = -(-256 // wb)
    print(f"window_bits={wb} n_windows={n_win} win_group={wg}")

    # stage 1: digit extraction
    dig = jax.jit(lambda s: msmod._digit_columns(s, wb))
    cols = timed("digit_columns", dig, scal)

    # stage 2: argsort (the one batched sort)
    srt = jax.jit(lambda c: jnp.argsort(c, axis=1).astype(jnp.int32))
    order = timed(f"argsort ({n_win}, {N}) u32", srt, cols)

    dsort = jax.jit(
        lambda c, o: jnp.take_along_axis(c, o, axis=1))
    d_sorted = timed("take_along_axis digits", dsort, cols, order)

    # stage 3a: the OLD triple per-coordinate gather for ONE window
    gath3 = jax.jit(lambda o: msmod._take_points(pts, o))
    timed("triple point gather, 1 window", gath3, order[0])

    # stage 3b: the packed single gather
    packed = jax.jit(lambda: msmod._pack_points(FQ_OPS, pts))()
    sync(packed)
    gath1 = jax.jit(lambda o: jnp.take(packed, o, axis=0))
    timed("packed point gather, 1 window", gath1, order[0])

    # stage 4: one window's full bucket pipeline
    elem_shape = pts.x.shape[1:]
    one_win = jax.jit(lambda o, d: msmod._bucket_window_sorted(
        FQ_OPS, packed, elem_shape, o, d, 1 << wb, True))
    timed("bucket_window_sorted, 1 window", one_win, order[0], d_sorted[0])

    # stage 5: the scan-madd alone for ONE window (gather + chunked scan)
    def scan_only(o):
        p_sorted = msmod._unpack_points(
            FQ_OPS, jnp.take(packed, o, axis=0), elem_shape)
        from functools import partial
        comb = partial(jac.madd, FQ_OPS)
        totals, within = msmod._scan_chunks(
            FQ_OPS, p_sorted, comb, msmod._CHUNK, True)
        return totals
    timed("gather + scan_chunks, 1 window", jax.jit(scan_only), order[0])

    # full MSM
    full = jax.jit(lambda p, s: msmod._msm_impl(FQ_OPS, p, s, wb, wg, True))
    timed("FULL msm", full, pts, scal, reps=2)


if __name__ == "__main__":
    main()
