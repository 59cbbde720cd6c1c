#!/usr/bin/env python
"""Round-5 TPU microbench: fieldcore montmul kernel + fused point kernels.

Run on the real chip: python scripts/micro_r5.py
"""
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from zksnark_tpu.utils.jaxcfg import setup_cache

setup_cache()

import jax
import jax.numpy as jnp
import numpy as np

from zksnark_tpu.curve import bn254 as hc
from zksnark_tpu.curve import jacobian as jac
from zksnark_tpu.curve.field_ops import FQ2_OPS, FQ_OPS
from zksnark_tpu.field import limb
from zksnark_tpu.field.limb import FR_CTX
from zksnark_tpu.ops.montmul import mont_mul_pallas

print("devices:", jax.devices(), file=sys.stderr)


def timeit(f, *args, reps=10):
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / reps, out


# ---- montmul kernel rate + correctness
n = 1 << 16
rng = np.random.default_rng(7)
a_int = [int.from_bytes(rng.bytes(31), "little") % FR_CTX.p
         for _ in range(256)]
am_small = jnp.asarray(FR_CTX.to_mont_np(a_int))
bm_small = jnp.asarray(FR_CTX.to_mont_np(a_int[::-1]))
t0 = time.time()
got = np.asarray(mont_mul_pallas(FR_CTX, am_small, bm_small))
print(f"first montmul pallas call (incl compile): {time.time()-t0:.1f}s",
      file=sys.stderr)
want = np.asarray(limb.mont_mul(FR_CTX, am_small, bm_small))
assert np.array_equal(got, want), "MONTMUL KERNEL MISMATCH vs XLA limb"
print("montmul kernel bit-exact on TPU: OK", file=sys.stderr)

am = jnp.tile(am_small, (n // 256, 1))
bm = jnp.tile(bm_small, (n // 256, 1))
f = jax.jit(lambda x, y: mont_mul_pallas(FR_CTX, x, y))
dt, _ = timeit(f, am, bm)
print(f"montmul_pallas 2^16: {dt*1e3:.2f} ms = {n/dt/1e6:.1f} Mmul/s",
      file=sys.stderr)

# ---- fused point kernels
ks = [int(x) for x in rng.integers(1, 1 << 62, size=64)]
pts_aff = [hc.g1_scalar_mul(hc.G1_GEN_PT, k) for k in ks]
P_small = jac.from_affine(
    FQ_OPS, jnp.asarray(FQ_OPS.to_mont_np([p[0] for p in pts_aff])),
    jnp.asarray(FQ_OPS.to_mont_np([p[1] for p in pts_aff])))
reps_p = n // 64
P = jac.JPoint(jnp.tile(P_small.x, (reps_p, 1)),
               jnp.tile(P_small.y, (reps_p, 1)),
               jnp.tile(P_small.z, (reps_p, 1)))
Q = jac.JPoint(jnp.roll(P.x, 1, 0), jnp.roll(P.y, 1, 0),
               jnp.roll(P.z, 1, 0))

t0 = time.time()
out = jac.add(FQ_OPS, P, Q)
jax.block_until_ready(out.x)
print(f"first g1 add call (incl compile): {time.time()-t0:.1f}s",
      file=sys.stderr)
# correctness vs XLA oracle on the small batch
got_small = jac.add(FQ_OPS, P_small, jac.JPoint(
    jnp.roll(P_small.x, 1, 0), jnp.roll(P_small.y, 1, 0),
    jnp.roll(P_small.z, 1, 0)))
import zksnark_tpu.ops.curve_pallas as cpal  # noqa: E402

aff_got = jac.to_affine_np(FQ_OPS, got_small).tolist()
want_small = jac._add_xla(FQ_OPS, P_small, jac.JPoint(
    jnp.roll(P_small.x, 1, 0), jnp.roll(P_small.y, 1, 0),
    jnp.roll(P_small.z, 1, 0)))
aff_want = jac.to_affine_np(FQ_OPS, want_small).tolist()
assert aff_got == aff_want, "G1 ADD KERNEL MISMATCH"
print("g1 add kernel matches XLA oracle on TPU: OK", file=sys.stderr)

for name, fn in (("g1_add", lambda: jac.add(FQ_OPS, P, Q)),
                 ("g1_madd", lambda: jac.madd(FQ_OPS, P, Q)),
                 ("g1_double", lambda: jac.double(FQ_OPS, P))):
    dt, _ = timeit(lambda: fn(), reps=5)
    muls = {"g1_add": 23, "g1_madd": 16, "g1_double": 8}[name]
    print(f"{name} 2^16: {dt*1e3:.2f} ms = {n/dt/1e6:.2f} Mop/s "
          f"(~{muls*n/dt/1e6:.0f} Mmul/s effective)", file=sys.stderr)

# ---- G2
ks2 = [int(x) for x in rng.integers(1, 1 << 62, size=64)]
p2_aff = [hc.g2_scalar_mul(hc.G2_GEN, k) for k in ks2]
P2_small = jac.from_affine(
    FQ2_OPS, jnp.asarray(FQ2_OPS.to_mont_np([list(p[0]) for p in p2_aff])),
    jnp.asarray(FQ2_OPS.to_mont_np([list(p[1]) for p in p2_aff])))
n2 = n // 2
P2 = jac.JPoint(jnp.tile(P2_small.x, (n2 // 64, 1, 1)),
                jnp.tile(P2_small.y, (n2 // 64, 1, 1)),
                jnp.tile(P2_small.z, (n2 // 64, 1, 1)))
Q2 = jac.JPoint(jnp.roll(P2.x, 1, 0), jnp.roll(P2.y, 1, 0),
                jnp.roll(P2.z, 1, 0))
got2 = jac.add(FQ2_OPS, P2_small, jac.JPoint(
    jnp.roll(P2_small.x, 1, 0), jnp.roll(P2_small.y, 1, 0),
    jnp.roll(P2_small.z, 1, 0)))
want2 = jac._add_xla(FQ2_OPS, P2_small, jac.JPoint(
    jnp.roll(P2_small.x, 1, 0), jnp.roll(P2_small.y, 1, 0),
    jnp.roll(P2_small.z, 1, 0)))
assert jac.to_affine_np(FQ2_OPS, got2).tolist() == \
    jac.to_affine_np(FQ2_OPS, want2).tolist(), "G2 ADD KERNEL MISMATCH"
print("g2 add kernel matches XLA oracle on TPU: OK", file=sys.stderr)
dt, _ = timeit(lambda: jac.add(FQ2_OPS, P2, Q2), reps=5)
print(f"g2_add 2^15: {dt*1e3:.2f} ms = {n2/dt/1e6:.2f} Mop/s",
      file=sys.stderr)
print("ALL OK", file=sys.stderr)
