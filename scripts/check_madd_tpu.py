"""On-hardware check: Pallas madd kernel, batch_normalize, and the
affine-MSM path vs the naive oracle (run on the real TPU chip)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from zksnark_tpu.utils.jaxcfg import setup_cache

setup_cache()

import jax
import jax.numpy as jnp
import numpy as np

from zksnark_tpu.curve import bn254 as hc
from zksnark_tpu.curve import jacobian as jac
from zksnark_tpu.curve.field_ops import FQ2_OPS, FQ_OPS
from zksnark_tpu.curve.jacobian import JPoint
from zksnark_tpu.field import params as fp
from zksnark_tpu.field.limb import FR_CTX
from zksnark_tpu.ops import msm as msmod

print("devices:", jax.devices())
N = 1 << 12
rng = np.random.default_rng(7)

# G1 points: multiples of the generator (host ground truth available)
mults = [int(m) for m in rng.integers(1, 1 << 30, size=N)]
base = hc.g1_scalar_mul(hc.G1_GEN_PT, fp.ENCRYPT_G1_SCALE)
pts_aff = [hc.g1_scalar_mul(base, m) for m in mults]
P = jac.from_affine(
    FQ_OPS,
    jnp.asarray(FQ_OPS.to_mont_np([p[0] for p in pts_aff])),
    jnp.asarray(FQ_OPS.to_mont_np([p[1] for p in pts_aff])))
scal = [int(s) for s in rng.integers(0, 1 << 62, size=N)]
slimbs = jnp.asarray(np.stack([
    np.array(fp.to_limbs(s), dtype=np.float32) for s in scal]))

# 1) madd vs add on shifted batches (q affine)
Q = P
Pp = jac.add(FQ_OPS, P, jac.double(FQ_OPS, P))  # projective p (= 3P)
out_add = jac.to_affine_np(FQ_OPS, jac.add(FQ_OPS, Pp, Q))
out_madd = jac.to_affine_np(FQ_OPS, jac.madd(FQ_OPS, Pp, Q))
assert (out_add == out_madd).all(), "madd != add on G1"
print("madd(G1) matches add on", N, "points")

# madd edge cases: q = -p, q = p (doubling), q = inf, p = inf
e_aff = pts_aff[:256]
E = jac.from_affine(
    FQ_OPS, jnp.asarray(FQ_OPS.to_mont_np([p[0] for p in e_aff])),
    jnp.asarray(FQ_OPS.to_mont_np([p[1] for p in e_aff])))
cases = [
    (E, jac.neg(FQ_OPS, E)),              # p + (-p) = inf
    (E, E),                               # doubling
    (E, jac.infinity(FQ_OPS, (256,))),    # q = inf
    (jac.infinity(FQ_OPS, (256,)), E),    # p = inf
]
for i, (a, b) in enumerate(cases):
    ra = jac.to_affine_np(FQ_OPS, jac.add(FQ_OPS, a, b))
    rm = jac.to_affine_np(FQ_OPS, jac.madd(FQ_OPS, a, b))
    assert (ra == rm).all(), f"madd edge case {i} mismatch"
print("madd edge cases OK")

# 2) batch_normalize: projective -> affine, values unchanged
norm = jac.batch_normalize(FQ_OPS, Pp)
za = np.asarray(FQ_OPS.from_mont_np(np.asarray(norm.z)))
assert set(za.tolist()) <= {0, 1}, "normalize z not in {0,1}"
assert (jac.to_affine_np(FQ_OPS, norm)
        == jac.to_affine_np(FQ_OPS, Pp)).all(), "normalize changed points"
print("batch_normalize OK")

# 3) affine MSM vs naive oracle (and vs projective path)
wb = msmod.pick_window_bits(N)
r_aff = msmod._msm_windowed(FQ_OPS, P, slimbs, wb, 0, True)
r_prj = msmod._msm_windowed(FQ_OPS, P, slimbs, wb, 0, False)
r_nav = msmod.msm_naive(FQ_OPS, P, slimbs)
a1 = jac.to_affine_np(FQ_OPS, r_aff)
a2 = jac.to_affine_np(FQ_OPS, r_prj)
a3 = jac.to_affine_np(FQ_OPS, r_nav)
assert a1 == a2 == a3, f"MSM mismatch: {a1} {a2} {a3}"
# host ground truth
expect = hc.g1_scalar_mul(
    base, sum(m * s for m, s in zip(mults, scal)) % FR_CTX.p)
assert a1 == expect, "MSM != host ground truth"
print("G1 MSM affine/projective/naive/host all agree")

# 4) G2: madd + affine MSM vs projective
g2b = hc.g2_scalar_mul(hc.G2_GEN, fp.ENCRYPT_G2_SCALE)
pts2 = [hc.g2_scalar_mul(g2b, m) for m in mults[:1024]]
P2 = jac.from_affine(
    FQ2_OPS,
    jnp.asarray(FQ2_OPS.to_mont_np([list(p[0]) for p in pts2])),
    jnp.asarray(FQ2_OPS.to_mont_np([list(p[1]) for p in pts2])))
s2 = slimbs[:1024]
r2a = jac.to_affine_np(FQ2_OPS, msmod._msm_windowed(FQ2_OPS, P2, s2, 8, 0,
                                                    True))
r2b = jac.to_affine_np(FQ2_OPS, msmod._msm_windowed(FQ2_OPS, P2, s2, 8, 0,
                                                    False))
assert r2a == r2b, "G2 affine MSM != projective"
n2 = jac.batch_normalize(FQ2_OPS, jac.add(FQ2_OPS, P2, P2))
print("G2 MSM affine path OK; G2 normalize compiled")

# 5) timing: affine vs projective MSM at 2^16
N2 = 1 << 16
reps = int(np.ceil(N2 / N))
Pb = JPoint(jnp.tile(P.x, (reps, 1))[:N2], jnp.tile(P.y, (reps, 1))[:N2],
            jnp.tile(P.z, (reps, 1))[:N2])
sb = jnp.tile(slimbs, (reps, 1))[:N2]
wb2 = msmod.pick_window_bits(N2)
for tag, aff in (("affine", True), ("projective", False)):
    r = msmod._msm_windowed(FQ_OPS, Pb, sb, wb2, 0, aff)
    jax.block_until_ready(r.x)
    t0 = time.time()
    r = msmod._msm_windowed(FQ_OPS, Pb, sb, wb2, 0, aff)
    jax.block_until_ready(r.x)
    dt = time.time() - t0
    print(f"MSM 2^16 {tag}: {dt*1e3:.0f} ms ({N2/dt/1e3:.0f}k Gexp/s)")

print("ALL CHECKS PASSED")
