"""Per-kernel TPU roofline profiling: where does MSM/NTT time go?

Times each building block in isolation on the real chip:
  mont_mul (XLA + Pallas), jac.add G1/G2, batched argsort, prefix scan,
  bucket window, full MSM at several window sizes, NTT.

Env: LOG_N (default 16), PIECES (csv filter, default all).
"""
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
from zksnark_tpu.field.limb import FR_CTX, mont_mul
from zksnark_tpu.ops import msm as msmod
from zksnark_tpu.ops import ntt as nttmod

LOG_N = int(os.environ.get("LOG_N", "16"))
PIECES = set(os.environ.get("PIECES", "").split(",")) - {""}
n = 1 << LOG_N
from zksnark_tpu.field import params as _fp
LL = _fp.NUM_LIMBS
print(f"[prof] devices={jax.devices()} n={n}", flush=True)


def bench(name, fn, *args, reps=3):
    if PIECES and name.split(":")[0] not in PIECES:
        return None
    t0 = time.time()
    out = fn(*args)
    jax.block_until_ready(out)
    compile_s = time.time() - t0
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.time() - t0)
    print(f"[prof] {name:34s} {best*1e3:10.2f} ms   (compile {compile_s:.1f}s)",
          flush=True)
    return best


rng = np.random.default_rng(0)
scalars_int = [int(rng.integers(1, 1 << 62)) for _ in range(n)]
scalars = jnp.asarray(FR_CTX.to_limbs_np(scalars_int))

base = hc.g1_scalar_mul(hc.G1_GEN_PT, 69)
g1x = jnp.broadcast_to(jnp.asarray(FQ_OPS.to_mont_np([base[0]]))[0], (n, LL))
g1y = jnp.broadcast_to(jnp.asarray(FQ_OPS.to_mont_np([base[1]]))[0], (n, LL))
p1 = jac.from_affine(FQ_OPS, g1x, g1y)

b2 = hc.g2_scalar_mul(hc.G2_GEN, 96)
g2x = jnp.broadcast_to(jnp.asarray(FQ2_OPS.to_mont_np([list(b2[0])]))[0],
                       (n, 2, LL))
g2y = jnp.broadcast_to(jnp.asarray(FQ2_OPS.to_mont_np([list(b2[1])]))[0],
                       (n, 2, LL))
p2 = jac.from_affine(FQ2_OPS, g2x, g2y)

# --- field multiply throughput ------------------------------------------
mm = jax.jit(lambda a, b: mont_mul(FR_CTX, a, b))
t = bench(f"montmul_xla ({n}x)", mm, g1x, g1y)
if t:
    print(f"[prof]   -> {n/t/1e6:.1f} Mmul/s", flush=True)

try:
    from zksnark_tpu.ops.montmul import mont_mul_pallas
    pm = jax.jit(lambda a, b: mont_mul_pallas(FR_CTX, a, b))
    t = bench(f"montmul_pallas ({n}x)", pm, g1x, g1y)
    if t:
        print(f"[prof]   -> {n/t/1e6:.1f} Mmul/s", flush=True)
except Exception as e:
    print(f"[prof] pallas unavailable: {e!r}", flush=True)

# --- point ops -----------------------------------------------------------
add1x = jax.jit(lambda p, q: jac._add_xla(FQ_OPS, p, q))
t = bench(f"jac.add G1 xla ({n} lanes)", add1x, p1, p1)
add1 = jax.jit(lambda p, q: jac.add(FQ_OPS, p, q))
t = bench(f"jac.add G1 auto ({n} lanes)", add1, p1, p1)
if t:
    print(f"[prof]   -> {n/t/1e6:.1f} Madd/s", flush=True)
add2 = jax.jit(lambda p, q: jac.add(FQ2_OPS, p, q))
t = bench(f"jac.add G2 auto ({n} lanes)", add2, p2, p2)
dbl1 = jax.jit(lambda p: jac.double(FQ_OPS, p))
bench(f"jac.double G1 auto ({n} lanes)", dbl1, p1)

# --- MSM building blocks -------------------------------------------------
for wb in (8,):
    dc = jax.jit(lambda s: msmod._digit_columns(s, wb))
    cols = dc(scalars)
    srt = jax.jit(lambda c: jnp.argsort(c, axis=1))
    t = bench(f"argsort ({cols.shape[0]}x{n})", srt, cols)

ps1 = jax.jit(lambda p: msmod._prefix_scan(FQ_OPS, p))
t = bench(f"prefix_scan G1 ({n})", ps1, p1)
if t:
    print(f"[prof]   -> {2*n/t/1e6:.1f} Madd/s (2n model)", flush=True)
ts1 = jax.jit(lambda p: msmod.tree_sum(FQ_OPS, p))
bench(f"tree_sum G1 ({n})", ts1, p1)

# --- full MSMs -----------------------------------------------------------
for wb in (8, 13, 16):
    t = bench(f"msm G1 wb={wb}", msmod._msm_windowed, FQ_OPS, p1, scalars,
              wb)
    if t:
        print(f"[prof]   -> {n/t/1e6:.2f} MGexp/s", flush=True)
t = bench("msm G2 wb=8", msmod._msm_windowed, FQ2_OPS, p2, scalars, 8)

# --- NTT -----------------------------------------------------------------
dom = nttmod.get_domain(LOG_N)
a = jnp.asarray(FR_CTX.to_mont_np([i + 1 for i in range(n)]))
nt = jax.jit(lambda x: nttmod.ntt(dom, x))
t = bench(f"ntt 2^{LOG_N}", nt, a)
if t:
    import math
    print(f"[prof]   -> {(n//2)*LOG_N/t/1e6:.1f} Mbutterfly/s", flush=True)
print("[prof] done", flush=True)
