"""Radix-2 NTT / iNTT over BN254 Fr limb vectors — the polynomial engine.

This replaces the reference's O(n^2) Lagrange interpolation + schoolbook
convolution + long division (coefficient_poly.rs, SURVEY.md §2 #2/#3/#7)
with an O(n log n) evaluation-domain pipeline.  BN254 Fr has 2-adicity 28,
so radix-2 domains up to 2^28 exist (params.FR_ROOT_OF_UNITY).

Design (TPU/XLA-first):
- the butterfly network is a ``lax.scan`` over stages with a *uniform* body
  (one gather by a per-stage permutation, one batched Montgomery multiply,
  add/sub, one inverse-permutation gather), so XLA compiles the body ONCE
  regardless of log n — graph size stays constant while n scales;
- per-stage pair/permutation index tables and twiddle-exponent tables are
  precomputed host-side in numpy; twiddle *values* live in one (n/2, L)
  Montgomery power table gathered per stage (no O(n log n) twiddle storage);
- coset evaluation (for the h(x) quotient: the vanishing polynomial is the
  *constant* g^n - 1 on the coset g*D) is a pointwise pre/post scale.

The naive O(n^2) DFT in `field.host.PrimeField.dft` is the test oracle,
mirroring how the reference kept dft/idft only for tests
(/root/reference/src/field/mod.rs:508-537).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from ..field import params
from ..field.limb import FR_CTX, MontCtx, add, sub
from .montmul import mont_mul_auto as mont_mul

L = params.NUM_LIMBS


def _pow_table(base: int, count: int, p: int):
    out = np.empty(count, dtype=object)
    acc = 1
    for i in range(count):
        out[i] = acc
        acc = acc * base % p
    return out


class Domain:
    """A radix-2 evaluation domain of size n = 2^k in Fr, with coset g."""

    def __init__(self, log_n: int, ctx: MontCtx = FR_CTX,
                 coset_gen: int = params.FR_GENERATOR):
        assert 1 <= log_n <= params.FR_TWO_ADICITY
        self.ctx = ctx
        self.log_n = log_n
        self.n = n = 1 << log_n
        p = ctx.p
        self.omega = pow(params.FR_ROOT_OF_UNITY,
                         1 << (params.FR_TWO_ADICITY - log_n), p)
        self.omega_inv = pow(self.omega, -1, p)
        self.n_inv = pow(n, -1, p)
        self.coset_gen = coset_gen
        self.coset_gen_inv = pow(coset_gen, -1, p)
        # Z_D on the coset is the constant g^n - 1
        self.coset_vanishing = (pow(coset_gen, n, p) - 1) % p
        self.coset_vanishing_inv = pow(self.coset_vanishing, -1, p)

        # bit-reversal permutation
        idx = np.arange(n)
        rev = np.zeros(n, dtype=np.int32)
        for b in range(log_n):
            rev |= ((idx >> b) & 1).astype(np.int32) << (log_n - 1 - b)
        self.bitrev = jnp.asarray(rev)

        # Per-stage tables for the uniform scan body.  At stage s
        # (m = 2^s, half = m/2), pair k = (block, j): u at block*m + j,
        # v at block*m + half + j, twiddle exponent (n >> s) * j.
        perm = np.empty((log_n, n), dtype=np.int32)
        perm_inv = np.empty((log_n, n), dtype=np.int32)
        tw_idx = np.empty((log_n, n // 2), dtype=np.int32)
        for s in range(1, log_n + 1):
            m = 1 << s
            half = m >> 1
            k = np.arange(n // 2)
            block = k // half
            j = k % half
            u_pos = block * m + j
            v_pos = u_pos + half
            pr = np.concatenate([u_pos, v_pos]).astype(np.int32)
            perm[s - 1] = pr
            inv = np.empty(n, dtype=np.int32)
            inv[pr] = np.arange(n, dtype=np.int32)
            perm_inv[s - 1] = inv
            tw_idx[s - 1] = ((n >> s) * j).astype(np.int32)
        self.perm = jnp.asarray(perm)
        self.perm_inv = jnp.asarray(perm_inv)
        self.tw_idx = jnp.asarray(tw_idx)

        # twiddle value tables (Montgomery): omega^j and omega^-j, j < n/2
        self.tw_table = jnp.asarray(ctx.to_mont_np(
            list(_pow_table(self.omega, max(n // 2, 1), p))))
        self.tw_table_inv = jnp.asarray(ctx.to_mont_np(
            list(_pow_table(self.omega_inv, max(n // 2, 1), p))))

        # coset scales (Montgomery form)
        self.coset_pows = jnp.asarray(ctx.to_mont_np(
            list(_pow_table(coset_gen, n, p))))
        self.coset_pows_inv = jnp.asarray(ctx.to_mont_np(
            list(_pow_table(self.coset_gen_inv, n, p))))
        self.n_inv_mont = jnp.asarray(ctx.to_mont_np([self.n_inv])[0])
        self.vanishing_inv_mont = jnp.asarray(
            ctx.to_mont_np([self.coset_vanishing_inv])[0])


@lru_cache(maxsize=None)
def get_domain(log_n: int) -> Domain:
    return Domain(log_n)


def _butterflies(domain: Domain, x: jnp.ndarray,
                 tw_table: jnp.ndarray) -> jnp.ndarray:
    """In-order-output DIT butterflies given bit-reversed input.

    One lax.scan over stages; the body is compiled once.
    """
    ctx = domain.ctx
    half = domain.n // 2

    def body(x, stage):
        perm, perm_inv, tw_idx = stage
        xp = jnp.take(x, perm, axis=0)
        u, v = xp[:half], xp[half:]
        w = jnp.take(tw_table, tw_idx, axis=0)
        t = mont_mul(ctx, w, v)
        res = jnp.concatenate([add(ctx, u, t), sub(ctx, u, t)], axis=0)
        return jnp.take(res, perm_inv, axis=0), None

    x, _ = jax.lax.scan(
        body, x, (domain.perm, domain.perm_inv, domain.tw_idx))
    return x


def ntt(domain: Domain, coeffs: jnp.ndarray) -> jnp.ndarray:
    """coefficients -> evaluations on the domain (Montgomery in/out)."""
    x = jnp.take(coeffs, domain.bitrev, axis=0)
    return _butterflies(domain, x, domain.tw_table)


def intt(domain: Domain, evals: jnp.ndarray) -> jnp.ndarray:
    """evaluations -> coefficients (Montgomery in/out)."""
    x = jnp.take(evals, domain.bitrev, axis=0)
    x = _butterflies(domain, x, domain.tw_table_inv)
    return mont_mul(domain.ctx, x, domain.n_inv_mont[None, :])


def coset_ntt(domain: Domain, coeffs: jnp.ndarray) -> jnp.ndarray:
    """coefficients -> evaluations on the coset g*D."""
    scaled = mont_mul(domain.ctx, coeffs, domain.coset_pows)
    return ntt(domain, scaled)


def coset_intt(domain: Domain, evals: jnp.ndarray) -> jnp.ndarray:
    """evaluations on the coset g*D -> coefficients."""
    coeffs = intt(domain, evals)
    return mont_mul(domain.ctx, coeffs, domain.coset_pows_inv)


@partial(jax.jit, static_argnums=0)
def poly_mul(domain: Domain, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Polynomial product via the domain (sum of degrees must be < n)."""
    ea = ntt(domain, a)
    eb = ntt(domain, b)
    return intt(domain, mont_mul(domain.ctx, ea, eb))


@partial(jax.jit, static_argnums=0)
def divide_by_vanishing(domain: Domain, u_evals: jnp.ndarray,
                        v_evals: jnp.ndarray,
                        w_evals: jnp.ndarray) -> jnp.ndarray:
    """h = (U*V - W) / Z_D given *evaluations on the domain D* of the three
    weighted witness polynomials — the Groth16 quotient pipeline
    (replaces prove's O(n^2) convolution + long division,
    /root/reference/src/groth16/mod.rs:277).

    Returns h's coefficient vector (length n; degree <= n-2 for a satisfied
    witness).  An unsatisfied witness yields garbage high coefficients and a
    proof that fails verification — same silent-failure contract as the
    reference's remainder-dropping division.
    """
    ctx = domain.ctx
    u_c = intt(domain, u_evals)
    v_c = intt(domain, v_evals)
    w_c = intt(domain, w_evals)
    ue = coset_ntt(domain, u_c)
    ve = coset_ntt(domain, v_c)
    we = coset_ntt(domain, w_c)
    num = sub(ctx, mont_mul(ctx, ue, ve), we)
    q = mont_mul(ctx, num, domain.vanishing_inv_mont[None, :])
    return coset_intt(domain, q)
