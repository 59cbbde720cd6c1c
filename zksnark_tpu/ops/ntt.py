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

import os
from functools import lru_cache, partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..field import params
from ..field.limb import FR_CTX, MontCtx, add, sub
from .montmul import mont_mul_auto as mont_mul

L = params.NUM_LIMBS


class DomainTables(NamedTuple):
    """The field-valued domain tables, as a pytree.

    Pass these THROUGH outer jit boundaries (prover, setup, bench) as
    arguments: closed-over jnp arrays are embedded into the HLO as
    constants, which at 2^20 is hundreds of MB of program text (the axon
    remote-compile endpoint rejects it outright).  Index tables don't
    exist at all — butterfly pairings and bit-reversal are recomputed
    in-trace from iota (pure shift/mask math, cheaper than the HBM they
    would occupy).  Coset scale vectors g^j are likewise NOT stored:
    only two ~sqrt(n)-row factor tables persist, and `coset_ntt`/
    `coset_intt` rebuild the (n, L) series in-trace as ONE batched
    Montgomery outer product (g^j = (g^k)^(j//k) * g^(j%k), the same
    factorization device_setup uses for the xi powers) — at 2^20 the
    two persistent (n, L) tables cost 1 GB of physical HBM (f32 arrays
    with a 32-wide minor dim tile as T(8, 128): 4x padding) that the
    prover needs for MSM headroom.  (A log-concat doubling build was
    tried first and OOM'd the 2^20 quotient: it holds ~2n rows of
    build transients per series; the outer product's transient is just
    the series itself.)"""

    tw_table: jnp.ndarray        # (n/2, L) omega^j, Montgomery
    tw_table_inv: jnp.ndarray    # (n/2, L) omega^-j
    coset_lo: jnp.ndarray        # (k, L) g^b for b < k = 2^ceil(log_n/2)
    coset_hi: jnp.ndarray        # (n/k, L) (g^k)^a
    coset_lo_inv: jnp.ndarray    # (k, L) g^-b
    coset_hi_inv: jnp.ndarray    # (n/k, L) (g^-k)^a
    n_inv_mont: jnp.ndarray      # (L,)
    vanishing_inv_mont: jnp.ndarray  # (L,)


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

        # field-valued tables only (index math is recomputed in-trace):
        # twiddles omega^j / omega^-j for j < n/2, coset factor tables
        k = 1 << (-(-log_n // 2))        # k = 2^ceil(log_n/2), k | n
        self.coset_k = k

        def factors(base):
            lo = list(_pow_table(base, k, p))
            hi = list(_pow_table(pow(base, k, p), n // k, p))
            return (jnp.asarray(ctx.to_mont_np(lo)),
                    jnp.asarray(ctx.to_mont_np(hi)))

        lo_f, hi_f = factors(coset_gen)
        lo_i, hi_i = factors(self.coset_gen_inv)
        self.t = DomainTables(
            tw_table=jnp.asarray(ctx.to_mont_np(
                list(_pow_table(self.omega, max(n // 2, 1), p)))),
            tw_table_inv=jnp.asarray(ctx.to_mont_np(
                list(_pow_table(self.omega_inv, max(n // 2, 1), p)))),
            coset_lo=lo_f, coset_hi=hi_f,
            coset_lo_inv=lo_i, coset_hi_inv=hi_i,
            n_inv_mont=jnp.asarray(ctx.to_mont_np([self.n_inv])[0]),
            vanishing_inv_mont=jnp.asarray(
                ctx.to_mont_np([self.coset_vanishing_inv])[0]),
        )

    # kept as properties for existing call sites
    @property
    def tw_table(self):
        return self.t.tw_table

    @property
    def tw_table_inv(self):
        return self.t.tw_table_inv

    def coset_pows_np(self, inverse: bool = False) -> np.ndarray:
        """Host-built (n, L) coset scale table g^j (or g^-j) — for the
        sharded four-step path, which needs a *permuted* gather of the
        series before shard_map splits it.  Returns numpy (no HBM
        residency until the caller transfers it)."""
        base = self.coset_gen_inv if inverse else self.coset_gen
        return self.ctx.to_mont_np(list(_pow_table(base, self.n, self.ctx.p)))

    @property
    def n_inv_mont(self):
        return self.t.n_inv_mont

    @property
    def vanishing_inv_mont(self):
        return self.t.vanishing_inv_mont


@lru_cache(maxsize=None)
def get_domain(log_n: int) -> Domain:
    return Domain(log_n)


def _bitrev_take(log_n: int, x: jnp.ndarray) -> jnp.ndarray:
    """Gather x into bit-reversed order; indices built in-trace from iota
    (log_n shift/or ops — no (n,) table to embed or store)."""
    idx = jnp.arange(1 << log_n, dtype=jnp.int32)
    rev = jnp.zeros_like(idx)
    for b in range(log_n):
        rev = rev | (((idx >> b) & 1) << (log_n - 1 - b))
    return jnp.take(x, rev, axis=0)


def _butterflies(ctx: MontCtx, log_n: int, tw_table: jnp.ndarray,
                 x: jnp.ndarray) -> jnp.ndarray:
    """In-order-output DIT butterflies given bit-reversed input.

    One lax.scan over stages; the body is compiled once.  At stage s
    (m = 2^s, half = m/2), pair k = (block, j) reads u at block*m + j and
    v at u + half with twiddle omega^(j * n/2^s); all pair/output indices
    are shift/mask functions of iota and the traced stage number, so the
    graph carries no index tables at all."""
    n = 1 << log_n
    k = jnp.arange(n // 2, dtype=jnp.int32)
    pos = jnp.arange(n, dtype=jnp.int32)

    def body(x, s):
        sm1 = s - 1
        half = jnp.int32(1) << sm1
        j = k & (half - 1)
        u_pos = ((k >> sm1) << s) | j
        u = jnp.take(x, u_pos, axis=0)
        v = jnp.take(x, u_pos + half, axis=0)
        w = jnp.take(tw_table, j << (log_n - s), axis=0)
        t = mont_mul(ctx, w, v)
        res = jnp.concatenate([add(ctx, u, t), sub(ctx, u, t)], axis=0)
        # inverse placement, gather-only: position p holds res[src]
        src = (((pos >> s) << sm1) | (pos & (half - 1))) \
            + ((pos >> sm1) & 1) * (n // 2)
        return jnp.take(res, src, axis=0), None

    x, _ = jax.lax.scan(
        body, x, jnp.arange(1, log_n + 1, dtype=jnp.int32))
    return x


def _unroll_enabled() -> bool:
    """Unrolled butterflies on?  Default: TPU backends only (the scan
    body keeps the graph small for XLA:CPU compile economy); env
    ZK_NTT_UNROLL=0/1 overrides."""
    env = os.environ.get("ZK_NTT_UNROLL")
    if env is not None:
        return env == "1"
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:  # pragma: no cover
        return False


def _butterflies_unrolled(ctx: MontCtx, log_n: int, tw_table: jnp.ndarray,
                          x: jnp.ndarray) -> jnp.ndarray:
    """The same in-order-output DIT butterflies as `_butterflies`, with
    the stage loop unrolled in Python so every index is STATIC:

    - pair selection is a reshape to (n/2^s, 2^s, L) + two slices —
      contiguous layout ops instead of three (n, L) random gathers;
    - the stage twiddles are a strided SLICE of the power table
      (tw_table[0 : n/2 : n/2^s]) instead of a gather;
    - every stage's multiply flattens to the same (n/2, L) batch, so all
      log_n stages share ONE Mosaic kernel.

    Identical arithmetic to the scan body (same mont_mul/add/sub on the
    same value pairs), hence bit-identical outputs; ~5x faster on TPU at
    2^20 where the scan body's gathers are HBM-bound.  Graph size grows
    with log_n, which is why the scan path remains the CPU default."""
    n = 1 << log_n
    for s in range(1, log_n + 1):
        half = 1 << (s - 1)
        m = 1 << s
        xb = x.reshape(n // m, m, L)
        u = xb[:, :half]
        v = xb[:, half:]
        w = tw_table[0:n // 2:n // m]              # omega^(j * n/2^s)
        t = mont_mul(ctx, w[None], v)
        x = jnp.concatenate(
            [add(ctx, u, t), sub(ctx, u, t)], axis=1).reshape(n, L)
    return x


def ntt(domain: Domain, coeffs: jnp.ndarray,
        t: DomainTables | None = None) -> jnp.ndarray:
    """coefficients -> evaluations on the domain (Montgomery in/out).

    Inside an outer jit at large n, pass `t=domain.t` through the jit
    boundary as an argument (see DomainTables)."""
    t = domain.t if t is None else t
    x = _bitrev_take(domain.log_n, coeffs)
    bf = _butterflies_unrolled if _unroll_enabled() else _butterflies
    return bf(domain.ctx, domain.log_n, t.tw_table, x)


def intt(domain: Domain, evals: jnp.ndarray,
         t: DomainTables | None = None) -> jnp.ndarray:
    """evaluations -> coefficients (Montgomery in/out)."""
    t = domain.t if t is None else t
    x = _bitrev_take(domain.log_n, evals)
    bf = _butterflies_unrolled if _unroll_enabled() else _butterflies
    x = bf(domain.ctx, domain.log_n, t.tw_table_inv, x)
    return mont_mul(domain.ctx, x, t.n_inv_mont[None, :])


def pow_series(ctx: MontCtx, hi: jnp.ndarray, lo: jnp.ndarray
               ) -> jnp.ndarray:
    """(n, L) Montgomery powers [g^0 .. g^{n-1}] built in-trace from the
    sqrt-factor tables as ONE batched outer Montgomery product:
    g^(a*k + b) = hi[a] * lo[b].  Bit-identical to a host sequential
    table: canonical Montgomery digits are unique per value, so the
    multiplication ASSOCIATION cannot change the result."""
    m, k = hi.shape[0], lo.shape[0]
    return mont_mul(ctx, hi[:, None, :], lo[None, :, :]).reshape(m * k, L)


def coset_ntt(domain: Domain, coeffs: jnp.ndarray,
              t: DomainTables | None = None,
              coset_pows: jnp.ndarray | None = None) -> jnp.ndarray:
    """coefficients -> evaluations on the coset g*D.

    coset_pows: pass a pre-built series (`pow_series`) to share one
    build across several transforms inside a jit; None builds it here."""
    t = domain.t if t is None else t
    if coset_pows is None:
        coset_pows = pow_series(domain.ctx, t.coset_hi, t.coset_lo)
    scaled = mont_mul(domain.ctx, coeffs, coset_pows)
    return ntt(domain, scaled, t)


def coset_intt(domain: Domain, evals: jnp.ndarray,
               t: DomainTables | None = None,
               coset_pows_inv: jnp.ndarray | None = None) -> jnp.ndarray:
    """evaluations on the coset g*D -> coefficients."""
    t = domain.t if t is None else t
    if coset_pows_inv is None:
        coset_pows_inv = pow_series(domain.ctx, t.coset_hi_inv,
                                    t.coset_lo_inv)
    coeffs = intt(domain, evals, t)
    return mont_mul(domain.ctx, coeffs, coset_pows_inv)


@partial(jax.jit, static_argnums=0)
def poly_mul(domain: Domain, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Polynomial product via the domain (sum of degrees must be < n)."""
    ea = ntt(domain, a)
    eb = ntt(domain, b)
    return intt(domain, mont_mul(domain.ctx, ea, eb))


@partial(jax.jit, static_argnums=0)
def divide_by_vanishing(domain: Domain, u_evals: jnp.ndarray,
                        v_evals: jnp.ndarray, w_evals: jnp.ndarray,
                        t: DomainTables | None = None) -> jnp.ndarray:
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
    td = domain.t if t is None else t
    cpows = pow_series(ctx, td.coset_hi, td.coset_lo)
    u_c = intt(domain, u_evals, td)
    v_c = intt(domain, v_evals, td)
    w_c = intt(domain, w_evals, td)
    ue = coset_ntt(domain, u_c, td, cpows)
    ve = coset_ntt(domain, v_c, td, cpows)
    we = coset_ntt(domain, w_c, td, cpows)
    num = sub(ctx, mont_mul(ctx, ue, ve), we)
    q = mont_mul(ctx, num, td.vanishing_inv_mont[None, :])
    return coset_intt(domain, q, td)
