"""Work-efficient prefix scans and segmented sums over field-element arrays.

The device-setup pipeline (groth16/prover.py:device_setup) needs
"accumulate value v into wire i" over hundreds of thousands of sparse
entries — a scatter-add in Fr, which has no hardware reduction.  The
TPU-friendly formulation mirrors the MSM bucket accumulation (ops/msm.py):
sort entries by key, prefix-scan the values (field addition is
associative), and read each segment's sum off the run-boundary prefixes:

    seg[s] = E_end[s] - E_end[prev present segment]

— both terms are direct scatters of run-end prefix values, so no
forward-fill pass is needed at all.

The scan itself is work-efficient and fully lane-parallel: values are laid
out as (chunks, 64) and a ``lax.scan`` walks the 64 sequential positions
with all chunks in vector lanes (~2N adds total, ONE add instantiation per
level — compile-friendly).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..field import params
from ..field.limb import MontCtx, add as l_add, sub as l_sub

L = params.NUM_LIMBS
_CHUNK = 64


def _pad_rows(x: jnp.ndarray, m: int) -> jnp.ndarray:
    n = x.shape[0]
    if m == n:
        return x
    return jnp.concatenate(
        [x, jnp.zeros((m - n,) + x.shape[1:], x.dtype)])


def _hs_scan(ctx: MontCtx, x: jnp.ndarray) -> jnp.ndarray:
    """Small-size inclusive Hillis-Steele scan over axis 0 (identity 0)."""
    size = x.shape[0]
    if size <= 1:
        return x
    log = (size - 1).bit_length()
    pos = jax.lax.broadcasted_iota(jnp.int32, (size, 1), 0)

    def body(i, v):
        shift = jnp.int32(1) << i
        partner = jnp.roll(v, shift, axis=0)
        partner = jnp.where(pos >= shift, partner, jnp.zeros_like(partner))
        return l_add(ctx, partner, v)

    return jax.lax.fori_loop(0, log, body, x)


def field_prefix_scan(ctx: MontCtx, x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive prefix sums (mod p) of a (n, L) Montgomery/limb array.

    Work-efficient: ~2n field adds, ceil(n/64) lanes wide."""
    n = x.shape[0]
    if n <= 2 * _CHUNK:
        return _hs_scan(ctx, x)
    b = -(-n // _CHUNK)
    grid = jnp.moveaxis(
        _pad_rows(x, b * _CHUNK).reshape(b, _CHUNK, L), 1, 0)  # (c, B, L)

    def body(carry, col):
        nxt = l_add(ctx, carry, col)
        return nxt, nxt

    totals, within = jax.lax.scan(
        body, jnp.zeros((b, L), x.dtype), grid)
    within = jnp.moveaxis(within, 0, 1)  # (B, c, L)
    shifted = jnp.concatenate(
        [jnp.zeros((1, L), x.dtype), totals[:-1]])
    carry = field_prefix_scan(ctx, shifted)
    full = l_add(ctx, jnp.broadcast_to(carry[:, None], within.shape),
                 within)
    return full.reshape(b * _CHUNK, L)[:n]


def field_segment_sums(ctx: MontCtx, keys: jnp.ndarray, vals: jnp.ndarray,
                       num_segments: int) -> jnp.ndarray:
    """sum of vals grouped by key: (E,) int keys + (E, L) values ->
    (num_segments, L) per-segment field sums.  Keys need NOT be sorted
    (one argsort inside); empty segments sum to zero."""
    order = jnp.argsort(keys).astype(jnp.int32)
    k_sorted = jnp.take(keys, order).astype(jnp.int32)
    v_sorted = jnp.take(vals, order, axis=0)
    prefix = field_prefix_scan(ctx, v_sorted)

    nxt = jnp.concatenate(
        [k_sorted[1:], jnp.full((1,), num_segments, k_sorted.dtype)])
    run_end = k_sorted != nxt

    zeros = jnp.zeros((num_segments, L), vals.dtype)
    tgt_end = jnp.where(run_end, k_sorted, jnp.int32(num_segments))
    ends = zeros.at[tgt_end].set(prefix, mode="drop")
    # the run-end prefix of segment s is also "everything before" the NEXT
    # present segment: scatter it there and subtract
    tgt_prev = jnp.where(run_end, nxt, jnp.int32(num_segments))
    prevs = zeros.at[tgt_prev].set(prefix, mode="drop")
    return l_sub(ctx, ends, prevs)
