"""Distributed NTT: the four-step (Bailey) factorization over a device mesh.

The reference's polynomial engine is O(n^2) single-threaded host code; the
single-chip replacement is `ops/ntt.py`.  This module scales the long
dimension across chips (SURVEY.md §5 "long-context" analog): an NTT of size
n = n1*n2 becomes

    1. n2 column-NTTs of size n1           (local: data is column-sharded)
    2. pointwise twiddle scale w^(j2*k1)   (local)
    3. ONE transpose                       (the all-to-all over ICI)
    4. n1 row-NTTs of size n2              (local: data is now row-sharded)

With M[j1][j2] = a[n2*j1 + j2] (row-major reshape of the coefficients) the
output is X[k1 + n1*k2] = C[k1][k2] — i.e. the result comes back
*column-major* ("four-step order").  `ntt_sharded` returns the (n1, n2)
matrix C row-sharded; callers either consume it in four-step order (the MSM
can permute its CRS points once at setup) or gather + transpose for natural
order (`to_natural`).

Derivation: X_{k1+n1 k2} = sum_{j2} w^{j2 k1} w_{n2}^{j2 k2}
                              [ sum_{j1} a_{n2 j1 + j2} w_{n1}^{j1 k1} ].
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..field import params
from ..field.limb import FR_CTX, mont_mul
from ..ops import ntt as nttmod

L = params.NUM_LIMBS


class ShardedDomain:
    """Precomputed tables for a size-2^(log_n1+log_n2) four-step NTT."""

    def __init__(self, log_n1: int, log_n2: int):
        self.log_n1, self.log_n2 = log_n1, log_n2
        self.n1, self.n2 = 1 << log_n1, 1 << log_n2
        self.n = self.n1 * self.n2
        self.dom1 = nttmod.get_domain(log_n1)
        self.dom2 = nttmod.get_domain(log_n2)
        self.dom_full = nttmod.get_domain(log_n1 + log_n2)
        p = FR_CTX.p
        w = self.dom_full.omega
        w_inv = self.dom_full.omega_inv
        # twiddle matrices T[j2][k1] = w^(j2*k1), (n2, n1) — column j2-major
        # so the j2-sharded step-2 scale is a local slice
        self.tw = self._tw_matrix(w, p)
        self.tw_inv = self._tw_matrix(w_inv, p)
        self.n_inv_mont = jnp.asarray(
            FR_CTX.to_mont_np([pow(self.n, -1, p)])[0])

    def _tw_matrix(self, w: int, p: int) -> jnp.ndarray:
        rows = []
        for j2 in range(self.n2):
            base = pow(w, j2, p)
            acc, row = 1, []
            for _ in range(self.n1):
                row.append(acc)
                acc = acc * base % p
            rows.append(row)
        return jnp.asarray(FR_CTX.to_mont_np(rows))  # (n2, n1, L)


def _step_local(sd: ShardedDomain, cols: jnp.ndarray,
                tw_cols: jnp.ndarray) -> jnp.ndarray:
    """Steps 1-2 on a local column block: cols (n1, n2_local, L)."""
    # column NTTs of size n1: move columns to the leading axis
    block = jnp.moveaxis(cols, 1, 0)            # (n2_local, n1, L)
    block = jax.vmap(lambda v: nttmod.ntt(sd.dom1, v))(block)
    # twiddle scale: tw_cols is (n2_local, n1, L)
    return mont_mul(FR_CTX, block, tw_cols)      # (n2_local, n1, L)


def ntt_local_block(sd: ShardedDomain, axis: str, cols: jnp.ndarray,
                    tw_cols: jnp.ndarray) -> jnp.ndarray:
    """Four-step forward transform on *local* blocks — call INSIDE a
    shard_map.  cols: (n1, n2/d, L) M-layout local block; tw_cols:
    (n2/d, n1, L) local twiddle slice.  Returns (n1/d, n2, L) C-layout."""
    block = _step_local(sd, cols, tw_cols)    # (n2/d, n1, L)
    # step 3 — THE all-to-all: j2-sharding -> k1-sharding.  Split the
    # n1 axis into d chunks, concatenate along the j2 axis.
    blk = jax.lax.all_to_all(block, axis, split_axis=1, concat_axis=0,
                             tiled=True)      # (n2, n1/d, L)
    rows = jnp.moveaxis(blk, 1, 0)            # (n1/d, n2, L)
    return jax.vmap(lambda v: nttmod.ntt(sd.dom2, v))(rows)


def intt_local_block(sd: ShardedDomain, axis: str, rows: jnp.ndarray,
                     tw_cols: jnp.ndarray) -> jnp.ndarray:
    """Inverse four-step on local blocks — call INSIDE a shard_map.
    rows: (n1/d, n2, L) C-layout local block; tw_cols: (n2/d, n1, L)
    INVERSE twiddle slice.  Returns (n1, n2/d, L) M-layout."""
    r = jax.vmap(lambda v: nttmod.intt(sd.dom2, v))(rows)
    blk = jnp.moveaxis(r, 0, 1)               # (n2, n1/d, L)
    blk = jax.lax.all_to_all(blk, axis, split_axis=0, concat_axis=1,
                             tiled=True)      # (n2/d, n1, L)
    blk = mont_mul(FR_CTX, blk, tw_cols)
    blk = jax.vmap(lambda v: nttmod.intt(sd.dom1, v))(blk)
    return jnp.moveaxis(blk, 0, 1)            # (n1, n2/d, L)


def ntt_sharded(mesh: Mesh, sd: ShardedDomain, m: jnp.ndarray,
                axis: str = "shard") -> jnp.ndarray:
    """Four-step NTT over the mesh.

    m: (n1, n2, L) coefficient matrix (M[j1][j2] = a[n2*j1 + j2]),
    column-sharded (PartitionSpec(None, axis)).  Returns C of shape
    (n1, n2, L), row-sharded (PartitionSpec(axis)), where the full NTT in
    natural order is X[k1 + n1*k2] = C[k1][k2].
    """
    n_dev = mesh.shape[axis]
    assert sd.n2 % n_dev == 0 and sd.n1 % n_dev == 0

    fn = shard_map(
        partial(ntt_local_block, sd, axis), mesh=mesh,
        in_specs=(P(None, axis), P(axis)),
        out_specs=P(axis),
        check_rep=False,
    )
    return fn(m, sd.tw)


def intt_sharded(mesh: Mesh, sd: ShardedDomain, c: jnp.ndarray,
                 axis: str = "shard") -> jnp.ndarray:
    """Inverse four-step transform.

    Takes C (n1, n2, L) in the *output layout* of `ntt_sharded` (row-
    sharded, four-step order) and returns the coefficient matrix M
    (n1, n2, L) column-sharded — the exact inverse of `ntt_sharded`.

    Implementation: run the four-step network with inverse twiddles in the
    reverse direction (rows first, transpose, columns last).
    """
    n_dev = mesh.shape[axis]
    assert sd.n2 % n_dev == 0 and sd.n1 % n_dev == 0

    fn = shard_map(
        partial(intt_local_block, sd, axis), mesh=mesh,
        in_specs=(P(axis), P(axis)),
        out_specs=P(None, axis),
        check_rep=False,
    )
    return fn(c, sd.tw_inv)


def to_natural(sd: ShardedDomain, c: jnp.ndarray) -> jnp.ndarray:
    """(n1, n2, L) four-step output -> (n,) natural order (gathers)."""
    return jnp.moveaxis(c, 0, 1).reshape(sd.n, L)


def from_coeffs(sd: ShardedDomain, a: jnp.ndarray) -> jnp.ndarray:
    """(n, L) natural-order coefficients -> (n1, n2, L) input matrix."""
    return a.reshape(sd.n1, sd.n2, L)


# ---------------------------------------------------------------------------
# contiguous-shard layouts (for co-sharding CRS points with transform output)
# ---------------------------------------------------------------------------

def eval_perm(sd: ShardedDomain, n_dev: int) -> np.ndarray:
    """C-layout: perm[p] = natural evaluation index at contiguous global
    position p when the (n1, n2) matrix is row(k1)-sharded over n_dev
    chips.  Position p = (dev, k1_local, k2) row-major; index k = k1+n1*k2.
    """
    n1d = sd.n1 // n_dev
    dev, k1l, k2 = np.meshgrid(
        np.arange(n_dev), np.arange(n1d), np.arange(sd.n2), indexing="ij")
    return ((dev * n1d + k1l) + sd.n1 * k2).reshape(-1).astype(np.int32)


def coeff_perm(sd: ShardedDomain, n_dev: int) -> np.ndarray:
    """M-layout: perm[p] = natural coefficient index at contiguous global
    position p when the (n1, n2) matrix is column(j2)-sharded.  Position
    p = (dev, j1, j2_local) row-major; index j = n2*j1 + j2."""
    n2d = sd.n2 // n_dev
    dev, j1, j2l = np.meshgrid(
        np.arange(n_dev), np.arange(sd.n1), np.arange(n2d), indexing="ij")
    return (sd.n2 * j1 + (dev * n2d + j2l)).reshape(-1).astype(np.int32)
