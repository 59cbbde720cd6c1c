"""Checkpoint / interchange formats for CRS, proofs and witnesses.

The reference has NO serialization at all — proofs cannot leave the process
(SURVEY.md §5 "Checkpoint/resume: none").  This module defines documented,
versioned layouts:

- JSON (hex-encoded field elements) for small artifacts: proofs, public
  inputs, the host Sigma parts.  G1 points are [x, y] (null = infinity);
  G2 points are [[x0, x1], [y0, y1]] over Fq2.
- ``.npz`` for the big device CRS arrays (raw 32x8-bit digit tensors,
  Montgomery form, little-endian digit order — the `field.limb` layout;
  X/Y in f32 lanes, Z compressed to uint8 digits per the normalized
  Z in {0, one} invariant, `curve.jacobian.compress_z`) — the prover
  memory-maps these straight back to the device.
"""

from __future__ import annotations

import json
from typing import Optional

import numpy as np

from ..groth16.protocol import Proof, SigmaG1, SigmaG2

FORMAT_VERSION = 1


def _enc_g1(p) -> Optional[object]:
    """G1 affine (x, y), or a plain int for the Z251 mock backend."""
    if p is None:
        return None
    if isinstance(p, int):
        return hex(p)
    return [hex(p[0]), hex(p[1])]


def _dec_g1(v):
    if v is None:
        return None
    if isinstance(v, str):
        return int(v, 16)
    return (int(v[0], 16), int(v[1], 16))


def _enc_g2(p) -> Optional[object]:
    if p is None:
        return None
    if isinstance(p, int):
        return hex(p)
    (x0, x1), (y0, y1) = p
    return [[hex(x0), hex(x1)], [hex(y0), hex(y1)]]


def _dec_g2(v):
    if v is None:
        return None
    if isinstance(v, str):
        return int(v, 16)
    return ((int(v[0][0], 16), int(v[0][1], 16)),
            (int(v[1][0], 16), int(v[1][1], 16)))


def proof_to_json(proof: Proof) -> str:
    return json.dumps({
        "version": FORMAT_VERSION,
        "curve": "bn254",
        "a": _enc_g1(proof.a),
        "b": _enc_g2(proof.b),
        "c": _enc_g1(proof.c),
    })


def proof_from_json(s: str) -> Proof:
    d = json.loads(s)
    assert d["version"] == FORMAT_VERSION
    return Proof(a=_dec_g1(d["a"]), b=_dec_g2(d["b"]), c=_dec_g1(d["c"]))


def crs_to_json(sigmag1: SigmaG1, sigmag2: SigmaG2) -> str:
    """Full host CRS (including xi lists when present)."""

    def g1_list(v):
        return None if v is None else [_enc_g1(p) for p in v]

    return json.dumps({
        "version": FORMAT_VERSION,
        "curve": "bn254",
        "g1": {
            "alpha": _enc_g1(sigmag1.alpha),
            "beta": _enc_g1(sigmag1.beta),
            "delta": _enc_g1(sigmag1.delta),
            "xi": g1_list(sigmag1.xi),
            "sum_gamma": g1_list(sigmag1.sum_gamma),
            "sum_delta": g1_list(sigmag1.sum_delta),
            "xi_t": g1_list(sigmag1.xi_t),
        },
        "g2": {
            "beta": _enc_g2(sigmag2.beta),
            "gamma": _enc_g2(sigmag2.gamma),
            "delta": _enc_g2(sigmag2.delta),
            "xi": None if sigmag2.xi is None else
            [_enc_g2(p) for p in sigmag2.xi],
        },
    })


def crs_from_json(s: str):
    d = json.loads(s)
    assert d["version"] == FORMAT_VERSION

    def g1_list(v):
        return None if v is None else [_dec_g1(p) for p in v]

    g1, g2 = d["g1"], d["g2"]
    sigmag1 = SigmaG1(
        alpha=_dec_g1(g1["alpha"]), beta=_dec_g1(g1["beta"]),
        delta=_dec_g1(g1["delta"]), xi=g1_list(g1["xi"]),
        sum_gamma=g1_list(g1["sum_gamma"]),
        sum_delta=g1_list(g1["sum_delta"]), xi_t=g1_list(g1["xi_t"]))
    sigmag2 = SigmaG2(
        beta=_dec_g2(g2["beta"]), gamma=_dec_g2(g2["gamma"]),
        delta=_dec_g2(g2["delta"]),
        xi=None if g2["xi"] is None else [_dec_g2(p) for p in g2["xi"]])
    return sigmag1, sigmag2


def witness_to_json(weights) -> str:
    return json.dumps({"version": FORMAT_VERSION,
                       "weights": [hex(w) for w in weights]})


def witness_from_json(s: str):
    d = json.loads(s)
    assert d["version"] == FORMAT_VERSION
    return [int(w, 16) for w in d["weights"]]


def device_crs_save(path: str, dcrs) -> None:
    """Persist the device CRS arrays + host Sigma parts (checkpoint)."""
    np.savez_compressed(
        path,
        xi_g1_x=np.asarray(dcrs.xi_g1.x), xi_g1_y=np.asarray(dcrs.xi_g1.y),
        xi_g1_z=np.asarray(dcrs.xi_g1.z),
        xi_t_x=np.asarray(dcrs.xi_t_g1.x), xi_t_y=np.asarray(dcrs.xi_t_g1.y),
        xi_t_z=np.asarray(dcrs.xi_t_g1.z),
        sd_x=np.asarray(dcrs.sum_delta_g1.x),
        sd_y=np.asarray(dcrs.sum_delta_g1.y),
        sd_z=np.asarray(dcrs.sum_delta_g1.z),
        xi_g2_x=np.asarray(dcrs.xi_g2.x), xi_g2_y=np.asarray(dcrs.xi_g2.y),
        xi_g2_z=np.asarray(dcrs.xi_g2.z),
        host_sigma=np.frombuffer(
            crs_to_json(dcrs.sigmag1, dcrs.sigmag2).encode(), dtype=np.uint8),
    )


def device_crs_load(path: str):
    """Load a device CRS checkpoint -> groth16.prover.DeviceCRS."""
    import jax.numpy as jnp

    from ..curve.jacobian import JPoint
    from ..groth16.prover import DeviceCRS

    from ..curve import jacobian as jac
    from ..curve.field_ops import FQ2_OPS, FQ_OPS

    z = np.load(path)
    sigmag1, sigmag2 = crs_from_json(bytes(z["host_sigma"]).decode())

    # re-establish the DeviceCRS invariant (Z in {0, one}) regardless of
    # how the checkpoint was produced — the prover's MSMs rely on it.
    # Z is widened to the field dtype for the normalize math and stored
    # back compressed (uint8 digits; see jacobian.compress_z)
    def norm(ops, x, y, zz):
        zj = jnp.asarray(zz)
        xj = jnp.asarray(x)
        return jac.compress_z(jac.batch_normalize(ops, JPoint(
            xj, jnp.asarray(y), zj.astype(xj.dtype))))

    return DeviceCRS(
        xi_g1=norm(FQ_OPS, z["xi_g1_x"], z["xi_g1_y"], z["xi_g1_z"]),
        xi_t_g1=norm(FQ_OPS, z["xi_t_x"], z["xi_t_y"], z["xi_t_z"]),
        sum_delta_g1=norm(FQ_OPS, z["sd_x"], z["sd_y"], z["sd_z"]),
        xi_g2=norm(FQ2_OPS, z["xi_g2_x"], z["xi_g2_y"], z["xi_g2_z"]),
        sigmag1=sigmag1, sigmag2=sigmag2)
