"""Device prover vs host protocol oracle: bit-exact CRS and proofs under a
pinned trapdoor/blinding (simple.zk; compiled graphs come from the cache).
"""

import pytest

jnp = pytest.importorskip("jax.numpy")

from zksnark_tpu.curve import jacobian as jac  # noqa: E402
from zksnark_tpu.curve.field_ops import FQ2_OPS, FQ_OPS  # noqa: E402
from zksnark_tpu.field.host import FR  # noqa: E402
from zksnark_tpu.frontend import compiler, witness  # noqa: E402
from zksnark_tpu.frontend.r1cs import R1CS  # noqa: E402
from zksnark_tpu.groth16 import protocol, prover  # noqa: E402
from zksnark_tpu.groth16.backend import BN254Backend  # noqa: E402
from zksnark_tpu.groth16.qap import from_r1cs  # noqa: E402

TD = (111, 222, 333, 444, 555)
BL = (666, 777)


@pytest.fixture(scope="module")
def setup_all():
    be = BN254Backend()
    code = open("test_programs/simple.zk").read()
    r1cs = compiler.parse(code, FR)
    w = witness.weights(code, [3, 2, 4], FR)
    dqap = prover.compile_r1cs(r1cs)
    dcrs = prover.device_setup(dqap, trapdoor=TD)

    roots = prover.domain_roots(dqap.domain)
    host_r1cs = R1CS(
        u=[[(roots[ri - 1], v) for (ri, v) in row] for row in r1cs.u],
        v=[[(roots[ri - 1], v) for (ri, v) in row] for row in r1cs.v],
        w=[[(roots[ri - 1], v) for (ri, v) in row] for row in r1cs.w],
        roots=roots, input=r1cs.input)
    qap_host = from_r1cs(FR, host_r1cs)
    crs_host = protocol.setup(be, qap_host, trapdoor=TD)
    return be, w, dqap, dcrs, qap_host, crs_host


def test_device_setup_matches_host(setup_all):
    be, w, dqap, dcrs, qap_host, crs_host = setup_all
    sg1_h, sg2_h = crs_host
    assert dcrs.sigmag1.alpha == sg1_h.alpha
    assert dcrs.sigmag1.beta == sg1_h.beta
    assert dcrs.sigmag1.delta == sg1_h.delta
    assert dcrs.sigmag1.sum_gamma == sg1_h.sum_gamma
    assert dcrs.sigmag2.beta == sg2_h.beta
    assert dcrs.sigmag2.gamma == sg2_h.gamma
    assert dcrs.sigmag2.delta == sg2_h.delta
    assert list(jac.to_affine_np(FQ_OPS, dcrs.xi_g1)) == sg1_h.xi
    assert list(jac.to_affine_np(FQ_OPS, dcrs.xi_t_g1)) == sg1_h.xi_t
    assert list(jac.to_affine_np(FQ_OPS, dcrs.sum_delta_g1)) == \
        sg1_h.sum_delta
    xi2 = jac.to_affine_np(FQ2_OPS, dcrs.xi_g2)
    assert [tuple(map(tuple, p)) if p else None for p in xi2] == sg2_h.xi


def test_device_prove_bit_exact(setup_all):
    be, w, dqap, dcrs, qap_host, crs_host = setup_all
    proof_dev = prover.device_prove(dqap, dcrs, w, blinding=BL)
    proof_host = protocol.prove(be, qap_host, crs_host, w, blinding=BL)
    assert proof_dev == proof_host
    assert protocol.verify(be, (dcrs.sigmag1, dcrs.sigmag2), [2, 34],
                           proof_dev)
    assert not protocol.verify(be, (dcrs.sigmag1, dcrs.sigmag2), [2, 35],
                               proof_dev)


def test_device_crs_checkpoint_roundtrip(setup_all, tmp_path):
    be, w, dqap, dcrs, qap_host, crs_host = setup_all
    from zksnark_tpu.utils import serialization as ser

    path = str(tmp_path / "crs.npz")
    ser.device_crs_save(path, dcrs)
    dcrs2 = ser.device_crs_load(path)
    proof = prover.device_prove(dqap, dcrs2, w, blinding=BL)
    assert protocol.verify(be, (dcrs2.sigmag1, dcrs2.sigmag2), [2, 34],
                           proof)
