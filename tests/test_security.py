"""Security accounting tests (hectr_tpu.ckks.security).

The reference makes no security statement anywhere (its logn=12,
q=2^109 at src/ctr.c:514-517 happens to sit exactly at the HE
standard's 128-bit ceiling for N=4096).  Here every preset's derived
RNS chain is checked against the published table.
"""

import pytest

from hectr_tpu.config import (
    FLAGSHIP,
    FLAGSHIP_QP,
    MEDIUM,
    PRESETS,
    REFERENCE_HEMPC,
    REFERENCE_HEMPC_SECURE,
    CKKSPreset,
)
from hectr_tpu.ckks.security import (
    HE_STANDARD_MAX_LOGQP,
    assert_security,
    modulus_bits,
    security_report,
)


def test_production_presets_meet_128():
    for preset in (MEDIUM, FLAGSHIP, FLAGSHIP_QP, REFERENCE_HEMPC_SECURE):
        rep = assert_security(preset, 128)
        assert rep.meets_128, rep
        assert rep.est_bits >= 128.0


def test_flagship_chain_documented_values():
    # DESIGN.md documents these numbers; keep them honest.
    log_q, log_qp = modulus_bits(FLAGSHIP)
    assert log_qp <= HE_STANDARD_MAX_LOGQP[128][15] == 881
    assert 550 <= log_q <= 570        # 2x30 base + 20 x ~25-bit scale
    assert log_qp - log_q == 60       # 2 x 30-bit special primes


def test_reference_parity_preset_is_flagged():
    # The RNS realization of the reference's parameters exceeds the
    # 128-bit ceiling at N=4096 -- the module must SAY so, not hide it.
    rep = security_report(REFERENCE_HEMPC)
    assert not rep.meets_128
    assert 80.0 <= rep.est_bits < 128.0
    with pytest.raises(ValueError, match="does not meet 128-bit"):
        assert_security(REFERENCE_HEMPC, 128)


def test_secure_variant_preserves_functional_shape():
    assert REFERENCE_HEMPC_SECURE.slots == REFERENCE_HEMPC.slots
    assert REFERENCE_HEMPC_SECURE.scale_bits == REFERENCE_HEMPC.scale_bits
    assert REFERENCE_HEMPC_SECURE.mult_depth == REFERENCE_HEMPC.mult_depth
    assert REFERENCE_HEMPC_SECURE.logn > REFERENCE_HEMPC.logn


def test_every_registered_preset_has_a_report():
    for preset in PRESETS.values():
        rep = security_report(preset)
        assert rep.log_qp >= rep.log_q > 0


def test_interpolation_monotone_and_anchored():
    from hectr_tpu.ckks.security import _interp_security

    # anchored at the table rows...
    for logn in (12, 14, 15):
        assert _interp_security(logn, HE_STANDARD_MAX_LOGQP[128][logn]) == 128
        assert _interp_security(logn, HE_STANDARD_MAX_LOGQP[192][logn]) == 192
    # ...and monotone nonincreasing in logQP
    vals = [_interp_security(15, q) for q in range(400, 1200, 50)]
    assert all(a >= b for a, b in zip(vals, vals[1:]))


def test_unknown_degree_rejected():
    p = CKKSPreset(name="tiny", logn=9, slots=4, scale_bits=30,
                   limb_bits=25, mult_depth=1)
    with pytest.raises(ValueError, match="no HE-standard row"):
        security_report(p)
