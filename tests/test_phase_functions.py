"""Phase function + inverse CDF tests against Henyey-Greenstein closed forms.

The HG phase function has analytic values, moments g**l, and an analytic
inverse CDF — the unit-test oracle recommended by SURVEY.md section 4.
"""

import numpy as np
import pytest

from i3rc_tpu.core.inverse_phase import inverse_phase_function
from i3rc_tpu.core.phase_functions import (
    PhaseFunction,
    PhaseFunctionTable,
    henyey_greenstein_coefficients,
    henyey_greenstein_values,
    normalize_phase_function,
)
from i3rc_tpu.utils.errors import ValidationError


def hg_inverse_cdf(g, p):
    """Analytic HG inverse: mu given cumulative probability p in [0, 1].

    CDF(mu) = (1-g^2)/(2g) * (1/sqrt(1+g^2-2g*mu') ...) inverted:
    mu = (1 + g^2 - ((1-g^2)/(1-g+2g p))^2) / (2g), with p measured from
    mu = -1 (backscatter).
    """
    t = (1 - g**2) / (1 - g + 2 * g * p)
    return (1 + g**2 - t**2) / (2 * g)


G = 0.85


def test_hg_moments_match_tabulated_values():
    angles = np.linspace(0, np.pi, 20001)
    pf_mom = PhaseFunction.from_legendre(henyey_greenstein_coefficients(G, 128))
    pf_tab = PhaseFunction.from_tabulated(angles, henyey_greenstein_values(G, angles))
    test_angles = np.linspace(0.05, np.pi, 50)  # forward peak needs >128 moments
    v_mom = pf_mom.values(test_angles)
    v_tab = pf_tab.values(test_angles)
    np.testing.assert_allclose(v_mom, v_tab, rtol=2e-3)


def test_values_normalized_to_two():
    angles = np.linspace(0, np.pi, 4001)
    pf = PhaseFunction.from_tabulated(angles, 3.7 * henyey_greenstein_values(G, angles))
    mus = np.cos(angles)
    vals = pf.values(angles)
    integral = -np.trapezoid(vals, mus)
    np.testing.assert_allclose(integral, 2.0, rtol=1e-6)


def test_legendre_projection_roundtrip():
    pf = PhaseFunction.from_legendre(henyey_greenstein_coefficients(0.5, 32))
    coeffs = pf.legendre_projection(16)
    np.testing.assert_allclose(coeffs, 0.5 ** np.arange(1, 17), rtol=1e-10)
    # Projection of a tabulated HG recovers g**l
    angles = np.linspace(0, np.pi, 8001)
    pf_tab = PhaseFunction.from_tabulated(angles, henyey_greenstein_values(0.5, angles))
    coeffs_tab = pf_tab.legendre_projection(8)
    np.testing.assert_allclose(coeffs_tab, 0.5 ** np.arange(1, 9), rtol=1e-3)


def test_isotropic_value():
    pf = PhaseFunction.from_legendre(np.zeros(0))
    np.testing.assert_allclose(pf.values(np.linspace(0, np.pi, 5)), 0.5)


def test_inverse_cdf_matches_analytic_hg():
    angles = np.linspace(0, np.pi, 20001)
    pf = PhaseFunction.from_tabulated(angles, henyey_greenstein_values(G, angles))
    n_steps = 2001
    inv = inverse_phase_function(pf, n_steps)
    p = np.arange(n_steps) / (n_steps - 1)
    # Table convention: p=0 -> backscatter (pi); analytic CDF measured from mu=-1
    mu_exact = hg_inverse_cdf(G, p)
    mu_table = np.cos(inv)
    np.testing.assert_allclose(mu_table[1:-1], mu_exact[1:-1], atol=2e-4)
    assert inv[0] == pytest.approx(np.pi, abs=1e-5)
    assert inv[-1] == 0.0


def test_inverse_cdf_isotropic_is_linear_in_mu():
    pf = PhaseFunction.from_legendre(np.zeros(0))
    inv = inverse_phase_function(pf, 101)
    p = np.arange(101) / 100
    np.testing.assert_allclose(np.cos(inv), 2 * p - 1, atol=1e-6)


def test_table_construction_and_eval():
    pfs = [PhaseFunction.from_legendre(henyey_greenstein_coefficients(g, 16),
                                       extinction=1.0 + g, single_scattering_albedo=0.9)
           for g in (0.3, 0.6)]
    table = PhaseFunctionTable.from_phase_functions(pfs, key=[5.0, 10.0])
    assert table.n_entries == 2
    vals = table.values(np.linspace(0, np.pi, 7))
    assert vals.shape == (7, 2)
    np.testing.assert_allclose(table.extinctions, [1.3, 1.6])


def test_validation_errors():
    with pytest.raises(ValidationError):
        PhaseFunction.from_legendre([1.5])  # g out of bounds
    with pytest.raises(ValidationError):
        angles = np.linspace(0.1, np.pi, 100)  # doesn't start at 0
        PhaseFunction.from_tabulated(angles, np.ones(100))
    with pytest.raises(ValidationError):
        PhaseFunctionTable.from_phase_functions(
            [PhaseFunction.from_legendre([0.5])] * 2, key=[2.0, 1.0])  # key not increasing


def test_normalize_helper_is_idempotent():
    angles = np.linspace(0, np.pi, 501)
    v = henyey_greenstein_values(0.2, angles)
    n1 = normalize_phase_function(angles, v)
    n2 = normalize_phase_function(angles, n1)
    np.testing.assert_allclose(n1, n2, rtol=1e-12)
