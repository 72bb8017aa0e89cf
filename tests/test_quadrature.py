"""Unit tests for the numeric core against closed forms."""

import numpy as np

from i3rc_tpu.core.quadrature import (
    find_index,
    gauss_legendre,
    legendre_polynomials,
    lobatto,
)


def test_legendre_polynomials_closed_forms():
    mus = np.linspace(-1, 1, 11)
    p = legendre_polynomials(3, mus)
    np.testing.assert_allclose(p[0], 1.0)
    np.testing.assert_allclose(p[1], mus)
    np.testing.assert_allclose(p[2], 0.5 * (3 * mus**2 - 1), atol=1e-14)
    np.testing.assert_allclose(p[3], 0.5 * (5 * mus**3 - 3 * mus), atol=1e-14)


def test_gauss_legendre_integrates_polynomials():
    mus, w = gauss_legendre(8)
    # Exact for polynomials up to degree 15
    for k in range(0, 16, 2):
        np.testing.assert_allclose(np.sum(w * mus**k), 2.0 / (k + 1), rtol=1e-12)
    for k in range(1, 16, 2):
        np.testing.assert_allclose(np.sum(w * mus**k), 0.0, atol=1e-13)


def test_lobatto_includes_endpoints_and_integrates():
    mus, w = lobatto(9)
    assert mus[0] == -1.0 and mus[-1] == 1.0
    assert np.all(np.diff(mus) > 0)
    np.testing.assert_allclose(np.sum(w), 2.0, rtol=1e-12)
    # n-point Lobatto exact to degree 2n-3 = 15
    for k in range(0, 16, 2):
        np.testing.assert_allclose(np.sum(w * mus**k), 2.0 / (k + 1), rtol=1e-10)


def test_lobatto_small_orders():
    mus, w = lobatto(2)
    np.testing.assert_allclose(mus, [-1, 1])
    np.testing.assert_allclose(w, [1, 1])
    mus3, w3 = lobatto(3)
    np.testing.assert_allclose(mus3, [-1, 0, 1], atol=1e-14)
    np.testing.assert_allclose(w3, [1 / 3, 4 / 3, 1 / 3], rtol=1e-12)


def test_find_index_contract():
    table = np.array([0.0, 1.0, 2.0, 5.0])
    assert find_index(0.5, table) == 0
    assert find_index(1.0, table) == 1
    assert find_index(4.99, table) == 2
    # Clipped at the ends so (i, i+1) is always a valid interval
    assert find_index(-1.0, table) == 0
    assert find_index(7.0, table) == 2
    np.testing.assert_array_equal(find_index(np.array([0.1, 3.0]), table), [0, 2])
