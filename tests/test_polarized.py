"""Polarized (Stokes-vector) transport tests.

Gates for integrators/polarized.py + core/phase_matrices.py (the
reference's Wishlist item 3, Wishlist.txt:20-31 — never built in the
Fortran, so every oracle here is analytic or a scalar-kernel
cross-check):

  * Rayleigh matrix values/normalization and the 100%-polarization limit
  * Mie matrix consistency with the scalar Mie intensity + physical bounds
  * conservative energy closure with Stokes weights in play
  * single-scattering Stokes radiances vs the analytic first-order
    solution (I from the same formula the scalar suite pins; Q/U from
    the rotated phase matrix), including the azimuth mirror symmetry
    U(phi) = -U(-phi) and V == 0 for unpolarized Rayleigh
  * de-polarizing "identity" matrix == scalar kernel (flux + radiance)
  * Lambertian reflection depolarizes
"""

import numpy as np
import jax
import pytest

from i3rc_tpu.core.illumination import PhotonSource
from i3rc_tpu.core.optics import Domain
from i3rc_tpu.core.phase_functions import PhaseFunction, PhaseFunctionTable
from i3rc_tpu.core.phase_matrices import (
    PhaseMatrix,
    PhaseMatrixTable,
    rayleigh_matrix_values,
)
from i3rc_tpu.integrators.config import IntegratorConfig
from i3rc_tpu.integrators.integrator import Integrator
from i3rc_tpu.integrators.polarized import PolarizedIntegrator
from i3rc_tpu.utils.errors import ValidationError

N = 150_000


def rayleigh_slab(tau, ssa=1.0, depol=0.0, n_layers=2, thickness=250.0):
    tab = PhaseMatrixTable.from_phase_matrices(
        [PhaseMatrix.rayleigh(depolarization=depol)], [1.0])
    dom = Domain.create([0.0, 500.0], [0.0, 500.0],
                        np.linspace(0.0, thickness, n_layers + 1))
    ext = np.full((1, 1, n_layers), tau / thickness)
    return dom.add_component("rayleigh", ext, np.full_like(ext, ssa),
                             np.zeros(ext.shape, np.int32), tab)


# ---------------------------------------------------------------------------
# Phase-matrix core
# ---------------------------------------------------------------------------
def test_rayleigh_matrix_values():
    pm = PhaseMatrix.rayleigh()
    # Normalization: integral of a1 over mu = 2.
    mus = np.cos(pm.scattering_angle)
    assert -np.trapezoid(pm.a1, mus) == pytest.approx(2.0, abs=1e-9)
    # 90-degree scattering of unpolarized light is 100% polarized,
    # perpendicular to the scattering plane (b1/a1 = -1).
    assert pm.degree_of_polarization(np.array([np.pi / 2]))[0] == \
        pytest.approx(1.0, abs=1e-6)
    v = pm.values(np.array([0.0, np.pi / 2, np.pi]))
    assert v["a1"][0] == pytest.approx(1.5, rel=1e-3)
    assert v["b1"][0] == pytest.approx(0.0, abs=1e-9)
    assert v["a3"][1] == pytest.approx(0.0, abs=1e-3)
    # Depolarization lowers the 90-degree DoP: (1-d)... via the Delta factor.
    pm_d = PhaseMatrix.rayleigh(depolarization=0.1)
    dop = pm_d.degree_of_polarization(np.array([np.pi / 2]))[0]
    assert 0.7 < dop < 1.0


def test_mie_matrix_consistent_with_scalar_intensity():
    from i3rc_tpu.tools.mie import mie_coefficients, mie_intensity

    wl, m, r = 0.55, 1.33 + 0.0j, 0.8
    pm = PhaseMatrix.from_mie(wl, m, r)
    # a1 is the normalized (|S1|^2+|S2|^2)/2: same shape as mie_intensity.
    x = 2.0 * np.pi * r / wl
    a, b = mie_coefficients(x, m)
    raw = mie_intensity(a, b, np.cos(pm.scattering_angle))
    ratio = pm.a1 / np.maximum(raw, 1e-300)
    assert np.allclose(ratio, ratio[0], rtol=1e-9)   # one global scale
    # Physical bounds |b1|, |a2|, |a3|, |a4|, |b2| <= a1 hold everywhere.
    for el in (pm.b1, pm.a2, pm.a3, pm.a4, pm.b2):
        assert np.all(np.abs(el) <= pm.a1 * (1 + 1e-9) + 1e-12)
    # Spheres: a2 == a1 and a4 == a3 identically.
    np.testing.assert_allclose(pm.a2, pm.a1, rtol=1e-12)
    np.testing.assert_allclose(pm.a4, pm.a3, rtol=1e-12)
    # Rayleigh limit: a tiny sphere reproduces the analytic matrix.
    tiny = PhaseMatrix.from_mie(0.55, 1.33 + 0.0j, 0.002)
    ray = rayleigh_matrix_values(tiny.scattering_angle)
    np.testing.assert_allclose(tiny.a1, ray["a1"], atol=2e-3)
    np.testing.assert_allclose(tiny.b1, ray["b1"], atol=2e-3)


def test_phase_matrix_validation():
    ang = np.linspace(0.0, np.pi, 19)
    with pytest.raises(ValidationError):  # b1 > a1: unphysical
        PhaseMatrix.from_elements(ang, np.ones_like(ang),
                                  2.0 * np.ones_like(ang),
                                  np.ones_like(ang))
    with pytest.raises(ValidationError):  # bad angle grid
        PhaseMatrix.from_elements(ang[::-1], np.ones_like(ang),
                                  np.zeros_like(ang), np.ones_like(ang))
    # Scalar bridge: the P11 PhaseFunction integrates like a phase function.
    pm = PhaseMatrix.rayleigh()
    pf = pm.scalar
    assert isinstance(pf, PhaseFunction)
    tab = PhaseMatrixTable.from_phase_matrices([pm], [1.0])
    assert isinstance(tab.scalar, PhaseFunctionTable)
    assert tab.scalar.n_entries == 1


def test_polarized_requires_matrix_tables():
    from i3rc_tpu.core.phase_functions import henyey_greenstein_coefficients

    pf = PhaseFunction.from_legendre(henyey_greenstein_coefficients(0.5, 16))
    tab = PhaseFunctionTable.from_phase_functions([pf], key=[1.0])
    dom = Domain.create([0, 500.0], [0, 500.0], [0.0, 250.0])
    ext = np.full((1, 1, 1), 1 / 250.0)
    dom = dom.add_component("c", ext, np.ones_like(ext),
                            np.zeros(ext.shape, np.int32), tab)
    with pytest.raises(ValidationError):
        PolarizedIntegrator.create(dom)


# ---------------------------------------------------------------------------
# Transport
# ---------------------------------------------------------------------------
def test_polarized_energy_closure():
    """Conservative Rayleigh slab: Fup + Fdn == 1 (statistical — the
    polarized-ratio weight multiplier has expectation 1 per event)."""
    dom = rayleigh_slab(tau=1.0)
    integ = PolarizedIntegrator.create(dom, config=IntegratorConfig(
        max_events=200))
    res = integ.compute(jax.random.PRNGKey(0),
                        PhotonSource.directional(0.5, 0.0), N)
    closure = float(res.mean_flux_up + res.mean_flux_down)
    assert closure == pytest.approx(1.0, abs=4e-3)
    assert int(res.n_bad) == 0


def _expected_single_scatter(tau, mu0_dir, det, depol=0.0):
    """First-order Stokes toward ``det`` in the detector meridian frame.

    INDEPENDENT geometric oracle — deliberately shares no frame-rotation
    machinery with the kernel (an earlier version replicated the kernel's
    alignment formula and could not catch its sign error): the polarized
    part of singly-scattered light lies along the scattering-plane NORMAL
    n = u x det (b1 < 0: polarization perpendicular to the plane), with
    magnitude -b1 x geometry.  Q/U follow from the polarization angle psi
    of n against the meridian basis: Q = Ip cos 2psi, U = Ip sin 2psi.
    I uses the same closed form the scalar suite pins
    (test_integrator.test_single_scattering_radiance).
    """
    cos_t = mu0_dir @ det
    e = rayleigh_matrix_values(np.array([np.arccos(np.clip(cos_t, -1, 1))]),
                               depol)
    mu = det[2]
    mu0 = -mu0_dir[2]
    if mu > 0:
        geom = (1 - np.exp(-tau * (1 / mu + 1 / mu0))) / (4 * np.pi * (mu + mu0))
    else:
        am = abs(mu)
        geom = (np.exp(-tau / mu0) - np.exp(-tau / am)) / (4 * np.pi) / (mu0 - am)
    i_d = e["a1"][0] * geom
    n = np.cross(mu0_dir, det)
    nn = np.linalg.norm(n)
    if nn < 1e-9:          # forward/backward: no polarization (b1 -> 0)
        return np.array([i_d, 0.0, 0.0, 0.0])
    n = n / nn
    z = np.array([0.0, 0.0, 1.0])
    m1 = z - det * det[2]
    if np.linalg.norm(m1) < 1e-6:
        m1 = np.array([1.0, 0.0, 0.0]) - det * det[0]
    m1 = m1 / np.linalg.norm(m1)
    m2 = np.cross(det, m1)
    cpsi = n @ m1
    spsi = n @ m2
    ip = -e["b1"][0] * geom         # b1 <= 0 for Rayleigh: Ip >= 0
    q_d = ip * (cpsi * cpsi - spsi * spsi)
    u_d = ip * (2.0 * cpsi * spsi)
    return np.array([i_d, q_d, u_d, 0.0])


def test_single_scattering_polarized_rayleigh():
    """Thin Rayleigh slab, max_events=1: Stokes radiances match the
    analytic first-order solution, including the meridian-frame rotation
    for detectors at nonzero relative azimuth."""
    tau, mu0 = 0.2, 0.6
    mus_det = np.array([0.8, 0.4, 0.4, -0.7])
    phis_det = np.array([0.0, 60.0, 300.0, 0.0])
    dom = rayleigh_slab(tau)
    integ = PolarizedIntegrator.create(
        dom, config=IntegratorConfig(max_events=1),
        intensity_mus=mus_det, intensity_phis=phis_det)
    res = integ.compute(jax.random.PRNGKey(3),
                        PhotonSource.directional(mu0, 0.0), 4 * N)
    got = np.asarray(res.mean_intensity)          # (D, 4)

    s0 = np.sqrt(1 - mu0 ** 2)
    d0 = np.array([s0, 0.0, -mu0])
    for i, (mu, phi) in enumerate(zip(mus_det, np.deg2rad(phis_det))):
        sd = np.sqrt(1 - mu ** 2)
        det = np.array([sd * np.cos(phi), sd * np.sin(phi), mu])
        exp = _expected_single_scatter(tau, d0, det)
        assert got[i, 0] == pytest.approx(exp[0], rel=0.02), (i, got[i], exp)
        # Q/U: absolute tolerance scaled to I (they pass through the same
        # estimator; 2% of I bounds MC noise + table resolution).
        assert got[i, 1] == pytest.approx(exp[1], abs=0.02 * exp[0]), \
            (i, got[i], exp)
        assert got[i, 2] == pytest.approx(exp[2], abs=0.02 * exp[0]), \
            (i, got[i], exp)
        assert abs(got[i, 3]) < 0.01 * exp[0]     # V == 0 for Rayleigh
    # Azimuth mirror symmetry: U flips sign between phi = +60 and -60,
    # Q and I agree.
    assert got[1, 0] == pytest.approx(got[2, 0], rel=0.03)
    assert got[1, 1] == pytest.approx(got[2, 1], abs=0.02 * got[1, 0])
    assert got[1, 2] == pytest.approx(-got[2, 2], abs=0.02 * got[1, 0])
    # The 90-degree-ish geometry is strongly polarized the right way:
    # Q < 0 (perpendicular to the meridian plane) for the phi=0 detector.
    assert got[0, 1] < -0.1 * got[0, 0]


def test_identity_matrix_matches_scalar_kernel():
    """A matrix with b1=0, a2=a3=a4=a1 leaves Stokes untouched: the
    polarized kernel must reproduce the scalar kernel's flux AND radiance
    (same P11, both kernels, two-sample statistical gate)."""
    ang = np.linspace(0.0, np.pi, 181)
    vals = rayleigh_matrix_values(ang)["a1"]       # any smooth P11 works
    pm = PhaseMatrix.from_elements(ang, vals, np.zeros_like(vals), vals,
                                   a2=vals, a4=vals)
    mtab = PhaseMatrixTable.from_phase_matrices([pm], [1.0])
    stab = mtab.scalar
    mus_det, phis_det = [0.7], [30.0]

    dom = Domain.create([0.0, 500.0], [0.0, 500.0],
                        np.linspace(0.0, 250.0, 3))
    ext = np.full((1, 1, 2), 2.0 / 250.0)
    dom_m = dom.add_component("c", ext, np.full_like(ext, 0.9),
                              np.zeros(ext.shape, np.int32), mtab)
    dom_s = dom.add_component("c", ext, np.full_like(ext, 0.9),
                              np.zeros(ext.shape, np.int32), stab)

    pol = PolarizedIntegrator.create(
        dom_m, config=IntegratorConfig(max_events=200),
        intensity_mus=mus_det, intensity_phis=phis_det)
    res_p = pol.compute(jax.random.PRNGKey(11),
                        PhotonSource.directional(0.5, 0.0), N)
    sca = Integrator.create(
        dom_s, config=IntegratorConfig(use_ray_tracing=False, max_events=200,
                                       use_fastpath=False),
        intensity_mus=mus_det, intensity_phis=phis_det)
    res_s = sca.compute(jax.random.PRNGKey(12),
                        PhotonSource.directional(0.5, 0.0), N)

    sig = 2.0 / np.sqrt(N)   # generous two-sample bound on O(0.5) fluxes
    assert float(res_p.mean_flux_up) == pytest.approx(
        float(res_s.mean_flux_up), abs=4 * sig)
    assert float(res_p.mean_flux_down) == pytest.approx(
        float(res_s.mean_flux_down), abs=4 * sig)
    assert float(res_p.mean_flux_absorbed) == pytest.approx(
        float(res_s.mean_flux_absorbed), abs=4 * sig)
    i_p = float(np.asarray(res_p.mean_intensity)[0, 0])
    i_s = float(np.asarray(res_s.mean_intensity)[0])
    assert i_p == pytest.approx(i_s, rel=0.04)
    # No spurious polarization from a polarization-neutral matrix.
    s = np.asarray(res_p.mean_intensity)[0]
    assert abs(s[1]) < 0.01 * s[0]
    assert abs(s[2]) < 0.01 * s[0]


def test_lambertian_surface_depolarizes():
    """Optically thin Rayleigh over a bright Lambertian surface: the
    upwelling radiance is dominated by depolarized surface reflection, so
    its DoP must sit well below the single-scattering DoP of the same
    geometry; flux bookkeeping stays closed with the albedo in play."""
    tau = 0.1
    dom = rayleigh_slab(tau=tau)
    integ = PolarizedIntegrator.create(
        dom, config=IntegratorConfig(max_events=100), surface_albedo=0.8,
        intensity_mus=[0.6], intensity_phis=[0.0])
    res = integ.compute(jax.random.PRNGKey(7),
                        PhotonSource.directional(0.6, 0.0), N)
    dop = float(res.degree_of_polarization[0])
    assert dop < 0.2
    # Sanity: the surface bounce feeds the detector (radiance well above
    # the single-scatter-only level).
    no_surf = PolarizedIntegrator.create(
        dom, config=IntegratorConfig(max_events=100),
        intensity_mus=[0.6], intensity_phis=[0.0])
    res0 = no_surf.compute(jax.random.PRNGKey(7),
                           PhotonSource.directional(0.6, 0.0), N)
    assert float(res.mean_intensity[0, 0]) > \
        2.0 * float(res0.mean_intensity[0, 0])


def test_polarized_source_circular():
    """A fully circular (V = I) source stays circular through forward/back
    Rayleigh scattering orders in the a4 proportion; detector V has the
    right sign for near-forward geometry (a4 > 0 there)."""
    tau = 0.2
    dom = rayleigh_slab(tau)
    integ = PolarizedIntegrator.create(
        dom, config=IntegratorConfig(max_events=1),
        intensity_mus=[-0.9], intensity_phis=[0.0],
        source_stokes=(1.0, 0.0, 0.0, 1.0))
    res = integ.compute(jax.random.PRNGKey(9),
                        PhotonSource.directional(0.9, 0.0), N)
    s = np.asarray(res.mean_intensity)[0]
    # Near-forward scattering (Theta ~ 25 degrees): a4/a1 close to 1,
    # so V/I of the single-scattered radiance stays high and positive.
    assert s[3] > 0.5 * s[0]


def test_polarized_multicomponent():
    """Rayleigh + Mie cloud two-component scene traces cleanly and the
    V channel stays (near) zero for an unpolarized source."""
    mie = PhaseMatrix.from_mie(0.55, 1.33 + 0.0j, 0.8)
    mie_tab = PhaseMatrixTable.from_phase_matrices([mie], [1.0])
    ray_tab = PhaseMatrixTable.from_phase_matrices(
        [PhaseMatrix.rayleigh()], [1.0])
    dom = Domain.create([0.0, 500.0], [0.0, 500.0],
                        np.linspace(0.0, 250.0, 3))
    ext = np.full((1, 1, 2), 1.0 / 250.0)
    dom = dom.add_component("rayleigh", 0.3 * ext, np.ones_like(ext),
                            np.zeros(ext.shape, np.int32), ray_tab)
    dom = dom.add_component("cloud", ext, np.full_like(ext, 0.99),
                            np.zeros(ext.shape, np.int32), mie_tab)
    integ = PolarizedIntegrator.create(
        dom, config=IntegratorConfig(max_events=200),
        intensity_mus=[0.5], intensity_phis=[0.0])
    res = integ.compute(jax.random.PRNGKey(21),
                        PhotonSource.directional(0.5, 0.0), N)
    assert int(res.n_bad) == 0
    s = np.asarray(res.mean_intensity)[0]
    assert s[0] > 0.0
    assert abs(s[3]) < 0.02 * s[0]
    closure = float(res.mean_flux_up + res.mean_flux_down
                    + res.mean_flux_absorbed)
    assert closure == pytest.approx(1.0, abs=5e-3)


# ---------------------------------------------------------------------------
# IO + driver
# ---------------------------------------------------------------------------
def test_phase_matrix_netcdf_roundtrip(tmp_path):
    """Matrix tables persist through the domain netCDF (P11 in the
    reference's exact Angle-Value layout + the phaseMatrixElements
    extension variable a Fortran reader ignores)."""
    from scipy.io import netcdf_file

    from i3rc_tpu.io.netcdf import read_domain, write_domain

    tab = PhaseMatrixTable.from_phase_matrices(
        [PhaseMatrix.rayleigh(n_angles=361),
         PhaseMatrix.from_mie(0.55, 1.33 + 0.0j, 0.8, n_angles=361)],
        [1.0, 2.0])
    dom = Domain.create([0, 500.0], [0, 500.0], np.linspace(0, 250.0, 3))
    ext = np.full((1, 1, 2), 1 / 250.0)
    dom = dom.add_component("mix", ext, np.ones_like(ext),
                            np.zeros(ext.shape, np.int32), tab)
    path = str(tmp_path / "pol_domain.nc")
    write_domain(dom, path)
    d2 = read_domain(path)
    t2 = d2.components[0].table
    assert isinstance(t2, PhaseMatrixTable)
    for i in range(2):
        m0, m1 = tab.element(i), t2.element(i)
        v1 = m0.values(m0.scattering_angle)
        v2 = m1.values(m0.scattering_angle)
        for k in ("a1", "b1", "a2", "a3", "a4", "b2"):
            np.testing.assert_allclose(v2[k], v1[k], atol=5e-6, rtol=2e-5)
    # The scalar-compatible layer is intact: a reader that ignores the
    # extension vars sees a normal Angle-Value P11 table.
    with netcdf_file(path, "r", mmap=False) as nc:
        assert "Component1_phaseFunctionValues" in nc.variables
        assert "Component1_phaseMatrixElements" in nc.variables


def test_polarized_driver_end_to_end(tmp_path):
    """monteCarloDriver with polarized=.true.: Stokes radiances written to
    ASCII + netCDF (Wishlist: 'the driver programs need to report
    polarized results')."""
    import textwrap

    from scipy.io import netcdf_file

    from i3rc_tpu.drivers.monte_carlo_driver import run_from_namelist
    from i3rc_tpu.io.netcdf import write_domain

    dom = rayleigh_slab(tau=0.5)
    dom_path = str(tmp_path / "ray.dom")
    write_domain(dom, dom_path)
    nml = textwrap.dedent(f"""
    &radiativeTransfer
      solarFlux = 1., solarMu = 0.6, solarAzimuth = 0., surfaceAlbedo = 0.2,
      intensityMus = 0.8, 0.4,  intensityPhis = 0., 120.,
    /
    &monteCarlo
      numPhotonsPerBatch = 4000, numBatches = 4, iseed = 3
    /
    &algorithms
      useRayTracing = .false., polarized = .true.,
    /
    &fileNames
      domainFileName = "{dom_path}",
      outputFluxFile = "{tmp_path}/pflux.out",
      outputRadFile = "{tmp_path}/prad.out",
      outputNetcdfFile = "{tmp_path}/pol.nc"
    /
    &output
    /
    """)
    nml_path = tmp_path / "pol.nml"
    nml_path.write_text(nml)
    out = run_from_namelist(str(nml_path), quiet=True)
    assert (tmp_path / "pflux.out").exists()
    rad_txt = (tmp_path / "prad.out").read_text()
    assert "Stokes" in rad_txt
    mean, err = out["radiance"]
    assert mean.shape[-1] == 4 and mean.ndim == 4
    assert np.all(mean[..., 0] > 0)          # I positive everywhere
    assert np.all(err[..., 0] >= 0)
    with netcdf_file(str(tmp_path / "pol.nc"), "r", mmap=False) as nc:
        v = nc.variables["intensity"]
        assert v.dimensions == ("stokes", "direction", "y", "x")
        assert nc.variables["intensity_StdErr"].shape == v.shape
    # Flux closure with albedo: up + (1-A) is not exact (absorbing surface
    # counts as escape) — just require up/down sane and scaled by solarFlux.
    m = out["mean_stats"]
    assert 0.0 < m[0][0] < 1.0 and 0.0 < m[1][0] < 1.0


def test_polarized_run_batches_sharded():
    """PolarizedIntegrator rides the standard mesh batch parallelism
    (run_batches over the 8-device CPU mesh): moments accumulate, Stokes
    radiances come back (nx, ny, D, 4) with per-batch stderr, and the
    flux mean matches a single-device compute within noise."""
    from i3rc_tpu.parallel.mesh import default_mesh, run_batches

    dom = rayleigh_slab(tau=0.5)
    integ = PolarizedIntegrator.create(
        dom, config=IntegratorConfig(max_events=100),
        intensity_mus=[0.8], intensity_phis=[0.0])
    src = PhotonSource.directional(0.6, 0.0)
    stats = run_batches(integ, src, 2048, 8, seed=5, mesh=default_mesh())
    mean = stats.mean
    assert np.asarray(mean.intensity).shape[-1] == 4
    assert np.asarray(stats.stderr.intensity).shape == \
        np.asarray(mean.intensity).shape
    single = integ.compute(jax.random.PRNGKey(17), src, 2048 * 8)
    fup_m = float(np.asarray(mean.flux_up).mean())
    fup_s = float(single.mean_flux_up)
    assert fup_m == pytest.approx(fup_s, abs=0.03)
    assert float(np.asarray(mean.intensity)[..., 0].mean()) > 0.0


def test_polarized_source_dipole_geometry():
    """Fully Q-polarized vertical beam, single Rayleigh scattering: pure
    DIPOLE physics as the oracle, sharing nothing with the kernel's
    rotation machinery.  The incident polarization is along x (the
    vertical-beam frame fallback); the scattered light toward detector d
    is fully polarized along the projection p = x - (x.d) d of the dipole
    axis, with intensity scaling 1 - (x.d)^2.  Pins the L(chi_d) and
    meridian-alignment legs for POLARIZED input (the unpolarized
    single-scatter test cannot see the incoming-azimuth rotation)."""
    tau = 0.05
    dom = rayleigh_slab(tau)
    mus_det = np.array([0.6, 0.6, 0.6, -0.5])
    phis_det = np.array([0.0, 60.0, 135.0, 30.0])
    integ = PolarizedIntegrator.create(
        dom, config=IntegratorConfig(max_events=1),
        intensity_mus=mus_det, intensity_phis=phis_det,
        source_stokes=(1.0, 1.0, 0.0, 0.0))
    res = integ.compute(jax.random.PRNGKey(2),
                        PhotonSource.directional(1.0, 0.0), 2 * N)
    got = np.asarray(res.mean_intensity)
    x_axis = np.array([1.0, 0.0, 0.0])
    z = np.array([0.0, 0.0, 1.0])
    for k, (mu, phi_deg) in enumerate(zip(mus_det, phis_det)):
        sd = np.sqrt(1 - mu ** 2)
        phi = np.deg2rad(phi_deg)
        det = np.array([sd * np.cos(phi), sd * np.sin(phi), mu])
        p = x_axis - (x_axis @ det) * det
        pn = np.linalg.norm(p)
        assert pn > 0.3          # geometry keeps the dipole projection fat
        p = p / pn
        m1 = z - det * det[2]
        m1 = m1 / np.linalg.norm(m1)
        m2 = np.cross(det, m1)
        cpsi, spsi = p @ m1, p @ m2
        i_k, q_k, u_k, v_k = got[k]
        # Fully polarized: DoP == 1 within MC noise on the ratio.
        dop = np.sqrt(q_k ** 2 + u_k ** 2) / i_k
        assert dop == pytest.approx(1.0, abs=0.03), (k, got[k])
        assert abs(v_k) < 0.02 * i_k
        # Polarization angle matches the projected dipole axis.
        assert q_k / i_k == pytest.approx(cpsi * cpsi - spsi * spsi,
                                          abs=0.04), (k, got[k])
        assert u_k / i_k == pytest.approx(2 * cpsi * spsi, abs=0.04), \
            (k, got[k])
    # Relative intensities follow the dipole factor 1 - (x.d)^2.
    def dip(k):
        sd = np.sqrt(1 - mus_det[k] ** 2)
        phi = np.deg2rad(phis_det[k])
        det = np.array([sd * np.cos(phi), sd * np.sin(phi), mus_det[k]])
        return 1.0 - (x_axis @ det) ** 2
    r_got = got[1, 0] / got[0, 0]
    r_exp = dip(1) / dip(0)
    assert r_got == pytest.approx(r_exp, rel=0.06)
