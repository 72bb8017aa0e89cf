// Independent photon-serial Monte Carlo oracle (double precision, C++).
//
// A from-scratch forward MC for 3-D voxel domains, written as a VALIDATION
// oracle for the JAX transport kernels: different language, different RNG
// (xoshiro256++), different traversal (photon-serial cell-stepping DDA in
// float64), different phase-function sampling (exact closed-form HG
// inversion).  Shares no code with the framework — agreement is evidence,
// not tautology.  Scope mirrors the I3RC benchmark scenes: one component,
// per-cell extinction and single-scattering albedo, Henyey-Greenstein
// scattering, Lambertian (or black) surface, periodic x/y, collimated
// solar illumination, column-resolved up/down/absorbed fluxes.
//
// Physics matched against Integrators/monteCarloRadiativeTransfer.f95
// :400-707 (photonLoop/scatteringLoop) and :1654-1807 (path accumulation):
// same estimator (analog weights with Russian roulette), same tallies.
//
// Build: scripts/build_native.sh -> _scalar_mc.so; ctypes binding in
// scalar_mc.py.

#include <cmath>
#include <cstdint>
#include <cstring>

namespace {

// xoshiro256++ (public-domain algorithm, Blackman & Vigna).
struct Rng {
  uint64_t s[4];
  explicit Rng(uint64_t seed) {
    // splitmix64 expansion of the seed.
    uint64_t x = seed;
    for (int i = 0; i < 4; ++i) {
      x += 0x9e3779b97f4a7c15ull;
      uint64_t z = x;
      z = (z ^ (z >> 30)) * 0xbf58476d1ce4e5b9ull;
      z = (z ^ (z >> 27)) * 0x94d049bb133111ebull;
      s[i] = z ^ (z >> 31);
    }
  }
  static uint64_t rotl(uint64_t v, int k) { return (v << k) | (v >> (64 - k)); }
  uint64_t next() {
    const uint64_t result = rotl(s[0] + s[3], 23) + s[0];
    const uint64_t t = s[1] << 17;
    s[2] ^= s[0];
    s[3] ^= s[1];
    s[1] ^= s[2];
    s[0] ^= s[3];
    s[2] ^= t;
    s[3] = rotl(s[3], 45);
    return result;
  }
  double uniform() {  // in [0, 1)
    return (next() >> 11) * 0x1.0p-53;
  }
};

struct Grid {
  int nx, ny, nz;
  double x0, y0, z0, dx, dy, dz;  // regular spacing
  const double* ext;              // (nx*ny*nz) C-order [ix][iy][iz]
  const double* ssa;
  double cell(const double* a, int ix, int iy, int iz) const {
    return a[(static_cast<int64_t>(ix) * ny + iy) * nz + iz];
  }
};

inline double hg_cosine(double g, double u) {
  if (std::fabs(g) < 1e-12) return 2.0 * u - 1.0;
  const double f = (1.0 - g * g) / (1.0 + g * (2.0 * u - 1.0));
  double mu = (1.0 + g * g - f * f) / (2.0 * g);
  if (mu > 1.0) mu = 1.0;
  if (mu < -1.0) mu = -1.0;
  return mu;
}

// Phase value, normalized so the integral over d(mu) is 2 (P_iso == 1).
inline double hg_phase(double g, double ct) {
  const double d = 1.0 + g * g - 2.0 * g * ct;
  return (1.0 - g * g) / (d * std::sqrt(std::fmax(d, 1e-30)));
}

// Tabulated phase function over (mu, value) pairs, mu ascending: trapezoid
// CDF in mu with exact piecewise-quadratic inversion for sampling (the
// same construction the reference applies to angle-value tables,
// Code/inversePhaseFunctions.f95:68-176, implemented independently) and
// linear interpolation in mu for values.
struct TabPhase {
  const double* mu;
  const double* val;   // raw values
  int n;
  double* cdf;         // length n, cdf[0] = 0, cdf[n-1] = total
  double total;
  void init(const double* m, const double* v, int count, double* scratch) {
    mu = m; val = v; n = count; cdf = scratch;
    cdf[0] = 0.0;
    for (int i = 1; i < n; ++i)
      cdf[i] = cdf[i - 1] + 0.5 * (val[i] + val[i - 1]) * (mu[i] - mu[i - 1]);
    total = cdf[n - 1];
  }
  double sample(double u) const {
    const double target = u * total;
    int lo = 0, hi = n - 1;  // find segment with cdf[lo] <= target < cdf[lo+1]
    while (hi - lo > 1) {
      const int mid = (lo + hi) / 2;
      if (cdf[mid] <= target) lo = mid; else hi = mid;
    }
    const double dm = mu[lo + 1] - mu[lo];
    const double p0 = val[lo];
    const double slope = (val[lo + 1] - val[lo]) / dm;
    const double rem = target - cdf[lo];
    double t;
    if (std::fabs(slope) < 1e-14 * std::fmax(p0, 1e-300)) {
      t = p0 > 0.0 ? rem / p0 : 0.0;
    } else {
      // Solve slope/2 t^2 + p0 t - rem = 0 (stable branch).
      const double disc = std::sqrt(std::fmax(p0 * p0 + 2.0 * slope * rem, 0.0));
      t = slope > 0.0 ? (disc - p0) / slope : 2.0 * rem / (p0 + disc);
    }
    if (t < 0.0) t = 0.0;
    if (t > dm) t = dm;
    return mu[lo] + t;
  }
  double value(double ct) const {  // normalized to integral-over-dmu == 2
    if (ct <= mu[0]) return val[0] * 2.0 / total;
    if (ct >= mu[n - 1]) return val[n - 1] * 2.0 / total;
    int lo = 0, hi = n - 1;
    while (hi - lo > 1) {
      const int mid = (lo + hi) / 2;
      if (mu[mid] <= ct) lo = mid; else hi = mid;
    }
    const double f = (ct - mu[lo]) / (mu[lo + 1] - mu[lo]);
    return (val[lo] * (1.0 - f) + val[lo + 1] * f) * 2.0 / total;
  }
};

inline void rotate(double& ux, double& uy, double& uz, double cs, double phi) {
  const double ss = std::sqrt(std::fmax(1.0 - cs * cs, 0.0));
  const double cphi = std::cos(phi), sphi = std::sin(phi);
  const double denom = std::sqrt(std::fmax(1.0 - uz * uz, 0.0));
  double nx, ny, nz;
  if (denom > 1e-10) {
    nx = ss * (ux * uz * cphi - uy * sphi) / denom + ux * cs;
    ny = ss * (uy * uz * cphi + ux * sphi) / denom + uy * cs;
    nz = -ss * cphi * denom + uz * cs;
  } else {
    const double sgn = uz >= 0.0 ? 1.0 : -1.0;
    nx = ss * cphi;
    ny = sgn * ss * sphi;
    nz = sgn * cs;
  }
  const double n = std::sqrt(nx * nx + ny * ny + nz * nz);
  ux = nx / n;
  uy = ny / n;
  uz = nz / n;
}

// Straight-line optical depth from (x,y,z) along (ux,uy,uz) to the top or
// bottom boundary (periodic x/y): the transmittance trace of
// computeIntensityContribution (monteCarloRadiativeTransfer.f95:1512-1535),
// independent implementation.  Returns tau; *exit_col = exit column;
// *out_top = exited through the top.
inline double path_tau(const Grid& gr, double x, double y, double z,
                       double ux, double uy, double uz,
                       double eps, bool* ok, int64_t* exit_col,
                       bool* out_top) {
  const double xw = gr.nx * gr.dx, yw = gr.ny * gr.dy;
  const double z_top = gr.z0 + gr.nz * gr.dz;
  double tau = 0.0;
  for (int guard = 0; guard < 100000000; ++guard) {
    int ix = static_cast<int>(std::floor((x - gr.x0) / gr.dx));
    int iy = static_cast<int>(std::floor((y - gr.y0) / gr.dy));
    int iz = static_cast<int>(std::floor((z - gr.z0) / gr.dz));
    if (ix < 0) ix = 0; if (ix >= gr.nx) ix = gr.nx - 1;
    if (iy < 0) iy = 0; if (iy >= gr.ny) iy = gr.ny - 1;
    if (iz < 0) iz = 0; if (iz >= gr.nz) iz = gr.nz - 1;
    const double k = gr.cell(gr.ext, ix, iy, iz);
    const double fx = gr.x0 + (ix + (ux > 0.0 ? 1 : 0)) * gr.dx;
    const double fy = gr.y0 + (iy + (uy > 0.0 ? 1 : 0)) * gr.dy;
    const double fz = gr.z0 + (iz + (uz > 0.0 ? 1 : 0)) * gr.dz;
    double s = 1e300;
    if (std::fabs(ux) > 1e-300) s = std::fmin(s, (fx - x) / ux);
    if (std::fabs(uy) > 1e-300) s = std::fmin(s, (fy - y) / uy);
    if (std::fabs(uz) > 1e-300) s = std::fmin(s, (fz - z) / uz);
    if (s < 0.0) s = 0.0;
    tau += k * s;
    x += ux * (s + eps);
    y += uy * (s + eps);
    z += uz * (s + eps);
    if (x >= gr.x0 + xw) x -= xw; else if (x < gr.x0) x += xw;
    if (y >= gr.y0 + yw) y -= yw; else if (y < gr.y0) y += yw;
    if (z >= z_top || z <= gr.z0) {
      int ex = static_cast<int>(std::floor((x - gr.x0) / gr.dx));
      int ey = static_cast<int>(std::floor((y - gr.y0) / gr.dy));
      if (ex < 0) ex = 0; if (ex >= gr.nx) ex = gr.nx - 1;
      if (ey < 0) ey = 0; if (ey >= gr.ny) ey = gr.ny - 1;
      *exit_col = static_cast<int64_t>(ex) * gr.ny + ey;
      *out_top = z >= z_top;
      *ok = true;
      return tau;
    }
  }
  *ok = false;
  return tau;
}

}  // namespace

extern "C" {

// Full-featured oracle: flux + optional tabulated phase function + optional
// local-estimate radiance detectors.  pf_n == 0 -> Henyey-Greenstein(g);
// otherwise (pf_mu, pf_val)[pf_n] give the phase function over mu
// (ascending), sampled by exact piecewise-quadratic CDF inversion.
// n_det detectors: det_dirs (3*n_det unit vectors, z-up), det_absmu
// (n_det); every physical collision (and surviving surface reflection)
// contributes w * P/(4 pi |mu_d|) * exp(-tau_to_boundary) (w/pi for the
// surface) at the trace's exit column into intensity (nx*ny*n_det),
// matching computeIntensityContribution
// (monteCarloRadiativeTransfer.f95:1419-1611, exact-transmittance mode).
// Returns photons dropped by the safety budget (expected 0).
int64_t trace_photons_full(
    int nx, int ny, int nz,
    double x0, double y0, double z0, double dx, double dy, double dz,
    const double* ext, const double* ssa, double g,
    const double* pf_mu, const double* pf_val, int pf_n, double* pf_scratch,
    double mu0, double phi0,          // incident direction (mu0 > 0 down)
    double surface_albedo,
    int n_det, const double* det_dirs, const double* det_absmu,
    int64_t n_photons, uint64_t seed,
    double roulette_threshold,        // kill/promote below this weight
    double* flux_up, double* flux_down, double* flux_abs,
    double* intensity) {
  Grid gr{nx, ny, nz, x0, y0, z0, dx, dy, dz, ext, ssa};
  TabPhase tab;
  const bool tabulated = pf_n > 0;
  if (tabulated) tab.init(pf_mu, pf_val, pf_n, pf_scratch);
  const double xw = nx * dx, yw = ny * dy;
  const double z_top = z0 + nz * dz;
  const double eps = 1e-10 * (xw + yw + (z_top - z0));
  int64_t n_bad = 0;
  Rng rng(seed);

  const double s0 = std::sqrt(std::fmax(1.0 - mu0 * mu0, 0.0));
  const double inc_ux = s0 * std::cos(phi0);
  const double inc_uy = s0 * std::sin(phi0);
  const double inc_uz = -mu0;  // entering at the top, travelling down

  for (int64_t p = 0; p < n_photons; ++p) {
    double x = x0 + rng.uniform() * xw;
    double y = y0 + rng.uniform() * yw;
    double z = z_top - eps;
    double ux = inc_ux, uy = inc_uy, uz = inc_uz;
    double w = 1.0;
    bool done = false;
    for (int order = 0; order < 1000000 && !done; ++order) {
      // Sample free path and march cell by cell (independent DDA).
      double tau = -std::log(std::fmax(rng.uniform(), 1e-300));
      int guard = 0;
      while (true) {
        if (++guard > 100000000) { n_bad++; done = true; break; }
        // Current cell indices (positions held strictly inside cells).
        int ix = static_cast<int>(std::floor((x - x0) / dx));
        int iy = static_cast<int>(std::floor((y - y0) / dy));
        int iz = static_cast<int>(std::floor((z - z0) / dz));
        if (ix < 0) ix = 0; if (ix >= nx) ix = nx - 1;
        if (iy < 0) iy = 0; if (iy >= ny) iy = ny - 1;
        if (iz < 0) iz = 0; if (iz >= nz) iz = nz - 1;
        const double k = gr.cell(ext, ix, iy, iz);
        // Distance to the nearest cell face along the direction.
        const double fx = x0 + (ix + (ux > 0.0 ? 1 : 0)) * dx;
        const double fy = y0 + (iy + (uy > 0.0 ? 1 : 0)) * dy;
        const double fz = z0 + (iz + (uz > 0.0 ? 1 : 0)) * dz;
        double s = 1e300;
        if (std::fabs(ux) > 1e-300) s = std::fmin(s, (fx - x) / ux);
        if (std::fabs(uy) > 1e-300) s = std::fmin(s, (fy - y) / uy);
        if (std::fabs(uz) > 1e-300) s = std::fmin(s, (fz - z) / uz);
        if (s < 0.0) s = 0.0;
        const double seg_tau = k * s;
        if (k > 0.0 && seg_tau >= tau) {
          // Collision inside this cell.
          const double step = tau / k;
          x += ux * step; y += uy * step; z += uz * step;
          const double a = gr.cell(ssa, ix, iy, iz);
          const int64_t col = static_cast<int64_t>(ix) * ny + iy;
          flux_abs[col] += w * (1.0 - a);
          w *= a;
          // Local estimation toward every detector (reference order:
          // absorption, then intensity, then roulette, :642-668).
          for (int d = 0; d < n_det; ++d) {
            const double* dd = det_dirs + 3 * d;
            double ct = ux * dd[0] + uy * dd[1] + uz * dd[2];
            if (ct > 1.0) ct = 1.0;
            if (ct < -1.0) ct = -1.0;
            const double pv = tabulated ? tab.value(ct) : hg_phase(g, ct);
            bool ok2 = false, otop = false;
            int64_t ecol = 0;
            const double t = path_tau(gr, x, y, z, dd[0], dd[1], dd[2], eps,
                                      &ok2, &ecol, &otop);
            if (ok2 && (otop == (dd[2] > 0.0)))
              intensity[ecol * n_det + d] +=
                  w * pv / (4.0 * M_PI * det_absmu[d]) * std::exp(-t);
          }
          if (w < roulette_threshold) {  // Russian roulette (:673-679)
            if (rng.uniform() * 2.0 < 1.0) { done = true; break; }
            w *= 2.0;
          }
          const double cs = tabulated ? tab.sample(rng.uniform())
                                      : hg_cosine(g, rng.uniform());
          rotate(ux, uy, uz, cs, 2.0 * M_PI * rng.uniform());
          break;  // new free path
        }
        // Cross into the next cell: advance to the face, then nudge past it
        // so the next floor() lands in the new cell.
        tau -= seg_tau;
        x += ux * (s + eps);
        y += uy * (s + eps);
        z += uz * (s + eps);
        // Periodic x/y.
        if (x >= x0 + xw) x -= xw; else if (x < x0) x += xw;
        if (y >= y0 + yw) y -= yw; else if (y < y0) y += yw;
        if (z >= z_top) {
          int ex = static_cast<int>(std::floor((x - x0) / dx));
          int ey = static_cast<int>(std::floor((y - y0) / dy));
          if (ex < 0) ex = 0; if (ex >= nx) ex = nx - 1;
          if (ey < 0) ey = 0; if (ey >= ny) ey = ny - 1;
          flux_up[static_cast<int64_t>(ex) * ny + ey] += w;
          done = true; break;
        }
        if (z <= z0) {
          int ex = static_cast<int>(std::floor((x - x0) / dx));
          int ey = static_cast<int>(std::floor((y - y0) / dy));
          if (ex < 0) ex = 0; if (ex >= nx) ex = nx - 1;
          if (ey < 0) ey = 0; if (ey >= ny) ey = ny - 1;
          flux_down[static_cast<int64_t>(ex) * ny + ey] += w;
          if (surface_albedo > 0.0 && rng.uniform() < surface_albedo) {
            // Lambertian re-emission: mu = sqrt(u) (:515-563).
            const double mu = std::sqrt(rng.uniform());
            const double st = std::sqrt(std::fmax(1.0 - mu * mu, 0.0));
            const double ph = 2.0 * M_PI * rng.uniform();
            ux = st * std::cos(ph); uy = st * std::sin(ph); uz = mu;
            z = z0 + eps;
            // Surface contribution w/pi per UPWARD detector (Lambertian
            // reflection emits into the upper hemisphere only; the
            // framework kernels agree — a downward trace from the
            // boundary is a zero-step trace, dropped, matching the
            // reference's non-positive-step guard :1711-1714).
            for (int d = 0; d < n_det; ++d) {
              const double* dd = det_dirs + 3 * d;
              if (dd[2] <= 0.0) continue;
              bool ok2 = false, otop = false;
              int64_t ecol = 0;
              const double t = path_tau(gr, x, y, z, dd[0], dd[1], dd[2],
                                        eps, &ok2, &ecol, &otop);
              if (ok2 && otop)
                intensity[ecol * n_det + d] += w / M_PI * std::exp(-t);
            }
            break;  // fresh free path from the surface
          }
          done = true; break;
        }
      }
    }
  }
  return n_bad;
}

// Original flux-only entry point (kept for binding compatibility).
int64_t trace_photons(
    int nx, int ny, int nz,
    double x0, double y0, double z0, double dx, double dy, double dz,
    const double* ext, const double* ssa, double g,
    double mu0, double phi0, double surface_albedo,
    int64_t n_photons, uint64_t seed, double roulette_threshold,
    double* flux_up, double* flux_down, double* flux_abs) {
  return trace_photons_full(nx, ny, nz, x0, y0, z0, dx, dy, dz, ext, ssa, g,
                            nullptr, nullptr, 0, nullptr, mu0, phi0,
                            surface_albedo, 0, nullptr, nullptr, n_photons,
                            seed, roulette_threshold, flux_up, flux_down,
                            flux_abs, nullptr);
}

}  // extern "C"
