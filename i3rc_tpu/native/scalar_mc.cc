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

}  // namespace

extern "C" {

// Traces n_photons; accumulates per-column weights into flux_up/flux_down
// (nx*ny) and flux_abs (nx*ny).  Returns the number of photons dropped by
// the safety budget (expected 0).
int64_t trace_photons(
    int nx, int ny, int nz,
    double x0, double y0, double z0, double dx, double dy, double dz,
    const double* ext, const double* ssa, double g,
    double mu0, double phi0,          // incident direction (mu0 > 0 down)
    double surface_albedo,
    int64_t n_photons, uint64_t seed,
    double roulette_threshold,        // kill/promote below this weight
    double* flux_up, double* flux_down, double* flux_abs) {
  Grid gr{nx, ny, nz, x0, y0, z0, dx, dy, dz, ext, ssa};
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
          if (w < roulette_threshold) {  // Russian roulette (:673-679)
            if (rng.uniform() * 2.0 < 1.0) { done = true; break; }
            w *= 2.0;
          }
          const double cs = hg_cosine(g, rng.uniform());
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
            break;  // fresh free path from the surface
          }
          done = true; break;
        }
      }
    }
  }
  return n_bad;
}

}  // extern "C"
