// Native CPU kernels for baryonforge-tpu.
//
// The reference's only compiled code is three numba scatter loops
// (Runners/HealpixRunner.py:17-74, Runners/Map2DRunner.py:13-167) plus the
// C++ engines it borrows from healpy/scipy. Here the same surface is
// provided as real C++: conservative deposit kernels (used as the CPU
// fallback and as an independent cross-check of the XLA scatter path) and
// a periodic cell-list fixed-radius neighbour search (the KDTree analog
// for BaryonifySnapshot).
//
// Exposed with C linkage; bound from Python via ctypes (no pybind11 in the
// build image).

#include <cmath>
#include <cstdint>
#include <vector>
#include <algorithm>

extern "C" {

// ---------------------------------------------------------------------
// HEALPix 4-neighbour weighted redeposit (regrid_pixels_hpix analog)
// ---------------------------------------------------------------------
void regrid_hpix(double* hmap, const double* parent_vals,
                 const int64_t* child_pix, const double* child_weights,
                 int64_t n) {
    for (int64_t i = 0; i < n; ++i) {
        const double v = parent_vals[i];
        for (int j = 0; j < 4; ++j) {
            hmap[child_pix[4 * i + j]] += child_weights[4 * i + j] * v;
        }
    }
}

// ---------------------------------------------------------------------
// Conservative unit-square / unit-cube deposits on periodic grids
// (regrid_pixels_2D / regrid_pixels_3D analogs; the overlap of a unit
// square with the grid reduces exactly to a bilinear corner split).
// ---------------------------------------------------------------------
static inline void corner1d(double pos, int64_t N, int64_t* i0, int64_t* i1,
                            double* w0, double* w1) {
    pos = std::fmod(pos, (double)N);
    if (pos < 0) pos += (double)N;
    int64_t i = (int64_t)std::floor(pos);
    double f = pos - (double)i;
    *i0 = i % N;
    *i1 = (i + 1) % N;
    *w0 = 1.0 - f;
    *w1 = f;
}

void deposit_2d(double* grid, const double* positions, const double* values,
                int64_t n, int64_t N) {
    for (int64_t p = 0; p < n; ++p) {
        int64_t x0, x1, y0, y1;
        double wx0, wx1, wy0, wy1;
        corner1d(positions[2 * p + 0], N, &x0, &x1, &wx0, &wx1);
        corner1d(positions[2 * p + 1], N, &y0, &y1, &wy0, &wy1);
        const double v = values[p];
        grid[x0 * N + y0] += v * wx0 * wy0;
        grid[x0 * N + y1] += v * wx0 * wy1;
        grid[x1 * N + y0] += v * wx1 * wy0;
        grid[x1 * N + y1] += v * wx1 * wy1;
    }
}

void deposit_3d(double* grid, const double* positions, const double* values,
                int64_t n, int64_t N) {
    for (int64_t p = 0; p < n; ++p) {
        int64_t x0, x1, y0, y1, z0, z1;
        double wx0, wx1, wy0, wy1, wz0, wz1;
        corner1d(positions[3 * p + 0], N, &x0, &x1, &wx0, &wx1);
        corner1d(positions[3 * p + 1], N, &y0, &y1, &wy0, &wy1);
        corner1d(positions[3 * p + 2], N, &z0, &z1, &wz0, &wz1);
        const double v = values[p];
        grid[(x0 * N + y0) * N + z0] += v * wx0 * wy0 * wz0;
        grid[(x0 * N + y0) * N + z1] += v * wx0 * wy0 * wz1;
        grid[(x0 * N + y1) * N + z0] += v * wx0 * wy1 * wz0;
        grid[(x0 * N + y1) * N + z1] += v * wx0 * wy1 * wz1;
        grid[(x1 * N + y0) * N + z0] += v * wx1 * wy0 * wz0;
        grid[(x1 * N + y0) * N + z1] += v * wx1 * wy0 * wz1;
        grid[(x1 * N + y1) * N + z0] += v * wx1 * wy1 * wz0;
        grid[(x1 * N + y1) * N + z1] += v * wx1 * wy1 * wz1;
    }
}

// ---------------------------------------------------------------------
// Periodic cell-list fixed-radius neighbour search (3D).
// Two-pass API: count neighbours per query, then fill a padded index
// array — static output shapes for the device pipeline.
// ---------------------------------------------------------------------
struct CellList {
    std::vector<int64_t> head;   // ncell^3, first particle per cell
    std::vector<int64_t> next;   // n, linked list
    int64_t ncell;
    double L, cell;
};

static CellList build_cells(const double* pos, int64_t n, double L,
                            double rmax) {
    CellList cl;
    cl.L = L;
    cl.ncell = std::max<int64_t>(1, (int64_t)std::floor(L / rmax));
    cl.ncell = std::min<int64_t>(cl.ncell, 256);
    cl.cell = L / (double)cl.ncell;
    cl.head.assign(cl.ncell * cl.ncell * cl.ncell, -1);
    cl.next.assign(n, -1);
    for (int64_t i = 0; i < n; ++i) {
        int64_t cx = (int64_t)(pos[3 * i + 0] / cl.cell) % cl.ncell;
        int64_t cy = (int64_t)(pos[3 * i + 1] / cl.cell) % cl.ncell;
        int64_t cz = (int64_t)(pos[3 * i + 2] / cl.cell) % cl.ncell;
        if (cx < 0) cx += cl.ncell;
        if (cy < 0) cy += cl.ncell;
        if (cz < 0) cz += cl.ncell;
        int64_t c = (cx * cl.ncell + cy) * cl.ncell + cz;
        cl.next[i] = cl.head[c];
        cl.head[c] = i;
    }
    return cl;
}

static inline double pdist2(const double* a, const double* b, double L) {
    double d2 = 0;
    for (int k = 0; k < 3; ++k) {
        double d = a[k] - b[k];
        if (d > L / 2) d -= L;
        if (d < -L / 2) d += L;
        d2 += d * d;
    }
    return d2;
}

// neighbours within radii[q] of centers[q]; fills counts (nq) and, when
// out != nullptr, up to pad indices per query (row-major, -1 padded)
void cell_query(const double* pos, int64_t n, double L,
                const double* centers, const double* radii, int64_t nq,
                double rmax, int64_t* counts, int64_t* out, int64_t pad) {
    CellList cl = build_cells(pos, n, L, rmax);
    const int64_t reach = (int64_t)std::ceil(rmax / cl.cell);
    for (int64_t q = 0; q < nq; ++q) {
        const double* c = &centers[3 * q];
        const double r2 = radii[q] * radii[q];
        int64_t cx = (int64_t)(std::fmod(c[0], L) / cl.cell);
        int64_t cy = (int64_t)(std::fmod(c[1], L) / cl.cell);
        int64_t cz = (int64_t)(std::fmod(c[2], L) / cl.cell);
        int64_t cnt = 0;
        for (int64_t dx = -reach; dx <= reach; ++dx)
        for (int64_t dy = -reach; dy <= reach; ++dy)
        for (int64_t dz = -reach; dz <= reach; ++dz) {
            int64_t gx = ((cx + dx) % cl.ncell + cl.ncell) % cl.ncell;
            int64_t gy = ((cy + dy) % cl.ncell + cl.ncell) % cl.ncell;
            int64_t gz = ((cz + dz) % cl.ncell + cl.ncell) % cl.ncell;
            int64_t cell = (gx * cl.ncell + gy) * cl.ncell + gz;
            for (int64_t i = cl.head[cell]; i != -1; i = cl.next[i]) {
                if (pdist2(&pos[3 * i], c, L) <= r2) {
                    if (out != nullptr && cnt < pad)
                        out[q * pad + cnt] = i;
                    ++cnt;
                }
            }
        }
        counts[q] = cnt;
    }
}

}  // extern "C"
