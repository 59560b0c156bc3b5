// libraytpu — native host runtime for ray_tracer_tpu, bound via ctypes.
//
// Provides the performance-critical host-side components that the
// reference implements in C++/CUDA host code:
//   * OBJ mesh parsing (reference: Serial/raytracer.cpp:220-287) — a
//     single-pass buffer scanner, ~50-100x the Python parser's speed;
//   * uniform-grid CSR construction (reference: Parallel/grid.cuh:137-207
//     two-pass count -> alloc -> fill) with the same resolution heuristic
//     and insertion order as ray_tracer_tpu/accel/grid.py.
//
// Pure C ABI; all memory is caller-managed via the count/fill two-call
// protocol so numpy arrays can be filled in place with zero copies.

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// OBJ loader
// ---------------------------------------------------------------------------

struct RtpuMesh {
  std::vector<double> verts;    // 3 * V
  std::vector<int32_t> faces;   // 3 * F (0-based)
  std::vector<float> uvs;       // 2 * VT
  std::vector<int32_t> uv_faces;  // 3 * F (0-based), -1 if absent
};

RtpuMesh* rtpu_obj_load(const char* path) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return nullptr;
  std::fseek(f, 0, SEEK_END);
  long size = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  // ftell can return -1 (error) or bogus values for non-regular files
  // (a directory fopen()s fine on Linux); a bad size would otherwise
  // become vector(size+1) throwing across the C ABI, or a buf[-1]
  // write.  Bail to the numpy fallback, which raises cleanly.
  if (size <= 0 || size > (1L << 40)) {
    std::fclose(f);
    return nullptr;
  }
  std::vector<char> buf(size + 1);
  if (std::fread(buf.data(), 1, size, f) != size_t(size)) {
    std::fclose(f);
    return nullptr;
  }
  std::fclose(f);
  buf[size] = '\0';

  auto* mesh = new RtpuMesh();
  char* p = buf.data();
  char* end = buf.data() + size;
  while (p < end) {
    // p points at start of line
    if (p[0] == 'v' && p[1] == ' ') {
      p += 2;
      for (int k = 0; k < 3; ++k) mesh->verts.push_back(std::strtod(p, &p));
    } else if (p[0] == 'v' && p[1] == 't' && p[2] == ' ') {
      p += 3;
      for (int k = 0; k < 2; ++k) mesh->uvs.push_back(float(std::strtod(p, &p)));
    } else if (p[0] == 'f' && p[1] == ' ') {
      p += 2;
      int32_t frow[3], trow[3];
      bool all_vt = true;
      for (int k = 0; k < 3; ++k) {
        long v = std::strtol(p, &p, 10);
        long vt = 0;
        if (*p == '/') {
          ++p;
          // parse ONLY when a number follows: strtol would skip any
          // whitespace (tab, CR) and consume the NEXT corner's token
          if (*p == '-' || (*p >= '0' && *p <= '9'))
            vt = std::strtol(p, &p, 10);
          if (*p == '/') {
            ++p;
            std::strtol(p, &p, 10);  // normal index, ignored
          }
        }
        // OBJ negative indices are relative to the elements defined so
        // far (-1 = most recent), matching io/obj._parse_obj_numpy
        long nvert = long(mesh->verts.size() / 3);
        long nuv = long(mesh->uvs.size() / 2);
        frow[k] = int32_t(v > 0 ? v - 1 : nvert + v);
        trow[k] = int32_t(vt > 0 ? vt - 1 : (vt < 0 ? nuv + vt : -1));
        if (vt == 0) all_vt = false;
      }
      for (int k = 0; k < 3; ++k) {
        mesh->faces.push_back(frow[k]);
        // a face is textured only when ALL THREE corners carry vt —
        // per-corner -1 would pass the renderer's face-level has_uv
        // check and gather garbage uvs (parity with the numpy parser's
        // whole-row -1 for partially-textured faces)
        mesh->uv_faces.push_back(all_vt ? trow[k] : -1);
      }
    }
    while (p < end && *p != '\n') ++p;
    ++p;
  }
  return mesh;
}

long rtpu_obj_num_verts(RtpuMesh* m) { return long(m->verts.size() / 3); }
long rtpu_obj_num_faces(RtpuMesh* m) { return long(m->faces.size() / 3); }
long rtpu_obj_num_uvs(RtpuMesh* m) { return long(m->uvs.size() / 2); }

void rtpu_obj_fill(RtpuMesh* m, double* verts, int32_t* faces, float* uvs,
                   int32_t* uv_faces) {
  if (verts) std::memcpy(verts, m->verts.data(), m->verts.size() * sizeof(double));
  if (faces) std::memcpy(faces, m->faces.data(), m->faces.size() * sizeof(int32_t));
  if (uvs && !m->uvs.empty())
    std::memcpy(uvs, m->uvs.data(), m->uvs.size() * sizeof(float));
  if (uv_faces)
    std::memcpy(uv_faces, m->uv_faces.data(), m->uv_faces.size() * sizeof(int32_t));
}

void rtpu_obj_free(RtpuMesh* m) { delete m; }

// ---------------------------------------------------------------------------
// Grid builder (two-pass CSR)
// ---------------------------------------------------------------------------

struct RtpuGrid {
  int n[3];
  float lower[3], upper[3], width[3], inv_width[3];
  std::vector<int64_t> cell_start;
  std::vector<int32_t> tri_ids;
};

static inline int rtpu_iclamp(int v, int lo, int hi) {
  return v < lo ? lo : (v > hi ? hi : v);
}

// SAT triangle/box overlap (Akenine-Möller 2001), the exact-insertion
// filter behind GridConfig.exact_overlap.  MUST keep bitwise keep/drop
// parity with the numpy reference accel/grid.tri_box_overlap: same f64
// operation order, same inclusive comparisons, and the lib is compiled
// with -ffp-contract=off so no FMA contraction diverges from numpy.
// u0/u1/u2 are the triangle vertices translated to the box center; h is
// the (pad-inflated) half-extent.  The 3 box-normal axes are skipped —
// candidate pairs already passed the AABB overlap expansion.
static bool rtpu_tri_box_overlap(const double u0[3], const double u1[3],
                                 const double u2[3], const double h[3]) {
  auto sep = [&](double ax, double ay, double az) {
    double p0 = ax * u0[0] + ay * u0[1] + az * u0[2];
    double p1 = ax * u1[0] + ay * u1[1] + az * u1[2];
    double p2 = ax * u2[0] + ay * u2[1] + az * u2[2];
    double r = h[0] * std::fabs(ax) + h[1] * std::fabs(ay) + h[2] * std::fabs(az);
    double lo = std::min(std::min(p0, p1), p2);
    double hi = std::max(std::max(p0, p1), p2);
    return lo > r || hi < -r;
  };
  const double e0[3] = {u1[0] - u0[0], u1[1] - u0[1], u1[2] - u0[2]};
  const double e1[3] = {u2[0] - u1[0], u2[1] - u1[1], u2[2] - u1[2]};
  const double e2[3] = {u0[0] - u2[0], u0[1] - u2[1], u0[2] - u2[2]};
  // triangle-plane axis
  if (sep(e0[1] * e1[2] - e0[2] * e1[1],
          e0[2] * e1[0] - e0[0] * e1[2],
          e0[0] * e1[1] - e0[1] * e1[0]))
    return false;
  // 9 edge-cross axes: cross(unit_j, edge) for j in {x, y, z}
  for (const double* e : {e0, e1, e2}) {
    if (sep(0.0, -e[2], e[1])) return false;
    if (sep(e[2], 0.0, -e[0])) return false;
    if (sep(-e[1], e[0], 0.0)) return false;
  }
  return true;
}

static RtpuGrid* rtpu_grid_build_impl(const float* verts, long nv,
                                      const int32_t* faces, long nf,
                                      float res_mult, int max_res,
                                      int exact) {
  auto* g = new RtpuGrid();
  if (nf <= 0 || nv <= 0) {  // callers gate on nf > 0; stay defined anyway
    for (int k = 0; k < 3; ++k) {
      g->lower[k] = g->upper[k] = g->width[k] = g->inv_width[k] = 0.f;
      g->n[k] = 1;
    }
    g->cell_start.assign(2, 0);
    return g;
  }
  // Bounds-clamp face indices: a corrupt index would otherwise read
  // out of the caller's vertex buffer (UB).  Valid meshes (incl. OBJ
  // relative indices, resolved by the loader) are unaffected.
  auto vert_at = [&](long i) {
    return verts + 3 * rtpu_iclamp(faces[i], 0, int(nv - 1));
  };
  for (int k = 0; k < 3; ++k) {
    g->lower[k] = INFINITY;
    g->upper[k] = -INFINITY;
  }
  for (long i = 0; i < nf * 3; ++i) {
    const float* v = vert_at(i);
    for (int k = 0; k < 3; ++k) {
      g->lower[k] = std::min(g->lower[k], v[k]);
      g->upper[k] = std::max(g->upper[k], v[k]);
    }
  }
  float delta[3] = {g->upper[0] - g->lower[0], g->upper[1] - g->lower[1],
                    g->upper[2] - g->lower[2]};
  int axis = delta[0] > delta[1] ? 0 : 1;
  if (axis == 1) axis = delta[1] > delta[2] ? 1 : 2;
  else axis = delta[0] > delta[2] ? 0 : 2;
  // Float32 arithmetic in the SAME operation order as
  // accel/grid.grid_resolution (reciprocal then multiply): libm
  // double pow + divide rounds differently and can flip int(x+1) by
  // one voxel on some scenes, silently diverging from the numpy
  // correctness reference.
  if (delta[axis] == 0.f) {  // fully degenerate mesh: 1-cell grid
    for (int k = 0; k < 3; ++k) {
      g->n[k] = 1;
      g->width[k] = 0.f;
      g->inv_width[k] = 0.f;
    }
  } else {
    float max_inv_width = 1.0f / delta[axis];
    float cube_root = res_mult * std::pow(float(nf), 1.0f / 3.0f);
    float vpud = cube_root * max_inv_width;
    for (int k = 0; k < 3; ++k) {
      g->n[k] = rtpu_iclamp(int(delta[k] * vpud + 1.0f), 1, max_res);
      g->width[k] = delta[k] / g->n[k];
      g->inv_width[k] = g->width[k] == 0.f ? 0.f : 1.f / g->width[k];
    }
  }

  const int64_t total = int64_t(g->n[0]) * g->n[1] * g->n[2];
  std::vector<int64_t> counts(total, 0);
  std::vector<int32_t> vmin(nf * 3), vmax(nf * 3);
  for (long i = 0; i < nf; ++i) {
    const float* a = vert_at(3 * i);
    const float* b = vert_at(3 * i + 1);
    const float* c = vert_at(3 * i + 2);
    for (int k = 0; k < 3; ++k) {
      float lo = std::min(a[k], std::min(b[k], c[k]));
      float hi = std::max(a[k], std::max(b[k], c[k]));
      vmin[3 * i + k] = rtpu_iclamp(int((lo - g->lower[k]) * g->inv_width[k]), 0, g->n[k] - 1);
      vmax[3 * i + k] = rtpu_iclamp(int((hi - g->lower[k]) * g->inv_width[k]), 0, g->n[k] - 1);
    }
  }
  const int64_t nxy = int64_t(g->n[0]) * g->n[1];
  if (exact) {
    // single pass collecting SAT-surviving pairs (tri-major, z-fastest
    // cell order — same pair order as the AABB loops below and the
    // numpy build, so within-cell triangle order is unchanged), then a
    // stable counting sort into the CSR.
    std::vector<int64_t> pcell;
    std::vector<int32_t> ptri;
    double pad[3], lo64[3], w64[3];
    for (int k = 0; k < 3; ++k) {
      lo64[k] = double(g->lower[k]);
      w64[k] = double(g->width[k]);
      pad[k] = std::max(w64[k] * 1e-4, 1e-12);
    }
    for (long i = 0; i < nf; ++i) {
      const float* a = vert_at(3 * i);
      const float* b = vert_at(3 * i + 1);
      const float* c = vert_at(3 * i + 2);
      for (int x = vmin[3 * i]; x <= vmax[3 * i]; ++x)
        for (int y = vmin[3 * i + 1]; y <= vmax[3 * i + 1]; ++y)
          for (int z = vmin[3 * i + 2]; z <= vmax[3 * i + 2]; ++z) {
            const int idx[3] = {x, y, z};
            double u0[3], u1[3], u2[3], h[3];
            for (int k = 0; k < 3; ++k) {
              // numpy order: box_lo/box_hi from the f32 frame, then
              // center/half-extent (+pad)
              double box_lo = lo64[k] + double(idx[k]) * w64[k];
              double box_hi = lo64[k] + (double(idx[k]) + 1.0) * w64[k];
              double ctr = (box_lo + box_hi) * 0.5;
              h[k] = (box_hi - box_lo) * 0.5 + pad[k];
              u0[k] = double(a[k]) - ctr;
              u1[k] = double(b[k]) - ctr;
              u2[k] = double(c[k]) - ctr;
            }
            if (rtpu_tri_box_overlap(u0, u1, u2, h)) {
              pcell.push_back(z * nxy + int64_t(y) * g->n[0] + x);
              ptri.push_back(int32_t(i));
              counts[pcell.back()]++;
            }
          }
    }
    g->cell_start.assign(total + 1, 0);
    for (int64_t i = 0; i < total; ++i)
      g->cell_start[i + 1] = g->cell_start[i] + counts[i];
    g->tri_ids.resize(g->cell_start[total]);
    std::vector<int64_t> cursor(g->cell_start.begin(), g->cell_start.end() - 1);
    for (size_t p = 0; p < pcell.size(); ++p)
      g->tri_ids[cursor[pcell[p]]++] = ptri[p];
    return g;
  }
  for (long i = 0; i < nf; ++i)
    for (int x = vmin[3 * i]; x <= vmax[3 * i]; ++x)
      for (int y = vmin[3 * i + 1]; y <= vmax[3 * i + 1]; ++y)
        for (int z = vmin[3 * i + 2]; z <= vmax[3 * i + 2]; ++z)
          counts[z * nxy + int64_t(y) * g->n[0] + x]++;

  g->cell_start.assign(total + 1, 0);
  for (int64_t i = 0; i < total; ++i)
    g->cell_start[i + 1] = g->cell_start[i] + counts[i];
  g->tri_ids.resize(g->cell_start[total]);
  std::vector<int64_t> cursor(g->cell_start.begin(), g->cell_start.end() - 1);
  for (long i = 0; i < nf; ++i)
    for (int x = vmin[3 * i]; x <= vmax[3 * i]; ++x)
      for (int y = vmin[3 * i + 1]; y <= vmax[3 * i + 1]; ++y)
        for (int z = vmin[3 * i + 2]; z <= vmax[3 * i + 2]; ++z)
          g->tri_ids[cursor[z * nxy + int64_t(y) * g->n[0] + x]++] = int32_t(i);
  return g;
}

RtpuGrid* rtpu_grid_build(const float* verts, long nv, const int32_t* faces,
                          long nf, float res_mult, int max_res) {
  // bad_alloc across the C ABI would std::terminate the host process;
  // return null instead (callers fall back to the numpy builder) —
  // same hardening as the OBJ loader above
  try {
    return rtpu_grid_build_impl(verts, nv, faces, nf, res_mult, max_res, 0);
  } catch (...) {
    return nullptr;
  }
}

// v2 entry point adding SAT-exact insertion; the Python binding probes
// for THIS symbol, so a stale pre-exact libraytpu.so is treated as
// unavailable (numpy fallback) instead of silently ignoring `exact`.
RtpuGrid* rtpu_grid_build_v2(const float* verts, long nv,
                             const int32_t* faces, long nf, float res_mult,
                             int max_res, int exact) {
  try {
    return rtpu_grid_build_impl(verts, nv, faces, nf, res_mult, max_res,
                                exact);
  } catch (...) {
    return nullptr;
  }
}

void rtpu_grid_dims(RtpuGrid* g, int32_t* n3, float* lower3, float* upper3,
                    float* width3, float* inv_width3, int64_t* nnz) {
  for (int k = 0; k < 3; ++k) {
    n3[k] = g->n[k];
    lower3[k] = g->lower[k];
    upper3[k] = g->upper[k];
    width3[k] = g->width[k];
    inv_width3[k] = g->inv_width[k];
  }
  *nnz = int64_t(g->tri_ids.size());
}

void rtpu_grid_fill(RtpuGrid* g, int64_t* cell_start, int32_t* tri_ids) {
  std::memcpy(cell_start, g->cell_start.data(),
              g->cell_start.size() * sizeof(int64_t));
  if (!g->tri_ids.empty())
    std::memcpy(tri_ids, g->tri_ids.data(), g->tri_ids.size() * sizeof(int32_t));
}

void rtpu_grid_free(RtpuGrid* g) { delete g; }

// ---------------------------------------------------------------------------
// Balanced greedy maximal empty boxes (accel/packed.greedy_empty_boxes)
// ---------------------------------------------------------------------------
//
// Per-cell growth is independent of every other cell's extents (it only
// consults the occupancy), so the numpy reference's global lock-step
// round-robin is equivalent to a per-cell sequential round-robin — this
// builder produces BITWISE-identical extents (tests/test_packed.py pins
// the parity) at ~50x the numpy speed (the 128^3 dense-scene build
// measured 48 s in numpy).  Threaded over z-slabs; cells outside the
// grid count as empty (a leap past the boundary just exits the march).

static inline int64_t rtpu_sat_box(const int64_t* S, int nx1, int ny1,
                                   int nz1, int zlo, int zhi, int ylo,
                                   int yhi, int xlo, int xhi) {
  // inclusive cell coords; clip to the grid (outside contributes 0)
  int nzc = nz1 - 1, nyc = ny1 - 1, nxc = nx1 - 1;
  zlo = zlo < 0 ? 0 : (zlo > nzc ? nzc : zlo);
  ylo = ylo < 0 ? 0 : (ylo > nyc ? nyc : ylo);
  xlo = xlo < 0 ? 0 : (xlo > nxc ? nxc : xlo);
  zhi = zhi + 1 < 0 ? 0 : (zhi + 1 > nzc ? nzc : zhi + 1);
  yhi = yhi + 1 < 0 ? 0 : (yhi + 1 > nyc ? nyc : yhi + 1);
  xhi = xhi + 1 < 0 ? 0 : (xhi + 1 > nxc ? nxc : xhi + 1);
  if (zhi <= zlo || yhi <= ylo || xhi <= xlo) return 0;
  auto at = [&](int z, int y, int x) -> int64_t {
    return S[(int64_t(z) * ny1 + y) * nx1 + x];
  };
  return at(zhi, yhi, xhi) - at(zlo, yhi, xhi) - at(zhi, ylo, xhi)
       - at(zhi, yhi, xlo) + at(zlo, ylo, xhi) + at(zlo, yhi, xlo)
       + at(zhi, ylo, xlo) - at(zlo, ylo, xlo);
}

void rtpu_empty_boxes(const uint8_t* occ, long nx, long ny, long nz,
                      int cap, int32_t* ext /* 6 * nz*ny*nx */) {
  const int nx1 = int(nx) + 1, ny1 = int(ny) + 1, nz1 = int(nz) + 1;
  const int64_t cells = nx * ny * nz;
  // summed-area table with a zero boundary plane on each low face
  std::vector<int64_t> S(int64_t(nx1) * ny1 * nz1, 0);
  for (int z = 0; z < nz; ++z)
    for (int y = 0; y < ny; ++y) {
      const uint8_t* row = occ + (int64_t(z) * ny + y) * nx;
      int64_t* out = S.data() + (int64_t(z + 1) * ny1 + (y + 1)) * nx1;
      const int64_t* up = S.data() + (int64_t(z + 1) * ny1 + y) * nx1;
      const int64_t* back = S.data() + (int64_t(z) * ny1 + (y + 1)) * nx1;
      const int64_t* upback = S.data() + (int64_t(z) * ny1 + y) * nx1;
      int64_t run = 0;
      for (int x = 0; x < nx; ++x) {
        run += row[x];
        out[x + 1] = run + up[x + 1] + back[x + 1] - upback[x + 1];
      }
    }

  auto grow_slab = [&](int z0, int z1) {
    for (int z = z0; z < z1; ++z)
      for (int y = 0; y < ny; ++y)
        for (int x = 0; x < nx; ++x) {
          int64_t lin = (int64_t(z) * ny + y) * nx + x;
          if (occ[lin]) {
            for (int d = 0; d < 6; ++d) ext[d * cells + lin] = 0;
            continue;
          }
          // [x-, x+, y-, y+, z-, z+] — the numpy reference's direction
          // order; +1 per direction per round while the added slab is
          // empty (balanced growth — see greedy_empty_boxes on why)
          int e[6] = {0, 0, 0, 0, 0, 0};
          bool grew = true;
          while (grew) {
            grew = false;
            for (int d = 0; d < 6; ++d) {
              if (e[d] >= cap) continue;
              int xlo = x - e[0], xhi = x + e[1];
              int ylo = y - e[2], yhi = y + e[3];
              int zlo = z - e[4], zhi = z + e[5];
              int64_t c;
              switch (d) {
                case 0: c = rtpu_sat_box(S.data(), nx1, ny1, nz1, zlo, zhi, ylo, yhi, xlo - 1, xlo - 1); break;
                case 1: c = rtpu_sat_box(S.data(), nx1, ny1, nz1, zlo, zhi, ylo, yhi, xhi + 1, xhi + 1); break;
                case 2: c = rtpu_sat_box(S.data(), nx1, ny1, nz1, zlo, zhi, ylo - 1, ylo - 1, xlo, xhi); break;
                case 3: c = rtpu_sat_box(S.data(), nx1, ny1, nz1, zlo, zhi, yhi + 1, yhi + 1, xlo, xhi); break;
                case 4: c = rtpu_sat_box(S.data(), nx1, ny1, nz1, zlo - 1, zlo - 1, ylo, yhi, xlo, xhi); break;
                default: c = rtpu_sat_box(S.data(), nx1, ny1, nz1, zhi + 1, zhi + 1, ylo, yhi, xlo, xhi); break;
              }
              if (c == 0) { ++e[d]; grew = true; }
            }
          }
          for (int d = 0; d < 6; ++d) ext[d * cells + lin] = e[d];
        }
  };

  unsigned hw = std::thread::hardware_concurrency();
  int nthreads = int(hw ? (hw < 16 ? hw : 16) : 4);
  if (nthreads > nz) nthreads = int(nz);
  if (nthreads <= 1) {
    grow_slab(0, int(nz));
  } else {
    std::vector<std::thread> ts;
    int per = int((nz + nthreads - 1) / nthreads);
    for (int t = 0; t < nthreads; ++t) {
      int z0 = t * per, z1 = z0 + per > nz ? int(nz) : z0 + per;
      if (z0 >= z1) break;
      ts.emplace_back(grow_slab, z0, z1);
    }
    for (auto& th : ts) th.join();
  }
}

}  // extern "C"
