// Native mesh-processing runtime for the TPU framework.
//
// Host-side counterpart of the reference's mcubes / pymeshlab / pyfqmr stack
// (reference meshutils.py, nerf/renderer.py:497-698 export_stage0):
//   - iso-surface extraction via marching tetrahedra (6-tet cube split) with
//     welded vertices (watertight on shared edges),
//   - quadric-error-metric (QEM) edge-collapse decimation,
//   - connected-component cleanup (min face count / min diameter),
//   - vertex welding.
//
// Exposed with a plain C ABI for ctypes; buffers are allocated here and
// released with mesh_free(). Built by native/build.sh into libmeshops.so.

#include <array>
#include <cstdint>
#include <cstring>
#include <cmath>
#include <cstdlib>
#include <functional>
#include <vector>
#include <unordered_map>
#include <queue>
#include <algorithm>

namespace {

struct V3 {
    double x = 0, y = 0, z = 0;
    V3() = default;
    V3(double a, double b, double c) : x(a), y(b), z(c) {}
    V3 operator+(const V3& o) const { return {x + o.x, y + o.y, z + o.z}; }
    V3 operator-(const V3& o) const { return {x - o.x, y - o.y, z - o.z}; }
    V3 operator*(double s) const { return {x * s, y * s, z * s}; }
    double dot(const V3& o) const { return x * o.x + y * o.y + z * o.z; }
    V3 cross(const V3& o) const {
        return {y * o.z - z * o.y, z * o.x - x * o.z, x * o.y - y * o.x};
    }
    double norm() const { return std::sqrt(dot(*this)); }
};

// Symmetric 4x4 quadric (10 unique coefficients) for QEM.
struct Quadric {
    double m[10] = {0};
    void addPlane(double a, double b, double c, double d) {
        m[0] += a * a; m[1] += a * b; m[2] += a * c; m[3] += a * d;
        m[4] += b * b; m[5] += b * c; m[6] += b * d;
        m[7] += c * c; m[8] += c * d;
        m[9] += d * d;
    }
    Quadric operator+(const Quadric& o) const {
        Quadric q;
        for (int i = 0; i < 10; i++) q.m[i] = m[i] + o.m[i];
        return q;
    }
    double eval(const V3& v) const {
        return m[0] * v.x * v.x + 2 * m[1] * v.x * v.y + 2 * m[2] * v.x * v.z +
               2 * m[3] * v.x + m[4] * v.y * v.y + 2 * m[5] * v.y * v.z +
               2 * m[6] * v.y + m[7] * v.z * v.z + 2 * m[8] * v.z + m[9];
    }
};

struct EdgeKey {
    uint64_t k;
    bool operator==(const EdgeKey& o) const { return k == o.k; }
};
struct EdgeKeyHash {
    size_t operator()(const EdgeKey& e) const { return std::hash<uint64_t>()(e.k); }
};
inline EdgeKey edge_key(uint32_t a, uint32_t b) {
    if (a > b) std::swap(a, b);
    return {(uint64_t(a) << 32) | b};
}

}  // namespace

extern "C" {

void mesh_free(void* p) { std::free(p); }

// ---------------------------------------------------------------------------
// Marching tetrahedra iso-surface extraction.
// grid: [nx*ny*nz] row-major (x-major: index = (x*ny + y)*nz + z), values f.
// Surface at f == iso, vertices emitted where f crosses iso, oriented so that
// triangle normals point toward LOWER field values (outward for density
// fields thresholded as inside>iso).
// Returns 0 on success; out buffers allocated with malloc.
// ---------------------------------------------------------------------------
int marching_tets(const float* grid, int nx, int ny, int nz, float iso,
                  const float* origin, const float* spacing,
                  float** out_verts, int64_t* out_nv,
                  int32_t** out_tris, int64_t* out_nt) {
    // The 6-tetrahedron decomposition of a cube (corner ids 0..7 with
    // corner c = (x + (c&1), y + ((c>>1)&1), z + ((c>>2)&1))).
    // Six tetrahedra around the body diagonal 0-7; each is {0, a, b, 7} for a
    // cube-edge path 0 -> a -> b -> 7.  This split uses the same face diagonal
    // on the shared face of adjacent cubes, so welded vertices are crack-free.
    static const int TETS[6][4] = {
        {0, 1, 3, 7}, {0, 1, 5, 7}, {0, 2, 3, 7},
        {0, 2, 6, 7}, {0, 4, 5, 7}, {0, 4, 6, 7},
    };
    auto gid = [&](int x, int y, int z) -> int64_t {
        return (int64_t(x) * ny + y) * nz + z;
    };

    std::vector<float> verts;
    std::vector<int32_t> tris;
    // Weld vertices on grid edges: key = (min_gid, max_gid) of the crossing edge.
    std::unordered_map<EdgeKey, int32_t, EdgeKeyHash> edge_vert;

    auto vert_on_edge = [&](int64_t ga, int64_t gb, V3 pa, V3 pb,
                            float fa, float fb) -> int32_t {
        uint64_t a = uint64_t(ga), b = uint64_t(gb);
        if (a > b) { std::swap(a, b); std::swap(fa, fb); std::swap(pa, pb); }
        EdgeKey k{(a << 32) | b};
        auto it = edge_vert.find(k);
        if (it != edge_vert.end()) return it->second;
        double t = (std::fabs(fb - fa) > 1e-12) ? (iso - fa) / (fb - fa) : 0.5;
        t = std::min(1.0, std::max(0.0, t));
        V3 p = pa + (pb - pa) * t;
        int32_t id = int32_t(verts.size() / 3);
        verts.push_back(float(p.x));
        verts.push_back(float(p.y));
        verts.push_back(float(p.z));
        edge_vert.emplace(k, id);
        return id;
    };

    for (int x = 0; x < nx - 1; x++) {
        for (int y = 0; y < ny - 1; y++) {
            for (int z = 0; z < nz - 1; z++) {
                float f[8];
                V3 p[8];
                int64_t g[8];
                bool any_in = false, any_out = false;
                for (int c = 0; c < 8; c++) {
                    int cx = x + (c & 1), cy = y + ((c >> 1) & 1), cz = z + ((c >> 2) & 1);
                    g[c] = gid(cx, cy, cz);
                    f[c] = grid[g[c]];
                    p[c] = V3(origin[0] + cx * spacing[0],
                              origin[1] + cy * spacing[1],
                              origin[2] + cz * spacing[2]);
                    (f[c] > iso ? any_in : any_out) = true;
                }
                if (!any_in || !any_out) continue;

                for (const auto& tet : TETS) {
                    int vi[4] = {tet[0], tet[1], tet[2], tet[3]};
                    int inside = 0, code = 0;
                    for (int i = 0; i < 4; i++)
                        if (f[vi[i]] > iso) { inside++; code |= (1 << i); }
                    if (inside == 0 || inside == 4) continue;

                    auto emit = [&](int a0, int b0, int a1, int b1, int a2, int b2) {
                        int32_t v0 = vert_on_edge(g[vi[a0]], g[vi[b0]], p[vi[a0]], p[vi[b0]], f[vi[a0]], f[vi[b0]]);
                        int32_t v1 = vert_on_edge(g[vi[a1]], g[vi[b1]], p[vi[a1]], p[vi[b1]], f[vi[a1]], f[vi[b1]]);
                        int32_t v2 = vert_on_edge(g[vi[a2]], g[vi[b2]], p[vi[a2]], p[vi[b2]], f[vi[a2]], f[vi[b2]]);
                        if (v0 == v1 || v1 == v2 || v0 == v2) return;
                        tris.push_back(v0);
                        tris.push_back(v1);
                        tris.push_back(v2);
                    };

                    // Orient: triangle normal points away from the "inside"
                    // (f > iso) vertices. Case tables for 1 and 2 inside.
                    if (inside == 1 || inside == 3) {
                        int lone = -1;
                        for (int i = 0; i < 4; i++) {
                            bool in_i = (code >> i) & 1;
                            if ((inside == 1 && in_i) || (inside == 3 && !in_i)) lone = i;
                        }
                        int o[3], oi = 0;
                        for (int i = 0; i < 4; i++)
                            if (i != lone) o[oi++] = i;
                        // winding: consistent orientation w.r.t. tet parity
                        emit(lone, o[0], lone, o[1], lone, o[2]);
                        // fix orientation by geometric check below
                        size_t n = tris.size();
                        if (n >= 3) {
                            V3 a(verts[3 * tris[n - 3]], verts[3 * tris[n - 3] + 1], verts[3 * tris[n - 3] + 2]);
                            V3 b(verts[3 * tris[n - 2]], verts[3 * tris[n - 2] + 1], verts[3 * tris[n - 2] + 2]);
                            V3 c(verts[3 * tris[n - 1]], verts[3 * tris[n - 1] + 1], verts[3 * tris[n - 1] + 2]);
                            V3 nrm = (b - a).cross(c - a);
                            V3 inward = p[vi[lone]] - a;  // toward the lone vertex
                            bool lone_inside = (inside == 1);
                            // normal should point away from inside region
                            double d = nrm.dot(inward);
                            if ((lone_inside && d > 0) || (!lone_inside && d < 0)) {
                                std::swap(tris[n - 2], tris[n - 1]);
                            }
                        }
                    } else {  // inside == 2: quad -> 2 triangles
                        int ins[2], outs[2], ii = 0, oo = 0;
                        for (int i = 0; i < 4; i++)
                            ((code >> i) & 1 ? ins[ii++] : outs[oo++]) = i;
                        // quad corners on edges (in0-out0, in0-out1, in1-out1, in1-out0)
                        int32_t q0 = vert_on_edge(g[vi[ins[0]]], g[vi[outs[0]]], p[vi[ins[0]]], p[vi[outs[0]]], f[vi[ins[0]]], f[vi[outs[0]]]);
                        int32_t q1 = vert_on_edge(g[vi[ins[0]]], g[vi[outs[1]]], p[vi[ins[0]]], p[vi[outs[1]]], f[vi[ins[0]]], f[vi[outs[1]]]);
                        int32_t q2 = vert_on_edge(g[vi[ins[1]]], g[vi[outs[1]]], p[vi[ins[1]]], p[vi[outs[1]]], f[vi[ins[1]]], f[vi[outs[1]]]);
                        int32_t q3 = vert_on_edge(g[vi[ins[1]]], g[vi[outs[0]]], p[vi[ins[1]]], p[vi[outs[0]]], f[vi[ins[1]]], f[vi[outs[0]]]);
                        auto push_oriented = [&](int32_t a0, int32_t a1, int32_t a2) {
                            if (a0 == a1 || a1 == a2 || a0 == a2) return;
                            V3 a(verts[3 * a0], verts[3 * a0 + 1], verts[3 * a0 + 2]);
                            V3 b(verts[3 * a1], verts[3 * a1 + 1], verts[3 * a1 + 2]);
                            V3 c(verts[3 * a2], verts[3 * a2 + 1], verts[3 * a2 + 2]);
                            V3 nrm = (b - a).cross(c - a);
                            V3 to_in = (p[vi[ins[0]]] + p[vi[ins[1]]]) * 0.5 - a;
                            if (nrm.dot(to_in) > 0) std::swap(a1, a2);
                            tris.push_back(a0);
                            tris.push_back(a1);
                            tris.push_back(a2);
                        };
                        push_oriented(q0, q1, q2);
                        push_oriented(q0, q2, q3);
                    }
                }
            }
        }
    }

    *out_nv = int64_t(verts.size() / 3);
    *out_nt = int64_t(tris.size() / 3);
    *out_verts = (float*)std::malloc(verts.size() * sizeof(float));
    *out_tris = (int32_t*)std::malloc(tris.size() * sizeof(int32_t));
    std::memcpy(*out_verts, verts.data(), verts.size() * sizeof(float));
    std::memcpy(*out_tris, tris.data(), tris.size() * sizeof(int32_t));
    return 0;
}

// ---------------------------------------------------------------------------
// QEM edge-collapse decimation (Garland-Heckbert) to a target face count.
// ---------------------------------------------------------------------------
int decimate_qem(const float* verts_in, int64_t nv, const int32_t* tris_in,
                 int64_t nt, int64_t target_faces,
                 float** out_verts, int64_t* out_nv,
                 int32_t** out_tris, int64_t* out_nt) {
    std::vector<V3> V(nv);
    for (int64_t i = 0; i < nv; i++)
        V[i] = V3(verts_in[3 * i], verts_in[3 * i + 1], verts_in[3 * i + 2]);
    std::vector<int32_t> F(tris_in, tris_in + 3 * nt);
    std::vector<bool> face_dead(nt, false);
    std::vector<Quadric> Q(nv);
    std::vector<std::vector<int32_t>> vfaces(nv);

    auto face_plane = [&](int64_t f, double* abcd) -> bool {
        V3 a = V[F[3 * f]], b = V[F[3 * f + 1]], c = V[F[3 * f + 2]];
        V3 n = (b - a).cross(c - a);
        double len = n.norm();
        if (len < 1e-14) return false;
        n = n * (1.0 / len);
        abcd[0] = n.x; abcd[1] = n.y; abcd[2] = n.z; abcd[3] = -n.dot(a);
        return true;
    };

    for (int64_t f = 0; f < nt; f++) {
        double pl[4];
        for (int k = 0; k < 3; k++) vfaces[F[3 * f + k]].push_back(int32_t(f));
        if (!face_plane(f, pl)) continue;
        for (int k = 0; k < 3; k++) Q[F[3 * f + k]].addPlane(pl[0], pl[1], pl[2], pl[3]);
    }

    struct Cand {
        double cost;
        uint32_t a, b;
        uint32_t gen;  // lazy invalidation
        bool operator<(const Cand& o) const { return cost > o.cost; }
    };
    std::vector<uint32_t> gen(nv, 0);
    std::priority_queue<Cand> heap;

    auto midpoint_cost = [&](uint32_t a, uint32_t b, V3* best) -> double {
        Quadric q = Q[a] + Q[b];
        // candidates: midpoint, a, b (skip the 4x4 solve; robust and fast)
        V3 cands[3] = {(V[a] + V[b]) * 0.5, V[a], V[b]};
        double bc = 1e300;
        for (auto& c : cands) {
            double e = q.eval(c);
            if (e < bc) { bc = e; *best = c; }
        }
        return bc;
    };

    std::unordered_map<EdgeKey, bool, EdgeKeyHash> seen;
    for (int64_t f = 0; f < nt; f++) {
        for (int k = 0; k < 3; k++) {
            uint32_t a = F[3 * f + k], b = F[3 * f + (k + 1) % 3];
            EdgeKey e = edge_key(a, b);
            if (seen.emplace(e, true).second) {
                V3 best;
                double c = midpoint_cost(a, b, &best);
                heap.push({c, std::min(a, b), std::max(a, b), 0});
            }
        }
    }

    std::vector<int32_t> remap(nv);
    for (int64_t i = 0; i < nv; i++) remap[i] = int32_t(i);
    auto find = [&](int32_t v) {
        while (remap[v] != v) { remap[v] = remap[remap[v]]; v = remap[v]; }
        return v;
    };

    int64_t live_faces = nt;
    while (live_faces > target_faces && !heap.empty()) {
        Cand c = heap.top();
        heap.pop();
        uint32_t a = uint32_t(find(c.a)), b = uint32_t(find(c.b));
        if (a == b) continue;
        if (c.gen != gen[a] + gen[b]) continue;  // stale

        V3 best;
        midpoint_cost(a, b, &best);

        // collapse b into a
        remap[b] = a;
        V[a] = best;
        Q[a] = Q[a] + Q[b];
        gen[a]++;

        // merge face lists, kill degenerate faces
        for (int32_t f : vfaces[b]) vfaces[a].push_back(f);
        std::vector<int32_t> keep;
        keep.reserve(vfaces[a].size());
        for (int32_t f : vfaces[a]) {
            if (face_dead[f]) continue;
            int32_t i0 = find(F[3 * f]), i1 = find(F[3 * f + 1]), i2 = find(F[3 * f + 2]);
            if (i0 == i1 || i1 == i2 || i0 == i2) {
                face_dead[f] = true;
                live_faces--;
                continue;
            }
            keep.push_back(f);
        }
        vfaces[a] = std::move(keep);
        vfaces[b].clear();

        // re-push neighbor edges
        std::unordered_map<EdgeKey, bool, EdgeKeyHash> local;
        for (int32_t f : vfaces[a]) {
            for (int k = 0; k < 3; k++) {
                uint32_t x = uint32_t(find(F[3 * f + k]));
                uint32_t y = uint32_t(find(F[3 * f + (k + 1) % 3]));
                if (x == y) continue;
                if (x != a && y != a) continue;
                EdgeKey e = edge_key(x, y);
                if (!local.emplace(e, true).second) continue;
                V3 bb;
                double cost = midpoint_cost(x, y, &bb);
                heap.push({cost, std::min(x, y), std::max(x, y), gen[x] + gen[y]});
            }
        }
    }

    // compact output
    std::vector<int32_t> vid(nv, -1);
    std::vector<float> ov;
    std::vector<int32_t> ot;
    for (int64_t f = 0; f < nt; f++) {
        if (face_dead[f]) continue;
        int32_t idx[3];
        for (int k = 0; k < 3; k++) {
            int32_t v = find(F[3 * f + k]);
            if (vid[v] < 0) {
                vid[v] = int32_t(ov.size() / 3);
                ov.push_back(float(V[v].x));
                ov.push_back(float(V[v].y));
                ov.push_back(float(V[v].z));
            }
            idx[k] = vid[v];
        }
        if (idx[0] == idx[1] || idx[1] == idx[2] || idx[0] == idx[2]) continue;
        ot.push_back(idx[0]);
        ot.push_back(idx[1]);
        ot.push_back(idx[2]);
    }

    *out_nv = int64_t(ov.size() / 3);
    *out_nt = int64_t(ot.size() / 3);
    *out_verts = (float*)std::malloc(std::max<size_t>(ov.size(), 1) * sizeof(float));
    *out_tris = (int32_t*)std::malloc(std::max<size_t>(ot.size(), 1) * sizeof(int32_t));
    std::memcpy(*out_verts, ov.data(), ov.size() * sizeof(float));
    std::memcpy(*out_tris, ot.data(), ot.size() * sizeof(int32_t));
    return 0;
}

// ---------------------------------------------------------------------------
// Connected-component cleanup: drop components with < min_faces faces or
// bounding-box diagonal < min_diameter (reference meshutils.py clean_mesh
// min_f / min_d semantics).
// ---------------------------------------------------------------------------
int clean_components(const float* verts_in, int64_t nv, const int32_t* tris_in,
                     int64_t nt, int32_t min_faces, float min_diameter,
                     float** out_verts, int64_t* out_nv,
                     int32_t** out_tris, int64_t* out_nt) {
    std::vector<int32_t> parent(nv);
    for (int64_t i = 0; i < nv; i++) parent[i] = int32_t(i);
    std::function<int32_t(int32_t)> find = [&](int32_t v) {
        while (parent[v] != v) { parent[v] = parent[parent[v]]; v = parent[v]; }
        return v;
    };
    for (int64_t f = 0; f < nt; f++) {
        int32_t a = find(tris_in[3 * f]), b = find(tris_in[3 * f + 1]), c = find(tris_in[3 * f + 2]);
        parent[b] = a;
        parent[find(c)] = find(a);
    }

    std::unordered_map<int32_t, int64_t> comp_faces;
    std::unordered_map<int32_t, std::array<double, 6>> comp_bbox;
    for (int64_t f = 0; f < nt; f++) {
        int32_t r = find(tris_in[3 * f]);
        comp_faces[r]++;
        auto it = comp_bbox.find(r);
        if (it == comp_bbox.end()) {
            comp_bbox[r] = {1e30, 1e30, 1e30, -1e30, -1e30, -1e30};
            it = comp_bbox.find(r);
        }
        for (int k = 0; k < 3; k++) {
            const float* p = verts_in + 3 * tris_in[3 * f + k];
            for (int d = 0; d < 3; d++) {
                it->second[d] = std::min(it->second[d], double(p[d]));
                it->second[3 + d] = std::max(it->second[3 + d], double(p[d]));
            }
        }
    }

    std::vector<int32_t> vid(nv, -1);
    std::vector<float> ov;
    std::vector<int32_t> ot;
    for (int64_t f = 0; f < nt; f++) {
        int32_t r = find(tris_in[3 * f]);
        auto& bb = comp_bbox[r];
        double dx = bb[3] - bb[0], dy = bb[4] - bb[1], dz = bb[5] - bb[2];
        double diag = std::sqrt(dx * dx + dy * dy + dz * dz);
        if (comp_faces[r] < min_faces && diag < min_diameter) continue;
        for (int k = 0; k < 3; k++) {
            int32_t v = tris_in[3 * f + k];
            if (vid[v] < 0) {
                vid[v] = int32_t(ov.size() / 3);
                ov.push_back(verts_in[3 * v]);
                ov.push_back(verts_in[3 * v + 1]);
                ov.push_back(verts_in[3 * v + 2]);
            }
            ot.push_back(vid[v]);
        }
    }

    *out_nv = int64_t(ov.size() / 3);
    *out_nt = int64_t(ot.size() / 3);
    *out_verts = (float*)std::malloc(std::max<size_t>(ov.size(), 1) * sizeof(float));
    *out_tris = (int32_t*)std::malloc(std::max<size_t>(ot.size(), 1) * sizeof(int32_t));
    std::memcpy(*out_verts, ov.data(), ov.size() * sizeof(float));
    std::memcpy(*out_tris, ot.data(), ot.size() * sizeof(int32_t));
    return 0;
}

}  // extern "C"
