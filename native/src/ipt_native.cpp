// ipt_native: host-side native runtime for inverse_path_tracer_tpu.
//
// TPU-native equivalent of the reference's C++ host layer (the vendored
// tiny_obj_loader OBJ/MTL parser and the BVH builder, bvh.h:109-205) —
// written from scratch with semantics matching the Python reference
// implementation in scene/obj_loader.py and ops/bvh.py, which serve as
// the oracles in tests/test_native.py.  The device compute path stays
// JAX/XLA/Pallas; this library accelerates scene ingest (hot when
// generating the 100-scene dataset) and tree builds for large meshes.
//
// C ABI only (consumed via ctypes): every entry point returns a handle
// or fills caller-provided buffers; no C++ types cross the boundary.

#include <algorithm>
#include <cctype>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <fstream>
#include <numeric>
#include <sstream>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

struct Vec3 {
  float x = 0, y = 0, z = 0;
};

struct ObjData {
  std::vector<float> vertices;        // nV * 3
  std::vector<float> normals;         // nN * 3
  std::vector<int32_t> faces;         // nF * 3 vertex indices
  std::vector<int32_t> face_normals;  // nF * 3 vn indices (or -1)
  std::vector<int32_t> face_mat;      // nF material slot (-1 = none)
  std::vector<std::string> mat_names; // slot -> usemtl name
  std::string mtllibs;                // newline-joined mtllib entries
  std::string error;
};

int resolve_index(long idx, size_t n) {
  return idx > 0 ? static_cast<int>(idx - 1) : static_cast<int>(n + idx);
}

// Split a polygon, matching the Python loader exactly: triangles pass
// through; quads split on the shortest diagonal with ties going to the
// [0,1,3]+[1,2,3] split; n-gons fan-triangulate.
void emit_face(ObjData &o, const std::vector<int> &vi,
               const std::vector<int> &ni, int mat) {
  size_t n = vi.size();
  if (n < 3) return;
  auto push = [&](int a, int b, int c) {
    o.faces.insert(o.faces.end(), {vi[a], vi[b], vi[c]});
    o.face_normals.insert(o.face_normals.end(), {ni[a], ni[b], ni[c]});
    o.face_mat.push_back(mat);
  };
  if (n == 3) {
    push(0, 1, 2);
  } else if (n == 4) {
    const float *v = o.vertices.data();
    auto d2 = [&](int a, int b) {
      float dx = v[3 * vi[a]] - v[3 * vi[b]];
      float dy = v[3 * vi[a] + 1] - v[3 * vi[b] + 1];
      float dz = v[3 * vi[a] + 2] - v[3 * vi[b] + 2];
      // double accumulation matches numpy float64 diagonal comparison
      return double(dx) * dx + double(dy) * dy + double(dz) * dz;
    };
    if (d2(0, 2) < d2(1, 3)) {
      push(0, 1, 2);
      push(0, 2, 3);
    } else {
      push(0, 1, 3);
      push(1, 2, 3);
    }
  } else {
    for (size_t k = 1; k + 1 < n; ++k)
      push(0, static_cast<int>(k), static_cast<int>(k + 1));
  }
}

ObjData *parse_obj(const char *path) {
  auto *o = new ObjData();
  std::ifstream f(path);
  if (!f) {
    o->error = std::string("cannot open ") + path;
    return o;
  }
  std::unordered_map<std::string, int> mat_slot;
  int cur_mat = -1;
  std::string line;
  while (std::getline(f, line)) {
    // strip
    size_t b = line.find_first_not_of(" \t\r\n");
    if (b == std::string::npos) continue;
    size_t e = line.find_last_not_of(" \t\r\n");
    std::string s = line.substr(b, e - b + 1);
    if (s.empty() || s[0] == '#') continue;
    std::istringstream ss(s);
    std::string tok;
    ss >> tok;
    if (tok == "v") {
      float x = 0, y = 0, z = 0;
      ss >> x >> y >> z;
      o->vertices.insert(o->vertices.end(), {x, y, z});
    } else if (tok == "vn") {
      float x = 0, y = 0, z = 0;
      ss >> x >> y >> z;
      o->normals.insert(o->normals.end(), {x, y, z});
    } else if (tok == "usemtl") {
      std::string name;
      ss >> name;
      auto it = mat_slot.find(name);
      if (it == mat_slot.end()) {
        cur_mat = static_cast<int>(o->mat_names.size());
        mat_slot[name] = cur_mat;
        o->mat_names.push_back(name);
      } else {
        cur_mat = it->second;
      }
    } else if (tok == "mtllib") {
      std::string lib_name;
      while (ss >> lib_name) {
        if (!o->mtllibs.empty()) o->mtllibs += "\n";
        o->mtllibs += lib_name;
      }
    } else if (tok == "f") {
      std::vector<int> vi, ni;
      std::string part;
      while (ss >> part) {
        // formats: v, v/vt, v//vn, v/vt/vn
        long v_idx = 0, n_idx = 0;
        bool has_n = false;
        size_t s1 = part.find('/');
        if (s1 == std::string::npos) {
          v_idx = std::strtol(part.c_str(), nullptr, 10);
        } else {
          v_idx = std::strtol(part.substr(0, s1).c_str(), nullptr, 10);
          size_t s2 = part.find('/', s1 + 1);
          if (s2 != std::string::npos && s2 + 1 < part.size()) {
            n_idx = std::strtol(part.substr(s2 + 1).c_str(), nullptr, 10);
            has_n = true;
          }
        }
        vi.push_back(resolve_index(v_idx, o->vertices.size() / 3));
        ni.push_back(has_n ? resolve_index(n_idx, o->normals.size() / 3) : -1);
      }
      emit_face(*o, vi, ni, cur_mat);
    }
    // mtllib / g / o / s ignored (parity with the Python loader; the
    // scene DSL supplies the MTL path).
  }
  return o;
}

// ---------------- BVH builder (over triangles) ----------------

struct BvhNode {
  float bmin[3], bmax[3];
  int32_t start, n_prims, right_offset;
};

struct BvhData {
  std::vector<BvhNode> nodes;
  std::vector<int32_t> order;
};

struct BvhCtx {
  const float *verts;  // nT * 9
  std::vector<float> cent, tmin, tmax;  // nT * 3 each
  int leaf_size;
  BvhData out;
};

int bvh_recurse(BvhCtx &c, int lo, int hi) {
  int idx = static_cast<int>(c.out.nodes.size());
  c.out.nodes.push_back({});
  BvhNode &node = c.out.nodes.back();
  for (int k = 0; k < 3; ++k) {
    node.bmin[k] = 1e30f;
    node.bmax[k] = -1e30f;
  }
  for (int i = lo; i < hi; ++i) {
    int t = c.out.order[i];
    for (int k = 0; k < 3; ++k) {
      node.bmin[k] = std::fmin(node.bmin[k], c.tmin[3 * t + k]);
      node.bmax[k] = std::fmax(node.bmax[k], c.tmax[3 * t + k]);
    }
  }
  node.start = lo;
  node.n_prims = hi - lo;
  node.right_offset = 0;
  if (hi - lo <= c.leaf_size) return idx;

  // midpoint split on largest centroid extent (stable partition, same
  // rule as ops/bvh.py and the reference bvh.h:175-190)
  float cmin[3] = {1e30f, 1e30f, 1e30f}, cmax[3] = {-1e30f, -1e30f, -1e30f};
  for (int i = lo; i < hi; ++i) {
    int t = c.out.order[i];
    for (int k = 0; k < 3; ++k) {
      cmin[k] = std::fmin(cmin[k], c.cent[3 * t + k]);
      cmax[k] = std::fmax(cmax[k], c.cent[3 * t + k]);
    }
  }
  int axis = 0;
  float best = cmax[0] - cmin[0];
  for (int k = 1; k < 3; ++k)
    if (cmax[k] - cmin[k] > best) {
      best = cmax[k] - cmin[k];
      axis = k;
    }
  float mid = 0.5f * (cmin[axis] + cmax[axis]);

  std::vector<int32_t> sel(c.out.order.begin() + lo, c.out.order.begin() + hi);
  std::vector<int32_t> left, right;
  for (int32_t t : sel)
    (c.cent[3 * t + axis] < mid ? left : right).push_back(t);
  int n_left = static_cast<int>(left.size());
  if (n_left == 0 || n_left == hi - lo) {
    // degenerate: stable sort by centroid, halve
    std::vector<int> ord(sel.size());
    std::iota(ord.begin(), ord.end(), 0);
    std::stable_sort(ord.begin(), ord.end(), [&](int a, int b) {
      return c.cent[3 * sel[a] + axis] < c.cent[3 * sel[b] + axis];
    });
    n_left = (hi - lo) / 2;
    for (size_t i = 0; i < sel.size(); ++i)
      c.out.order[lo + i] = sel[ord[i]];
  } else {
    std::copy(left.begin(), left.end(), c.out.order.begin() + lo);
    std::copy(right.begin(), right.end(), c.out.order.begin() + lo + n_left);
  }
  c.out.nodes[idx].n_prims = 0;
  bvh_recurse(c, lo, lo + n_left);
  int right_idx = bvh_recurse(c, lo + n_left, hi);
  c.out.nodes[idx].right_offset = right_idx - idx;
  return idx;
}

}  // namespace

extern "C" {

// ---- OBJ API ----
void *obj_parse(const char *path) { return parse_obj(path); }

const char *obj_error(void *h) {
  auto *o = static_cast<ObjData *>(h);
  return o->error.empty() ? nullptr : o->error.c_str();
}

int obj_counts(void *h, int32_t *n_verts, int32_t *n_normals, int32_t *n_faces,
               int32_t *n_mats) {
  auto *o = static_cast<ObjData *>(h);
  *n_verts = static_cast<int32_t>(o->vertices.size() / 3);
  *n_normals = static_cast<int32_t>(o->normals.size() / 3);
  *n_faces = static_cast<int32_t>(o->faces.size() / 3);
  *n_mats = static_cast<int32_t>(o->mat_names.size());
  return 0;
}

// Caller allocates buffers sized per obj_counts.
int obj_fill(void *h, float *verts, float *normals, int32_t *faces,
             int32_t *face_normals, int32_t *face_mat) {
  auto *o = static_cast<ObjData *>(h);
  std::memcpy(verts, o->vertices.data(), o->vertices.size() * sizeof(float));
  std::memcpy(normals, o->normals.data(), o->normals.size() * sizeof(float));
  std::memcpy(faces, o->faces.data(), o->faces.size() * sizeof(int32_t));
  std::memcpy(face_normals, o->face_normals.data(),
              o->face_normals.size() * sizeof(int32_t));
  std::memcpy(face_mat, o->face_mat.data(),
              o->face_mat.size() * sizeof(int32_t));
  return 0;
}

// Material name for slot i (NUL-terminated; valid while handle lives).
const char *obj_mat_name(void *h, int32_t i) {
  auto *o = static_cast<ObjData *>(h);
  if (i < 0 || i >= static_cast<int32_t>(o->mat_names.size())) return nullptr;
  return o->mat_names[i].c_str();
}

const char *obj_mtllibs(void *h) {
  return static_cast<ObjData *>(h)->mtllibs.c_str();
}

void obj_free(void *h) { delete static_cast<ObjData *>(h); }

// ---- BVH API ----
// verts: nT*9 floats (tri-major).  Returns a handle.
void *bvh_build(const float *verts, int32_t n_tris, int32_t leaf_size) {
  auto *c = new BvhCtx();
  c->verts = verts;
  c->leaf_size = leaf_size;
  c->cent.resize(n_tris * 3);
  c->tmin.resize(n_tris * 3);
  c->tmax.resize(n_tris * 3);
  for (int t = 0; t < n_tris; ++t) {
    for (int k = 0; k < 3; ++k) {
      float a = verts[9 * t + k], b = verts[9 * t + 3 + k],
            d = verts[9 * t + 6 + k];
      c->cent[3 * t + k] = (a + b + d) / 3.0f;
      c->tmin[3 * t + k] = std::fmin(a, std::fmin(b, d));
      c->tmax[3 * t + k] = std::fmax(a, std::fmax(b, d));
    }
  }
  c->out.order.resize(n_tris);
  std::iota(c->out.order.begin(), c->out.order.end(), 0);
  if (n_tris > 0) bvh_recurse(*c, 0, n_tris);
  return c;
}

int32_t bvh_n_nodes(void *h) {
  return static_cast<int32_t>(static_cast<BvhCtx *>(h)->out.nodes.size());
}

int bvh_fill(void *h, float *bmin, float *bmax, int32_t *start,
             int32_t *n_prims, int32_t *right_offset, int32_t *order) {
  auto *c = static_cast<BvhCtx *>(h);
  for (size_t i = 0; i < c->out.nodes.size(); ++i) {
    const BvhNode &n = c->out.nodes[i];
    std::memcpy(bmin + 3 * i, n.bmin, 3 * sizeof(float));
    std::memcpy(bmax + 3 * i, n.bmax, 3 * sizeof(float));
    start[i] = n.start;
    n_prims[i] = n.n_prims;
    right_offset[i] = n.right_offset;
  }
  std::memcpy(order, c->out.order.data(),
              c->out.order.size() * sizeof(int32_t));
  return 0;
}

void bvh_free(void *h) { delete static_cast<BvhCtx *>(h); }

}  // extern "C"
