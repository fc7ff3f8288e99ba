// Native geometry runtime: OBJ parsing + BVH construction.
//
// The reference keeps these host-side in C++ (tinyobjloader +
// TriangleBvh::build, src/triangle_bvh.cu:615-718). This library provides
// the same capabilities behind a C ABI consumed from Python via ctypes
// (synerfgine_tpu/geometry/native.py); the numpy implementations remain
// as fallback and as the behavior oracle in tests.
//
// Build: make -C native   (produces libsynerfgeom.so)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <sstream>
#include <string>
#include <vector>

namespace {

struct Vec3 {
  float x = 0, y = 0, z = 0;
};

bool parse_obj(const char* path, std::vector<float>& out_tris) {
  std::ifstream f(path);
  if (!f) return false;
  std::vector<Vec3> verts;
  std::string line;
  std::vector<long> face_idx;
  while (std::getline(f, line)) {
    if (line.size() < 2) continue;
    if (line[0] == 'v' && line[1] == ' ') {
      Vec3 v;
      if (sscanf(line.c_str() + 2, "%f %f %f", &v.x, &v.y, &v.z) == 3)
        verts.push_back(v);
    } else if (line[0] == 'f' && line[1] == ' ') {
      face_idx.clear();
      std::istringstream ss(line.substr(2));
      std::string tok;
      while (ss >> tok) {
        // "i", "i/j", "i//k", "i/j/k"
        long i = strtol(tok.c_str(), nullptr, 10);
        if (i < 0) i = (long)verts.size() + i + 1;
        face_idx.push_back(i - 1);
      }
      for (size_t k = 1; k + 1 < face_idx.size(); ++k) {  // fan
        const long idx[3] = {face_idx[0], face_idx[k], face_idx[k + 1]};
        for (int j = 0; j < 3; ++j) {
          if (idx[j] < 0 || idx[j] >= (long)verts.size()) return false;
          const Vec3& v = verts[idx[j]];
          out_tris.push_back(v.x);
          out_tris.push_back(v.y);
          out_tris.push_back(v.z);
        }
      }
    }
  }
  return true;
}

struct BvhBuilder {
  const float* tris;  // (T, 9)
  int leaf_size;
  std::vector<float> lo, hi;
  std::vector<int> left, right, first, count;
  std::vector<long long> order;
  std::vector<float> centroids;  // (T, 3)

  int new_node() {
    lo.insert(lo.end(), {0, 0, 0});
    hi.insert(hi.end(), {0, 0, 0});
    left.push_back(-1);
    right.push_back(-1);
    first.push_back(0);
    count.push_back(0);
    return (int)left.size() - 1;
  }

  void node_bounds(int node, const std::vector<long long>& idx, size_t a,
                   size_t b) {
    float mn[3] = {1e30f, 1e30f, 1e30f}, mx[3] = {-1e30f, -1e30f, -1e30f};
    for (size_t i = a; i < b; ++i) {
      const float* t = tris + idx[i] * 9;
      for (int v = 0; v < 3; ++v)
        for (int d = 0; d < 3; ++d) {
          mn[d] = std::min(mn[d], t[v * 3 + d]);
          mx[d] = std::max(mx[d], t[v * 3 + d]);
        }
    }
    for (int d = 0; d < 3; ++d) {
      lo[node * 3 + d] = mn[d];
      hi[node * 3 + d] = mx[d];
    }
  }

  // iterative median-split build (max-variance axis, like the numpy
  // builder and the reference's CPU build)
  void build(int n_tris) {
    std::vector<long long> idx(n_tris);
    for (int i = 0; i < n_tris; ++i) idx[i] = i;
    centroids.resize((size_t)n_tris * 3);
    for (int i = 0; i < n_tris; ++i)
      for (int d = 0; d < 3; ++d)
        centroids[(size_t)i * 3 + d] =
            (tris[i * 9 + d] + tris[i * 9 + 3 + d] + tris[i * 9 + 6 + d]) / 3.f;

    struct Task {
      int node;
      size_t a, b;
    };
    std::vector<Task> stack;
    int root = new_node();
    stack.push_back({root, 0, (size_t)n_tris});
    while (!stack.empty()) {
      Task t = stack.back();
      stack.pop_back();
      node_bounds(t.node, idx, t.a, t.b);
      size_t n = t.b - t.a;
      if ((int)n <= leaf_size) {
        first[t.node] = (int)order.size();
        count[t.node] = (int)n;
        for (size_t i = t.a; i < t.b; ++i) order.push_back(idx[i]);
        continue;
      }
      // max-variance axis of centroids
      double mean[3] = {0, 0, 0}, var[3] = {0, 0, 0};
      for (size_t i = t.a; i < t.b; ++i)
        for (int d = 0; d < 3; ++d) mean[d] += centroids[idx[i] * 3 + d];
      for (int d = 0; d < 3; ++d) mean[d] /= (double)n;
      for (size_t i = t.a; i < t.b; ++i)
        for (int d = 0; d < 3; ++d) {
          double c = centroids[idx[i] * 3 + d] - mean[d];
          var[d] += c * c;
        }
      int axis = 0;
      if (var[1] > var[axis]) axis = 1;
      if (var[2] > var[axis]) axis = 2;
      size_t mid = t.a + n / 2;
      std::nth_element(idx.begin() + t.a, idx.begin() + mid, idx.begin() + t.b,
                       [&](long long x, long long y) {
                         return centroids[x * 3 + axis] < centroids[y * 3 + axis];
                       });
      int l = new_node();
      int r = new_node();
      left[t.node] = l;
      right[t.node] = r;
      stack.push_back({l, t.a, mid});
      stack.push_back({r, mid, t.b});
    }
  }
};

}  // namespace

extern "C" {

// Returns the triangle count, or -1 on error.
int sg_obj_count(const char* path) {
  std::vector<float> tris;
  if (!parse_obj(path, tris)) return -1;
  return (int)(tris.size() / 9);
}

// out must hold max_tris*9 floats. Returns count written, or -1.
int sg_obj_load(const char* path, float* out, int max_tris) {
  std::vector<float> tris;
  if (!parse_obj(path, tris)) return -1;
  int n = (int)(tris.size() / 9);
  if (n > max_tris) n = max_tris;
  memcpy(out, tris.data(), (size_t)n * 9 * sizeof(float));
  return n;
}

// Builds the BVH; arrays must hold up to 2*n_tris nodes (and n_tris order
// entries). Returns node count, or -1 if capacity is insufficient.
int sg_bvh_build(const float* tris, int n_tris, int leaf_size,
                 float* bounds_lo, float* bounds_hi, int* left, int* right,
                 int* first, int* count, long long* tri_order, int max_nodes) {
  BvhBuilder b;
  b.tris = tris;
  b.leaf_size = leaf_size;
  b.build(n_tris);
  int n_nodes = (int)b.left.size();
  if (n_nodes > max_nodes) return -1;
  memcpy(bounds_lo, b.lo.data(), (size_t)n_nodes * 3 * sizeof(float));
  memcpy(bounds_hi, b.hi.data(), (size_t)n_nodes * 3 * sizeof(float));
  memcpy(left, b.left.data(), (size_t)n_nodes * sizeof(int));
  memcpy(right, b.right.data(), (size_t)n_nodes * sizeof(int));
  memcpy(first, b.first.data(), (size_t)n_nodes * sizeof(int));
  memcpy(count, b.count.data(), (size_t)n_nodes * sizeof(int));
  memcpy(tri_order, b.order.data(), (size_t)n_tris * sizeof(long long));
  return n_nodes;
}
}
