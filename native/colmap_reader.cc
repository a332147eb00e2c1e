// Fast COLMAP binary model reader (C core, ctypes-consumed).
//
// The pipeline only needs bulk arrays (point xyz, image quaternions/
// translations/names); decoding ~1e6 variable-length records through
// Python struct calls takes tens of seconds per Phototourism scene, this
// does it in milliseconds. Layouts follow COLMAP src/base/reconstruction.cc
// (same formats as upnerf/data/colmap.py, which remains the portable
// fallback).
//
// Build: sh native/build.sh   (g++ -O2 -shared -fPIC)
//
// Two-pass API: call with NULL output pointers to obtain counts, allocate
// numpy arrays in Python, call again to fill. All outputs little-endian
// native doubles/ints. Returns 0 on success, negative errno-style codes.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

struct Buf {
  std::vector<unsigned char> data;
  size_t off = 0;
  bool ok = true;

  bool load(const char* path) {
    FILE* f = std::fopen(path, "rb");
    if (!f) return false;
    std::fseek(f, 0, SEEK_END);
    long size = std::ftell(f);
    std::fseek(f, 0, SEEK_SET);
    data.resize(static_cast<size_t>(size));
    size_t got = size ? std::fread(data.data(), 1, size, f) : 0;
    std::fclose(f);
    return got == static_cast<size_t>(size);
  }

  template <typename T>
  T read() {
    if (off + sizeof(T) > data.size()) {
      ok = false;
      return T{};
    }
    T v;
    std::memcpy(&v, data.data() + off, sizeof(T));
    off += sizeof(T);
    return v;
  }

  bool skip(size_t n) {
    if (off + n > data.size()) {
      ok = false;
      return false;
    }
    off += n;
    return true;
  }
};

int num_cam_params(int model_id) {
  switch (model_id) {
    case 0: return 3;   // SIMPLE_PINHOLE
    case 1: return 4;   // PINHOLE
    case 2: return 4;   // SIMPLE_RADIAL
    case 3: return 5;   // RADIAL
    case 4: return 8;   // OPENCV
    case 5: return 8;   // OPENCV_FISHEYE
    case 6: return 12;  // FULL_OPENCV
    case 7: return 5;   // FOV
    case 8: return 4;   // SIMPLE_RADIAL_FISHEYE
    case 9: return 5;   // RADIAL_FISHEYE
    case 10: return 12; // THIN_PRISM_FISHEYE
    default: return -1;
  }
}

}  // namespace

extern "C" {

// points3D.bin -> xyz (n, 3) doubles [+ rgb (n, 3) uint8 if non-null].
// First call with xyz==NULL: *n_out = point count.
int colmap_read_points3d(const char* path, double* xyz, unsigned char* rgb,
                         long long* n_out) {
  Buf b;
  if (!b.load(path)) return -1;
  const uint64_t n = b.read<uint64_t>();
  if (n_out) *n_out = static_cast<long long>(n);
  for (uint64_t i = 0; i < n; ++i) {
    b.skip(8);  // point id
    double x = b.read<double>(), y = b.read<double>(), z = b.read<double>();
    unsigned char r = b.read<unsigned char>(), g = b.read<unsigned char>(),
                  bl = b.read<unsigned char>();
    b.skip(8);  // reprojection error
    const uint64_t track = b.read<uint64_t>();
    b.skip(8 * track);
    if (!b.ok) return -2;
    if (xyz) {
      xyz[3 * i] = x;
      xyz[3 * i + 1] = y;
      xyz[3 * i + 2] = z;
    }
    if (rgb) {
      rgb[3 * i] = r;
      rgb[3 * i + 1] = g;
      rgb[3 * i + 2] = bl;
    }
  }
  return 0;
}

// images.bin -> ids (n), qvec (n,4), tvec (n,3), camera_ids (n),
// names packed as NUL-separated bytes (names_cap bytes available).
// First call with ids==NULL: *n_out = image count, *names_len_out = total
// packed-name bytes (incl. NULs).
int colmap_read_images(const char* path, int* ids, double* qvec, double* tvec,
                       int* camera_ids, char* names, long long names_cap,
                       long long* n_out, long long* names_len_out) {
  Buf b;
  if (!b.load(path)) return -1;
  const uint64_t n = b.read<uint64_t>();
  if (n_out) *n_out = static_cast<long long>(n);
  long long name_bytes = 0;
  for (uint64_t i = 0; i < n; ++i) {
    const int32_t id = b.read<int32_t>();
    double q[4], t[3];
    for (double& v : q) v = b.read<double>();
    for (double& v : t) v = b.read<double>();
    const int32_t cam_id = b.read<int32_t>();
    // NUL-terminated name
    size_t start = b.off;
    while (b.off < b.data.size() && b.data[b.off] != 0) ++b.off;
    if (b.off >= b.data.size()) return -2;
    size_t len = b.off - start;
    ++b.off;  // consume NUL
    const uint64_t npts = b.read<uint64_t>();
    b.skip(24 * npts);
    if (!b.ok) return -2;

    if (ids) {
      ids[i] = id;
      camera_ids[i] = cam_id;
      std::memcpy(qvec + 4 * i, q, sizeof(q));
      std::memcpy(tvec + 3 * i, t, sizeof(t));
      if (names && name_bytes + static_cast<long long>(len) + 1 <= names_cap) {
        std::memcpy(names + name_bytes, b.data.data() + start, len);
        names[name_bytes + len] = 0;
      }
    }
    name_bytes += static_cast<long long>(len) + 1;
  }
  if (names_len_out) *names_len_out = name_bytes;
  return 0;
}

// cameras.bin -> ids (n), model_ids (n), wh (n,2) int64, params (n, 12)
// doubles zero-padded. First call with ids==NULL: *n_out = count.
int colmap_read_cameras(const char* path, int* ids, int* model_ids,
                        long long* wh, double* params, long long* n_out) {
  Buf b;
  if (!b.load(path)) return -1;
  const uint64_t n = b.read<uint64_t>();
  if (n_out) *n_out = static_cast<long long>(n);
  for (uint64_t i = 0; i < n; ++i) {
    const int32_t id = b.read<int32_t>();
    const int32_t model = b.read<int32_t>();
    const uint64_t w = b.read<uint64_t>();
    const uint64_t h = b.read<uint64_t>();
    const int np = num_cam_params(model);
    if (np < 0) return -3;
    double p[12] = {0};
    for (int k = 0; k < np; ++k) p[k] = b.read<double>();
    if (!b.ok) return -2;
    if (ids) {
      ids[i] = id;
      model_ids[i] = model;
      wh[2 * i] = static_cast<long long>(w);
      wh[2 * i + 1] = static_cast<long long>(h);
      std::memcpy(params + 12 * i, p, sizeof(p));
    }
  }
  return 0;
}

}  // extern "C"
