// Native PCD v0.7 reader/writer (x/y/z extraction).
//
// TPU-native counterpart of the reference's point-cloud I/O dependency
// (reference: ETHZ_experiments/catkin_ws/src/sensors/src/pcl_tools/
// pcl_loader.py:9-103, which delegates parsing to the pypcd4 package).
// The GT maps are multi-million-point clouds loaded at every dataset
// construction; this parser streams the payload once and handles the
// ascii / binary / binary_compressed (LZF) variants.
//
// C ABI consumed by virus_nerf_tpu.utils.native via ctypes; the pure-
// Python implementation in virus_nerf_tpu.data.pcl is the golden
// reference and fallback.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <fstream>
#include <sstream>
#include <string>
#include <vector>

namespace {

struct Field {
  std::string name;
  int size = 4;
  char type = 'F';
  int count = 1;
};

// libLZF-compatible decompression (PCD binary_compressed payloads).
size_t lzf_decompress(const uint8_t* in, size_t in_len, uint8_t* out,
                      size_t out_len) {
  size_t ip = 0, op = 0;
  while (ip < in_len && op < out_len) {
    unsigned ctrl = in[ip++];
    if (ctrl < 32) {  // literal run
      size_t run = ctrl + 1;
      if (ip + run > in_len || op + run > out_len) return 0;
      std::memcpy(out + op, in + ip, run);
      ip += run;
      op += run;
    } else {  // back reference
      size_t len = ctrl >> 5;
      if (len == 7) {
        if (ip >= in_len) return 0;
        len += in[ip++];
      }
      if (ip >= in_len) return 0;
      size_t ref = op - ((ctrl & 0x1f) << 8) - in[ip++] - 1;
      if (ref > op || op + len + 2 > out_len) return 0;
      for (size_t i = 0; i < len + 2; ++i) out[op + i] = out[ref + i];
      op += len + 2;
    }
  }
  return op;
}

double field_to_double(const uint8_t* p, const Field& f) {
  switch (f.type) {
    case 'F':
      if (f.size == 4) { float v; std::memcpy(&v, p, 4); return v; }
      if (f.size == 8) { double v; std::memcpy(&v, p, 8); return v; }
      break;
    case 'I':
      if (f.size == 1) return *reinterpret_cast<const int8_t*>(p);
      if (f.size == 2) { int16_t v; std::memcpy(&v, p, 2); return v; }
      if (f.size == 4) { int32_t v; std::memcpy(&v, p, 4); return v; }
      break;
    case 'U':
      if (f.size == 1) return *p;
      if (f.size == 2) { uint16_t v; std::memcpy(&v, p, 2); return v; }
      if (f.size == 4) { uint32_t v; std::memcpy(&v, p, 4); return v; }
      break;
  }
  return 0.0;
}

}  // namespace

extern "C" {

// Load x/y/z from a PCD file.  On success returns 0 and sets *out_data
// (malloc'd, n*3 floats, caller frees with pcd_free) and *out_n.
// Error codes: 1 file, 2 header, 3 payload, 4 unsupported mode.
int pcd_load_xyz(const char* path, float** out_data, long* out_n) {
  std::ifstream f(path, std::ios::binary);
  if (!f) return 1;

  std::vector<Field> fields;
  long n_points = -1;
  std::string mode;
  std::string line;
  while (std::getline(f, line)) {
    if (!line.empty() && line.back() == '\r') line.pop_back();
    if (line.empty() || line[0] == '#') continue;
    std::istringstream ss(line);
    std::string key;
    ss >> key;
    if (key == "FIELDS") {
      std::string name;
      while (ss >> name) {
        Field fd;
        fd.name = name;
        fields.push_back(fd);
      }
    } else if (key == "SIZE") {
      for (auto& fd : fields) ss >> fd.size;
    } else if (key == "TYPE") {
      for (auto& fd : fields) ss >> fd.type;
    } else if (key == "COUNT") {
      for (auto& fd : fields) ss >> fd.count;
    } else if (key == "POINTS") {
      ss >> n_points;
    } else if (key == "DATA") {
      ss >> mode;
      break;
    }
  }
  if (n_points < 0 || fields.empty()) return 2;

  int xi = -1, yi = -1, zi = -1;
  size_t stride = 0;
  std::vector<size_t> offsets(fields.size());
  for (size_t i = 0; i < fields.size(); ++i) {
    offsets[i] = stride;
    stride += static_cast<size_t>(fields[i].size) * fields[i].count;
    if (fields[i].name == "x") xi = static_cast<int>(i);
    if (fields[i].name == "y") yi = static_cast<int>(i);
    if (fields[i].name == "z") zi = static_cast<int>(i);
  }
  if (xi < 0 || yi < 0 || zi < 0) return 2;

  float* out = static_cast<float*>(std::malloc(sizeof(float) * 3 * n_points));
  if (!out) return 3;

  if (mode == "ascii") {
    for (long i = 0; i < n_points; ++i) {
      if (!std::getline(f, line)) { std::free(out); return 3; }
      std::istringstream ss(line);
      double v;
      int col = 0;
      for (size_t fi = 0; fi < fields.size(); ++fi) {
        for (int c = 0; c < fields[fi].count; ++c) {
          if (!(ss >> v)) { std::free(out); return 3; }
          if (c == 0) {
            if (static_cast<int>(fi) == xi) out[3 * i + 0] = (float)v;
            if (static_cast<int>(fi) == yi) out[3 * i + 1] = (float)v;
            if (static_cast<int>(fi) == zi) out[3 * i + 2] = (float)v;
          }
          ++col;
        }
      }
    }
  } else if (mode == "binary") {
    std::vector<uint8_t> buf(stride * n_points);
    f.read(reinterpret_cast<char*>(buf.data()), buf.size());
    if (static_cast<size_t>(f.gcount()) < buf.size()) {
      std::free(out);
      return 3;
    }
    const bool xyz_f32_contig =
        fields[xi].type == 'F' && fields[xi].size == 4 &&
        fields[yi].type == 'F' && fields[yi].size == 4 &&
        fields[zi].type == 'F' && fields[zi].size == 4 &&
        offsets[yi] == offsets[xi] + 4 && offsets[zi] == offsets[xi] + 8;
    if (xyz_f32_contig) {  // common layout: one 12-byte copy per row
      const uint8_t* src = buf.data() + offsets[xi];
      if (stride == 12) {
        std::memcpy(out, src, sizeof(float) * 3 * n_points);
      } else {
        for (long i = 0; i < n_points; ++i)
          std::memcpy(out + 3 * i, src + stride * i, 12);
      }
    } else {
      for (long i = 0; i < n_points; ++i) {
        const uint8_t* row = buf.data() + stride * i;
        out[3 * i + 0] = (float)field_to_double(row + offsets[xi], fields[xi]);
        out[3 * i + 1] = (float)field_to_double(row + offsets[yi], fields[yi]);
        out[3 * i + 2] = (float)field_to_double(row + offsets[zi], fields[zi]);
      }
    }
  } else if (mode == "binary_compressed") {
    uint32_t comp_size = 0, uncomp_size = 0;
    f.read(reinterpret_cast<char*>(&comp_size), 4);
    f.read(reinterpret_cast<char*>(&uncomp_size), 4);
    std::vector<uint8_t> comp(comp_size), raw(uncomp_size);
    f.read(reinterpret_cast<char*>(comp.data()), comp_size);
    if (static_cast<size_t>(f.gcount()) < comp_size ||
        lzf_decompress(comp.data(), comp_size, raw.data(), uncomp_size) !=
            uncomp_size) {
      std::free(out);
      return 3;
    }
    // binary_compressed is column-major: all of field 0, then field 1, ...
    size_t off = 0;
    std::vector<size_t> col_off(fields.size());
    for (size_t i = 0; i < fields.size(); ++i) {
      col_off[i] = off;
      off += static_cast<size_t>(fields[i].size) * fields[i].count * n_points;
    }
    auto read_col = [&](int fi, int comp_idx) {
      const Field& fd = fields[fi];
      const uint8_t* base = raw.data() + col_off[fi];
      size_t esz = static_cast<size_t>(fd.size) * fd.count;
      for (long i = 0; i < n_points; ++i)
        out[3 * i + comp_idx] = (float)field_to_double(base + esz * i, fd);
    };
    read_col(xi, 0);
    read_col(yi, 1);
    read_col(zi, 2);
  } else {
    std::free(out);
    return 4;
  }

  *out_data = out;
  *out_n = n_points;
  return 0;
}

void pcd_free(float* p) { std::free(p); }

// Save an (n, 3) float32 cloud as PCD v0.7 x/y/z.  Returns 0 on success.
int pcd_save_xyz(const char* path, const float* data, long n, int binary) {
  std::ofstream f(path, std::ios::binary);
  if (!f) return 1;
  f << "# .PCD v0.7 - Point Cloud Data file format\n"
    << "VERSION 0.7\nFIELDS x y z\nSIZE 4 4 4\nTYPE F F F\nCOUNT 1 1 1\n"
    << "WIDTH " << n << "\nHEIGHT 1\nVIEWPOINT 0 0 0 1 0 0 0\n"
    << "POINTS " << n << "\nDATA " << (binary ? "binary" : "ascii") << "\n";
  if (binary) {
    f.write(reinterpret_cast<const char*>(data), sizeof(float) * 3 * n);
  } else {
    char buf[128];
    for (long i = 0; i < n; ++i) {
      std::snprintf(buf, sizeof(buf), "%.8g %.8g %.8g\n", data[3 * i],
                    data[3 * i + 1], data[3 * i + 2]);
      f << buf;
    }
  }
  return f.good() ? 0 : 1;
}

}  // extern "C"
