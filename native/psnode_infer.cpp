// psnode_infer — dependency-free C++ runtime for exported py_psnode_tpu
// submodules.
//
// Role: the reference framework exports TorchScript modules that the C++
// PSOPS simulator loads and evaluates in its time loop
// (/root/reference/README.md:45). This library is the TPU-native framework's
// equivalent consumer: it loads the flat-binary weight artifacts written by
// py_psnode_tpu.export (see export/binfmt.py for the format) and evaluates
// the Dense→ELU submodules (DE_Func / AE_Func / Init_Func / codecs) on the
// host, so a C++ simulator can embed trained surrogates without Python.
//
// Build:  g++ -O3 -march=native -shared -fPIC -o libpsnode_infer.so psnode_infer.cpp
// API:    C interface at the bottom (ctypes/cffi friendly).

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cmath>
#include <map>
#include <memory>
#include <string>
#include <vector>

namespace psnode {

constexpr uint32_t kMagic = 0x50534E57;  // "PSNW"
constexpr uint32_t kVersion = 1;

struct Tensor {
  std::vector<uint32_t> dims;
  std::vector<float> data;
  size_t numel() const {
    size_t n = 1;
    for (auto d : dims) n *= d;
    return n;
  }
};

using WeightMap = std::map<std::string, Tensor>;

// ---------------------------------------------------------------------------
// weights file loading
// ---------------------------------------------------------------------------

static bool read_exact(FILE* f, void* dst, size_t n) {
  return fread(dst, 1, n, f) == n;
}

bool load_weights(const char* path, WeightMap& out, std::string& err) {
  std::unique_ptr<FILE, int (*)(FILE*)> f(fopen(path, "rb"), fclose);
  if (!f) {
    err = "cannot open file";
    return false;
  }
  uint32_t magic, version, n;
  if (!read_exact(f.get(), &magic, 4) || !read_exact(f.get(), &version, 4) ||
      !read_exact(f.get(), &n, 4)) {
    err = "truncated header";
    return false;
  }
  if (magic != kMagic || version != kVersion) {
    err = "bad magic/version";
    return false;
  }
  for (uint32_t k = 0; k < n; ++k) {
    uint32_t name_len;
    if (!read_exact(f.get(), &name_len, 4)) { err = "truncated name len"; return false; }
    std::string name(name_len, '\0');
    if (!read_exact(f.get(), name.data(), name_len)) { err = "truncated name"; return false; }
    uint32_t ndim;
    if (!read_exact(f.get(), &ndim, 4)) { err = "truncated ndim"; return false; }
    Tensor t;
    t.dims.resize(ndim);
    if (ndim && !read_exact(f.get(), t.dims.data(), 4 * ndim)) { err = "truncated dims"; return false; }
    uint32_t dtype;
    if (!read_exact(f.get(), &dtype, 4)) { err = "truncated dtype"; return false; }
    if (dtype != 0) { err = "unsupported dtype"; return false; }
    t.data.resize(t.numel());
    if (!read_exact(f.get(), t.data.data(), 4 * t.numel())) { err = "truncated data"; return false; }
    out.emplace(std::move(name), std::move(t));
  }
  return true;
}

// ---------------------------------------------------------------------------
// MLP evaluation (Dense -> ELU stacks, flax naming: .../dense_k/{kernel,bias})
// ---------------------------------------------------------------------------

struct Dense {
  const Tensor* kernel;  // [in, out]
  const Tensor* bias;    // [out]
};

struct Mlp {
  std::vector<Dense> layers;
  uint32_t in_dim = 0, out_dim = 0;
};

// Collect dense_0..dense_k under a common prefix, e.g. "x_dot/".
bool build_mlp(const WeightMap& w, const std::string& prefix, Mlp& mlp,
               std::string& err) {
  for (int k = 0;; ++k) {
    auto kk = w.find(prefix + "dense_" + std::to_string(k) + "/kernel");
    auto kb = w.find(prefix + "dense_" + std::to_string(k) + "/bias");
    if (kk == w.end()) break;
    if (kb == w.end() || kk->second.dims.size() != 2 ||
        kb->second.dims.size() != 1) {
      err = "malformed layer " + std::to_string(k);
      return false;
    }
    mlp.layers.push_back({&kk->second, &kb->second});
  }
  if (mlp.layers.empty()) {
    err = "no layers under prefix " + prefix;
    return false;
  }
  mlp.in_dim = mlp.layers.front().kernel->dims[0];
  mlp.out_dim = mlp.layers.back().kernel->dims[1];
  return true;
}

static inline float elu(float x) { return x > 0.f ? x : std::expm1(x); }

// y[B,out] = MLP(x[B,in]); ELU between layers, none after the last.
void mlp_forward(const Mlp& mlp, const float* x, float* y, int batch) {
  std::vector<float> buf_a, buf_b;
  const float* cur = x;
  size_t cur_dim = mlp.in_dim;
  for (size_t li = 0; li < mlp.layers.size(); ++li) {
    const Dense& d = mlp.layers[li];
    const uint32_t in = d.kernel->dims[0], out = d.kernel->dims[1];
    std::vector<float>& dst_buf = (li % 2 == 0) ? buf_a : buf_b;
    dst_buf.assign(size_t(batch) * out, 0.f);
    float* dst = dst_buf.data();
    const float* K = d.kernel->data.data();
    const float* b = d.bias->data.data();
    for (int n = 0; n < batch; ++n) {
      const float* xn = cur + size_t(n) * cur_dim;
      float* yn = dst + size_t(n) * out;
      for (uint32_t o = 0; o < out; ++o) yn[o] = b[o];
      for (uint32_t i = 0; i < in; ++i) {
        const float xi = xn[i];
        if (xi == 0.f) continue;
        const float* Ki = K + size_t(i) * out;
        for (uint32_t o = 0; o < out; ++o) yn[o] += xi * Ki[o];
      }
      if (li + 1 < mlp.layers.size())
        for (uint32_t o = 0; o < out; ++o) yn[o] = elu(yn[o]);
    }
    cur = dst;
    cur_dim = out;
  }
  memcpy(y, cur, sizeof(float) * size_t(batch) * mlp.out_dim);
}

struct Module {
  WeightMap weights;
  std::map<std::string, Mlp> mlps;  // one per top-level prefix
  std::string last_error;
};

}  // namespace psnode

// ---------------------------------------------------------------------------
// C API (ctypes friendly)
// ---------------------------------------------------------------------------

extern "C" {

void* psnode_load(const char* path) {
  auto m = std::make_unique<psnode::Module>();
  std::string err;
  if (!psnode::load_weights(path, m->weights, err)) {
    fprintf(stderr, "psnode_load(%s): %s\n", path, err.c_str());
    return nullptr;
  }
  // discover top-level prefixes (everything before the first '/')
  std::map<std::string, bool> prefixes;
  for (auto& kv : m->weights) {
    auto pos = kv.first.find('/');
    if (pos != std::string::npos) {
      // net prefix may be nested, e.g. "x_dot/dense_0/kernel" or
      // "net/dense_0/kernel" — take everything up to "dense_"
      auto dp = kv.first.find("dense_");
      if (dp != std::string::npos && dp > 0)
        prefixes[kv.first.substr(0, dp)] = true;
    }
  }
  for (auto& kv : prefixes) {
    psnode::Mlp mlp;
    std::string e2;
    if (psnode::build_mlp(m->weights, kv.first, mlp, e2))
      m->mlps.emplace(kv.first, std::move(mlp));
  }
  if (m->mlps.empty()) {
    fprintf(stderr, "psnode_load(%s): no MLPs found\n", path);
    return nullptr;
  }
  return m.release();
}

void psnode_free(void* handle) { delete static_cast<psnode::Module*>(handle); }

// Number of nets in the module; name/in/out query by index.
int psnode_num_nets(void* handle) {
  return static_cast<psnode::Module*>(handle)->mlps.size();
}

const char* psnode_net_name(void* handle, int idx) {
  auto* m = static_cast<psnode::Module*>(handle);
  int k = 0;
  for (auto& kv : m->mlps)
    if (k++ == idx) return kv.first.c_str();
  return nullptr;
}

int psnode_net_in_dim(void* handle, const char* net) {
  auto* m = static_cast<psnode::Module*>(handle);
  auto it = m->mlps.find(net);
  return it == m->mlps.end() ? -1 : int(it->second.in_dim);
}

int psnode_net_out_dim(void* handle, const char* net) {
  auto* m = static_cast<psnode::Module*>(handle);
  auto it = m->mlps.find(net);
  return it == m->mlps.end() ? -1 : int(it->second.out_dim);
}

// y[B,out] = net(x[B,in]); returns 0 on success.
int psnode_forward(void* handle, const char* net, const float* x, float* y,
                   int batch) {
  auto* m = static_cast<psnode::Module*>(handle);
  auto it = m->mlps.find(net);
  if (it == m->mlps.end()) return -1;
  psnode::mlp_forward(it->second, x, y, batch);
  return 0;
}

}  // extern "C"
