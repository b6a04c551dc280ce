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

// ---------------------------------------------------------------------------
// Fixed-grid rollouts (the PSOPS-embedding role: the host simulator drives
// trained surrogates through the time loop — reference semantics pinned to
// /root/reference/neural_dae/my_solvers.py:52-131 minus events, which the
// embedding simulator handles by feeding post-event z/v streams).
// ---------------------------------------------------------------------------

enum class Solver { kEuler, kMidpoint, kRk4 };

bool parse_solver(const char* s, Solver& out) {
  std::string n(s ? s : "");
  for (auto& c : n) c = char(tolower(c));
  if (n == "euler") { out = Solver::kEuler; return true; }
  if (n == "midpoint") { out = Solver::kMidpoint; return true; }
  if (n == "rk4" || n == "rk4_38") { out = Solver::kRk4; return true; }
  return false;
}

// Evaluates dx = step(f, dt) for the skip-augmented dynamics
//   f(u) = de(cat(all_init, u - all_init, u)),  u = cat(x, drive)
// where `drive` (z / z+v+i) is held constant across substeps (reference
// semantics: no input interpolation inside a step, my_fixed_grid.py:20-32).
struct DynEval {
  const Mlp* de;
  const float* all_init;  // [B, d_u]
  const float* drive;     // [B, d_u - xd]
  int B, xd, d_u;
  mutable std::vector<float> feat;  // [B, 3*d_u]

  void eval(const float* x, float* dx) const {
    feat.resize(size_t(B) * 3 * d_u);
    const int dd = d_u - xd;
    for (int n = 0; n < B; ++n) {
      float* fn = feat.data() + size_t(n) * 3 * d_u;
      const float* init = all_init + size_t(n) * d_u;
      const float* xn = x + size_t(n) * xd;
      const float* dn = drive + size_t(n) * dd;
      for (int k = 0; k < d_u; ++k) fn[k] = init[k];
      for (int k = 0; k < xd; ++k) fn[d_u + k] = xn[k] - init[k];
      for (int k = 0; k < dd; ++k) fn[d_u + xd + k] = dn[k] - init[xd + k];
      for (int k = 0; k < xd; ++k) fn[2 * d_u + k] = xn[k];
      for (int k = 0; k < dd; ++k) fn[2 * d_u + xd + k] = dn[k];
    }
    mlp_forward(*de, feat.data(), dx, B);
  }
};

constexpr float kOneThird = 1.0f / 3.0f;

// x1 = x0 + step; RK4 is Kutta's 3/8 rule (my_fixed_grid.py:38-51).
// Generic over the dynamics evaluator (DynEval for the main family,
// a channel-wise closure for the channel-wise family).
template <typename F>
void explicit_step_fn(F&& eval, Solver solver, float dt, const float* x0,
                      float* x1, int n_state) {
  const size_t N = size_t(n_state);
  std::vector<float> k1(N), k2(N), k3(N), k4(N), tmp(N);
  switch (solver) {
    case Solver::kEuler:
      eval(x0, k1.data());
      for (size_t k = 0; k < N; ++k) x1[k] = x0[k] + dt * k1[k];
      break;
    case Solver::kMidpoint:
      eval(x0, k1.data());
      for (size_t k = 0; k < N; ++k) tmp[k] = x0[k] + k1[k] * (0.5f * dt);
      eval(tmp.data(), k2.data());
      for (size_t k = 0; k < N; ++k) x1[k] = x0[k] + dt * k2[k];
      break;
    case Solver::kRk4:
      eval(x0, k1.data());
      for (size_t k = 0; k < N; ++k) tmp[k] = x0[k] + dt * k1[k] * kOneThird;
      eval(tmp.data(), k2.data());
      for (size_t k = 0; k < N; ++k)
        tmp[k] = x0[k] + dt * (k2[k] - k1[k] * kOneThird);
      eval(tmp.data(), k3.data());
      for (size_t k = 0; k < N; ++k)
        tmp[k] = x0[k] + dt * (k1[k] - k2[k] + k3[k]);
      eval(tmp.data(), k4.data());
      for (size_t k = 0; k < N; ++k)
        x1[k] = x0[k] + (k1[k] + 3.0f * (k2[k] + k3[k]) + k4[k]) * dt * 0.125f;
      break;
  }
}

void explicit_step(const DynEval& f, Solver solver, float dt, const float* x0,
                   float* x1, int n_state) {
  explicit_step_fn([&f](const float* x, float* dx) { f.eval(x, dx); }, solver,
                   dt, x0, x1, n_state);
}

// ---------------------------------------------------------------------------
// Channel-wise family (repaired neural_base.py:68-115,199-229; exported as
// per-channel nets "<sub>/c<k>/dense_i/..." plus plain vertical nets — see
// export.flatten_channelwise).
// ---------------------------------------------------------------------------

// C independent MLPs applied to the channel slices of [B, C, d_in].
struct CwStack {
  std::vector<const Mlp*> nets;
  int in_dim = 0, out_dim = 0;
};

bool build_cw_stack(const Module& m, const std::string& sub, CwStack& out) {
  for (int c = 0;; ++c) {
    auto it = m.mlps.find(sub + "/c" + std::to_string(c) + "/");
    if (it == m.mlps.end()) break;
    out.nets.push_back(&it->second);
  }
  if (out.nets.empty()) return false;
  out.in_dim = int(out.nets.front()->in_dim);
  out.out_dim = int(out.nets.front()->out_dim);
  return true;
}

// y[B, C, d_out] = per-channel nets over x[B, C, d_in] (both contiguous).
void cw_forward(const CwStack& s, const float* x, float* y, int B) {
  const int C = int(s.nets.size());
  const int di = s.in_dim, dout = s.out_dim;
  std::vector<float> xin(size_t(B) * di), yout(size_t(B) * dout);
  for (int c = 0; c < C; ++c) {
    for (int n = 0; n < B; ++n)
      memcpy(xin.data() + size_t(n) * di, x + (size_t(n) * C + c) * di,
             sizeof(float) * di);
    mlp_forward(*s.nets[c], xin.data(), yout.data(), B);
    for (int n = 0; n < B; ++n)
      memcpy(y + (size_t(n) * C + c) * dout, yout.data() + size_t(n) * dout,
             sizeof(float) * dout);
  }
}

// Vertical net over the channel axis: feat [B, C_in, h] -> out [B, C_out, h]
// via the swapaxes trick (rows = B*h, features = channels — the stacked
// einsum in models/funcs.ChannelWiseDEFunc.__call__).
void vertical_forward(const Mlp& v, const float* feat, float* out, int B,
                      int c_in, int h) {
  const int c_out = int(v.out_dim);
  std::vector<float> vin(size_t(B) * h * c_in), vout(size_t(B) * h * c_out);
  for (int n = 0; n < B; ++n)
    for (int c = 0; c < c_in; ++c)
      for (int j = 0; j < h; ++j)
        vin[(size_t(n) * h + j) * c_in + c] = feat[(size_t(n) * c_in + c) * h + j];
  mlp_forward(v, vin.data(), vout.data(), B * h);
  for (int n = 0; n < B; ++n)
    for (int c = 0; c < c_out; ++c)
      for (int j = 0; j < h; ++j)
        out[(size_t(n) * c_out + c) * h + j] = vout[(size_t(n) * h + j) * c_out + c];
}

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

// Full neural-ODE rollout on the host (ref my_solvers.py:52-80, no events —
// feed post-event z in the stream).  t [T], x0 [B,xd], z [T,B,zd] →
// x_out [T,B,xd].  Returns 0 on success, -1 bad net, -2 bad solver.
int psnode_ode_rollout(void* de_handle, const float* t, const float* x0,
                       const float* z, int T, int B, int xd, int zd,
                       const char* solver, float* x_out) {
  auto* dem = static_cast<psnode::Module*>(de_handle);
  auto de = dem->mlps.find("x_dot/");
  if (de == dem->mlps.end()) return -1;
  psnode::Solver sv;
  if (!psnode::parse_solver(solver, sv)) return -2;

  const int d_u = xd + zd;
  std::vector<float> all_init(size_t(B) * d_u);
  for (int n = 0; n < B; ++n) {
    for (int k = 0; k < xd; ++k)
      all_init[size_t(n) * d_u + k] = x0[size_t(n) * xd + k];
    for (int k = 0; k < zd; ++k)
      all_init[size_t(n) * d_u + xd + k] = z[size_t(n) * zd + k];
  }
  memcpy(x_out, x0, sizeof(float) * size_t(B) * xd);
  psnode::DynEval f{&de->second, all_init.data(), nullptr, B, xd, d_u, {}};
  for (int j = 1; j < T; ++j) {
    const float dt = t[j] - t[j - 1];
    f.drive = z + size_t(j - 1) * B * zd;
    psnode::explicit_step(f, sv, dt, x_out + size_t(j - 1) * B * xd,
                          x_out + size_t(j) * B * xd, B * xd);
  }
  return 0;
}

namespace psnode {

// Shared latent rollout for the channel-wise family
// (models/channelwise.{ChannelWiseODEModel,ChannelWiseDAEModel}): per-channel
// encode of x0, latent [B, xd, h] integration with the shared vertical net
// over the channel axis. Fills xh [T, B, xd, h]. Returns 0 ok, -1 bad net,
// -2 bad solver.
int cw_latent_rollout(Module* m, const float* t, const float* x0,
                      const float* z, int T, int B, int xd, int zd,
                      Solver sv, std::vector<float>& xh, int& h_out) {
  CwStack x_enc, xh_ext, xh_head, z_enc, zh_ext;
  if (!build_cw_stack(*m, "x_encoder", x_enc) ||
      !build_cw_stack(*m, "xh_ext", xh_ext) ||
      !build_cw_stack(*m, "xh_dot_head", xh_head) ||
      !build_cw_stack(*m, "z_encoder", z_enc) ||
      !build_cw_stack(*m, "zh_ext", zh_ext))
    return -1;
  auto vert = m->mlps.find("xh_dot_v/");
  if (vert == m->mlps.end()) return -1;

  const int h = x_enc.out_dim;
  h_out = h;
  const int C = xd + zd;
  const size_t BX = size_t(B) * xd * h;
  xh.assign(size_t(T) * BX, 0.f);
  cw_forward(x_enc, x0, xh.data(), B);  // xh[0]  ([B,xd] == [B,xd,1])

  std::vector<float> zenc(size_t(B) * zd * h), fz(size_t(B) * zd * h);
  std::vector<float> f_init(size_t(B) * C * h);
  // f_init = cat(xh_ext(xh0), zh_ext(z_enc(z0))) (models/channelwise.py:66)
  {
    std::vector<float> fx0(size_t(B) * xd * h);
    cw_forward(xh_ext, xh.data(), fx0.data(), B);
    cw_forward(z_enc, z, zenc.data(), B);
    cw_forward(zh_ext, zenc.data(), fz.data(), B);
    for (int n = 0; n < B; ++n) {
      memcpy(f_init.data() + size_t(n) * C * h,
             fx0.data() + size_t(n) * xd * h, sizeof(float) * xd * h);
      memcpy(f_init.data() + (size_t(n) * C + xd) * h,
             fz.data() + size_t(n) * zd * h, sizeof(float) * zd * h);
    }
  }

  std::vector<float> fx(size_t(B) * xd * h), feat(size_t(B) * 3 * C * h);
  std::vector<float> dot(size_t(B) * xd * h);
  auto eval = [&](const float* xh_t, float* out) {
    cw_forward(xh_ext, xh_t, fx.data(), B);
    for (int n = 0; n < B; ++n) {
      float* fn = feat.data() + size_t(n) * 3 * C * h;
      const float* fxn = fx.data() + size_t(n) * xd * h;
      const float* fzn = fz.data() + size_t(n) * zd * h;
      const float* in_ = f_init.data() + size_t(n) * C * h;
      // feat = cat(ft, f_init, ft - f_init) over the channel axis
      // (models/funcs.ChannelWiseDEFunc.__call__)
      memcpy(fn, fxn, sizeof(float) * xd * h);
      memcpy(fn + size_t(xd) * h, fzn, sizeof(float) * zd * h);
      memcpy(fn + size_t(C) * h, in_, sizeof(float) * C * h);
      for (int k = 0; k < C * h; ++k) fn[2 * C * h + k] = fn[k] - in_[k];
    }
    vertical_forward(vert->second, feat.data(), dot.data(), B, 3 * C, h);
    cw_forward(xh_head, dot.data(), out, B);
  };

  for (int j = 1; j < T; ++j) {
    const float dt = t[j] - t[j - 1];
    // step inputs (z held constant across substeps)
    cw_forward(z_enc, z + size_t(j - 1) * B * zd, zenc.data(), B);
    cw_forward(zh_ext, zenc.data(), fz.data(), B);
    explicit_step_fn(eval, sv, dt, xh.data() + size_t(j - 1) * BX,
                     xh.data() + size_t(j) * BX, int(BX));
  }
  return 0;
}

}  // namespace psnode

// Full channel-wise neural-ODE rollout (the repaired neural_base.py family,
// no events): latent rollout + per-channel decode of every row.
// t [T], x0 [B,xd], z [T,B,zd] → x_out [T,B,xd].
// Returns 0 ok, -1 bad net, -2 bad solver.
int psnode_cw_ode_rollout(void* de_handle, const float* t, const float* x0,
                          const float* z, int T, int B, int xd, int zd,
                          const char* solver, float* x_out) {
  auto* m = static_cast<psnode::Module*>(de_handle);
  psnode::Solver sv;
  if (!psnode::parse_solver(solver, sv)) return -2;
  psnode::CwStack x_dec;
  if (!psnode::build_cw_stack(*m, "x_decoder", x_dec)) return -1;
  std::vector<float> xh;
  int h = 0;
  int rc = psnode::cw_latent_rollout(m, t, x0, z, T, B, xd, zd, sv, xh, h);
  if (rc != 0) return rc;
  // decode every row: [T*B, xd, h] -> [T*B, xd, 1]
  psnode::cw_forward(x_dec, xh.data(), x_out, T * B);
  return 0;
}

// Channel-wise DAE rollout (models/channelwise.ChannelWiseDAEModel): the
// dynamics take only (Xh, z) — no algebraic feedback (ref neural_base.py:110)
// — so the differential rollout is the latent ODE and the algebraic readout
// runs decoupled over every time point.  v [T,B,vd] → i_out [T,B,id].
int psnode_cw_dae_rollout(void* de_handle, void* ae_handle, const float* t,
                          const float* x0, const float* z, const float* v,
                          int T, int B, int xd, int zd, int vd, int idim,
                          const char* solver, float* x_out, float* i_out) {
  auto* m = static_cast<psnode::Module*>(de_handle);
  auto* ma = static_cast<psnode::Module*>(ae_handle);
  psnode::Solver sv;
  if (!psnode::parse_solver(solver, sv)) return -2;
  psnode::CwStack x_dec, ae_xh_ext, v_enc, vh_ext, yh_ext, y_dec;
  if (!psnode::build_cw_stack(*m, "x_decoder", x_dec) ||
      !psnode::build_cw_stack(*ma, "xh_ext", ae_xh_ext) ||
      !psnode::build_cw_stack(*ma, "v_encoder", v_enc) ||
      !psnode::build_cw_stack(*ma, "vh_ext", vh_ext) ||
      !psnode::build_cw_stack(*ma, "yh_ext", yh_ext) ||
      !psnode::build_cw_stack(*ma, "y_decoder", y_dec))
    return -1;
  auto yvert = ma->mlps.find("yh_func_v/");
  if (yvert == ma->mlps.end()) return -1;

  std::vector<float> xh;
  int h = 0;
  int rc = psnode::cw_latent_rollout(m, t, x0, z, T, B, xd, zd, sv, xh, h);
  if (rc != 0) return rc;
  const size_t BX = size_t(B) * xd * h;
  psnode::cw_forward(x_dec, xh.data(), x_out, T * B);

  // algebraic readout per row (decoupled, models/channelwise.py:172)
  const int Ca = xd + vd;
  std::vector<float> fxa(size_t(B) * xd * h), venc(size_t(B) * vd * h),
      fva(size_t(B) * vd * h), feat_a(size_t(B) * Ca * h),
      yh(size_t(B) * idim * h), yh2(size_t(B) * idim * h);
  for (int j = 0; j < T; ++j) {
    psnode::cw_forward(ae_xh_ext, xh.data() + size_t(j) * BX, fxa.data(), B);
    psnode::cw_forward(v_enc, v + size_t(j) * B * vd, venc.data(), B);
    psnode::cw_forward(vh_ext, venc.data(), fva.data(), B);
    for (int n = 0; n < B; ++n) {
      float* fn = feat_a.data() + size_t(n) * Ca * h;
      memcpy(fn, fxa.data() + size_t(n) * xd * h, sizeof(float) * xd * h);
      memcpy(fn + size_t(xd) * h, fva.data() + size_t(n) * vd * h,
             sizeof(float) * vd * h);
    }
    psnode::vertical_forward(yvert->second, feat_a.data(), yh.data(), B, Ca, h);
    psnode::cw_forward(yh_ext, yh.data(), yh2.data(), B);
    psnode::cw_forward(y_dec, yh2.data(), i_out + size_t(j) * B * idim, B);
  }
  return 0;
}

static const psnode::Mlp* find_net(void* handle, const char* prefix) {
  if (!handle) return nullptr;
  auto* m = static_cast<psnode::Module*>(handle);
  auto it = m->mlps.find(prefix);
  return it == m->mlps.end() ? nullptr : &it->second;
}

// Full neural-ODE rollout for the DIRECT-ENCODE variant
// (ref neural_00_ODE_02_direct_encode.py:60-89, no events): encode the
// initial state and the whole z stream, integrate the latent dynamics,
// decode every solution row.  t [T], x0 [B,xd], z [T,B,zd] → x_out [T,B,xd].
// Returns 0 ok, -1 bad net, -2 bad solver.
int psnode_ode_encode_rollout(void* de_handle, void* xenc_handle,
                              void* xdec_handle, void* zenc_handle,
                              const float* t, const float* x0, const float* z,
                              int T, int B, int xd, int zd, const char* solver,
                              float* x_out) {
  const psnode::Mlp* de = find_net(de_handle, "x_dot/");
  const psnode::Mlp* xe = find_net(xenc_handle, "net/");
  const psnode::Mlp* xdec = find_net(xdec_handle, "net/");
  const psnode::Mlp* ze = find_net(zenc_handle, "net/");
  if (!de || !xe || !xdec || !ze) return -1;
  psnode::Solver sv;
  if (!psnode::parse_solver(solver, sv)) return -2;

  const int h = int(xe->out_dim);
  const int d_u = 2 * h;
  // encode the exogenous stream up front (one batched pass per time point)
  std::vector<float> zh(size_t(T) * B * h);
  psnode::mlp_forward(*ze, z, zh.data(), T * B);
  std::vector<float> xh(size_t(T) * B * h);  // latent solution
  psnode::mlp_forward(*xe, x0, xh.data(), B);  // xh[0] = encode(x0)

  std::vector<float> all_init(size_t(B) * d_u);
  for (int n = 0; n < B; ++n) {
    float* an = all_init.data() + size_t(n) * d_u;
    for (int k = 0; k < h; ++k) an[k] = xh[size_t(n) * h + k];
    for (int k = 0; k < h; ++k) an[h + k] = zh[size_t(n) * h + k];
  }
  psnode::DynEval f{de, all_init.data(), nullptr, B, h, d_u, {}};
  for (int j = 1; j < T; ++j) {
    const float dt = t[j] - t[j - 1];
    f.drive = zh.data() + size_t(j - 1) * B * h;
    psnode::explicit_step(f, sv, dt, xh.data() + size_t(j - 1) * B * h,
                          xh.data() + size_t(j) * B * h, B * h);
  }
  psnode::mlp_forward(*xdec, xh.data(), x_out, T * B);
  return 0;
}

// Full semi-explicit neural-DAE rollout for the DIRECT-ENCODE variant
// (ref neural_01_DAE_02_direct_encode.py:103-153, no events): five codecs,
// learned init (raw), latent lagged-i integration, latent algebraic net,
// decoded outputs with the decoded initial row overwritten by the raw Init
// output (ref :150).  zenc_handle may be null when zd == 0 (the z stream
// passes through un-encoded, ref :107-109).
// t [T], z [T,B,zd], v [T,B,vd], i0_in [B,id] → x_out [T,B,xd],
// i_out [T,B,id].  Returns 0 ok, -1 bad net, -2 bad solver.
int psnode_dae_encode_rollout(
    void* de_handle, void* ae_handle, void* init_handle, void* xenc_handle,
    void* xdec_handle, void* zenc_handle, void* venc_handle, void* ienc_handle,
    void* idec_handle, const float* t, const float* z, const float* v,
    const float* i0_in, int T, int B, int xd, int zd, int vd, int idim,
    const char* solver, float* x_out, float* i_out) {
  const psnode::Mlp* de = find_net(de_handle, "x_dot/");
  const psnode::Mlp* ae = find_net(ae_handle, "i_calculator/");
  const psnode::Mlp* init = find_net(init_handle, "init_fun/");
  const psnode::Mlp* xe = find_net(xenc_handle, "net/");
  const psnode::Mlp* xdec = find_net(xdec_handle, "net/");
  const psnode::Mlp* ze = zd ? find_net(zenc_handle, "net/") : nullptr;
  const psnode::Mlp* ve = find_net(venc_handle, "net/");
  const psnode::Mlp* ie = find_net(ienc_handle, "net/");
  const psnode::Mlp* idec = find_net(idec_handle, "net/");
  if (!de || !ae || !init || !xe || !xdec || !ve || !ie || !idec ||
      (zd && !ze))
    return -1;
  psnode::Solver sv;
  if (!psnode::parse_solver(solver, sv)) return -2;

  const int h = int(xe->out_dim);
  const int zl = zd ? h : 0;  // latent z width (0 when z_dim == 0, ref :73)
  const int d_u = h + zl + h + h;
  const int ae_in = d_u + h + zl + h;

  // raw learned init: x0 = Init(z0, v0, i0)  (ref :126)
  std::vector<float> init_in(size_t(B) * (zd + vd + idim));
  for (int n = 0; n < B; ++n) {
    float* bn = init_in.data() + size_t(n) * (zd + vd + idim);
    for (int k = 0; k < zd; ++k) bn[k] = z[size_t(n) * zd + k];
    for (int k = 0; k < vd; ++k) bn[zd + k] = v[size_t(n) * vd + k];
    for (int k = 0; k < idim; ++k) bn[zd + vd + k] = i0_in[size_t(n) * idim + k];
  }
  std::vector<float> x0_raw(size_t(B) * xd);
  psnode::mlp_forward(*init, init_in.data(), x0_raw.data(), B);

  // encode the streams up front
  std::vector<float> zh(size_t(T) * B * zl);
  if (zd) psnode::mlp_forward(*ze, z, zh.data(), T * B);
  std::vector<float> vh(size_t(T) * B * h);
  psnode::mlp_forward(*ve, v, vh.data(), T * B);
  std::vector<float> ih0(size_t(B) * h);
  psnode::mlp_forward(*ie, i0_in, ih0.data(), B);
  std::vector<float> xh(size_t(T) * B * h);   // latent differential solution
  std::vector<float> ihl(size_t(T) * B * h);  // latent algebraic solution
  psnode::mlp_forward(*xe, x0_raw.data(), xh.data(), B);  // xh[0]

  std::vector<float> all_init(size_t(B) * d_u);
  for (int n = 0; n < B; ++n) {
    float* an = all_init.data() + size_t(n) * d_u;
    for (int k = 0; k < h; ++k) an[k] = xh[size_t(n) * h + k];
    for (int k = 0; k < zl; ++k) an[h + k] = zh[size_t(n) * zl + k];
    for (int k = 0; k < h; ++k) an[h + zl + k] = vh[size_t(n) * h + k];
    for (int k = 0; k < h; ++k) an[h + zl + h + k] = ih0[size_t(n) * h + k];
  }

  // latent algebraic eval: ih = ae(cat(all_init, xh_t, zh_t, vh_t))
  std::vector<float> ae_feat(size_t(B) * ae_in);
  auto eval_ae = [&](const float* xh_t, const float* zh_t, const float* vh_t,
                     float* out) {
    for (int n = 0; n < B; ++n) {
      float* fn = ae_feat.data() + size_t(n) * ae_in;
      const float* an = all_init.data() + size_t(n) * d_u;
      for (int k = 0; k < d_u; ++k) fn[k] = an[k];
      for (int k = 0; k < h; ++k) fn[d_u + k] = xh_t[size_t(n) * h + k];
      for (int k = 0; k < zl; ++k) fn[d_u + h + k] = zh_t[size_t(n) * zl + k];
      for (int k = 0; k < h; ++k)
        fn[d_u + h + zl + k] = vh_t[size_t(n) * h + k];
    }
    psnode::mlp_forward(*ae, ae_feat.data(), out, B);
  };
  eval_ae(xh.data(), zh.data(), vh.data(), ihl.data());  // ih[0]

  std::vector<float> drive(size_t(B) * (zl + h + h));
  psnode::DynEval f{de, all_init.data(), nullptr, B, h, d_u, {}};
  for (int j = 1; j < T; ++j) {
    const float dt = t[j] - t[j - 1];
    const float* zh_prev = zh.data() + size_t(j - 1) * B * zl;
    const float* vh_prev = vh.data() + size_t(j - 1) * B * h;
    const float* ih_prev = ihl.data() + size_t(j - 1) * B * h;  // lagged
    for (int n = 0; n < B; ++n) {
      float* dn = drive.data() + size_t(n) * (zl + h + h);
      for (int k = 0; k < zl; ++k) dn[k] = zh_prev[size_t(n) * zl + k];
      for (int k = 0; k < h; ++k) dn[zl + k] = vh_prev[size_t(n) * h + k];
      for (int k = 0; k < h; ++k) dn[zl + h + k] = ih_prev[size_t(n) * h + k];
    }
    f.drive = drive.data();
    psnode::explicit_step(f, sv, dt, xh.data() + size_t(j - 1) * B * h,
                          xh.data() + size_t(j) * B * h, B * h);
    eval_ae(xh.data() + size_t(j) * B * h, zh.data() + size_t(j) * B * zl,
            vh.data() + size_t(j) * B * h, ihl.data() + size_t(j) * B * h);
  }

  psnode::mlp_forward(*xdec, xh.data(), x_out, T * B);
  // x_pred[0] = raw Init output (ref :150)
  memcpy(x_out, x0_raw.data(), sizeof(float) * size_t(B) * xd);
  psnode::mlp_forward(*idec, ihl.data(), i_out, T * B);
  return 0;
}

// Full semi-explicit neural-DAE rollout (ref my_solvers.py:82-131, no
// events): learned init, lagged-i differential steps, direct algebraic
// evaluation at each new time point.  t [T], z [T,B,zd], v [T,B,vd],
// i0_in [B,id] (the data's initial algebraic output, consumed by Init) →
// x_out [T,B,xd], i_out [T,B,id].
int psnode_dae_rollout(void* de_handle, void* ae_handle, void* init_handle,
                       const float* t, const float* z, const float* v,
                       const float* i0_in, int T, int B, int xd, int zd,
                       int vd, int idim, const char* solver, float* x_out,
                       float* i_out) {
  auto* dem = static_cast<psnode::Module*>(de_handle);
  auto* aem = static_cast<psnode::Module*>(ae_handle);
  auto* inm = static_cast<psnode::Module*>(init_handle);
  auto de = dem->mlps.find("x_dot/");
  auto ae = aem->mlps.find("i_calculator/");
  auto in = inm->mlps.find("init_fun/");
  if (de == dem->mlps.end() || ae == aem->mlps.end() || in == inm->mlps.end())
    return -1;
  psnode::Solver sv;
  if (!psnode::parse_solver(solver, sv)) return -2;

  const int d_u = xd + zd + vd + idim;
  const int ae_in = d_u + xd + zd + vd;
  std::vector<float> buf(size_t(B) * (zd + vd + idim));
  std::vector<float> all_init(size_t(B) * d_u);
  std::vector<float> drive(size_t(B) * (zd + vd + idim));
  std::vector<float> ae_feat(size_t(B) * ae_in);

  // x0 = Init(z0, v0, i0) (ref :98 — learned consistent initialization)
  for (int n = 0; n < B; ++n) {
    float* bn = buf.data() + size_t(n) * (zd + vd + idim);
    for (int k = 0; k < zd; ++k) bn[k] = z[size_t(n) * zd + k];
    for (int k = 0; k < vd; ++k) bn[zd + k] = v[size_t(n) * vd + k];
    for (int k = 0; k < idim; ++k) bn[zd + vd + k] = i0_in[size_t(n) * idim + k];
  }
  psnode::mlp_forward(in->second, buf.data(), x_out, B);  // rows 0 = x0

  for (int n = 0; n < B; ++n) {
    float* an = all_init.data() + size_t(n) * d_u;
    const float* bn = buf.data() + size_t(n) * (zd + vd + idim);
    for (int k = 0; k < xd; ++k) an[k] = x_out[size_t(n) * xd + k];
    for (int k = 0; k < zd + vd + idim; ++k) an[xd + k] = bn[k];
  }

  // i at a time point: ae(cat(all_init, x, z_t, v_t))  (ref :95,121)
  auto eval_ae = [&](const float* x, const float* zt, const float* vt,
                     float* out) {
    for (int n = 0; n < B; ++n) {
      float* fn = ae_feat.data() + size_t(n) * ae_in;
      const float* an = all_init.data() + size_t(n) * d_u;
      for (int k = 0; k < d_u; ++k) fn[k] = an[k];
      for (int k = 0; k < xd; ++k) fn[d_u + k] = x[size_t(n) * xd + k];
      for (int k = 0; k < zd; ++k) fn[d_u + xd + k] = zt[size_t(n) * zd + k];
      for (int k = 0; k < vd; ++k)
        fn[d_u + xd + zd + k] = vt[size_t(n) * vd + k];
    }
    psnode::mlp_forward(ae->second, ae_feat.data(), out, B);
  };
  eval_ae(x_out, z, v, i_out);  // i_solution[0]

  psnode::DynEval f{&de->second, all_init.data(), nullptr, B, xd, d_u, {}};
  for (int j = 1; j < T; ++j) {
    const float dt = t[j] - t[j - 1];
    const float* x_prev = x_out + size_t(j - 1) * B * xd;
    const float* i_prev = i_out + size_t(j - 1) * B * idim;  // lagged i (:119)
    // drive = cat(z[j-1], v[j-1], i_prev), held constant across substeps
    for (int n = 0; n < B; ++n) {
      float* dn = drive.data() + size_t(n) * (zd + vd + idim);
      const float* zn = z + (size_t(j - 1) * B + n) * zd;
      const float* vn = v + (size_t(j - 1) * B + n) * vd;
      const float* in_ = i_prev + size_t(n) * idim;
      for (int k = 0; k < zd; ++k) dn[k] = zn[k];
      for (int k = 0; k < vd; ++k) dn[zd + k] = vn[k];
      for (int k = 0; k < idim; ++k) dn[zd + vd + k] = in_[k];
    }
    f.drive = drive.data();
    psnode::explicit_step(f, sv, dt, x_prev, x_out + size_t(j) * B * xd,
                          B * xd);
    eval_ae(x_out + size_t(j) * B * xd, z + size_t(j) * B * zd,
            v + size_t(j) * B * vd, i_out + size_t(j) * B * idim);
  }
  return 0;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Incremental stepper — the TRUE PSOPS co-simulation contract: the host
// simulator advances the surrogate ONE step per network solution step and
// feeds back the bus voltage it just solved (the reference's TorchScript
// modules are consumed exactly this way, /root/reference/README.md:45).
// The rollout entry points above assume the whole input stream is known up
// front; the stepper carries (all_initial, x_t, i_t) across calls instead.
// Step semantics are identical to the rollouts (pinned by
// tests/test_native_runtime.py stepper==rollout parity).
// ---------------------------------------------------------------------------

namespace psnode {

enum class StepVariant { kOde, kDae, kOdeEnc, kDaeEnc, kCwOde, kCwDae };

struct Stepper {
  StepVariant variant;
  Solver sv;
  int B, xd, zd, vd, id;
  // main-family nets
  const Mlp* de = nullptr;
  const Mlp* ae = nullptr;
  const Mlp* init = nullptr;
  const Mlp* xe = nullptr;
  const Mlp* xdec = nullptr;
  const Mlp* ze = nullptr;
  const Mlp* ve = nullptr;
  const Mlp* ie = nullptr;
  const Mlp* idec = nullptr;
  // channel-wise stacks (dynamics module + algebraic module)
  CwStack cw_xe, cw_xdec, cw_xh_ext, cw_xh_head, cw_ze, cw_zh_ext;
  CwStack cw_ae_xh_ext, cw_v_enc, cw_vh_ext, cw_yh_ext, cw_y_dec;
  const Mlp* cw_vert = nullptr;
  const Mlp* cw_yvert = nullptr;
  int h = 0;   // latent width (encode / channel-wise families)
  int zl = 0;  // latent z width (dae_encode: 0 when zd == 0, ref script4:73)
  int d_u = 0, ae_in = 0;
  // carried state
  std::vector<float> all_init;  // [B, d_u]  (main)  /  f_init [B, C*h] (cw)
  std::vector<float> x;         // [B, xd] raw or [B, h] / [B, xd*h] latent
  std::vector<float> ih;        // [B, id] raw i  /  [B, h] latent i (dae_enc)
  // scratch
  std::vector<float> drive, feat, z_lat, v_lat, fz, fx, cw_feat, cw_dot;
  bool ready = false;
};

// latent algebraic eval for dae_encode: ih = ae(cat(all_init, xh, zh, vh))
static void stepper_eval_ae_latent(Stepper& s, const float* xh,
                                   const float* zh, const float* vh,
                                   float* out) {
  const int B = s.B, h = s.h, zl = s.zl, d_u = s.d_u, ae_in = s.ae_in;
  s.feat.resize(size_t(B) * ae_in);
  for (int n = 0; n < B; ++n) {
    float* fn = s.feat.data() + size_t(n) * ae_in;
    const float* an = s.all_init.data() + size_t(n) * d_u;
    for (int k = 0; k < d_u; ++k) fn[k] = an[k];
    for (int k = 0; k < h; ++k) fn[d_u + k] = xh[size_t(n) * h + k];
    for (int k = 0; k < zl; ++k) fn[d_u + h + k] = zh[size_t(n) * zl + k];
    for (int k = 0; k < h; ++k) fn[d_u + h + zl + k] = vh[size_t(n) * h + k];
  }
  mlp_forward(*s.ae, s.feat.data(), out, B);
}

// raw algebraic eval for dae: i = ae(cat(all_init, x, z_t, v_t))
static void stepper_eval_ae_raw(Stepper& s, const float* x, const float* zt,
                                const float* vt, float* out) {
  const int B = s.B, xd = s.xd, zd = s.zd, vd = s.vd;
  const int d_u = s.d_u, ae_in = s.ae_in;
  s.feat.resize(size_t(B) * ae_in);
  for (int n = 0; n < B; ++n) {
    float* fn = s.feat.data() + size_t(n) * ae_in;
    const float* an = s.all_init.data() + size_t(n) * d_u;
    for (int k = 0; k < d_u; ++k) fn[k] = an[k];
    for (int k = 0; k < xd; ++k) fn[d_u + k] = x[size_t(n) * xd + k];
    for (int k = 0; k < zd; ++k) fn[d_u + xd + k] = zt[size_t(n) * zd + k];
    for (int k = 0; k < vd; ++k)
      fn[d_u + xd + zd + k] = vt[size_t(n) * vd + k];
  }
  mlp_forward(*s.ae, s.feat.data(), out, B);
}

// channel-wise latent dynamics eval (mirrors cw_latent_rollout's closure;
// s.fz must hold zh_ext(z_enc(z_prev)) before the step)
static void stepper_cw_eval(Stepper& s, const float* xh_t, float* out) {
  const int B = s.B, xd = s.xd, zd = s.zd, h = s.h;
  const int C = xd + zd;
  s.fx.resize(size_t(B) * xd * h);
  s.cw_feat.resize(size_t(B) * 3 * C * h);
  s.cw_dot.resize(size_t(B) * xd * h);
  cw_forward(s.cw_xh_ext, xh_t, s.fx.data(), B);
  for (int n = 0; n < B; ++n) {
    float* fn = s.cw_feat.data() + size_t(n) * 3 * C * h;
    const float* fxn = s.fx.data() + size_t(n) * xd * h;
    const float* fzn = s.fz.data() + size_t(n) * zd * h;
    const float* in_ = s.all_init.data() + size_t(n) * C * h;
    memcpy(fn, fxn, sizeof(float) * xd * h);
    memcpy(fn + size_t(xd) * h, fzn, sizeof(float) * zd * h);
    memcpy(fn + size_t(C) * h, in_, sizeof(float) * C * h);
    for (int k = 0; k < C * h; ++k) fn[2 * C * h + k] = fn[k] - in_[k];
  }
  vertical_forward(*s.cw_vert, s.cw_feat.data(), s.cw_dot.data(), B, 3 * C, h);
  cw_forward(s.cw_xh_head, s.cw_dot.data(), out, B);
}

// channel-wise algebraic readout at one time point (mirrors
// psnode_cw_dae_rollout's per-row loop)
static void stepper_cw_readout(Stepper& s, const float* xh_t, const float* vt,
                               float* i_out) {
  const int B = s.B, xd = s.xd, vd = s.vd, id = s.id, h = s.h;
  const int Ca = xd + vd;
  std::vector<float> fxa(size_t(B) * xd * h), venc(size_t(B) * vd * h),
      fva(size_t(B) * vd * h), feat_a(size_t(B) * Ca * h),
      yh(size_t(B) * id * h), yh2(size_t(B) * id * h);
  cw_forward(s.cw_ae_xh_ext, xh_t, fxa.data(), B);
  cw_forward(s.cw_v_enc, vt, venc.data(), B);
  cw_forward(s.cw_vh_ext, venc.data(), fva.data(), B);
  for (int n = 0; n < B; ++n) {
    float* fn = feat_a.data() + size_t(n) * Ca * h;
    memcpy(fn, fxa.data() + size_t(n) * xd * h, sizeof(float) * xd * h);
    memcpy(fn + size_t(xd) * h, fva.data() + size_t(n) * vd * h,
           sizeof(float) * vd * h);
  }
  vertical_forward(*s.cw_yvert, feat_a.data(), yh.data(), B, Ca, h);
  cw_forward(s.cw_yh_ext, yh.data(), yh2.data(), B);
  cw_forward(s.cw_y_dec, yh2.data(), i_out, B);
}

}  // namespace psnode

extern "C" {

// Create a stepper. `handles` layout by variant:
//   "ode":        [de]
//   "dae":        [de, ae, init]
//   "ode_encode": [de, x_encoder, x_decoder, z_encoder]
//   "dae_encode": [de, ae, init, x_encoder, x_decoder,
//                  z_encoder (null iff zd==0), v_encoder, i_encoder,
//                  i_decoder]
//   "cw_ode":     [de]
//   "cw_dae":     [de, ae]
// Events are the host's concern: apply a jump by passing post-jump z/v
// values for the step that starts at the event time (ref
// my_solvers.py:70-72,108-110 semantics, input-stream form).
// Returns null on bad variant/solver/net/dims.
void* psnode_stepper_create(const char* variant, const char* solver,
                            void** handles, int n_handles, int B, int xd,
                            int zd, int vd, int idim) {
  using psnode::StepVariant;
  auto s = std::make_unique<psnode::Stepper>();
  std::string v(variant ? variant : "");
  if (v == "ode") s->variant = StepVariant::kOde;
  else if (v == "dae") s->variant = StepVariant::kDae;
  else if (v == "ode_encode") s->variant = StepVariant::kOdeEnc;
  else if (v == "dae_encode") s->variant = StepVariant::kDaeEnc;
  else if (v == "cw_ode") s->variant = StepVariant::kCwOde;
  else if (v == "cw_dae") s->variant = StepVariant::kCwDae;
  else return nullptr;
  if (!psnode::parse_solver(solver, s->sv)) return nullptr;
  if (B <= 0 || xd <= 0) return nullptr;
  s->B = B; s->xd = xd; s->zd = zd; s->vd = vd; s->id = idim;

  auto need = [&](int n) { return n_handles >= n && handles; };
  switch (s->variant) {
    case StepVariant::kOde:
      if (!need(1)) return nullptr;
      s->de = find_net(handles[0], "x_dot/");
      if (!s->de) return nullptr;
      s->d_u = xd + zd;
      break;
    case StepVariant::kDae:
      if (!need(3)) return nullptr;
      s->de = find_net(handles[0], "x_dot/");
      s->ae = find_net(handles[1], "i_calculator/");
      s->init = find_net(handles[2], "init_fun/");
      if (!s->de || !s->ae || !s->init) return nullptr;
      s->d_u = xd + zd + vd + idim;
      s->ae_in = s->d_u + xd + zd + vd;
      break;
    case StepVariant::kOdeEnc:
      if (!need(4)) return nullptr;
      s->de = find_net(handles[0], "x_dot/");
      s->xe = find_net(handles[1], "net/");
      s->xdec = find_net(handles[2], "net/");
      s->ze = find_net(handles[3], "net/");
      if (!s->de || !s->xe || !s->xdec || !s->ze) return nullptr;
      s->h = int(s->xe->out_dim);
      s->d_u = 2 * s->h;
      break;
    case StepVariant::kDaeEnc:
      if (!need(9)) return nullptr;
      s->de = find_net(handles[0], "x_dot/");
      s->ae = find_net(handles[1], "i_calculator/");
      s->init = find_net(handles[2], "init_fun/");
      s->xe = find_net(handles[3], "net/");
      s->xdec = find_net(handles[4], "net/");
      s->ze = zd ? find_net(handles[5], "net/") : nullptr;
      s->ve = find_net(handles[6], "net/");
      s->ie = find_net(handles[7], "net/");
      s->idec = find_net(handles[8], "net/");
      if (!s->de || !s->ae || !s->init || !s->xe || !s->xdec || !s->ve ||
          !s->ie || !s->idec || (zd && !s->ze))
        return nullptr;
      s->h = int(s->xe->out_dim);
      s->zl = zd ? s->h : 0;
      s->d_u = s->h + s->zl + s->h + s->h;
      s->ae_in = s->d_u + s->h + s->zl + s->h;
      break;
    case StepVariant::kCwOde:
    case StepVariant::kCwDae: {
      if (!need(s->variant == StepVariant::kCwDae ? 2 : 1)) return nullptr;
      auto* m = static_cast<psnode::Module*>(handles[0]);
      if (!m) return nullptr;
      if (!psnode::build_cw_stack(*m, "x_encoder", s->cw_xe) ||
          !psnode::build_cw_stack(*m, "x_decoder", s->cw_xdec) ||
          !psnode::build_cw_stack(*m, "xh_ext", s->cw_xh_ext) ||
          !psnode::build_cw_stack(*m, "xh_dot_head", s->cw_xh_head) ||
          !psnode::build_cw_stack(*m, "z_encoder", s->cw_ze) ||
          !psnode::build_cw_stack(*m, "zh_ext", s->cw_zh_ext))
        return nullptr;
      auto vert = m->mlps.find("xh_dot_v/");
      if (vert == m->mlps.end()) return nullptr;
      s->cw_vert = &vert->second;
      s->h = s->cw_xe.out_dim;
      if (s->variant == StepVariant::kCwDae) {
        auto* ma = static_cast<psnode::Module*>(handles[1]);
        if (!ma) return nullptr;
        if (!psnode::build_cw_stack(*ma, "xh_ext", s->cw_ae_xh_ext) ||
            !psnode::build_cw_stack(*ma, "v_encoder", s->cw_v_enc) ||
            !psnode::build_cw_stack(*ma, "vh_ext", s->cw_vh_ext) ||
            !psnode::build_cw_stack(*ma, "yh_ext", s->cw_yh_ext) ||
            !psnode::build_cw_stack(*ma, "y_decoder", s->cw_y_dec))
          return nullptr;
        auto yvert = ma->mlps.find("yh_func_v/");
        if (yvert == ma->mlps.end()) return nullptr;
        s->cw_yvert = &yvert->second;
      }
      break;
    }
  }
  return s.release();
}

void psnode_stepper_free(void* st) {
  delete static_cast<psnode::Stepper*>(st);
}

// Initialize at t0. Inputs are [B, dim] rows: `x0` (ignored for the DAE
// families — the learned Init net produces it, ref script3:98/script4:126),
// `z0`, `v0`/`i0` (DAE families only). Writes the surrogate's own initial
// outputs to `x0_out` [B,xd] and `i0_out` [B,id] when non-null (DAE-encode:
// x0_out is the RAW Init output, the ref's x_pred[0]=x0 overwrite :150).
// Returns 0 ok, -1 bad args.
int psnode_stepper_init(void* st, const float* x0, const float* z0,
                        const float* v0, const float* i0, float* x0_out,
                        float* i0_out) {
  using psnode::StepVariant;
  auto* s = static_cast<psnode::Stepper*>(st);
  if (!s) return -1;
  const int B = s->B, xd = s->xd, zd = s->zd, vd = s->vd, id = s->id;

  switch (s->variant) {
    case StepVariant::kOde: {
      if (!x0 || (zd && !z0)) return -1;
      s->all_init.assign(size_t(B) * s->d_u, 0.f);
      s->x.assign(x0, x0 + size_t(B) * xd);
      for (int n = 0; n < B; ++n) {
        float* an = s->all_init.data() + size_t(n) * s->d_u;
        for (int k = 0; k < xd; ++k) an[k] = x0[size_t(n) * xd + k];
        for (int k = 0; k < zd; ++k) an[xd + k] = z0[size_t(n) * zd + k];
      }
      if (x0_out) memcpy(x0_out, x0, sizeof(float) * size_t(B) * xd);
      break;
    }
    case StepVariant::kOdeEnc: {
      if (!x0 || (zd && !z0)) return -1;
      const int h = s->h;
      s->x.assign(size_t(B) * h, 0.f);
      psnode::mlp_forward(*s->xe, x0, s->x.data(), B);
      s->z_lat.assign(size_t(B) * h, 0.f);
      psnode::mlp_forward(*s->ze, z0, s->z_lat.data(), B);
      s->all_init.assign(size_t(B) * s->d_u, 0.f);
      for (int n = 0; n < B; ++n) {
        float* an = s->all_init.data() + size_t(n) * s->d_u;
        for (int k = 0; k < h; ++k) an[k] = s->x[size_t(n) * h + k];
        for (int k = 0; k < h; ++k) an[h + k] = s->z_lat[size_t(n) * h + k];
      }
      if (x0_out) psnode::mlp_forward(*s->xdec, s->x.data(), x0_out, B);
      break;
    }
    case StepVariant::kDae: {
      if (!z0 || !v0 || !i0) return -1;
      std::vector<float> buf(size_t(B) * (zd + vd + id));
      for (int n = 0; n < B; ++n) {
        float* bn = buf.data() + size_t(n) * (zd + vd + id);
        for (int k = 0; k < zd; ++k) bn[k] = z0[size_t(n) * zd + k];
        for (int k = 0; k < vd; ++k) bn[zd + k] = v0[size_t(n) * vd + k];
        for (int k = 0; k < id; ++k) bn[zd + vd + k] = i0[size_t(n) * id + k];
      }
      s->x.assign(size_t(B) * xd, 0.f);
      psnode::mlp_forward(*s->init, buf.data(), s->x.data(), B);
      s->all_init.assign(size_t(B) * s->d_u, 0.f);
      for (int n = 0; n < B; ++n) {
        float* an = s->all_init.data() + size_t(n) * s->d_u;
        const float* bn = buf.data() + size_t(n) * (zd + vd + id);
        for (int k = 0; k < xd; ++k) an[k] = s->x[size_t(n) * xd + k];
        for (int k = 0; k < zd + vd + id; ++k) an[xd + k] = bn[k];
      }
      s->ih.assign(size_t(B) * id, 0.f);
      stepper_eval_ae_raw(*s, s->x.data(), z0, v0, s->ih.data());
      if (x0_out) memcpy(x0_out, s->x.data(), sizeof(float) * size_t(B) * xd);
      if (i0_out) memcpy(i0_out, s->ih.data(), sizeof(float) * size_t(B) * id);
      break;
    }
    case StepVariant::kDaeEnc: {
      if (!v0 || !i0 || (zd && !z0)) return -1;
      const int h = s->h, zl = s->zl;
      std::vector<float> buf(size_t(B) * (zd + vd + id));
      for (int n = 0; n < B; ++n) {
        float* bn = buf.data() + size_t(n) * (zd + vd + id);
        for (int k = 0; k < zd; ++k) bn[k] = z0[size_t(n) * zd + k];
        for (int k = 0; k < vd; ++k) bn[zd + k] = v0[size_t(n) * vd + k];
        for (int k = 0; k < id; ++k) bn[zd + vd + k] = i0[size_t(n) * id + k];
      }
      std::vector<float> x0_raw(size_t(B) * xd);
      psnode::mlp_forward(*s->init, buf.data(), x0_raw.data(), B);
      s->x.assign(size_t(B) * h, 0.f);
      psnode::mlp_forward(*s->xe, x0_raw.data(), s->x.data(), B);
      s->z_lat.assign(size_t(B) * (zl ? zl : 1), 0.f);
      if (zd) psnode::mlp_forward(*s->ze, z0, s->z_lat.data(), B);
      s->v_lat.assign(size_t(B) * h, 0.f);
      psnode::mlp_forward(*s->ve, v0, s->v_lat.data(), B);
      std::vector<float> ih0(size_t(B) * h);
      psnode::mlp_forward(*s->ie, i0, ih0.data(), B);
      s->all_init.assign(size_t(B) * s->d_u, 0.f);
      for (int n = 0; n < B; ++n) {
        float* an = s->all_init.data() + size_t(n) * s->d_u;
        for (int k = 0; k < h; ++k) an[k] = s->x[size_t(n) * h + k];
        for (int k = 0; k < zl; ++k) an[h + k] = s->z_lat[size_t(n) * zl + k];
        for (int k = 0; k < h; ++k)
          an[h + zl + k] = s->v_lat[size_t(n) * h + k];
        for (int k = 0; k < h; ++k)
          an[h + zl + h + k] = ih0[size_t(n) * h + k];
      }
      s->ih.assign(size_t(B) * h, 0.f);
      stepper_eval_ae_latent(*s, s->x.data(), s->z_lat.data(),
                             s->v_lat.data(), s->ih.data());
      if (x0_out)  // ref :150 — initial row is the RAW Init output
        memcpy(x0_out, x0_raw.data(), sizeof(float) * size_t(B) * xd);
      if (i0_out) psnode::mlp_forward(*s->idec, s->ih.data(), i0_out, B);
      break;
    }
    case StepVariant::kCwOde:
    case StepVariant::kCwDae: {
      if (!x0 || (zd && !z0)) return -1;
      const int h = s->h, C = xd + zd;
      s->x.assign(size_t(B) * xd * h, 0.f);
      psnode::cw_forward(s->cw_xe, x0, s->x.data(), B);
      std::vector<float> zenc(size_t(B) * zd * h), fx0(size_t(B) * xd * h);
      s->fz.assign(size_t(B) * zd * h, 0.f);
      psnode::cw_forward(s->cw_xh_ext, s->x.data(), fx0.data(), B);
      psnode::cw_forward(s->cw_ze, z0, zenc.data(), B);
      psnode::cw_forward(s->cw_zh_ext, zenc.data(), s->fz.data(), B);
      s->all_init.assign(size_t(B) * C * h, 0.f);
      for (int n = 0; n < B; ++n) {
        memcpy(s->all_init.data() + size_t(n) * C * h,
               fx0.data() + size_t(n) * xd * h, sizeof(float) * xd * h);
        memcpy(s->all_init.data() + (size_t(n) * C + xd) * h,
               s->fz.data() + size_t(n) * zd * h, sizeof(float) * zd * h);
      }
      if (x0_out) psnode::cw_forward(s->cw_xdec, s->x.data(), x0_out, B);
      if (s->variant == StepVariant::kCwDae && i0_out) {
        if (!v0) return -1;
        stepper_cw_readout(*s, s->x.data(), v0, i0_out);
      }
      break;
    }
  }
  s->ready = true;
  return 0;
}

// Advance one step of `dt`. Drive inputs (`z_prev` [, `v_prev`]) are the
// values over [t, t+dt) — held constant across substeps (reference
// semantics, my_fixed_grid.py:20-32); the algebraic output is evaluated at
// t+dt with `z_next`/`v_next` (ref my_solvers.py:121). Writes the new
// decoded state to `x_out` [B,xd] and (DAE families) the new algebraic
// output to `i_out` [B,id]. Returns 0 ok, -1 bad args / not initialized.
int psnode_stepper_step(void* st, float dt, const float* z_prev,
                        const float* v_prev, const float* z_next,
                        const float* v_next, float* x_out, float* i_out) {
  using psnode::StepVariant;
  auto* s = static_cast<psnode::Stepper*>(st);
  if (!s || !s->ready) return -1;
  const int B = s->B, xd = s->xd, zd = s->zd, vd = s->vd, id = s->id;

  switch (s->variant) {
    case StepVariant::kOde: {
      if (zd && !z_prev) return -1;
      psnode::DynEval f{s->de, s->all_init.data(), z_prev, B, xd, s->d_u, {}};
      std::vector<float> x1(size_t(B) * xd);
      psnode::explicit_step(f, s->sv, dt, s->x.data(), x1.data(), B * xd);
      s->x.swap(x1);
      if (x_out) memcpy(x_out, s->x.data(), sizeof(float) * size_t(B) * xd);
      break;
    }
    case StepVariant::kOdeEnc: {
      if (zd && !z_prev) return -1;
      const int h = s->h;
      s->z_lat.resize(size_t(B) * h);
      psnode::mlp_forward(*s->ze, z_prev, s->z_lat.data(), B);
      psnode::DynEval f{s->de, s->all_init.data(), s->z_lat.data(), B, h,
                        s->d_u, {}};
      std::vector<float> x1(size_t(B) * h);
      psnode::explicit_step(f, s->sv, dt, s->x.data(), x1.data(), B * h);
      s->x.swap(x1);
      if (x_out) psnode::mlp_forward(*s->xdec, s->x.data(), x_out, B);
      break;
    }
    case StepVariant::kDae: {
      if (!z_prev || !v_prev || !z_next || !v_next) return -1;
      s->drive.resize(size_t(B) * (zd + vd + id));
      for (int n = 0; n < B; ++n) {
        float* dn = s->drive.data() + size_t(n) * (zd + vd + id);
        for (int k = 0; k < zd; ++k) dn[k] = z_prev[size_t(n) * zd + k];
        for (int k = 0; k < vd; ++k) dn[zd + k] = v_prev[size_t(n) * vd + k];
        for (int k = 0; k < id; ++k)
          dn[zd + vd + k] = s->ih[size_t(n) * id + k];  // lagged i (:119)
      }
      psnode::DynEval f{s->de, s->all_init.data(), s->drive.data(), B, xd,
                        s->d_u, {}};
      std::vector<float> x1(size_t(B) * xd);
      psnode::explicit_step(f, s->sv, dt, s->x.data(), x1.data(), B * xd);
      s->x.swap(x1);
      stepper_eval_ae_raw(*s, s->x.data(), z_next, v_next, s->ih.data());
      if (x_out) memcpy(x_out, s->x.data(), sizeof(float) * size_t(B) * xd);
      if (i_out) memcpy(i_out, s->ih.data(), sizeof(float) * size_t(B) * id);
      break;
    }
    case StepVariant::kDaeEnc: {
      if (!v_prev || !v_next || (zd && (!z_prev || !z_next))) return -1;
      const int h = s->h, zl = s->zl;
      s->z_lat.resize(size_t(B) * (zl ? zl : 1));
      if (zd) psnode::mlp_forward(*s->ze, z_prev, s->z_lat.data(), B);
      s->v_lat.resize(size_t(B) * h);
      psnode::mlp_forward(*s->ve, v_prev, s->v_lat.data(), B);
      s->drive.resize(size_t(B) * (zl + h + h));
      for (int n = 0; n < B; ++n) {
        float* dn = s->drive.data() + size_t(n) * (zl + h + h);
        for (int k = 0; k < zl; ++k) dn[k] = s->z_lat[size_t(n) * zl + k];
        for (int k = 0; k < h; ++k) dn[zl + k] = s->v_lat[size_t(n) * h + k];
        for (int k = 0; k < h; ++k)
          dn[zl + h + k] = s->ih[size_t(n) * h + k];  // lagged latent i
      }
      psnode::DynEval f{s->de, s->all_init.data(), s->drive.data(), B, h,
                        s->d_u, {}};
      std::vector<float> x1(size_t(B) * h);
      psnode::explicit_step(f, s->sv, dt, s->x.data(), x1.data(), B * h);
      s->x.swap(x1);
      if (zd) psnode::mlp_forward(*s->ze, z_next, s->z_lat.data(), B);
      psnode::mlp_forward(*s->ve, v_next, s->v_lat.data(), B);
      stepper_eval_ae_latent(*s, s->x.data(), s->z_lat.data(),
                             s->v_lat.data(), s->ih.data());
      if (x_out) psnode::mlp_forward(*s->xdec, s->x.data(), x_out, B);
      if (i_out) psnode::mlp_forward(*s->idec, s->ih.data(), i_out, B);
      break;
    }
    case StepVariant::kCwOde:
    case StepVariant::kCwDae: {
      if (zd && !z_prev) return -1;
      const int h = s->h;
      std::vector<float> zenc(size_t(B) * zd * h);
      psnode::cw_forward(s->cw_ze, z_prev, zenc.data(), B);
      psnode::cw_forward(s->cw_zh_ext, zenc.data(), s->fz.data(), B);
      std::vector<float> x1(size_t(B) * xd * h);
      psnode::explicit_step_fn(
          [&](const float* xh, float* out) { stepper_cw_eval(*s, xh, out); },
          s->sv, dt, s->x.data(), x1.data(), B * xd * h);
      s->x.swap(x1);
      if (x_out) psnode::cw_forward(s->cw_xdec, s->x.data(), x_out, B);
      if (s->variant == StepVariant::kCwDae && i_out) {
        if (!v_next) return -1;
        stepper_cw_readout(*s, s->x.data(), v_next, i_out);
      }
      break;
    }
  }
  return 0;
}

}  // extern "C"
