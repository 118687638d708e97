// Native parser for TheiaSfM cereal-PortableBinary reconstruction
// files.
//
// ref: src/theia/io/reconstruction_reader.cc:37-71 (the reference
// deserializes with cereal::PortableBinaryInputArchive). The wire
// format is reconstructed from the serialize() declarations — see the
// pure-Python twin in theiasfm_tpu/io/theia_format.py for the full
// field-by-field commentary; this file is the native fast path for
// large benchmark files (SURVEY.md §7: the host frontend components
// that are native in the reference get native equivalents). Exposed
// through the same C ABI / ctypes discipline as host_ops.cc.
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

struct Cursor {
  const uint8_t* data;
  size_t size;
  size_t pos = 0;
  bool ok = true;
  std::unordered_map<std::string, uint32_t> versions;
  std::unordered_map<uint32_t, std::string> poly_names;

  const uint8_t* Raw(size_t n) {
    if (pos + n > size) {
      ok = false;
      pos = size;
      static const uint8_t zero[32] = {0};
      return zero;
    }
    const uint8_t* p = data + pos;
    pos += n;
    return p;
  }
  uint8_t U8() { return Raw(1)[0]; }
  uint32_t U32() {
    uint32_t v;
    std::memcpy(&v, Raw(4), 4);
    return v;
  }
  int32_t I32() {
    int32_t v;
    std::memcpy(&v, Raw(4), 4);
    return v;
  }
  uint64_t U64() {
    uint64_t v;
    std::memcpy(&v, Raw(8), 8);
    return v;
  }
  double F64() {
    double v;
    std::memcpy(&v, Raw(8), 8);
    return v;
  }
  void F64N(double* out, size_t n) {
    if (pos + 8 * n > size) {
      ok = false;
      pos = size;
      std::memset(out, 0, 8 * n);
      return;
    }
    std::memcpy(out, data + pos, 8 * n);
    pos += 8 * n;
  }
  bool Bool() { return U8() != 0; }
  std::string Str() {
    uint64_t n = U64();
    if (pos + n > size) {
      ok = false;
      return "";
    }
    std::string s(reinterpret_cast<const char*>(data + pos), n);
    pos += n;
    return s;
  }
  // cereal writes the class version u32 at the FIRST occurrence of
  // each versioned type per archive.
  uint32_t Version(const std::string& key) {
    auto it = versions.find(key);
    if (it != versions.end()) return it->second;
    uint32_t v = U32();
    versions.emplace(key, v);
    return v;
  }
  // Eigen matrix (io/eigen_serializable.h): i32 rows, i32 cols,
  // column-major scalars.
  void EigenF64(double* out, size_t cap) {
    int32_t rows = I32(), cols = I32();
    if (rows < 0 || cols < 0) { ok = false; return; }
    size_t n = static_cast<size_t>(rows) * cols;
    if (pos + 8 * n > size) { ok = false; pos = size; return; }
    for (size_t i = 0; i < n; ++i) {
      double v = F64();
      if (i < cap) out[i] = v;  // vectors only in this format
    }
  }
  void EigenU8(uint8_t* out, size_t cap) {
    int32_t rows = I32(), cols = I32();
    size_t n = static_cast<size_t>(rows) * cols;
    const uint8_t* p = Raw(n);
    for (size_t i = 0; i < n && i < cap; ++i) out[i] = p[i];
  }
};

constexpr int kMaxIntr = 10;
constexpr int kPriorVals = 17;  // focal,pp2,ar,skew,rd4,td2,pos3,ori3

enum PriorSetBit {
  kFocal = 0, kPP = 1, kAspect = 2, kSkew = 3,
  kRadial = 4, kTangential = 5, kPosition = 6, kOrientation = 7,
};

struct ViewRec {
  uint32_t id;
  std::string name;
  uint8_t estimated;
  int32_t model;
  double extr[6];
  double intr[kMaxIntr];
  int32_t w, h;
  uint32_t group = 0;
  // prior
  int32_t prior_model = 0;
  int32_t prior_w = 0, prior_h = 0;
  uint8_t prior_set = 0;
  double prior_vals[kPriorVals];
};

struct TrackRec {
  uint32_t id;
  uint8_t estimated;
  double point[4];
  uint8_t color[3];
};

struct Recon {
  std::vector<ViewRec> views;
  std::vector<TrackRec> tracks;
  // observations (view id, track id, x, y)
  std::vector<uint32_t> obs_view, obs_track;
  std::vector<double> obs_xy;
  std::string names;             // concatenated view names
  std::vector<int64_t> name_off;  // views+1 offsets
};

int32_t ModelFromPolyName(const std::string& n, int* nparams) {
  // matches camera/camera_intrinsics_model_type.h:46-53
  if (n == "theia::PinholeCameraModel") { *nparams = 7; return 0; }
  if (n == "theia::PinholeRadialTangentialCameraModel") {
    *nparams = 10; return 1;
  }
  if (n == "theia::FisheyeCameraModel") { *nparams = 9; return 2; }
  if (n == "theia::FOVCameraModel") { *nparams = 6; return 3; }
  if (n == "theia::DivisionUndistortionCameraModel") {
    *nparams = 6; return 4;
  }
  *nparams = 7;
  return 0;
}

int32_t ModelFromPriorName(const std::string& n) {
  if (n == "PINHOLE") return 0;
  if (n == "PINHOLE_RADIAL_TANGENTIAL") return 1;
  if (n == "FISHEYE") return 2;
  if (n == "FOV") return 3;
  if (n == "DIVISION_UNDISTORTION") return 4;
  return 0;
}

// Prior<N> (camera_intrinsics_prior.h): versioned per N; bool is_set
// + N doubles.
bool ReadPrior(Cursor& c, int n, double* out) {
  char key[16];
  std::snprintf(key, sizeof(key), "Prior<%d>", n);
  c.Version(key);
  bool is_set = c.Bool();
  c.F64N(out, n);
  return is_set;
}

void ReadIntrinsicsPrior(Cursor& c, ViewRec& v) {
  uint32_t ver = c.Version("CameraIntrinsicsPrior");
  double* pv = v.prior_vals;
  std::memset(pv, 0, sizeof(double) * kPriorVals);
  double tmp[4];
  auto set = [&](PriorSetBit b, bool on) {
    if (on) v.prior_set |= (1u << b);
  };
  if (ver >= 2) {
    v.prior_w = c.I32();
    v.prior_h = c.I32();
    std::string model = ver >= 3 ? c.Str() : "PINHOLE";
    v.prior_model = ModelFromPriorName(model);
    set(kFocal, ReadPrior(c, 1, pv + 0));
    if (ver >= 4) set(kPP, ReadPrior(c, 2, pv + 1));
    set(kAspect, ReadPrior(c, 1, pv + 3));
    set(kSkew, ReadPrior(c, 1, pv + 4));
    if (ver >= 3) {
      set(kRadial, ReadPrior(c, 4, pv + 5));
    } else {
      set(kRadial, ReadPrior(c, 2, pv + 5));
    }
    set(kTangential, ReadPrior(c, 2, pv + 9));
    set(kPosition, ReadPrior(c, 3, pv + 11));
    set(kOrientation, ReadPrior(c, 3, pv + 14));
    ReadPrior(c, 1, tmp);  // latitude
    ReadPrior(c, 1, tmp);  // longitude
    ReadPrior(c, 1, tmp);  // altitude
  } else {
    if (ver >= 1) {
      v.prior_w = c.I32();
      v.prior_h = c.I32();
    }
    v.prior_model = 0;
    set(kFocal, ReadPrior(c, 1, pv + 0));
    bool ppx = ReadPrior(c, 1, pv + 1);
    bool ppy = ReadPrior(c, 1, pv + 2);
    set(kPP, ppx && ppy);
    set(kAspect, ReadPrior(c, 1, pv + 3));
    set(kSkew, ReadPrior(c, 1, pv + 4));
    bool r1 = ReadPrior(c, 1, pv + 5);
    bool r2 = ReadPrior(c, 1, pv + 6);
    set(kRadial, r1 && r2);
  }
}

// cereal polymorphic shared_ptr (see theia_format.py commentary).
struct PtrTable {
  std::unordered_map<uint32_t, std::pair<int32_t, std::vector<double>>>
      objects;
};

void ReadPolyIntrinsics(Cursor& c, PtrTable& ptrs, int32_t* model,
                        double* intr) {
  std::memset(intr, 0, sizeof(double) * kMaxIntr);
  uint32_t poly_id = c.U32();
  if (poly_id == 0) {
    *model = 0;
    return;
  }
  std::string name;
  if (poly_id & 0x80000000u) {
    name = c.Str();
    c.poly_names.emplace(
        static_cast<uint32_t>(c.poly_names.size() + 1), name);
  } else {
    auto it = c.poly_names.find(poly_id);
    name = it == c.poly_names.end() ? "theia::PinholeCameraModel"
                                    : it->second;
  }
  int nparams = 7;
  *model = ModelFromPolyName(name, &nparams);

  uint32_t ptr_id = c.U32();
  uint32_t key = ptr_id & 0x7FFFFFFFu;
  if (!(ptr_id & 0x80000000u)) {
    auto it = ptrs.objects.find(key);
    if (it != ptrs.objects.end()) {
      *model = it->second.first;
      for (size_t i = 0; i < it->second.second.size() && i < kMaxIntr;
           ++i)
        intr[i] = it->second.second[i];
    }
    return;
  }
  c.Version(name);                      // derived class version
  c.Version("CameraIntrinsicsModel");   // base class version
  uint64_t nvec = c.U64();
  if (nvec > 64) {  // intrinsics vectors are <= 10; reject corrupt sizes
    c.ok = false;
    return;
  }
  std::vector<double> params(nvec);
  c.F64N(params.data(), nvec);
  for (size_t i = 0; i < nvec && i < kMaxIntr; ++i) intr[i] = params[i];
  ptrs.objects.emplace(key, std::make_pair(*model, std::move(params)));
}

void ReadCamera(Cursor& c, PtrTable& ptrs, ViewRec& v) {
  uint32_t ver = c.Version("Camera");
  if (ver == 0) {
    // pinhole-only path: 13 doubles + image size
    double params[13];
    c.F64N(params, 13);
    std::memcpy(v.extr, params, sizeof(double) * 6);
    std::memset(v.intr, 0, sizeof(double) * kMaxIntr);
    std::memcpy(v.intr, params + 6, sizeof(double) * 7);
    v.model = 0;
    v.w = c.I32();
    v.h = c.I32();
    return;
  }
  c.F64N(v.extr, 6);
  ReadPolyIntrinsics(c, ptrs, &v.model, v.intr);
  v.w = c.I32();
  v.h = c.I32();
}

}  // namespace

extern "C" {

void* theia_read(const char* path) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return nullptr;
  std::fseek(f, 0, SEEK_END);
  long len = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  if (len <= 0) {
    std::fclose(f);
    return nullptr;
  }
  std::vector<uint8_t> buf(len);
  if (std::fread(buf.data(), 1, len, f) != static_cast<size_t>(len)) {
    std::fclose(f);
    return nullptr;
  }
  std::fclose(f);

  Cursor c{buf.data(), buf.size()};
  if (c.U8() != 1) return nullptr;  // little-endian marker
  c.Version("Reconstruction");
  c.U32();  // next_track_id
  c.U32();  // next_view_id

  uint64_t n_names = c.U64();
  for (uint64_t i = 0; i < n_names; ++i) {
    c.Str();
    c.U32();
  }

  auto* r = new Recon();
  PtrTable ptrs;

  uint64_t n_views = c.U64();
  r->views.reserve(n_views);
  r->name_off.push_back(0);
  for (uint64_t i = 0; i < n_views && c.ok; ++i) {
    ViewRec v{};
    v.id = c.U32();
    c.Version("View");
    v.name = c.Str();
    v.estimated = c.Bool() ? 1 : 0;
    ReadCamera(c, ptrs, v);
    ReadIntrinsicsPrior(c, v);
    uint64_t n_feat = c.U64();
    for (uint64_t k = 0; k < n_feat && c.ok; ++k) {
      uint32_t tid = c.U32();
      double xy[2] = {0, 0};
      c.EigenF64(xy, 2);
      r->obs_view.push_back(v.id);
      r->obs_track.push_back(tid);
      r->obs_xy.push_back(xy[0]);
      r->obs_xy.push_back(xy[1]);
    }
    r->names += v.name;
    r->name_off.push_back(static_cast<int64_t>(r->names.size()));
    r->views.push_back(std::move(v));
  }

  uint64_t n_tracks = c.U64();
  r->tracks.reserve(n_tracks);
  for (uint64_t i = 0; i < n_tracks && c.ok; ++i) {
    TrackRec t{};
    t.id = c.U32();
    c.Version("Track");
    t.estimated = c.Bool() ? 1 : 0;
    uint64_t n_tv = c.U64();
    for (uint64_t k = 0; k < n_tv && c.ok; ++k) c.U32();
    c.EigenF64(t.point, 4);
    c.EigenU8(t.color, 3);
    r->tracks.push_back(t);
  }

  // view -> intrinsics group map
  std::unordered_map<uint32_t, uint32_t> group_of;
  uint64_t n_vg = c.U64();
  for (uint64_t i = 0; i < n_vg && c.ok; ++i) {
    uint32_t vid = c.U32();
    uint32_t gid = c.U32();
    group_of.emplace(vid, gid);
  }
  for (auto& v : r->views) {
    auto it = group_of.find(v.id);
    if (it != group_of.end()) v.group = it->second;
  }

  if (!c.ok) {
    delete r;
    return nullptr;
  }
  return r;
}

void theia_recon_free(void* h) { delete static_cast<Recon*>(h); }

int64_t theia_num_views(void* h) {
  return static_cast<Recon*>(h)->views.size();
}
int64_t theia_num_tracks(void* h) {
  return static_cast<Recon*>(h)->tracks.size();
}
int64_t theia_num_obs(void* h) {
  return static_cast<Recon*>(h)->obs_view.size();
}
int64_t theia_names_size(void* h) {
  return static_cast<Recon*>(h)->names.size();
}

// Bulk copies into caller-allocated buffers (numpy arrays on the
// Python side; sizes from the count functions above).
void theia_get_views(void* h, uint32_t* vids, uint8_t* est,
                     int32_t* model, double* extr, double* intr,
                     int32_t* wh, uint32_t* group) {
  auto* r = static_cast<Recon*>(h);
  for (size_t i = 0; i < r->views.size(); ++i) {
    const ViewRec& v = r->views[i];
    vids[i] = v.id;
    est[i] = v.estimated;
    model[i] = v.model;
    std::memcpy(extr + i * 6, v.extr, sizeof(double) * 6);
    std::memcpy(intr + i * kMaxIntr, v.intr,
                sizeof(double) * kMaxIntr);
    wh[i * 2] = v.w;
    wh[i * 2 + 1] = v.h;
    group[i] = v.group;
  }
}

void theia_get_names(void* h, char* buf, int64_t* offsets) {
  auto* r = static_cast<Recon*>(h);
  std::memcpy(buf, r->names.data(), r->names.size());
  std::memcpy(offsets, r->name_off.data(),
              r->name_off.size() * sizeof(int64_t));
}

void theia_get_priors(void* h, int32_t* prior_model, int32_t* prior_wh,
                      uint8_t* prior_set, double* prior_vals) {
  auto* r = static_cast<Recon*>(h);
  for (size_t i = 0; i < r->views.size(); ++i) {
    const ViewRec& v = r->views[i];
    prior_model[i] = v.prior_model;
    prior_wh[i * 2] = v.prior_w;
    prior_wh[i * 2 + 1] = v.prior_h;
    prior_set[i] = v.prior_set;
    std::memcpy(prior_vals + i * kPriorVals, v.prior_vals,
                sizeof(double) * kPriorVals);
  }
}

void theia_get_tracks(void* h, uint32_t* tids, uint8_t* est,
                      double* points, uint8_t* colors) {
  auto* r = static_cast<Recon*>(h);
  for (size_t i = 0; i < r->tracks.size(); ++i) {
    const TrackRec& t = r->tracks[i];
    tids[i] = t.id;
    est[i] = t.estimated;
    std::memcpy(points + i * 4, t.point, sizeof(double) * 4);
    std::memcpy(colors + i * 3, t.color, 3);
  }
}

void theia_get_obs(void* h, uint32_t* view_ids, uint32_t* track_ids,
                   double* xy) {
  auto* r = static_cast<Recon*>(h);
  std::memcpy(view_ids, r->obs_view.data(),
              r->obs_view.size() * sizeof(uint32_t));
  std::memcpy(track_ids, r->obs_track.data(),
              r->obs_track.size() * sizeof(uint32_t));
  std::memcpy(xy, r->obs_xy.data(), r->obs_xy.size() * sizeof(double));
}

}  // extern "C"
