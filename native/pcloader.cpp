// pcloader: native threaded .npz point-cloud batch loader.
//
// Role: the host-side input pipeline feeding the TPU (the reference uses 6
// torch DataLoader worker *processes*, train.py:188 + cfg.py:26; this is the
// same concurrency as an in-process C++ thread pool with zero IPC/pickling).
//
// Scope: reads the generate_pc npz contract (one ZIP container per frame,
// .npy entries 'points'/'rgb'/'segmentation'/...), decodes stored or
// deflated entries (zlib raw inflate), converts every requested key to
// float32, and assembles shuffled, prefetched batches into caller-provided
// buffers. Exposed as a C API consumed from Python via ctypes
// (pointcloud_tpu/data/native_loader.py).
//
// Build: make -C native   (g++ -O3 -shared -fPIC pcloader.cpp -lz)

#include <zlib.h>

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <queue>
#include <random>
#include <string>
#include <thread>
#include <vector>

namespace {

struct NpyArray {
  std::vector<float> data;  // always converted to f32
  std::vector<int64_t> shape;
  bool ok = false;
};

// ---------------- ZIP container ----------------

struct ZipEntry {
  std::string name;
  uint16_t method = 0;       // 0 = stored, 8 = deflate
  uint32_t comp_size = 0;
  uint32_t uncomp_size = 0;
  uint32_t local_offset = 0;  // offset of the local file header
};

bool read_file(const std::string& path, std::vector<uint8_t>& out) {
  FILE* f = std::fopen(path.c_str(), "rb");
  if (!f) return false;
  std::fseek(f, 0, SEEK_END);
  long n = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  out.resize(static_cast<size_t>(n));
  size_t got = std::fread(out.data(), 1, out.size(), f);
  std::fclose(f);
  return got == out.size();
}

uint16_t rd16(const uint8_t* p) { return (uint16_t)(p[0] | (p[1] << 8)); }
uint32_t rd32(const uint8_t* p) {
  return (uint32_t)(p[0] | (p[1] << 8) | (p[2] << 16) | ((uint32_t)p[3] << 24));
}

// Parse the central directory (robust against trailing comments).
bool zip_entries(const std::vector<uint8_t>& buf, std::vector<ZipEntry>& out) {
  if (buf.size() < 22) return false;
  // find End Of Central Directory signature 0x06054b50, scanning backwards
  size_t eocd = std::string::npos;
  size_t start = buf.size() - 22;
  for (size_t i = start + 1; i-- > 0;) {
    if (buf[i] == 0x50 && i + 4 <= buf.size() && rd32(&buf[i]) == 0x06054b50) {
      eocd = i;
      break;
    }
    if (start - i > 65557) break;  // max comment length
  }
  if (eocd == std::string::npos) return false;
  uint16_t n_entries = rd16(&buf[eocd + 10]);
  uint32_t cd_offset = rd32(&buf[eocd + 16]);
  size_t p = cd_offset;
  for (int e = 0; e < n_entries; ++e) {
    if (p + 46 > buf.size() || rd32(&buf[p]) != 0x02014b50) return false;
    ZipEntry ent;
    ent.method = rd16(&buf[p + 10]);
    ent.comp_size = rd32(&buf[p + 20]);
    ent.uncomp_size = rd32(&buf[p + 24]);
    uint16_t name_len = rd16(&buf[p + 28]);
    uint16_t extra_len = rd16(&buf[p + 30]);
    uint16_t comment_len = rd16(&buf[p + 32]);
    ent.local_offset = rd32(&buf[p + 42]);
    ent.name.assign(reinterpret_cast<const char*>(&buf[p + 46]), name_len);
    out.push_back(std::move(ent));
    p += 46 + name_len + extra_len + comment_len;
  }
  return true;
}

bool zip_extract(const std::vector<uint8_t>& buf, const ZipEntry& ent,
                 std::vector<uint8_t>& out) {
  size_t p = ent.local_offset;
  if (p + 30 > buf.size() || rd32(&buf[p]) != 0x04034b50) return false;
  uint16_t name_len = rd16(&buf[p + 26]);
  uint16_t extra_len = rd16(&buf[p + 28]);
  size_t data = p + 30 + name_len + extra_len;
  if (data + ent.comp_size > buf.size()) return false;
  out.resize(ent.uncomp_size);
  if (ent.method == 0) {  // stored
    if (ent.comp_size != ent.uncomp_size) return false;
    std::memcpy(out.data(), &buf[data], ent.uncomp_size);
    return true;
  }
  if (ent.method == 8) {  // raw deflate
    z_stream zs;
    std::memset(&zs, 0, sizeof(zs));
    if (inflateInit2(&zs, -15) != Z_OK) return false;
    zs.next_in = const_cast<Bytef*>(&buf[data]);
    zs.avail_in = ent.comp_size;
    zs.next_out = out.data();
    zs.avail_out = ent.uncomp_size;
    int rc = inflate(&zs, Z_FINISH);
    inflateEnd(&zs);
    return rc == Z_STREAM_END;
  }
  return false;
}

// ---------------- NPY parsing ----------------

bool parse_npy(const std::vector<uint8_t>& raw, NpyArray& out) {
  if (raw.size() < 10 || std::memcmp(raw.data(), "\x93NUMPY", 6) != 0)
    return false;
  uint8_t major = raw[6];
  size_t header_len, header_off;
  if (major == 1) {
    header_len = rd16(&raw[8]);
    header_off = 10;
  } else {
    header_len = rd32(&raw[8]);
    header_off = 12;
  }
  if (header_off + header_len > raw.size()) return false;
  std::string header(reinterpret_cast<const char*>(&raw[header_off]), header_len);

  auto find_val = [&](const char* key) -> std::string {
    size_t k = header.find(key);
    if (k == std::string::npos) return "";
    size_t c = header.find(':', k);
    return header.substr(c + 1);
  };

  // dtype
  std::string descr = find_val("'descr'");
  size_t q1 = descr.find('\'');
  size_t q2 = descr.find('\'', q1 + 1);
  std::string dt = descr.substr(q1 + 1, q2 - q1 - 1);

  // numpy saves F-contiguous arrays (e.g. column slices) in Fortran order;
  // decode and convert to C order below
  bool fortran =
      find_val("'fortran_order'").substr(0, 6).find("True") != std::string::npos;

  // shape tuple
  std::string sh = find_val("'shape'");
  size_t lp = sh.find('(');
  size_t rp = sh.find(')');
  std::string inner = sh.substr(lp + 1, rp - lp - 1);
  out.shape.clear();
  int64_t cur = -1;
  for (char ch : inner) {
    if (ch >= '0' && ch <= '9') {
      cur = (cur < 0 ? 0 : cur) * 10 + (ch - '0');
    } else if (cur >= 0) {
      out.shape.push_back(cur);
      cur = -1;
    }
  }
  if (cur >= 0) out.shape.push_back(cur);

  int64_t count = 1;
  for (int64_t s : out.shape) count *= s;
  const uint8_t* data = &raw[header_off + header_len];
  size_t avail = raw.size() - header_off - header_len;
  out.data.resize(static_cast<size_t>(count));

  auto need = [&](size_t itemsize) { return avail >= (size_t)count * itemsize; };
  if (dt == "<f4") {
    if (!need(4)) return false;
    std::memcpy(out.data.data(), data, count * 4);
  } else if (dt == "<f8") {
    if (!need(8)) return false;
    const double* d = reinterpret_cast<const double*>(data);
    for (int64_t i = 0; i < count; ++i) out.data[i] = (float)d[i];
  } else if (dt == "<i8") {
    if (!need(8)) return false;
    const int64_t* d = reinterpret_cast<const int64_t*>(data);
    for (int64_t i = 0; i < count; ++i) out.data[i] = (float)d[i];
  } else if (dt == "<i4") {
    if (!need(4)) return false;
    const int32_t* d = reinterpret_cast<const int32_t*>(data);
    for (int64_t i = 0; i < count; ++i) out.data[i] = (float)d[i];
  } else if (dt == "|u1") {
    if (!need(1)) return false;
    for (int64_t i = 0; i < count; ++i) out.data[i] = (float)data[i];
  } else {
    return false;  // object arrays etc. stay on the Python path
  }

  if (fortran && out.shape.size() > 1) {
    // column-major -> row-major reorder (rank-generic)
    const size_t nd = out.shape.size();
    std::vector<int64_t> c_strides(nd), f_strides(nd);
    int64_t cs = 1, fs = 1;
    for (size_t d = nd; d-- > 0;) {
      c_strides[d] = cs;
      cs *= out.shape[d];
    }
    for (size_t d = 0; d < nd; ++d) {
      f_strides[d] = fs;
      fs *= out.shape[d];
    }
    std::vector<float> reordered(out.data.size());
    std::vector<int64_t> idx(nd, 0);
    for (int64_t flat = 0; flat < count; ++flat) {
      int64_t f_off = 0;
      for (size_t d = 0; d < nd; ++d) f_off += idx[d] * f_strides[d];
      reordered[flat] = out.data[f_off];
      for (size_t d = nd; d-- > 0;) {  // increment C-order index
        if (++idx[d] < out.shape[d]) break;
        idx[d] = 0;
      }
    }
    out.data = std::move(reordered);
  }

  out.ok = true;
  return true;
}

bool load_npz_key(const std::string& path, const std::string& key, NpyArray& out) {
  std::vector<uint8_t> buf;
  if (!read_file(path, buf)) return false;
  std::vector<ZipEntry> entries;
  if (!zip_entries(buf, entries)) return false;
  std::string want = key + ".npy";
  for (const auto& e : entries) {
    if (e.name == want) {
      std::vector<uint8_t> raw;
      if (!zip_extract(buf, e, raw)) return false;
      return parse_npy(raw, out);
    }
  }
  return false;
}

// ---------------- Batch loader ----------------

struct Loader {
  std::vector<std::string> paths;
  std::vector<std::string> keys;
  std::vector<int64_t> key_sizes;  // elements per sample per key
  int batch_size = 1;
  int n_threads = 4;
  int prefetch = 2;
  bool shuffle = true;
  bool drop_last = true;
  uint64_t seed = 0;
  uint64_t epoch = 0;

  // per-epoch state
  std::vector<int> order;
  std::atomic<int> next_batch{0};
  int total_batches = 0;

  // batch ready queue (in-order delivery)
  std::mutex mu;
  std::condition_variable cv;
  std::vector<std::vector<std::vector<float>>> ready;  // [batch][key] data
  std::vector<bool> done_flags;
  int deliver_next = 0;

  std::vector<std::thread> workers;
  std::atomic<bool> stop{false};
  std::atomic<int> error{0};

  int num_batches() const {
    int n = static_cast<int>(paths.size());
    return drop_last ? n / batch_size : (n + batch_size - 1) / batch_size;
  }

  void start_epoch() {
    join_workers();
    order.resize(paths.size());
    for (size_t i = 0; i < order.size(); ++i) order[i] = static_cast<int>(i);
    if (shuffle) {
      std::mt19937_64 rng(seed + epoch);
      for (size_t i = order.size(); i > 1; --i) {
        std::swap(order[i - 1], order[rng() % i]);
      }
    }
    epoch++;
    total_batches = num_batches();
    next_batch = 0;
    deliver_next = 0;
    error = 0;
    ready.assign(total_batches, {});
    done_flags.assign(total_batches, false);
    stop = false;
    int nt = std::min(n_threads, std::max(total_batches, 1));
    for (int t = 0; t < nt; ++t) {
      workers.emplace_back([this] { work(); });
    }
  }

  void work() {
    for (;;) {
      if (stop.load()) return;
      int b = next_batch.fetch_add(1);
      if (b >= total_batches) return;
      // throttle: don't run more than `prefetch` batches ahead of delivery
      {
        std::unique_lock<std::mutex> lk(mu);
        cv.wait(lk, [&] {
          return stop.load() || b < deliver_next + prefetch + (int)workers.size();
        });
        if (stop.load()) return;
      }
      std::vector<std::vector<float>> batch(keys.size());
      int n_in_batch =
          std::min<int>(batch_size, (int)paths.size() - b * batch_size);
      for (size_t k = 0; k < keys.size(); ++k) {
        batch[k].resize((size_t)n_in_batch * key_sizes[k]);
      }
      for (int s = 0; s < n_in_batch; ++s) {
        int file_idx = order[b * batch_size + s];
        for (size_t k = 0; k < keys.size(); ++k) {
          NpyArray arr;
          if (!load_npz_key(paths[file_idx], keys[k], arr) ||
              (int64_t)arr.data.size() != key_sizes[k]) {
            error = 1;
            std::lock_guard<std::mutex> lk(mu);
            done_flags[b] = true;
            cv.notify_all();
            return;
          }
          std::memcpy(batch[k].data() + (size_t)s * key_sizes[k],
                      arr.data.data(), key_sizes[k] * sizeof(float));
        }
      }
      std::lock_guard<std::mutex> lk(mu);
      ready[b] = std::move(batch);
      done_flags[b] = true;
      cv.notify_all();
    }
  }

  // Blocks until batch `deliver_next` is ready; copies into user buffers.
  int next(float** out_buffers) {
    if (deliver_next >= total_batches) return 1;  // epoch exhausted
    std::unique_lock<std::mutex> lk(mu);
    int b = deliver_next;
    cv.wait(lk, [&] { return done_flags[b] || error.load(); });
    if (error.load()) return 2;
    for (size_t k = 0; k < keys.size(); ++k) {
      std::memcpy(out_buffers[k], ready[b][k].data(),
                  ready[b][k].size() * sizeof(float));
    }
    ready[b].clear();
    ready[b].shrink_to_fit();
    deliver_next++;
    cv.notify_all();
    return 0;
  }

  void join_workers() {
    stop = true;
    cv.notify_all();
    for (auto& w : workers) {
      if (w.joinable()) w.join();
    }
    workers.clear();
    stop = false;
  }

  ~Loader() { join_workers(); }
};

}  // namespace

extern "C" {

void* pcl_create(const char** paths, int n_files, const char** keys, int n_keys,
                 const int64_t* key_sizes, int batch_size, int n_threads,
                 int prefetch, int shuffle, uint64_t seed, int drop_last) {
  auto* l = new Loader();
  l->paths.assign(paths, paths + n_files);
  l->keys.assign(keys, keys + n_keys);
  l->key_sizes.assign(key_sizes, key_sizes + n_keys);
  l->batch_size = batch_size;
  l->n_threads = n_threads;
  l->prefetch = prefetch;
  l->shuffle = shuffle != 0;
  l->seed = seed;
  l->drop_last = drop_last != 0;
  return l;
}

int pcl_num_batches(void* handle) {
  return static_cast<Loader*>(handle)->num_batches();
}

void pcl_start_epoch(void* handle) {
  static_cast<Loader*>(handle)->start_epoch();
}

// returns 0 = ok, 1 = epoch exhausted, 2 = decode error
int pcl_next(void* handle, float** out_buffers) {
  return static_cast<Loader*>(handle)->next(out_buffers);
}

void pcl_destroy(void* handle) { delete static_cast<Loader*>(handle); }

// single-file decode helper (for tests / ad-hoc use)
int pcl_load_key(const char* path, const char* key, float* out, int64_t capacity,
                 int64_t* out_size) {
  NpyArray arr;
  if (!load_npz_key(path, key, arr)) return 1;
  if ((int64_t)arr.data.size() > capacity) return 2;
  std::memcpy(out, arr.data.data(), arr.data.size() * sizeof(float));
  *out_size = (int64_t)arr.data.size();
  return 0;
}

}  // extern "C"
