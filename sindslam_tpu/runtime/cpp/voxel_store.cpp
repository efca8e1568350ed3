// Native voxel map store + asynchronous insertion pipeline.
//
// TPU-native replacement for the reference's octomap back-end
// (octomap_pub/src/pubPointCloud.cc: per-point insertRay + integrateNodeColor
// into a ColorOcTree, reference :300-320) and its ROS decoupling: the DEVICE
// does the geometric work in batch (back-projection, occlusion veto, ray
// voxelization -> flat arrays of voxel coords), and this store integrates
// log-odds occupancy + color on a background thread, so tracking never waits
// on mapping (the role ROS pub/sub played between the two reference nodes).
//
// Plain C ABI for ctypes. Build: make -C sindslam_tpu/runtime/cpp
//
// Voxel key packing: 21 bits per axis, biased; resolution fixed at creation
// (reference: 0.02 m, pubPointCloud.cc:91).

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <mutex>
#include <thread>
#include <unordered_map>
#include <vector>

namespace {

constexpr int64_t kBias = 1 << 20;  // 21-bit signed range per axis

inline int64_t pack(int32_t x, int32_t y, int32_t z) {
  return (((int64_t)(x + kBias)) << 42) | (((int64_t)(y + kBias)) << 21) |
         ((int64_t)(z + kBias));
}

inline void unpack(int64_t k, int32_t* x, int32_t* y, int32_t* z) {
  *x = (int32_t)((k >> 42) & 0x1FFFFF) - kBias;
  *y = (int32_t)((k >> 21) & 0x1FFFFF) - kBias;
  *z = (int32_t)(k & 0x1FFFFF) - kBias;
}

struct Cell {
  float log_odds = 0.f;
  uint32_t r = 0, g = 0, b = 0;
  uint32_t hits = 0;
};

struct Batch {
  std::vector<int32_t> xyz;   // n*3 voxel coords
  std::vector<uint8_t> rgb;   // n*3 (only meaningful for hits)
  std::vector<uint8_t> hit;   // n
};

struct VoxelStore {
  double resolution;
  float lo_hit, lo_miss, lo_min, lo_max;
  std::unordered_map<int64_t, Cell> cells;

  std::deque<Batch> queue;
  std::mutex mu;
  // Guards `cells`: held by the worker for each integrate() and by every
  // reader (size/export/save). Separate from `mu` so enqueue never blocks
  // behind a long integration.
  std::mutex cells_mu;
  std::condition_variable cv;
  std::condition_variable cv_done;
  std::atomic<bool> stop{false};
  size_t pending = 0;
  std::thread worker;

  void integrate(const Batch& b) {
    std::lock_guard<std::mutex> lk(cells_mu);
    const size_t n = b.hit.size();
    for (size_t i = 0; i < n; ++i) {
      int64_t key = pack(b.xyz[3 * i], b.xyz[3 * i + 1], b.xyz[3 * i + 2]);
      Cell& c = cells[key];
      if (b.hit[i]) {
        c.log_odds += lo_hit;
        if (c.log_odds > lo_max) c.log_odds = lo_max;
        c.r += b.rgb[3 * i];
        c.g += b.rgb[3 * i + 1];
        c.b += b.rgb[3 * i + 2];
        c.hits += 1;
      } else {
        c.log_odds += lo_miss;
        if (c.log_odds < lo_min) c.log_odds = lo_min;
      }
    }
  }

  void run() {
    for (;;) {
      Batch b;
      {
        std::unique_lock<std::mutex> lk(mu);
        cv.wait(lk, [&] { return stop.load() || !queue.empty(); });
        if (queue.empty()) {
          if (stop.load()) return;
          continue;
        }
        b = std::move(queue.front());
        queue.pop_front();
      }
      integrate(b);
      {
        std::lock_guard<std::mutex> lk(mu);
        --pending;
        if (pending == 0) cv_done.notify_all();
      }
    }
  }
};

}  // namespace

extern "C" {

void* vstore_create(double resolution, float lo_hit, float lo_miss,
                    float lo_min, float lo_max) {
  auto* s = new VoxelStore();
  s->resolution = resolution;
  s->lo_hit = lo_hit;
  s->lo_miss = lo_miss;
  s->lo_min = lo_min;
  s->lo_max = lo_max;
  s->worker = std::thread([s] { s->run(); });
  return s;
}

void vstore_destroy(void* h) {
  auto* s = (VoxelStore*)h;
  {
    std::lock_guard<std::mutex> lk(s->mu);
    s->stop = true;
  }
  s->cv.notify_all();
  s->worker.join();
  delete s;
}

// Enqueue a batch (copied) for background integration.
void vstore_insert_async(void* h, const int32_t* xyz, const uint8_t* rgb,
                         const uint8_t* hit, int64_t n) {
  auto* s = (VoxelStore*)h;
  Batch b;
  b.xyz.assign(xyz, xyz + 3 * n);
  b.rgb.assign(rgb, rgb + 3 * n);
  b.hit.assign(hit, hit + n);
  {
    std::lock_guard<std::mutex> lk(s->mu);
    s->queue.push_back(std::move(b));
    ++s->pending;
  }
  s->cv.notify_one();
}

// Block until every queued batch is integrated.
void vstore_flush(void* h) {
  auto* s = (VoxelStore*)h;
  std::unique_lock<std::mutex> lk(s->mu);
  s->cv_done.wait(lk, [&] { return s->pending == 0; });
}

int64_t vstore_size(void* h) {
  auto* s = (VoxelStore*)h;
  std::lock_guard<std::mutex> lk(s->cells_mu);
  return (int64_t)s->cells.size();
}

// Export occupied voxels (log_odds >= threshold AND >= min_hits hits — the
// hit-count floor stands in for StatisticalOutlierRemoval).
int64_t vstore_export(void* h, float min_log_odds, uint32_t min_hits,
                      int32_t* out_xyz, uint8_t* out_rgb, int64_t max_out) {
  auto* s = (VoxelStore*)h;
  std::lock_guard<std::mutex> lk(s->cells_mu);
  int64_t n = 0;
  for (const auto& kv : s->cells) {
    if (kv.second.log_odds < min_log_odds || kv.second.hits < min_hits)
      continue;
    if (n >= max_out) break;
    int32_t x, y, z;
    unpack(kv.first, &x, &y, &z);
    out_xyz[3 * n] = x;
    out_xyz[3 * n + 1] = y;
    out_xyz[3 * n + 2] = z;
    uint32_t c = kv.second.hits ? kv.second.hits : 1;
    out_rgb[3 * n] = (uint8_t)(kv.second.r / c);
    out_rgb[3 * n + 1] = (uint8_t)(kv.second.g / c);
    out_rgb[3 * n + 2] = (uint8_t)(kv.second.b / c);
    ++n;
  }
  return n;
}

// ASCII PCD export (reference saves pointcloud.pcd in its destructor,
// pubPointCloud.cc:184-185).
int vstore_save_pcd(void* h, const char* path, float min_log_odds,
                    uint32_t min_hits) {
  auto* s = (VoxelStore*)h;
  std::lock_guard<std::mutex> lk(s->cells_mu);
  std::vector<const std::pair<const int64_t, Cell>*> keep;
  for (const auto& kv : s->cells)
    if (kv.second.log_odds >= min_log_odds && kv.second.hits >= min_hits)
      keep.push_back(&kv);
  FILE* f = fopen(path, "w");
  if (!f) return -1;
  fprintf(f,
          "# .PCD v0.7 - Point Cloud Data file format\nVERSION 0.7\n"
          "FIELDS x y z rgb\nSIZE 4 4 4 4\nTYPE F F F U\nCOUNT 1 1 1 1\n"
          "WIDTH %zu\nHEIGHT 1\nVIEWPOINT 0 0 0 1 0 0 0\nPOINTS %zu\n"
          "DATA ascii\n",
          keep.size(), keep.size());
  for (const auto* kv : keep) {
    int32_t x, y, z;
    unpack(kv->first, &x, &y, &z);
    const Cell& c = kv->second;
    uint32_t n = c.hits ? c.hits : 1;
    uint32_t rgb = ((c.r / n) << 16) | ((c.g / n) << 8) | (c.b / n);
    fprintf(f, "%.4f %.4f %.4f %u\n", (x + 0.5) * s->resolution,
            (y + 0.5) * s->resolution, (z + 0.5) * s->resolution, rgb);
  }
  fclose(f);
  return 0;
}

}  // extern "C"
