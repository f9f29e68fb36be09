// Native VPQ core: tube-matching PQ over sliding windows.
//
// The reference computes VPQ in a 32-process python pool over PNG files
// (maxtron_deeplab/evaluation/video_panoptic_metrics.py:24-330 +
// vipseg_evaluation.py:287-320). This C++ core runs the confusion-map and
// matching inner loops directly on int32 id maps with std::thread
// parallelism across window positions — same semantics as
// axial_vs_tpu/evaluation/vpq.py (which stays as the reference oracle and
// fallback).
//
// Build: g++ -O3 -march=native -shared -fPIC -o libvpq_core.so vpq_core.cpp -lpthread
// ABI: see vpq_stats() below; python binding in evaluation/vpq_native.py.

#include <cstdint>
#include <cstring>
#include <mutex>
#include <thread>
#include <unordered_map>
#include <unordered_set>
#include <vector>

namespace {

struct Stats {
  std::vector<double> iou;
  std::vector<int64_t> tp, fp, fn;
  explicit Stats(int64_t n_cats)
      : iou(n_cats, 0.0), tp(n_cats, 0), fp(n_cats, 0), fn(n_cats, 0) {}
  void add(const Stats& o) {
    for (size_t i = 0; i < iou.size(); ++i) {
      iou[i] += o.iou[i];
      tp[i] += o.tp[i];
      fp[i] += o.fp[i];
      fn[i] += o.fn[i];
    }
  }
};

struct SegInfo {
  int64_t cat;
  bool crowd;
};

void process_window(const int32_t* gt, const int32_t* pred, int64_t n_pixels,
                    const std::unordered_map<int64_t, SegInfo>& gt_segs,
                    const std::unordered_map<int64_t, SegInfo>& pred_segs,
                    Stats* stats) {
  // confusion map over the tube
  std::unordered_map<uint64_t, int64_t> inter;
  inter.reserve(1024);
  for (int64_t i = 0; i < n_pixels; ++i) {
    uint64_t key =
        (static_cast<uint64_t>(static_cast<uint32_t>(gt[i])) << 32) |
        static_cast<uint32_t>(pred[i]);
    ++inter[key];
  }
  std::unordered_map<int64_t, int64_t> gt_area, pred_area;
  for (const auto& kv : inter) {
    int64_t g = static_cast<int64_t>(kv.first >> 32);
    int64_t p = static_cast<int64_t>(kv.first & 0xffffffffu);
    gt_area[g] += kv.second;
    pred_area[p] += kv.second;
  }
  auto get_inter = [&](int64_t g, int64_t p) -> int64_t {
    auto it = inter.find((static_cast<uint64_t>(static_cast<uint32_t>(g)) << 32) |
                         static_cast<uint32_t>(p));
    return it == inter.end() ? 0 : it->second;
  };

  std::unordered_set<int64_t> gt_matched, pred_matched;
  for (const auto& kv : inter) {
    int64_t g = static_cast<int64_t>(kv.first >> 32);
    int64_t p = static_cast<int64_t>(kv.first & 0xffffffffu);
    auto git = gt_segs.find(g);
    auto pit = pred_segs.find(p);
    if (git == gt_segs.end() || pit == pred_segs.end()) continue;
    if (git->second.crowd) continue;
    if (git->second.cat != pit->second.cat) continue;
    int64_t uni = pred_area[p] + gt_area[g] - kv.second - get_inter(0, p);
    double iou = static_cast<double>(kv.second) / static_cast<double>(uni);
    if (iou > 0.5) {
      stats->tp[git->second.cat] += 1;
      stats->iou[git->second.cat] += iou;
      gt_matched.insert(g);
      pred_matched.insert(p);
    }
  }

  std::unordered_map<int64_t, int64_t> crowd_by_cat;
  for (const auto& kv : gt_area) {
    int64_t g = kv.first;
    if (g == 0 || gt_matched.count(g)) continue;
    auto it = gt_segs.find(g);
    if (it == gt_segs.end()) continue;
    if (it->second.crowd) {
      crowd_by_cat[it->second.cat] = g;
      continue;
    }
    stats->fn[it->second.cat] += 1;
  }
  for (const auto& kv : pred_area) {
    int64_t p = kv.first;
    if (p == 0 || pred_matched.count(p)) continue;
    auto it = pred_segs.find(p);
    if (it == pred_segs.end()) continue;
    int64_t ignored = get_inter(0, p);
    auto cit = crowd_by_cat.find(it->second.cat);
    if (cit != crowd_by_cat.end()) ignored += get_inter(cit->second, p);
    if (static_cast<double>(ignored) / static_cast<double>(kv.second) > 0.5)
      continue;
    stats->fp[it->second.cat] += 1;
  }
}

}  // namespace

extern "C" {

// gt/pred: (V, HW) int32 id maps (void = 0). Segment tables are parallel
// arrays. Outputs are dense per-category arrays of length n_cats.
// Returns 0 on success.
int vpq_stats(const int32_t* gt, const int32_t* pred, int64_t v, int64_t hw,
              int64_t nframes, const int64_t* gt_seg_ids,
              const int64_t* gt_seg_cats, const uint8_t* gt_seg_crowd,
              int64_t n_gt_segs, const int64_t* pred_seg_ids,
              const int64_t* pred_seg_cats, int64_t n_pred_segs,
              int64_t n_cats, int num_threads, double* iou_out,
              int64_t* tp_out, int64_t* fp_out, int64_t* fn_out) {
  if (nframes > v) return 0;
  std::unordered_map<int64_t, SegInfo> gt_segs, pred_segs;
  for (int64_t i = 0; i < n_gt_segs; ++i) {
    if (gt_seg_cats[i] < 0 || gt_seg_cats[i] >= n_cats) return 1;
    gt_segs[gt_seg_ids[i]] = {gt_seg_cats[i], gt_seg_crowd[i] != 0};
  }
  for (int64_t i = 0; i < n_pred_segs; ++i) {
    if (pred_seg_cats[i] < 0 || pred_seg_cats[i] >= n_cats) return 1;
    pred_segs[pred_seg_ids[i]] = {pred_seg_cats[i], false};
  }

  int64_t n_windows = v - nframes + 1;
  int nt = num_threads > 0 ? num_threads : 1;
  if (nt > n_windows) nt = static_cast<int>(n_windows);

  std::vector<Stats> partials(nt, Stats(n_cats));
  std::vector<std::thread> threads;
  for (int t = 0; t < nt; ++t) {
    threads.emplace_back([&, t]() {
      for (int64_t wi = t; wi < n_windows; wi += nt) {
        process_window(gt + wi * hw, pred + wi * hw, nframes * hw, gt_segs,
                       pred_segs, &partials[t]);
      }
    });
  }
  for (auto& th : threads) th.join();

  Stats total(n_cats);
  for (const auto& p : partials) total.add(p);
  std::memcpy(iou_out, total.iou.data(), n_cats * sizeof(double));
  std::memcpy(tp_out, total.tp.data(), n_cats * sizeof(int64_t));
  std::memcpy(fp_out, total.fp.data(), n_cats * sizeof(int64_t));
  std::memcpy(fn_out, total.fn.data(), n_cats * sizeof(int64_t));
  return 0;
}

}  // extern "C"
