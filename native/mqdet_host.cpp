// mqdet_host — native host-side runtime for mqdet_tpu.
//
// The reference's native surface is CUDA device kernels (csrc/) — their TPU
// equivalents live in Pallas/XLA. THIS library covers the host-side hot
// paths that the reference ran in python/torch-CPU and that dominate
// wall-clock outside the chip:
//   * greedy detection<->GT matching for mAP evaluation
//     (the per-(image,category) inner loop of COCOeval/LVISEval — called
//     ~1.2M times for an LVIS run)
//   * bilinear uint8 image resize + Detectron BGR255 normalization + bucket
//     padding (the data-loader per-image transform)
//   * greedy class-aware NMS (host fallback / tooling)
//
// Exposed via a plain C ABI consumed with ctypes (no pybind11 in the image).
// Build: make -C native   (produces libmqdet_host.so)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// Greedy IoU matching (COCOeval.evaluateImg semantics).
//   det_boxes: (D, 4) xyxy, SORTED by score desc
//   gt_boxes:  (G, 4) xyxy, real GTs first, ignored GTs last
//   gt_ignore: (G,) uint8
//   thresholds: (T,)
// Outputs: tp (T, D) uint8, det_ignore (T, D) uint8
// ---------------------------------------------------------------------------
void match_detections(
    const float* det_boxes, int64_t D,
    const float* gt_boxes, const uint8_t* gt_ignore, int64_t G,
    const double* thresholds, int64_t T,
    uint8_t* tp, uint8_t* det_ignore) {
  if (D == 0) return;
  std::memset(tp, 0, (size_t)(T * D));
  std::memset(det_ignore, 0, (size_t)(T * D));
  if (G == 0) return;

  // IoU matrix (D, G), COCO convention (no +1)
  std::vector<double> iou((size_t)(D * G));
  for (int64_t d = 0; d < D; ++d) {
    const float* a = det_boxes + d * 4;
    double area_a = std::max(0.f, a[2] - a[0]) * std::max(0.f, a[3] - a[1]);
    for (int64_t g = 0; g < G; ++g) {
      const float* b = gt_boxes + g * 4;
      double area_b = std::max(0.f, b[2] - b[0]) * std::max(0.f, b[3] - b[1]);
      double iw = std::min(a[2], b[2]) - std::max(a[0], b[0]);
      double ih = std::min(a[3], b[3]) - std::max(a[1], b[1]);
      double inter = (iw > 0 && ih > 0) ? iw * ih : 0.0;
      double uni = area_a + area_b - inter;
      iou[(size_t)(d * G + g)] = uni > 0 ? inter / uni : 0.0;
    }
  }

  std::vector<uint8_t> taken((size_t)G);
  for (int64_t t = 0; t < T; ++t) {
    std::fill(taken.begin(), taken.end(), 0);
    double thr = thresholds[t];
    for (int64_t d = 0; d < D; ++d) {
      int64_t best = -1;
      double best_iou = thr - 1e-10;
      for (int64_t g = 0; g < G; ++g) {
        // any matched gt — real OR ignored — is consumed
        // (vendored lvis_eval.py:366 `if gt_m[...] > 0: continue`)
        if (taken[(size_t)g]) continue;
        // gts sorted real-first: once we reach ignored gts with a real match
        // in hand, stop (COCOeval tie-break rule)
        if (gt_ignore[g] && best > -1 && !gt_ignore[best]) break;
        double v = iou[(size_t)(d * G + g)];
        if (v > best_iou) { best = g; best_iou = v; }
      }
      if (best > -1) {
        taken[(size_t)best] = 1;
        if (gt_ignore[best]) {
          det_ignore[t * D + d] = 1;
        } else {
          tp[t * D + d] = 1;
        }
      }
    }
  }
}

// ---------------------------------------------------------------------------
// Bilinear resize (uint8 HWC RGB) + BGR255 Detectron normalization + bucket
// padding. out: (bucket_h, bucket_w, 3) float32, zero-padded.
// ---------------------------------------------------------------------------
void resize_normalize_pad(
    const uint8_t* img, int64_t h, int64_t w,
    int64_t oh, int64_t ow,
    int64_t bucket_h, int64_t bucket_w,
    const float* pixel_mean, const float* pixel_std,  // BGR order
    int to_bgr255,
    float* out) {
  std::memset(out, 0, sizeof(float) * (size_t)(bucket_h * bucket_w * 3));
  const double sy = (double)h / oh;
  const double sx = (double)w / ow;
  for (int64_t y = 0; y < oh; ++y) {
    // PIL-style bilinear: sample at center-aligned positions
    double fy = (y + 0.5) * sy - 0.5;
    int64_t y0 = (int64_t)std::floor(fy);
    double ly = fy - y0;
    int64_t y0c = std::min(std::max(y0, (int64_t)0), h - 1);
    int64_t y1c = std::min(std::max(y0 + 1, (int64_t)0), h - 1);
    for (int64_t x = 0; x < ow; ++x) {
      double fx = (x + 0.5) * sx - 0.5;
      int64_t x0 = (int64_t)std::floor(fx);
      double lx = fx - x0;
      int64_t x0c = std::min(std::max(x0, (int64_t)0), w - 1);
      int64_t x1c = std::min(std::max(x0 + 1, (int64_t)0), w - 1);
      float* o = out + (y * bucket_w + x) * 3;
      for (int c = 0; c < 3; ++c) {
        double v00 = img[(y0c * w + x0c) * 3 + c];
        double v01 = img[(y0c * w + x1c) * 3 + c];
        double v10 = img[(y1c * w + x0c) * 3 + c];
        double v11 = img[(y1c * w + x1c) * 3 + c];
        double v = v00 * (1 - ly) * (1 - lx) + v01 * (1 - ly) * lx +
                   v10 * ly * (1 - lx) + v11 * ly * lx;
        int oc = to_bgr255 ? 2 - c : c;  // RGB -> BGR channel swap
        double scaled = to_bgr255 ? v : v / 255.0;
        o[oc] = (float)scaled;  // normalize below using output channel stats
      }
      for (int c = 0; c < 3; ++c) {
        o[c] = (float)((o[c] - pixel_mean[c]) / pixel_std[c]);
      }
    }
  }
}

// ---------------------------------------------------------------------------
// Greedy class-aware NMS (ml_nms semantics, +1 IoU convention).
// boxes (N, 4) xyxy, scores (N,), labels (N,). Returns number kept; indices
// written to keep (max_out).
// ---------------------------------------------------------------------------
int64_t class_aware_nms(
    const float* boxes, const float* scores, const int32_t* labels,
    int64_t N, double iou_threshold, int64_t max_out, int64_t* keep) {
  std::vector<int64_t> order((size_t)N);
  for (int64_t i = 0; i < N; ++i) order[(size_t)i] = i;
  std::stable_sort(order.begin(), order.end(), [&](int64_t a, int64_t b) {
    return scores[a] > scores[b];
  });
  std::vector<uint8_t> suppressed((size_t)N, 0);
  int64_t kept = 0;
  for (size_t oi = 0; oi < order.size() && kept < max_out; ++oi) {
    int64_t i = order[oi];
    if (suppressed[(size_t)i]) continue;
    keep[kept++] = i;
    const float* a = boxes + i * 4;
    double area_a = (a[2] - a[0] + 1.0) * (a[3] - a[1] + 1.0);
    for (size_t oj = oi + 1; oj < order.size(); ++oj) {
      int64_t j = order[oj];
      if (suppressed[(size_t)j] || labels[j] != labels[i]) continue;
      const float* b = boxes + j * 4;
      double iw = std::min(a[2], b[2]) - std::max(a[0], b[0]) + 1.0;
      double ih = std::min(a[3], b[3]) - std::max(a[1], b[1]) + 1.0;
      if (iw <= 0 || ih <= 0) continue;
      double inter = iw * ih;
      double area_b = (b[2] - b[0] + 1.0) * (b[3] - b[1] + 1.0);
      if (inter / (area_a + area_b - inter) > iou_threshold)
        suppressed[(size_t)j] = 1;
    }
  }
  return kept;
}

}  // extern "C"
