// densecap_tpu native geometry runtime (host side).
//
// The evaluator's per-image work — pascal IoU, greedy best-match
// assignment, gt merge clustering, greedy NMS — is O(N*M)/O(N^2) CPU
// code that the reference ran as hot Lua loops (eval_utils.lua:167-215,
// box_utils.lua:565-612, :154-256). Here it is vectorizable C++ behind a
// C ABI (ctypes wrapper: densecap_tpu/eval/native.py). The TPU path
// never calls this; it serves evaluation and CPU-only deployments.
//
// Conventions: boxes are x1y1x2y2, pascal (+1) areas, matching the
// NMS/evaluator convention (see densecap_tpu/ops/boxes.py docstring).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <numeric>
#include <vector>

namespace {

inline double pascal_iou(const float* a, const float* b) {
  double xx1 = std::max(a[0], b[0]);
  double yy1 = std::max(a[1], b[1]);
  double xx2 = std::min(a[2], b[2]);
  double yy2 = std::min(a[3], b[3]);
  double iw = std::max(xx2 - xx1 + 1.0, 0.0);
  double ih = std::max(yy2 - yy1 + 1.0, 0.0);
  double inter = iw * ih;
  double a1 = (a[2] - a[0] + 1.0) * (a[3] - a[1] + 1.0);
  double a2 = (b[2] - b[0] + 1.0) * (b[3] - b[1] + 1.0);
  return inter / (a1 + a2 - inter);
}

}  // namespace

extern "C" {

// Bump whenever any exported signature changes (see native_lib._load).
int dcgeom_abi_version() { return 1; }

// Full pairwise IoU matrix: boxes1 (n1,4) x boxes2 (n2,4) -> out (n1*n2).
void dcgeom_iou_matrix(const float* boxes1, int n1, const float* boxes2,
                       int n2, float* out) {
  for (int i = 0; i < n1; ++i)
    for (int j = 0; j < n2; ++j)
      out[size_t(i) * n2 + j] =
          float(pascal_iou(boxes1 + 4 * i, boxes2 + 4 * j));
}

// Greedy score-descending NMS. Writes up to max_out kept indices into
// `pick`; returns the number kept. Exact reference semantics
// (box_utils.lua:154-256): survivors have IoU <= thresh to every
// earlier-kept box.
int dcgeom_nms(const float* boxes, const float* scores, int n, float thresh,
               int max_out, int* pick) {
  std::vector<int> order(n);
  std::iota(order.begin(), order.end(), 0);
  std::stable_sort(order.begin(), order.end(), [&](int a, int b) {
    return scores[a] > scores[b];
  });
  std::vector<char> dead(n, 0);
  int kept = 0;
  for (int oi = 0; oi < n && kept < max_out; ++oi) {
    int i = order[oi];
    if (dead[i]) continue;
    pick[kept++] = i;
    for (int oj = oi + 1; oj < n; ++oj) {
      int j = order[oj];
      if (!dead[j] && pascal_iou(boxes + 4 * i, boxes + 4 * j) > thresh)
        dead[j] = 1;
    }
  }
  return kept;
}

// Evaluator greedy assignment (eval_utils.lua:173-215): detections in
// descending-score order each claim their best-IoU gt; first claim wins.
// Inputs: det boxes (nd,4) ALREADY sorted by descending score, gt boxes
// (nt,4). Outputs per detection: ov (best IoU), assignment (gt index or
// -1), ok (1 if it claimed a previously unclaimed gt).
void dcgeom_assign(const float* det, int nd, const float* gt, int nt,
                   float* ov, int32_t* assignment, int32_t* ok) {
  std::vector<char> used(std::max(nt, 1), 0);
  for (int d = 0; d < nd; ++d) {
    double best = 0.0;
    int jmax = -1;
    for (int j = 0; j < nt; ++j) {
      double o = pascal_iou(det + 4 * d, gt + 4 * j);
      if (o > best) {
        best = o;
        jmax = j;
      }
    }
    ov[d] = float(best);
    assignment[d] = jmax;
    if (jmax >= 0 && !used[jmax]) {
      used[jmax] = 1;
      ok[d] = 1;
    } else {
      ok[d] = 0;
    }
  }
}

// Greedy IoU clustering (box_utils.lua:590-612): repeatedly take the box
// with the most IoU>=thr partners, absorb the group. Outputs group id
// per box (0..n_groups-1, in greedy order). Returns n_groups.
int dcgeom_merge_boxes(const float* boxes, int n, float thr,
                       int32_t* group_ids) {
  std::vector<double> D(size_t(n) * n, 0.0);
  for (int i = 0; i < n; ++i) {
    D[size_t(i) * n + i] = 1.0;
    for (int j = i + 1; j < n; ++j) {
      double o = pascal_iou(boxes + 4 * i, boxes + 4 * j);
      D[size_t(i) * n + j] = o;
      D[size_t(j) * n + i] = o;
    }
  }
  for (int i = 0; i < n; ++i) group_ids[i] = -1;
  int ngroups = 0;
  for (;;) {
    int topix = -1, topnum = 0;
    for (int i = 0; i < n; ++i) {
      int cnt = 0;
      for (int j = 0; j < n; ++j)
        if (D[size_t(j) * n + i] >= thr) ++cnt;
      if (cnt > topnum) {
        topnum = cnt;
        topix = i;
      }
    }
    if (topnum == 0) break;
    // collect the group first, then zero (zeroing while scanning would
    // drop members after the first)
    std::vector<int> members;
    for (int j = 0; j < n; ++j)
      if (D[size_t(topix) * n + j] >= thr) members.push_back(j);
    for (int j : members) {
      group_ids[j] = ngroups;
      for (int k = 0; k < n; ++k) {
        D[size_t(j) * n + k] = 0.0;
        D[size_t(k) * n + j] = 0.0;
      }
    }
    ++ngroups;
  }
  return ngroups;
}

}  // extern "C"
