// Host-side SLIC connectivity enforcement (skimage
// _enforce_label_connectivity_cython semantics), C ABI, threaded over the
// batch dimension.
//
// Why native/host: the enforcement is scan-order BFS + union-find-style
// merging — pointer-chasing with data-dependent control flow. On the TPU
// the equivalent (ops/slic._enforce_connectivity) is built from [H*W]-table
// gathers (~65 ms each) and scatters (~260 ms each) at 224^2 batch 128
// (xplane, BASELINE.md round 3) and costs seconds; here it is a few ms per
// image on a CPU core. Reference consumption point:
// /root/reference/models/sppp.py:64-65 (skimage slic defaults,
// enforce_connectivity=True); oracle: tools/slic_numpy.py.
//
// Semantics, per image (int32 labels [H, W]):
//   1. Scan-order BFS flood fill over 4-connected equal-label components,
//      assigning sequential new ids; a component smaller than `min_size`
//      is merged into the most recently *seen* adjacent finished component
//      (skimage keeps the label of the last examined adjacent segment).
//   2. If more than `max_labels` components survive, reduce exactly like
//      the on-device reduce (ops/slic.py): per pass keep the max_labels
//      largest (size desc, id asc), merge every other component into its
//      min-id 4-adjacent component when that target is kept or has a
//      smaller id (downhill rule — acyclic), repeat to fixpoint.
//   3. Compact ids densely in scan order of each component's first pixel,
//      clipped to [0, max_labels).
//
// Build: g++ -O3 -std=c++17 -shared -fPIC -pthread connectivity.cpp -o
//        libfavit_connectivity.so   (see data/native.py pattern).

#include <algorithm>
#include <cstdint>
#include <thread>
#include <vector>

namespace {

void enforce_one(const int32_t* in, int32_t* out, int h, int w, int min_size,
                 int max_labels) {
  const int p = h * w;
  std::vector<int32_t> comp(p, -1);  // sequential component ids after BFS
  std::vector<int32_t> queue(p);
  std::vector<int32_t> sizes;

  // 1. Scan-order BFS with min-size merge into the last-seen adjacent.
  int next = 0;
  for (int start = 0; start < p; ++start) {
    if (comp[start] >= 0) continue;
    const int32_t lab = in[start];
    int head = 0, tail = 0;
    queue[tail++] = start;
    comp[start] = next;
    int32_t adjacent = -1;
    while (head < tail) {
      const int idx = queue[head++];
      const int y = idx / w, x = idx % w;
      const int nbs[4] = {idx - w, idx + w, idx - 1, idx + 1};
      const bool ok[4] = {y > 0, y < h - 1, x > 0, x < w - 1};
      for (int k = 0; k < 4; ++k) {
        if (!ok[k]) continue;
        const int nb = nbs[k];
        if (comp[nb] < 0 && in[nb] == lab) {
          comp[nb] = next;
          queue[tail++] = nb;
        } else if (comp[nb] >= 0 && comp[nb] != next) {
          adjacent = comp[nb];
        }
      }
    }
    if (tail < min_size && adjacent >= 0) {
      for (int i = 0; i < tail; ++i) comp[queue[i]] = adjacent;
      sizes[adjacent] += tail;
    } else {
      sizes.push_back(tail);
      ++next;
    }
  }

  // 2. Reduce to <= max_labels with the device rule (ops/slic.py
  //    reduce_body): keep the max_labels largest (size desc, id asc);
  //    merge others into their min-id 4-adjacent component when the
  //    target is kept or downhill; repeat.
  int n = next;
  std::vector<int32_t> remap(n);
  for (int i = 0; i < n; ++i) remap[i] = i;
  auto live_count = [&]() {
    int c = 0;
    for (int i = 0; i < n; ++i) c += (remap[i] == i && sizes[i] > 0);
    return c;
  };
  while (live_count() > max_labels) {
    // min-id adjacent per live component, from the pixel grid.
    std::vector<int32_t> adj(n, -1);
    for (int idx = 0; idx < p; ++idx) {
      const int y = idx / w, x = idx % w;
      const int32_t a = remap[comp[idx]];
      const int nbs[2] = {idx + w, idx + 1};  // each edge once
      const bool ok[2] = {y < h - 1, x < w - 1};
      for (int k = 0; k < 2; ++k) {
        if (!ok[k]) continue;
        const int32_t b = remap[comp[nbs[k]]];
        if (a == b) continue;
        if (adj[a] < 0 || b < adj[a]) adj[a] = b;
        if (adj[b] < 0 || a < adj[b]) adj[b] = a;
      }
    }
    // Rank live components: size desc, id asc.
    std::vector<int32_t> order;
    for (int i = 0; i < n; ++i)
      if (remap[i] == i && sizes[i] > 0) order.push_back(i);
    std::sort(order.begin(), order.end(), [&](int32_t a, int32_t b) {
      if (sizes[a] != sizes[b]) return sizes[a] > sizes[b];
      return a < b;
    });
    std::vector<char> keep(n, 0);
    for (size_t i = 0; i < order.size() && i < (size_t)max_labels; ++i)
      keep[order[i]] = 1;
    // Simultaneous merges with full chain resolution (downhill => acyclic).
    std::vector<int32_t> target(n);
    for (int i = 0; i < n; ++i) target[i] = i;
    bool any = false;
    for (int i = 0; i < n; ++i) {
      if (remap[i] != i || sizes[i] <= 0 || keep[i]) continue;
      const int32_t t = adj[i];
      if (t >= 0 && (keep[t] || t < i)) {
        target[i] = t;
        any = true;
      }
    }
    if (!any) break;  // no legal merge (disconnected leftovers) — stop
    auto resolve = [&](int32_t i) {
      while (target[i] != i) i = target[i];
      return i;
    };
    for (int i = 0; i < n; ++i) {
      if (target[i] == i) continue;
      const int32_t root = resolve(i);
      sizes[root] += sizes[i];
      sizes[i] = 0;
      remap[i] = root;
    }
    // Path-compress remap through merged chains.
    for (int i = 0; i < n; ++i) {
      int32_t r = remap[i];
      while (remap[r] != r) r = remap[r];
      remap[i] = r;
    }
  }

  // 3. Dense ranks in scan order of first pixel, clipped to the cap.
  std::vector<int32_t> rank(n, -1);
  int32_t r = 0;
  for (int start = 0; start < p; ++start) {
    const int32_t c = remap[comp[start]];
    if (rank[c] < 0) rank[c] = std::min(r++, max_labels - 1);
  }
  for (int idx = 0; idx < p; ++idx) out[idx] = rank[remap[comp[idx]]];
}

}  // namespace

extern "C" {

// labels/out: int32 [B, H, W] row-major. Returns 0 on success.
int favit_enforce_connectivity(const int32_t* labels, int32_t* out, int b,
                               int h, int w, int min_size, int max_labels,
                               int n_threads) {
  if (b <= 0 || h <= 0 || w <= 0 || max_labels <= 0) return -1;
  const int64_t stride = (int64_t)h * w;
  if (n_threads <= 0)
    n_threads = (int)std::min<unsigned>(std::thread::hardware_concurrency(),
                                        (unsigned)b);
  n_threads = std::max(1, std::min(n_threads, b));
  std::vector<std::thread> ts;
  for (int t = 0; t < n_threads; ++t) {
    ts.emplace_back([=]() {
      for (int i = t; i < b; i += n_threads)
        enforce_one(labels + i * stride, out + i * stride, h, w, min_size,
                    max_labels);
    });
  }
  for (auto& th : ts) th.join();
  return 0;
}

}  // extern "C"
