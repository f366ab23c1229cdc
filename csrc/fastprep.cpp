// fastprep — fused dataset preparation (native runtime component).
//
// The Python pipeline (data/pipeline.py) materializes several full copies of
// the dataset (normalize → temporal resample → two flip-augment concats →
// tuple grouping ≈ 6x the data in transient numpy buffers, tens of seconds for
// the 590 MB rectangle2d series).  This C++ engine computes the final grouped
// tuple tensor in ONE multithreaded pass: for every output (tuple, slot) it
// derives the source frame index, flip flags and flow-channel sign directly,
// and copies rows with optional reversal.
//
// Semantics mirror data/pipeline.py exactly (which mirrors
// Flow-2D/load_datasets.py):
//   - temporal resample: concat of `stride` phase-shifted every-stride views;
//   - flip augmentation: x2 per spatial axis, flipped copies appended in order
//     (axis 0 flip first), with the flow channel of the flipped axis negated
//     (channel 1 = dy for axis 0, channel 2 = dx for axis 1);
//   - tuple grouping for exp: runs of (2^exp + 1) frames reordered to
//     (first, last, middles...).
//
// Exposed via a C ABI consumed with ctypes (no pybind11 in this image).
// Build: see csrc/build.sh (g++ -O3 -shared -fPIC -pthread).

#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct Spec {
  // Frames are [T, H, W, C] where for volumetric data the trailing spatial
  // axes fold into the "row" unit: a [T, Z, Y, X, Creal] volume maps to
  // H=Z, W=Y, C=X*Creal — the two flipped axes are always (H, W), matching
  // the reference (2 flips in both 2-D and 3-D).
  const float* src;
  float* dst;  // [n_tuples, slots, H, W, C]
  int64_t T, H, W, C;
  int64_t c_real;       // true channel count (for flow-sign negation)
  int resample_stride;  // 0/1 = off
  int flip_axes;        // number of spatial axes augmented (0..2)
  int exp;              // tuple run = 2^exp + 1
  bool negate_flow;     // flow channels present (c_real == 1 + ndim)
  int64_t n_aug;        // frames after resample+flips
  int64_t run, n_tuples;
};

// Map an augmented-frame index back to (source frame, flip_y, flip_x).
inline void resolve(const Spec& s, int64_t aug_idx, int64_t* src_frame,
                    bool* flip_y, bool* flip_x) {
  int64_t t_resampled = s.T;  // after resample the count is unchanged
  int64_t idx = aug_idx;
  *flip_x = false;
  *flip_y = false;
  // flips were appended in axis order 0 then 1; each doubles the set.
  if (s.flip_axes >= 2) {
    int64_t half = t_resampled * (s.flip_axes >= 1 ? 2 : 1);
    if (idx >= half) {
      *flip_x = true;  // axis 1 (W)
      idx -= half;
    }
  }
  if (s.flip_axes >= 1) {
    if (idx >= t_resampled) {
      *flip_y = true;  // axis 0 (H)
      idx -= t_resampled;
    }
  }
  // undo temporal resample: position idx in the concat of stride phases
  if (s.resample_stride > 1) {
    int64_t stride = s.resample_stride;
    int64_t base = s.T / stride;  // floor length per full phase
    int64_t rem = s.T % stride;
    int64_t pos = idx, phase = 0;
    for (; phase < stride; ++phase) {
      int64_t len = base + (phase < rem ? 1 : 0);
      if (pos < len) break;
      pos -= len;
    }
    idx = phase + pos * stride;
  }
  *src_frame = idx;
}

void copy_frame(const Spec& s, int64_t src_frame, bool flip_y, bool flip_x,
                float* out) {
  const int64_t HWC = s.H * s.W * s.C;
  const float* in = s.src + src_frame * HWC;
  for (int64_t y = 0; y < s.H; ++y) {
    int64_t sy = flip_y ? (s.H - 1 - y) : y;
    const float* row = in + sy * s.W * s.C;
    float* orow = out + y * s.W * s.C;
    if (!flip_x) {
      std::memcpy(orow, row, sizeof(float) * s.W * s.C);
    } else {
      for (int64_t x = 0; x < s.W; ++x) {
        const float* px = row + (s.W - 1 - x) * s.C;
        std::memcpy(orow + x * s.C, px, sizeof(float) * s.C);
      }
    }
  }
  if (s.negate_flow && (flip_y || flip_x)) {
    // flipping spatial axis i negates flow channel 1+i of every c_real group
    const int64_t row_len = s.W * s.C;
    for (int64_t y = 0; y < s.H; ++y) {
      float* orow = out + y * row_len;
      for (int64_t g = 0; g + s.c_real <= row_len; g += s.c_real) {
        if (flip_y) orow[g + 1] = -orow[g + 1];
        if (flip_x && s.c_real > 2) orow[g + 2] = -orow[g + 2];
      }
    }
  }
}

void worker(const Spec& s, int64_t begin, int64_t end) {
  const int64_t HWC = s.H * s.W * s.C;
  for (int64_t t = begin; t < end; ++t) {
    for (int64_t slot = 0; slot < s.run; ++slot) {
      // slot order: (0, run-1, 1, 2, ..., run-2)
      int64_t offset = slot == 0 ? 0 : (slot == 1 ? s.run - 1 : slot - 1);
      int64_t aug_idx = t * s.run + offset;
      int64_t src_frame;
      bool fy, fx;
      resolve(s, aug_idx, &src_frame, &fy, &fx);
      copy_frame(s, src_frame, fy, fx, s.dst + (t * s.run + slot) * HWC);
    }
  }
}

}  // namespace

extern "C" {

// Returns the number of output tuples, or -1 on invalid arguments.
// dst must hold n_tuples * (2^exp + 1) * H * W * C floats.
int64_t fastprep_tuples(const float* src, float* dst, int64_t T, int64_t H,
                        int64_t W, int64_t C, int64_t c_real,
                        int resample_stride, int flip_axes, int exp,
                        int negate_flow, int n_threads) {
  if (!src || !dst || T <= 0 || exp < 1 || exp > 4) return -1;
  Spec s;
  s.src = src;
  s.dst = dst;
  s.T = T;
  s.H = H;
  s.W = W;
  s.C = C;
  s.c_real = c_real > 0 ? c_real : C;
  s.resample_stride = resample_stride;
  s.flip_axes = flip_axes;
  s.exp = exp;
  s.negate_flow = negate_flow != 0;
  s.n_aug = T;
  for (int a = 0; a < flip_axes; ++a) s.n_aug *= 2;
  s.run = (1LL << exp) + 1;
  s.n_tuples = s.n_aug / s.run;
  if (s.n_tuples <= 0) return 0;

  int nt = n_threads > 0 ? n_threads
                         : (int)std::thread::hardware_concurrency();
  if (nt < 1) nt = 1;
  if (nt > s.n_tuples) nt = (int)s.n_tuples;
  std::vector<std::thread> threads;
  int64_t chunk = (s.n_tuples + nt - 1) / nt;
  for (int i = 0; i < nt; ++i) {
    int64_t b = i * chunk;
    int64_t e = b + chunk < s.n_tuples ? b + chunk : s.n_tuples;
    if (b >= e) break;
    threads.emplace_back(worker, std::cref(s), b, e);
  }
  for (auto& th : threads) th.join();
  return s.n_tuples;
}

// How many tuples fastprep_tuples would produce.
int64_t fastprep_count(int64_t T, int flip_axes, int exp) {
  int64_t n = T;
  for (int a = 0; a < flip_axes; ++a) n *= 2;
  return n / ((1LL << exp) + 1);
}

}  // extern "C"
