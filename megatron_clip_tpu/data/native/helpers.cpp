// Native dataset index helpers.
//
// TPU-native equivalent of the reference's pybind11 helpers
// (megatron/data/helpers.cpp: build_sample_idx, build_blending_indices —
// compiled at startup by megatron/initialize.py:100-110). Exposed through a
// plain C ABI and loaded with ctypes (no pybind11 in this image); arrays are
// NumPy buffers passed as raw pointers. Compiled on demand by
// megatron_clip_tpu/data/native/__init__.py with g++ -O3.
//
// Algorithms are the standard ones:
//  - sample packing: walk documents in epoch order, packing tokens into
//    fixed seq_length samples, recording (doc_idx_pos, doc_offset) per sample;
//  - weighted blending: greedy choice of the dataset whose emitted fraction
//    lags its target weight the most.
#include <cstdint>
#include <cmath>

extern "C" {

// Returns number of samples written. sample_idx must have room for
// (num_samples+1)*2 int32 entries; call count_samples first to size it.
long long build_sample_idx(const int32_t* sizes,
                           const int32_t* doc_idx, long long doc_idx_len,
                           int32_t seq_length, int32_t num_epochs,
                           long long tokens_per_epoch,
                           int32_t* sample_idx /* [(n+1)*2] */,
                           long long max_samples) {
  long long num_samples = (num_epochs * tokens_per_epoch - 1) / seq_length;
  if (num_samples + 1 > max_samples) return -1;

  long long sample = 0;
  long long doc_pos = 0;     // index into doc_idx
  int32_t doc_offset = 0;    // token offset within current document
  sample_idx[0] = static_cast<int32_t>(doc_pos);
  sample_idx[1] = doc_offset;
  sample += 1;
  while (sample <= num_samples) {
    long long remaining = seq_length + 1;  // +1: targets are shifted inputs
    while (remaining > 0) {
      int32_t doc_len = sizes[doc_idx[doc_pos]] - doc_offset;
      remaining -= doc_len;
      if (remaining <= 0) {
        // sample ends inside this document
        doc_offset += static_cast<int32_t>(doc_len + remaining - 1);
        remaining = 0;
      } else {
        ++doc_pos;
        doc_offset = 0;
        if (doc_pos >= doc_idx_len) {  // ran out of shuffled docs
          doc_pos = doc_idx_len - 1;
          remaining = 0;
        }
      }
    }
    sample_idx[sample * 2] = static_cast<int32_t>(doc_pos);
    sample_idx[sample * 2 + 1] = doc_offset;
    ++sample;
  }
  return num_samples;
}

// Weighted multi-dataset blend (reference: build_blending_indices).
void build_blending_indices(int16_t* dataset_index,
                            int64_t* dataset_sample_index,
                            const double* weights, int32_t num_datasets,
                            int64_t size) {
  double* current = new double[num_datasets];
  int64_t* counts = new int64_t[num_datasets];
  for (int32_t i = 0; i < num_datasets; ++i) { current[i] = 0.0; counts[i] = 0; }
  for (int64_t s = 0; s < size; ++s) {
    // pick the dataset with the largest deficit vs its target share
    int32_t best = 0;
    double best_deficit = -1e300;
    for (int32_t i = 0; i < num_datasets; ++i) {
      double deficit = weights[i] * (s + 1) - counts[i];
      if (deficit > best_deficit) { best_deficit = deficit; best = i; }
    }
    dataset_index[s] = static_cast<int16_t>(best);
    dataset_sample_index[s] = counts[best];
    ++counts[best];
  }
  delete[] current;
  delete[] counts;
}

}  // extern "C"
