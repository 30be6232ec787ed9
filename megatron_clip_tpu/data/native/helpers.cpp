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

// ---------------------------------------------------------------------------
// BERT / ICT sentence-range mappings (reference: helpers.cpp build_mapping /
// build_blocks_mapping). Behavioural parity, not bit parity: the reference
// draws from std::mt19937; here both the C++ and the NumPy fallback use the
// same splitmix64 stream so the two implementations agree exactly with each
// other (testable) while keeping the reference's sampling *distribution*:
// short target lengths with prob ~short_seq_prob in [2, max_seq_length],
// documents with <min sentences or any sentence >512 tokens skipped, samples
// cut when the accumulated length reaches the target, Fisher-Yates shuffle
// of the final map with an independent stream.

static const int32_t kLongSentenceLen = 512;

static inline uint64_t splitmix64(uint64_t* state) {
  uint64_t z = (*state += 0x9E3779B97F4A7C15ULL);
  z = (z ^ (z >> 30)) * 0xBF58476D1CE4E5B9ULL;
  z = (z ^ (z >> 27)) * 0x94D049BB133111EBULL;
  return z ^ (z >> 31);
}

static inline int32_t target_len(uint64_t* rng, int32_t short_ratio,
                                 int32_t max_len) {
  if (short_ratio == 0) return max_len;
  const uint64_t r = splitmix64(rng);
  if (r % static_cast<uint64_t>(short_ratio) == 0) {
    return 2 + static_cast<int32_t>(r % static_cast<uint64_t>(max_len - 1));
  }
  return max_len;
}

static void shuffle_rows(int32_t* out, long long n, int width, uint64_t seed) {
  uint64_t rng = seed;
  for (long long i = n - 1; i > 0; --i) {
    const long long j =
        static_cast<long long>(splitmix64(&rng) % static_cast<uint64_t>(i + 1));
    for (int c = 0; c < width; ++c) {
      const int32_t t = out[i * width + c];
      out[i * width + c] = out[j * width + c];
      out[j * width + c] = t;
    }
  }
}

// Sentence-pair mapping for BERT: rows of (start_sentence, end_sentence,
// target_seq_len). Pass out=NULL to count; call again with the buffer.
long long build_mapping(const int64_t* docs, long long n_docs,
                        const int32_t* sizes,
                        int32_t num_epochs, long long max_num_samples,
                        int32_t max_seq_length, double short_seq_prob,
                        uint64_t seed, int32_t min_num_sent,
                        int32_t* out, long long max_out) {
  int32_t short_ratio = 0;
  if (short_seq_prob > 0.0) {
    short_ratio = static_cast<int32_t>(std::lround(1.0 / short_seq_prob));
  }
  uint64_t rng = seed;
  long long count = 0;
  for (int32_t epoch = 0; epoch < num_epochs; ++epoch) {
    if (count >= max_num_samples) break;
    for (long long doc = 0; doc < n_docs; ++doc) {
      const int64_t first = docs[doc];
      const int64_t last = docs[doc + 1];
      long long remain = last - first;
      if (remain < min_num_sent) continue;
      bool has_long = false;
      for (int64_t s = first; s < last; ++s) {
        if (sizes[s] > kLongSentenceLen) { has_long = true; break; }
      }
      if (has_long) continue;

      int64_t prev_start = first;
      int32_t seq_len = 0, num_sent = 0;
      int32_t tgt = target_len(&rng, short_ratio, max_seq_length);
      for (int64_t s = first; s < last; ++s) {
        seq_len += sizes[s];
        ++num_sent;
        --remain;
        if ((seq_len >= tgt && remain > 1 && num_sent >= min_num_sent) ||
            remain == 0) {
          if (out != NULL) {
            if (count >= max_out) return -1;
            out[count * 3] = static_cast<int32_t>(prev_start);
            out[count * 3 + 1] = static_cast<int32_t>(s + 1);
            out[count * 3 + 2] = tgt;
          }
          ++count;
          prev_start = s + 1;
          tgt = target_len(&rng, short_ratio, max_seq_length);
          seq_len = 0;
          num_sent = 0;
        }
      }
    }
  }
  if (out != NULL) shuffle_rows(out, count, 3, seed + 1);
  return count;
}

// Block mapping for ICT/REALM: rows of (start_sentence, end_sentence, doc,
// block_id); per-doc target length = max_seq_length - title_size[doc].
long long build_blocks_mapping(const int64_t* docs, long long n_docs,
                               const int32_t* sizes,
                               const int32_t* title_sizes,
                               int32_t num_epochs, long long max_num_samples,
                               int32_t max_seq_length, uint64_t seed,
                               int32_t use_one_sent_blocks,
                               int32_t* out, long long max_out) {
  const int32_t min_num_sent = use_one_sent_blocks ? 1 : 2;
  long long count = 0;
  for (int32_t epoch = 0; epoch < num_epochs; ++epoch) {
    if (count >= max_num_samples) break;
    int32_t block_id = 0;
    for (long long doc = 0; doc < n_docs; ++doc) {
      const int64_t first = docs[doc];
      const int64_t last = docs[doc + 1];
      const int32_t tgt = max_seq_length - title_sizes[doc];
      long long remain = last - first;
      if (remain < min_num_sent) continue;
      bool has_long = false;
      for (int64_t s = first; s < last; ++s) {
        if (sizes[s] > kLongSentenceLen) { has_long = true; break; }
      }
      if (has_long) continue;

      int64_t prev_start = first;
      int32_t seq_len = 0, num_sent = 0;
      for (int64_t s = first; s < last; ++s) {
        seq_len += sizes[s];
        ++num_sent;
        --remain;
        if ((seq_len >= tgt && remain >= min_num_sent &&
             num_sent >= min_num_sent) || remain == 0) {
          if (out != NULL) {
            if (count >= max_out) return -1;
            out[count * 4] = static_cast<int32_t>(prev_start);
            out[count * 4 + 1] = static_cast<int32_t>(s + 1);
            out[count * 4 + 2] = static_cast<int32_t>(doc);
            out[count * 4 + 3] = block_id;
          }
          ++count;
          ++block_id;
          prev_start = s + 1;
          seq_len = 0;
          num_sent = 0;
        }
      }
    }
  }
  if (out != NULL) shuffle_rows(out, count, 4, seed + 1);
  return count;
}

}  // extern "C"
