// Host-side batch assembly for the datamix pipeline.
//
// The reference's training loop spends host time in Python tokenize/pad/mask
// loops inside the prefetch thread
// (/root/reference/precondition/datamix_gemma/dataset_builders/dataset_builder.py:33-67,
// training_batch_generators/*).  This library does the per-batch work —
// byte-level tokenisation, padding, target-mask construction, and mixture
// sampling — in C++ behind a C ABI consumed via ctypes
// (precondition_tpu/datamix/native.py), so the prefetch thread keeps the
// device fed instead of burning the GIL.
//
// Build: make -C native   (g++ -O3 -shared -fPIC)

#include <cstdint>
#include <cstring>

extern "C" {

// Byte-level tokenisation matching dataset_builder.char_tokenizer:
// id = 2 + (byte % (vocab_size - 2)); 0 = pad, 1 = eos.
// Returns the number of tokens written (<= max_len).
int32_t tokenize_bytes(const char* text, int32_t text_len, int32_t vocab_size,
                       int32_t max_len, int32_t* out) {
  const int32_t span = vocab_size - 2;
  int32_t n = text_len < max_len ? text_len : max_len;
  for (int32_t i = 0; i < n; ++i) {
    out[i] = 2 + (static_cast<uint8_t>(text[i]) % span);
  }
  return n;
}

// Assemble a batch of (prompt, answer) pairs into padded token and target
// mask arrays of shape [n, max_seq_len].  The mask is true on answer
// positions only (loss masking contract of transformer.loss_fn).
void build_examples(const char** prompts, const int32_t* prompt_lens,
                    const char** answers, const int32_t* answer_lens,
                    int32_t n, int32_t max_seq_len, int32_t vocab_size,
                    int32_t pad_id, int32_t* out_tokens, uint8_t* out_mask) {
  for (int32_t row = 0; row < n; ++row) {
    int32_t* tok = out_tokens + static_cast<int64_t>(row) * max_seq_len;
    uint8_t* msk = out_mask + static_cast<int64_t>(row) * max_seq_len;
    for (int32_t j = 0; j < max_seq_len; ++j) {
      tok[j] = pad_id;
      msk[j] = 0;
    }
    int32_t np = tokenize_bytes(prompts[row], prompt_lens[row], vocab_size,
                                max_seq_len, tok);
    int32_t budget = max_seq_len - np;
    if (budget <= 0) continue;
    int32_t na = tokenize_bytes(answers[row], answer_lens[row], vocab_size,
                                budget, tok + np);
    for (int32_t j = np; j < np + na; ++j) msk[j] = 1;
  }
}

// splitmix64: deterministic, high-quality 64-bit mixer.
static inline uint64_t splitmix64(uint64_t* state) {
  uint64_t z = (*state += 0x9E3779B97f4A7C15ULL);
  z = (z ^ (z >> 30)) * 0xBF58476D1CE4E5B9ULL;
  z = (z ^ (z >> 27)) * 0x94D049BB133111EBULL;
  return z ^ (z >> 31);
}

// Multinomial mixture sampling: draw `count` dataset indices from
// `weights[k]` (need not be normalised) with a deterministic seed.
void sample_mixture(const double* weights, int32_t k, int32_t count,
                    uint64_t seed, int32_t* out) {
  double total = 0.0;
  for (int32_t i = 0; i < k; ++i) total += weights[i];
  uint64_t state = seed ^ 0xD1B54A32D192ED03ULL;
  for (int32_t c = 0; c < count; ++c) {
    const double u =
        (splitmix64(&state) >> 11) * (1.0 / 9007199254740992.0) * total;
    double acc = 0.0;
    int32_t pick = k - 1;
    for (int32_t i = 0; i < k; ++i) {
      acc += weights[i];
      if (u < acc) {
        pick = i;
        break;
      }
    }
    out[c] = pick;
  }
}

// Largest-remainder proportional allocation (dartboard generator).
void allocate_proportional(const double* weights, int32_t k,
                           int32_t batch_size, int32_t* out_counts) {
  double total = 0.0;
  for (int32_t i = 0; i < k; ++i) total += weights[i];
  int32_t assigned = 0;
  // floor pass
  double* rema = new double[k];
  for (int32_t i = 0; i < k; ++i) {
    const double raw = weights[i] / total * batch_size;
    out_counts[i] = static_cast<int32_t>(raw);
    rema[i] = raw - out_counts[i];
    assigned += out_counts[i];
  }
  // hand out remainders to the largest fractional parts
  for (int32_t r = assigned; r < batch_size; ++r) {
    int32_t best = 0;
    for (int32_t i = 1; i < k; ++i) {
      if (rema[i] > rema[best]) best = i;
    }
    out_counts[best] += 1;
    rema[best] = -1.0;
  }
  delete[] rema;
}

}  // extern "C"
