// rANS range coder with per-symbol 16-bit quantized CDF tables.
//
// TPU-native replacement for the reference's torchac CPU arithmetic coder
// (used at utils/encodings.py:107,132,151,172): the TPU computes the CDF
// tables (entropy model) in-graph; this host-side coder turns symbols +
// CDFs into the bitstream at checkpoint boundaries only.
//
// Layout: state-32 rANS, 8-bit renormalization, encoding in reverse symbol
// order so decode streams forward. CDFs are per-symbol rows of K+1 uint16
// cumulative frequencies over a 2^16 total; every symbol must have nonzero
// mass (the python wrapper's quantizer guarantees it).
//
// C ABI for ctypes.

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr uint32_t kProbBits = 16;
constexpr uint32_t kProbScale = 1u << kProbBits;   // 65536
constexpr uint32_t kRansL = 1u << 23;              // renorm lower bound

struct SymbolRange {
  uint32_t start;
  uint32_t freq;
};

inline SymbolRange lookup(const uint16_t* cdf_row, int sym) {
  uint32_t lo = cdf_row[sym];
  uint32_t hi = cdf_row[sym + 1];
  // row ends are implicit: index K holds 0 meaning 65536 when sym+1 == K
  if (hi == 0 && lo != 0) hi = kProbScale;
  return {lo, hi - lo};
}

}  // namespace

extern "C" {

// Encode n symbols. cdf: n rows of (num_cdf) uint16 each; symbols in
// [0, num_cdf-2]. out must hold worst case 4*n + 8 bytes. Returns the
// number of bytes written, or -1 on error.
int64_t rans_encode(const int32_t* symbols, const uint16_t* cdf,
                    int64_t n, int32_t num_cdf, uint8_t* out,
                    int64_t out_capacity) {
  std::vector<uint8_t> buf;
  buf.reserve(static_cast<size_t>(n) + 64);
  uint32_t state = kRansL;

  for (int64_t i = n - 1; i >= 0; --i) {
    const uint16_t* row = cdf + static_cast<size_t>(i) * num_cdf;
    int sym = symbols[i];
    if (sym < 0 || sym > num_cdf - 2) return -1;
    uint32_t lo = row[sym];
    uint32_t hi = (sym + 1 == num_cdf - 1) ? kProbScale : row[sym + 1];
    if (sym + 1 < num_cdf - 1 && row[sym + 1] == 0 && lo != 0)
      hi = kProbScale;
    uint32_t freq = hi - lo;
    if (freq == 0) return -2;

    // renormalize: state must stay < (kRansL >> kProbBits) << 8 * freq
    uint32_t x_max = ((kRansL >> kProbBits) << 8) * freq;
    while (state >= x_max) {
      buf.push_back(static_cast<uint8_t>(state & 0xFF));
      state >>= 8;
    }
    state = ((state / freq) << kProbBits) + (state % freq) + lo;
  }

  // flush 4 bytes of final state (little-endian), then the stream reversed
  int64_t total = static_cast<int64_t>(buf.size()) + 4;
  if (total > out_capacity) return -3;
  out[0] = state & 0xFF;
  out[1] = (state >> 8) & 0xFF;
  out[2] = (state >> 16) & 0xFF;
  out[3] = (state >> 24) & 0xFF;
  for (size_t j = 0; j < buf.size(); ++j)
    out[4 + j] = buf[buf.size() - 1 - j];
  return total;
}

// Decode n symbols from data (written by rans_encode with matching CDFs).
// Returns 0 on success.
int32_t rans_decode(const uint8_t* data, int64_t data_len,
                    const uint16_t* cdf, int64_t n, int32_t num_cdf,
                    int32_t* symbols_out) {
  if (data_len < 4) return -1;
  uint32_t state = static_cast<uint32_t>(data[0])
                 | (static_cast<uint32_t>(data[1]) << 8)
                 | (static_cast<uint32_t>(data[2]) << 16)
                 | (static_cast<uint32_t>(data[3]) << 24);
  int64_t pos = 4;

  for (int64_t i = 0; i < n; ++i) {
    const uint16_t* row = cdf + static_cast<size_t>(i) * num_cdf;
    uint32_t slot = state & (kProbScale - 1);

    // binary search for sym with cdf[sym] <= slot < cdf[sym+1]
    int lo_i = 0, hi_i = num_cdf - 2;
    while (lo_i < hi_i) {
      int mid = (lo_i + hi_i + 1) >> 1;
      uint32_t v = row[mid];
      if (mid < num_cdf - 1 && v == 0 && mid > 0) v = kProbScale;
      if (v <= slot) lo_i = mid; else hi_i = mid - 1;
    }
    int sym = lo_i;
    uint32_t start = row[sym];
    uint32_t hi = (sym + 1 == num_cdf - 1) ? kProbScale : row[sym + 1];
    if (sym + 1 < num_cdf - 1 && row[sym + 1] == 0 && start != 0)
      hi = kProbScale;
    uint32_t freq = hi - start;
    if (freq == 0) return -2;

    symbols_out[i] = sym;
    state = freq * (state >> kProbBits) + slot - start;
    while (state < kRansL) {
      if (pos >= data_len) {
        if (i == n - 1) break;  // final symbol may exactly drain the stream
        return -3;
      }
      state = (state << 8) | data[pos++];
    }
  }
  return 0;
}

}  // extern "C"
