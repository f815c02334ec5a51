// Native helpers for the RAD codec.
//
// The record-boundary walk is the only sequential step in decoding a RAD
// chunk: each record is [num_aln:u32][read fields][num_aln x aln fields]
// so the offset of record i+1 depends on record i's num_aln.  Everything
// else in the decoder is vectorized host/NumPy or device/JAX work.
//
// Build: make -C csrc   (produces libradc.so, loaded via ctypes)

#include <cstdint>
#include <cstring>

extern "C" {

// Walk records across multiple chunk regions of `buf`.
// Returns total number of records walked, or -1 on overrun.
int64_t radc_walk_records(const uint8_t* buf, int64_t buf_len,
                          const int64_t* region_starts,
                          const int64_t* region_counts, int64_t n_regions,
                          int64_t read_bytes, int64_t aln_bytes,
                          int64_t* rec_starts_out, int64_t* num_aln_out) {
  int64_t i = 0;
  for (int64_t r = 0; r < n_regions; ++r) {
    int64_t off = region_starts[r];
    const int64_t count = region_counts[r];
    for (int64_t k = 0; k < count; ++k) {
      if (off + 4 > buf_len) return -1;
      uint32_t na;
      std::memcpy(&na, buf + off, 4);
      rec_starts_out[i] = off;
      num_aln_out[i] = static_cast<int64_t>(na);
      off += 4 + read_bytes + static_cast<int64_t>(na) * aln_bytes;
      if (off > buf_len) return -1;
      ++i;
    }
  }
  return i;
}

}  // extern "C"
