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

// Extract all record fields in one pass.
//
// rec_starts/num_aln come from radc_walk_records.  read_widths has
// n_read_fields entries; aln_widths has n_aln_fields entries.  Outputs
// are dense u64 column arrays: read_cols[f][i] for record i, and
// aln_cols[f][j] for flat alignment j (alignments in record order).
int64_t radc_extract_fields(const uint8_t* buf, int64_t buf_len,
                            const int64_t* rec_starts, int64_t n_recs,
                            const int64_t* num_aln,
                            const int64_t* read_widths, int64_t n_read_fields,
                            const int64_t* aln_widths, int64_t n_aln_fields,
                            uint64_t** read_cols, uint64_t** aln_cols) {
  int64_t aln_idx = 0;
  for (int64_t i = 0; i < n_recs; ++i) {
    int64_t off = rec_starts[i] + 4;
    for (int64_t f = 0; f < n_read_fields; ++f) {
      uint64_t v = 0;
      const int64_t w = read_widths[f];
      if (off + w > buf_len) return -1;
      std::memcpy(&v, buf + off, w);
      read_cols[f][i] = v;
      off += w;
    }
    const int64_t na = num_aln[i];
    for (int64_t a = 0; a < na; ++a) {
      for (int64_t f = 0; f < n_aln_fields; ++f) {
        uint64_t v = 0;
        const int64_t w = aln_widths[f];
        if (off + w > buf_len) return -1;
        std::memcpy(&v, buf + off, w);
        aln_cols[f][aln_idx] = v;
        off += w;
      }
      ++aln_idx;
    }
  }
  return aln_idx;
}

// Encode records (inverse of extract): writes [num_aln u32][read
// fields][aln fields...] at the provided record starts.
int64_t radc_encode_records(uint8_t* buf, int64_t buf_len,
                            const int64_t* rec_starts, int64_t n_recs,
                            const int64_t* num_aln,
                            const int64_t* read_widths, int64_t n_read_fields,
                            const int64_t* aln_widths, int64_t n_aln_fields,
                            const uint64_t** read_cols,
                            const uint64_t** aln_cols) {
  int64_t aln_idx = 0;
  for (int64_t i = 0; i < n_recs; ++i) {
    int64_t off = rec_starts[i];
    const uint32_t na32 = static_cast<uint32_t>(num_aln[i]);
    if (off + 4 > buf_len) return -1;
    std::memcpy(buf + off, &na32, 4);
    off += 4;
    for (int64_t f = 0; f < n_read_fields; ++f) {
      const int64_t w = read_widths[f];
      if (off + w > buf_len) return -1;
      std::memcpy(buf + off, &read_cols[f][i], w);
      off += w;
    }
    const int64_t na = num_aln[i];
    for (int64_t a = 0; a < na; ++a) {
      for (int64_t f = 0; f < n_aln_fields; ++f) {
        const int64_t w = aln_widths[f];
        if (off + w > buf_len) return -1;
        std::memcpy(buf + off, &aln_cols[f][aln_idx], w);
        off += w;
      }
      ++aln_idx;
    }
  }
  return aln_idx;
}

// Format integer COO triplets as "r c v\n" lines (MatrixMarket body).
// out must have room for n * 62 bytes; returns bytes written.
int64_t radc_format_triplets(const int64_t* rows, const int64_t* cols,
                             const int64_t* vals, int64_t n, char* out) {
  char* p = out;
  auto emit = [&p](int64_t v) {
    char tmp[20];
    int k = 0;
    if (v < 0) {
      *p++ = '-';
      v = -v;
    }
    do {
      tmp[k++] = static_cast<char>('0' + (v % 10));
      v /= 10;
    } while (v);
    while (k) *p++ = tmp[--k];
  };
  for (int64_t i = 0; i < n; ++i) {
    emit(rows[i]);
    *p++ = ' ';
    emit(cols[i]);
    *p++ = ' ';
    emit(vals[i]);
    *p++ = '\n';
  }
  return p - out;
}

}  // extern "C"
