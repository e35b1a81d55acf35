// tiffio — minimal, fast TIFF codec for CTC microscopy data.
//
// Reference parity: arbellea/LSTM-UNet decodes t*.tif / man_seg*.tif through
// OpenCV (C++) and writes uint16 masks through it (SURVEY.md §2 io rows).
// This is the rebuild's native io layer: grayscale 8/16-bit baseline TIFF,
// strip-based, compression None(1) / LZW(5) / Deflate(8, 32946), horizontal
// predictor(2), both byte orders. Write path emits single-strip uncompressed
// little-endian TIFF (what CTC tooling expects to read back).
//
// Exposed as a C ABI for ctypes (no pybind11 in the image — see task env).
//
// Build: make -C native   (g++ -O2 -shared -fPIC tiffio.cpp -o libtiffio.so -lz)

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>
#include <zlib.h>

namespace {

struct Reader {
  const uint8_t* p;
  size_t n;
  bool big_endian;

  uint16_t u16(size_t off) const {
    if (off + 2 > n) return 0;
    return big_endian ? (uint16_t)((p[off] << 8) | p[off + 1])
                      : (uint16_t)(p[off] | (p[off + 1] << 8));
  }
  uint32_t u32(size_t off) const {
    if (off + 4 > n) return 0;
    return big_endian
               ? ((uint32_t)p[off] << 24) | ((uint32_t)p[off + 1] << 16) |
                     ((uint32_t)p[off + 2] << 8) | p[off + 3]
               : (uint32_t)p[off] | ((uint32_t)p[off + 1] << 8) |
                     ((uint32_t)p[off + 2] << 16) | ((uint32_t)p[off + 3] << 24);
  }
};

struct IfdEntry {
  uint16_t tag;
  uint16_t type;
  uint32_t count;
  size_t value_off;  // offset of the value field itself (4 bytes inline)
};

size_t type_size(uint16_t t) {
  switch (t) {
    case 1: case 2: case 6: case 7: return 1;   // BYTE/ASCII/SBYTE/UNDEF
    case 3: case 8: return 2;                    // SHORT/SSHORT
    case 4: case 9: case 11: return 4;           // LONG/SLONG/FLOAT
    case 5: case 10: case 12: return 8;          // RATIONAL/SRATIONAL/DOUBLE
    default: return 0;
  }
}

// Fetch the i-th integer value of an entry (SHORT or LONG).
uint32_t entry_val(const Reader& r, const IfdEntry& e, uint32_t i) {
  size_t esz = type_size(e.type);
  size_t total = esz * e.count;
  size_t base = (total <= 4) ? e.value_off : r.u32(e.value_off);
  size_t off = base + i * esz;
  if (esz == 2) return r.u16(off);
  if (esz == 4) return r.u32(off);
  if (esz == 1) return off < r.n ? r.p[off] : 0;
  return 0;
}

// TIFF-variant LZW decode (MSB-first codes, early code-size change).
bool lzw_decode(const uint8_t* src, size_t src_n, uint8_t* dst, size_t dst_n) {
  constexpr int kClear = 256, kEoi = 257, kFirst = 258, kMaxCode = 4094;
  std::vector<std::string> table;
  table.reserve(4096);
  auto reset = [&]() {
    table.clear();
    for (int i = 0; i < 256; i++) table.push_back(std::string(1, (char)i));
    table.push_back("");  // 256 clear
    table.push_back("");  // 257 eoi
  };
  reset();
  int code_bits = 9;
  uint32_t bitbuf = 0;
  int bitcnt = 0;
  size_t si = 0, di = 0;
  int prev = -1;

  auto next_code = [&]() -> int {
    while (bitcnt < code_bits) {
      if (si >= src_n) return kEoi;
      bitbuf = (bitbuf << 8) | src[si++];
      bitcnt += 8;
    }
    int code = (int)((bitbuf >> (bitcnt - code_bits)) & ((1u << code_bits) - 1));
    bitcnt -= code_bits;
    return code;
  };

  while (di < dst_n) {
    int code = next_code();
    if (code == kEoi) break;
    if (code == kClear) {
      reset();
      code_bits = 9;
      prev = -1;
      continue;
    }
    std::string entry;
    if (code < (int)table.size() && (code < 256 || code >= kFirst)) {
      entry = table[code];
    } else if (code == (int)table.size() && prev >= 0) {
      entry = table[prev] + table[prev][0];
    } else {
      return false;  // corrupt stream
    }
    size_t cp = std::min(entry.size(), dst_n - di);
    memcpy(dst + di, entry.data(), cp);
    di += cp;
    if (prev >= 0 && table.size() <= kMaxCode + 1) {
      table.push_back(table[prev] + entry[0]);
    }
    prev = code;
    // early change: TIFF bumps the code width one code early
    if ((int)table.size() + 1 >= (1 << code_bits) && code_bits < 12) code_bits++;
  }
  return di == dst_n;
}

bool zlib_decode(const uint8_t* src, size_t src_n, uint8_t* dst, size_t dst_n) {
  uLongf out_n = dst_n;
  return uncompress(dst, &out_n, src, src_n) == Z_OK && out_n == dst_n;
}

}  // namespace

extern "C" {

// Reads a grayscale TIFF. On success returns a malloc'd pixel buffer
// (row-major, native-endian samples) and fills width/height/bits (8 or 16).
// Returns nullptr on any unsupported/corrupt input (caller falls back to
// cv2/PIL on the Python side).
uint8_t* tiff_read(const char* path, uint32_t* width, uint32_t* height,
                   uint32_t* bits) {
  FILE* f = fopen(path, "rb");
  if (!f) return nullptr;
  fseek(f, 0, SEEK_END);
  long fn = ftell(f);
  fseek(f, 0, SEEK_SET);
  if (fn <= 8) { fclose(f); return nullptr; }
  std::vector<uint8_t> buf((size_t)fn);
  if (fread(buf.data(), 1, (size_t)fn, f) != (size_t)fn) { fclose(f); return nullptr; }
  fclose(f);

  Reader r{buf.data(), buf.size(), false};
  if (buf[0] == 'M' && buf[1] == 'M') r.big_endian = true;
  else if (!(buf[0] == 'I' && buf[1] == 'I')) return nullptr;
  if (r.u16(2) != 42) return nullptr;

  size_t ifd = r.u32(4);
  uint16_t n_ent = r.u16(ifd);
  if (!n_ent || ifd + 2 + 12 * (size_t)n_ent > r.n) return nullptr;

  uint32_t w = 0, h = 0, bps = 8, comp = 1, spp = 1, rows_per_strip = 0xFFFFFFFF;
  uint32_t predictor = 1, sample_format = 1;
  IfdEntry strip_offsets{}, strip_counts{};
  bool have_so = false, have_sc = false;

  for (uint16_t i = 0; i < n_ent; i++) {
    size_t e_off = ifd + 2 + 12 * (size_t)i;
    IfdEntry e{r.u16(e_off), r.u16(e_off + 2), r.u32(e_off + 4), e_off + 8};
    switch (e.tag) {
      case 256: w = entry_val(r, e, 0); break;
      case 257: h = entry_val(r, e, 0); break;
      case 258: bps = entry_val(r, e, 0); break;
      case 259: comp = entry_val(r, e, 0); break;
      case 273: strip_offsets = e; have_so = true; break;
      case 277: spp = entry_val(r, e, 0); break;
      case 278: rows_per_strip = entry_val(r, e, 0); break;
      case 279: strip_counts = e; have_sc = true; break;
      case 317: predictor = entry_val(r, e, 0); break;
      case 339: sample_format = entry_val(r, e, 0); break;
      default: break;
    }
  }
  // supported: grayscale uint8/uint16, strips
  if (!w || !h || !have_so || spp != 1 || (bps != 8 && bps != 16) ||
      sample_format > 2) {
    return nullptr;
  }
  if (comp != 1 && comp != 5 && comp != 8 && comp != 32946) return nullptr;

  size_t bytes_pp = bps / 8;
  size_t row_bytes = (size_t)w * bytes_pp;
  size_t total = row_bytes * h;
  uint8_t* out = (uint8_t*)malloc(total);
  if (!out) return nullptr;

  if (rows_per_strip == 0 || rows_per_strip > h) rows_per_strip = h;
  uint32_t n_strips = (h + rows_per_strip - 1) / rows_per_strip;
  if (strip_offsets.count < n_strips) { free(out); return nullptr; }

  size_t written = 0;
  for (uint32_t s = 0; s < n_strips; s++) {
    uint32_t rows = std::min<uint32_t>(rows_per_strip, h - s * rows_per_strip);
    size_t want = row_bytes * rows;
    size_t off = entry_val(r, strip_offsets, s);
    size_t cnt = have_sc ? entry_val(r, strip_counts, s) : want;
    if (off + cnt > r.n) { free(out); return nullptr; }
    bool ok = true;
    if (comp == 1) {
      if (cnt < want) { free(out); return nullptr; }
      memcpy(out + written, r.p + off, want);
    } else if (comp == 5) {
      ok = lzw_decode(r.p + off, cnt, out + written, want);
    } else {
      ok = zlib_decode(r.p + off, cnt, out + written, want);
    }
    if (!ok) { free(out); return nullptr; }
    written += want;
  }

  // horizontal predictor: undo per-row differencing
  if (predictor == 2) {
    if (bps == 8) {
      for (uint32_t y = 0; y < h; y++) {
        uint8_t* row = out + (size_t)y * row_bytes;
        for (uint32_t x = 1; x < w; x++) row[x] = (uint8_t)(row[x] + row[x - 1]);
      }
    } else {
      for (uint32_t y = 0; y < h; y++) {
        uint16_t* row = (uint16_t*)(out + (size_t)y * row_bytes);
        // predictor applies to native sample order; byteswap first if needed
        if (r.big_endian) {
          for (uint32_t x = 0; x < w; x++)
            row[x] = (uint16_t)((row[x] >> 8) | (row[x] << 8));
        }
        for (uint32_t x = 1; x < w; x++) row[x] = (uint16_t)(row[x] + row[x - 1]);
      }
    }
  } else if (bps == 16 && r.big_endian) {
    uint16_t* px = (uint16_t*)out;
    for (size_t i = 0; i < (size_t)w * h; i++)
      px[i] = (uint16_t)((px[i] >> 8) | (px[i] << 8));
  }

  *width = w;
  *height = h;
  *bits = bps;
  return out;
}

void tiff_free(uint8_t* p) { free(p); }

// Writes grayscale uint8/uint16 as single-strip uncompressed little-endian
// TIFF. Returns 0 on success.
int tiff_write(const char* path, const uint8_t* data, uint32_t width,
               uint32_t height, uint32_t bits) {
  if ((bits != 8 && bits != 16) || !width || !height) return -1;
  size_t pix_bytes = (size_t)width * height * (bits / 8);

  // header(8) + pixel data + IFD
  std::vector<uint8_t> out;
  out.reserve(8 + pix_bytes + 2 + 12 * 10 + 4);
  auto put16 = [&](uint16_t v) { out.push_back(v & 0xFF); out.push_back(v >> 8); };
  auto put32 = [&](uint32_t v) {
    out.push_back(v & 0xFF); out.push_back((v >> 8) & 0xFF);
    out.push_back((v >> 16) & 0xFF); out.push_back((v >> 24) & 0xFF);
  };

  uint32_t data_off = 8;
  uint32_t ifd_off = (uint32_t)(8 + pix_bytes);
  out.push_back('I'); out.push_back('I'); put16(42); put32(ifd_off);
  out.insert(out.end(), data, data + pix_bytes);

  struct E { uint16_t tag, type; uint32_t count, value; };
  E entries[] = {
      {256, 3, 1, width},          // ImageWidth
      {257, 3, 1, height},         // ImageLength
      {258, 3, 1, bits},           // BitsPerSample
      {259, 3, 1, 1},              // Compression: none
      {262, 3, 1, 1},              // Photometric: BlackIsZero
      {273, 4, 1, data_off},       // StripOffsets
      {277, 3, 1, 1},              // SamplesPerPixel
      {278, 3, 1, height},         // RowsPerStrip
      {279, 4, 1, (uint32_t)pix_bytes},  // StripByteCounts
      {339, 3, 1, 1},              // SampleFormat: unsigned
  };
  put16(sizeof(entries) / sizeof(E));
  for (const E& e : entries) {
    put16(e.tag); put16(e.type); put32(e.count);
    if (e.type == 3) { put16((uint16_t)e.value); put16(0); } else { put32(e.value); }
  }
  put32(0);  // next IFD

  std::string tmp = std::string(path) + ".tmp";
  FILE* f = fopen(tmp.c_str(), "wb");
  if (!f) return -1;
  bool ok = fwrite(out.data(), 1, out.size(), f) == out.size();
  ok = (fclose(f) == 0) && ok;
  if (!ok || rename(tmp.c_str(), path) != 0) { remove(tmp.c_str()); return -1; }
  return 0;
}

}  // extern "C"
