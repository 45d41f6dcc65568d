// Minimal PNG -> 8-bit grayscale decoder on raw zlib.
//
// Replaces the reference's cv::imread + cvtColor(BGR2GRAY) image loading
// (reference src/utils.cpp:172-190) without pulling in OpenCV. Supports the
// subset KITTI / our tooling produces: 8- and 16-bit depth, color types
// gray(0), RGB(2), gray+alpha(4), RGBA(6), no interlacing. Color is reduced
// with the same BT.601 fixed-point weights OpenCV uses, so the native and
// Python loaders feed bit-identical pixels to the pipeline.

#include "cvo_native.h"

#include <errno.h>
#include <stdio.h>
#include <string.h>
#include <zlib.h>

#include <vector>

namespace {

constexpr unsigned char kSig[8] = {137, 80, 78, 71, 13, 10, 26, 10};

inline uint32_t be32(const uint8_t *p) {
  return (uint32_t(p[0]) << 24) | (uint32_t(p[1]) << 16) |
         (uint32_t(p[2]) << 8) | uint32_t(p[3]);
}

inline uint8_t paeth(int a, int b, int c) {
  int p = a + b - c;
  int pa = p > a ? p - a : a - p;
  int pb = p > b ? p - b : b - p;
  int pc = p > c ? p - c : c - p;
  if (pa <= pb && pa <= pc) return uint8_t(a);
  if (pb <= pc) return uint8_t(b);
  return uint8_t(c);
}

// BT.601 luma in OpenCV's fixed-point form: (R*4899 + G*9617 + B*1868) >> 14.
inline uint8_t luma(uint8_t r, uint8_t g, uint8_t b) {
  return uint8_t((r * 4899 + g * 9617 + b * 1868 + (1 << 13)) >> 14);
}

struct Header {
  uint32_t width = 0, height = 0;
  int depth = 0, color = 0, interlace = 0;
  int channels = 0;
};

int parse_chunks(const uint8_t *buf, size_t len, Header *hdr,
                 std::vector<uint8_t> *idat) {
  if (len < 8 + 25 || memcmp(buf, kSig, 8) != 0) return -EINVAL;
  size_t off = 8;
  bool seen_ihdr = false;
  while (off + 12 <= len) {
    uint32_t clen = be32(buf + off);
    const uint8_t *type = buf + off + 4;
    const uint8_t *data = buf + off + 8;
    if (off + 12 + size_t(clen) > len) return -EINVAL;
    if (memcmp(type, "IHDR", 4) == 0) {
      if (clen < 13) return -EINVAL;
      hdr->width = be32(data);
      hdr->height = be32(data + 4);
      hdr->depth = data[8];
      hdr->color = data[9];
      hdr->interlace = data[12];
      seen_ihdr = true;
      if (hdr->width == 0 || hdr->height == 0 ||
          hdr->width > (1u << 24) || hdr->height > (1u << 24))
        return -EINVAL;
      switch (hdr->color) {
        case 0: hdr->channels = 1; break;
        case 2: hdr->channels = 3; break;
        case 4: hdr->channels = 2; break;
        case 6: hdr->channels = 4; break;
        default: return -ENOTSUP;  // palette (3) not needed for our datasets
      }
      if (hdr->depth != 8 && hdr->depth != 16) return -ENOTSUP;
      if (hdr->interlace != 0) return -ENOTSUP;
    } else if (memcmp(type, "IDAT", 4) == 0) {
      if (idat) idat->insert(idat->end(), data, data + clen);
    } else if (memcmp(type, "IEND", 4) == 0) {
      break;
    }
    off += 12 + clen;
  }
  return seen_ihdr ? 0 : -EINVAL;
}

int inflate_all(const std::vector<uint8_t> &in, std::vector<uint8_t> *out) {
  z_stream zs;
  memset(&zs, 0, sizeof(zs));
  if (inflateInit(&zs) != Z_OK) return -ENOMEM;
  zs.next_in = const_cast<Bytef *>(in.data());
  zs.avail_in = uInt(in.size());
  zs.next_out = out->data();
  zs.avail_out = uInt(out->size());
  int rc = inflate(&zs, Z_FINISH);
  inflateEnd(&zs);
  if (rc != Z_STREAM_END || zs.avail_out != 0) return -EINVAL;
  return 0;
}

int read_file(const char *path, std::vector<uint8_t> *buf) {
  FILE *f = fopen(path, "rb");
  if (!f) return -errno;
  fseek(f, 0, SEEK_END);
  long sz = ftell(f);
  if (sz <= 0) {
    fclose(f);
    return -EINVAL;
  }
  fseek(f, 0, SEEK_SET);
  buf->resize(size_t(sz));
  size_t got = fread(buf->data(), 1, buf->size(), f);
  fclose(f);
  return got == buf->size() ? 0 : -EIO;
}

}  // namespace

extern "C" int cvo_decode_png_gray_mem(const uint8_t *buf, size_t len,
                                       uint8_t *out, size_t out_len,
                                       int32_t *height, int32_t *width) {
  Header h;
  std::vector<uint8_t> idat;
  int rc = parse_chunks(buf, len, &h, &idat);
  if (rc) return rc;
  if (height) *height = int32_t(h.height);
  if (width) *width = int32_t(h.width);
  if (out_len < size_t(h.width) * h.height) return -ERANGE;

  const size_t bytes_per_px = size_t(h.channels) * (h.depth / 8);
  const size_t stride = size_t(h.width) * bytes_per_px;  // w/o filter byte
  std::vector<uint8_t> raw((stride + 1) * h.height);
  rc = inflate_all(idat, &raw);
  if (rc) return rc;

  // In-place per-row unfiltering (PNG filters 0-4).
  const int bpp = int(bytes_per_px);
  std::vector<uint8_t> prev(stride, 0);
  for (uint32_t y = 0; y < h.height; ++y) {
    uint8_t *row = raw.data() + y * (stride + 1);
    const int filter = row[0];
    uint8_t *cur = row + 1;
    switch (filter) {
      case 0:
        break;
      case 1:  // Sub
        for (size_t x = bpp; x < stride; ++x) cur[x] += cur[x - bpp];
        break;
      case 2:  // Up
        for (size_t x = 0; x < stride; ++x) cur[x] += prev[x];
        break;
      case 3:  // Average
        for (size_t x = 0; x < size_t(bpp); ++x) cur[x] += prev[x] >> 1;
        for (size_t x = bpp; x < stride; ++x)
          cur[x] += uint8_t((int(cur[x - bpp]) + int(prev[x])) >> 1);
        break;
      case 4:  // Paeth
        for (size_t x = 0; x < size_t(bpp); ++x)
          cur[x] += paeth(0, prev[x], 0);
        for (size_t x = bpp; x < stride; ++x)
          cur[x] += paeth(cur[x - bpp], prev[x], prev[x - bpp]);
        break;
      default:
        return -EINVAL;
    }
    memcpy(prev.data(), cur, stride);

    // Reduce this row to 8-bit gray. 16-bit samples take the high byte.
    uint8_t *dst = out + size_t(y) * h.width;
    const int step16 = h.depth == 16 ? 2 : 1;
    for (uint32_t x = 0; x < h.width; ++x) {
      const uint8_t *px = cur + size_t(x) * bytes_per_px;
      switch (h.color) {
        case 0:
        case 4:  // gray / gray+alpha: first sample
          dst[x] = px[0];
          break;
        default:  // RGB / RGBA
          dst[x] = luma(px[0], px[step16], px[2 * step16]);
          break;
      }
    }
  }
  return 0;
}

extern "C" int cvo_png_info(const char *path, int32_t *height,
                            int32_t *width) {
  std::vector<uint8_t> buf;
  int rc = read_file(path, &buf);
  if (rc) return rc;
  Header h;
  rc = parse_chunks(buf.data(), buf.size(), &h, nullptr);
  if (rc) return rc;
  if (height) *height = int32_t(h.height);
  if (width) *width = int32_t(h.width);
  return 0;
}

extern "C" int cvo_decode_png_gray(const char *path, uint8_t *out,
                                   size_t out_len) {
  std::vector<uint8_t> buf;
  int rc = read_file(path, &buf);
  if (rc) return rc;
  return cvo_decode_png_gray_mem(buf.data(), buf.size(), out, out_len,
                                 nullptr, nullptr);
}
