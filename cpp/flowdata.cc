// flowdata: native decode/encode kernels for the data pipeline.
//
// The reference framework's data path is C++ end to end (LMDB datum decode in
// src/caffe/layers/custom_data_layer.cpp:86-132, dataset packing in
// tools/convert_imageset_and_flow.cpp). This library is its TPU-framework
// counterpart: the host-side byte-level work — netpbm parsing, Middlebury
// .flo framing, the int16 fixed-point flow codec, occlusion bit unpacking and
// full packed-record decode — implemented natively and exposed through a
// plain C ABI consumed via ctypes (flownet2_tpu/data/native.py). The Python
// numpy implementations remain as the portable fallback and as the oracle in
// tests.
//
// Build: cpp/Makefile → libflowdata.so.

#include <cstdint>
#include <cstring>
#include <cmath>
#include <limits>

extern "C" {

// ---------------------------------------------------------------------------
// Fixed-point flow codec. Contract (matches the reference datum encoding):
// int16 = round(flow * 32), NaN -> 32767 (SHRT_MAX); decode divides by 32
// and maps the sentinel back to NaN.
// ---------------------------------------------------------------------------

static const int16_t kNanSentinel = 32767;
static const float kFlowScale = 32.0f;

void fd_decode_flow_i16(const int16_t* in, float* out, int64_t n) {
  const float inv = 1.0f / kFlowScale;
  for (int64_t i = 0; i < n; ++i) {
    int16_t v = in[i];
    out[i] = (v == kNanSentinel) ? std::numeric_limits<float>::quiet_NaN()
                                 : static_cast<float>(v) * inv;
  }
}

void fd_encode_flow_i16(const float* in, int16_t* out, int64_t n) {
  for (int64_t i = 0; i < n; ++i) {
    float v = in[i];
    if (!std::isfinite(v)) {
      out[i] = kNanSentinel;
      continue;
    }
    float s = std::nearbyint(v * kFlowScale);
    if (s < -32768.0f) s = -32768.0f;
    if (s > 32766.0f) s = 32766.0f;
    out[i] = static_cast<int16_t>(s);
  }
}

// ---------------------------------------------------------------------------
// Occlusion bit packing: 1 bit per pixel, little-endian bit order within each
// byte (bit i of byte i/8 is pixel i).
// ---------------------------------------------------------------------------

void fd_unpack_bits(const uint8_t* in, float* out, int64_t n) {
  for (int64_t i = 0; i < n; ++i) {
    out[i] = (in[i >> 3] >> (i & 7)) & 1 ? 1.0f : 0.0f;
  }
}

void fd_pack_bits(const uint8_t* in, uint8_t* out, int64_t n) {
  std::memset(out, 0, static_cast<size_t>((n + 7) / 8));
  for (int64_t i = 0; i < n; ++i) {
    if (in[i]) out[i >> 3] |= static_cast<uint8_t>(1u << (i & 7));
  }
}

// ---------------------------------------------------------------------------
// netpbm (P5/P6, maxval<=255). Returns 0 on success; fills w/h/channels and
// writes pixel bytes to `out` if out_capacity suffices. Call with out=null to
// query dimensions.
// ---------------------------------------------------------------------------

static int pnm_token(const uint8_t* buf, int64_t len, int64_t* pos, long* value) {
  // skip whitespace and '#' comments
  while (*pos < len) {
    uint8_t c = buf[*pos];
    if (c == '#') {
      while (*pos < len && buf[*pos] != '\n') ++(*pos);
    } else if (c == ' ' || c == '\t' || c == '\r' || c == '\n') {
      ++(*pos);
    } else {
      break;
    }
  }
  if (*pos >= len) return -1;
  long v = 0;
  int digits = 0;
  while (*pos < len && buf[*pos] >= '0' && buf[*pos] <= '9') {
    v = v * 10 + (buf[*pos] - '0');
    ++(*pos);
    ++digits;
  }
  if (!digits) return -1;
  *value = v;
  return 0;
}

int fd_decode_pnm(const uint8_t* buf, int64_t len, uint8_t* out,
                  int64_t out_capacity, int32_t* width, int32_t* height,
                  int32_t* channels) {
  if (len < 2 || buf[0] != 'P') return -1;
  int ch;
  if (buf[1] == '6') ch = 3;
  else if (buf[1] == '5') ch = 1;
  else return -2;
  int64_t pos = 2;
  long w, h, maxval;
  if (pnm_token(buf, len, &pos, &w) || pnm_token(buf, len, &pos, &h) ||
      pnm_token(buf, len, &pos, &maxval))
    return -3;
  if (maxval > 255 || w <= 0 || h <= 0) return -4;
  ++pos;  // single whitespace after maxval
  int64_t need = static_cast<int64_t>(w) * h * ch;
  *width = static_cast<int32_t>(w);
  *height = static_cast<int32_t>(h);
  *channels = ch;
  if (!out) return 0;
  if (len - pos < need || out_capacity < need) return -5;
  std::memcpy(out, buf + pos, static_cast<size_t>(need));
  return 0;
}

// ---------------------------------------------------------------------------
// Middlebury .flo ("PIEH" float magic, int32 w, int32 h, interleaved u,v).
// ---------------------------------------------------------------------------

int fd_read_flo(const uint8_t* buf, int64_t len, float* out,
                int64_t out_capacity, int32_t* width, int32_t* height) {
  if (len < 12 || std::memcmp(buf, "PIEH", 4) != 0) return -1;
  int32_t w, h;
  std::memcpy(&w, buf + 4, 4);
  std::memcpy(&h, buf + 8, 4);
  if (w <= 0 || h <= 0) return -2;
  int64_t need = static_cast<int64_t>(w) * h * 2;
  *width = w;
  *height = h;
  if (!out) return 0;
  if (len - 12 < need * 4 || out_capacity < need) return -3;
  std::memcpy(out, buf + 12, static_cast<size_t>(need) * 4);
  return 0;
}

int fd_write_flo_header(uint8_t* out, int32_t width, int32_t height) {
  std::memcpy(out, "PIEH", 4);
  std::memcpy(out + 4, &width, 4);
  std::memcpy(out + 8, &height, 4);
  return 12;
}

// ---------------------------------------------------------------------------
// Packed flow record decode (the .flowrec body; see
// flownet2_tpu/data/records.py): header H,W,flags (u32 LE each) followed by
// img0 u8[H*W*3], img1 u8[H*W*3], flow i16[H*W*2], optional occ bits.
// Outputs float32 planes; images as float (0..255), flow decoded, occ 0/1.
// Returns 0 on success; -1 bad header, -2 truncated, -3 capacity.
// ---------------------------------------------------------------------------

int fd_decode_record(const uint8_t* body, int64_t len, float* img0,
                     float* img1, float* flow, float* occ,
                     int32_t* width, int32_t* height, int32_t* has_occ,
                     int32_t* flow_channels) {
  if (len < 12) return -1;
  uint32_t h, w, flags;
  std::memcpy(&h, body, 4);
  std::memcpy(&w, body + 4, 4);
  std::memcpy(&flags, body + 8, 4);
  int64_t px = static_cast<int64_t>(h) * w;
  int occ_present = flags & 1;
  int64_t n_flow = (flags & 2) ? 1 : 2;  // bit 1: disparity (1 channel)
  int64_t need = 12 + px * 3 * 2 + px * n_flow * 2;
  if (occ_present) need += (px + 7) / 8;
  if (len < need) return -2;
  *width = static_cast<int32_t>(w);
  *height = static_cast<int32_t>(h);
  *has_occ = occ_present;
  *flow_channels = static_cast<int32_t>(n_flow);
  if (!img0) return 0;

  const uint8_t* p = body + 12;
  for (int64_t i = 0; i < px * 3; ++i) img0[i] = static_cast<float>(p[i]);
  p += px * 3;
  for (int64_t i = 0; i < px * 3; ++i) img1[i] = static_cast<float>(p[i]);
  p += px * 3;
  fd_decode_flow_i16(reinterpret_cast<const int16_t*>(p), flow, px * n_flow);
  p += px * n_flow * 2;
  if (occ_present && occ) fd_unpack_bits(p, occ, px);
  return 0;
}

int fd_version() { return 2; }

}  // extern "C"
