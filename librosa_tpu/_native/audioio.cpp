// Native audio decode for librosa_tpu.
//
// TPU-native framework host runtime: decoding is host work feeding device
// buffers (the reference delegates to libsndfile via the soundfile package,
// librosa/core/audio.py:171).  This module implements:
//   - WAV (RIFF) parser: PCM 8/16/24/32, float32/64, extensible
//   - FLAC decoder written from scratch against the FLAC format spec
//   - Ogg Vorbis via the system libvorbisfile (dlopen, API declared here)
//   - MP3 via the system libmpg123 (dlopen)
//
// C ABI:
//   int lt_decode(path, &data, &frames, &channels, &sr)  // data: interleaved f32, malloc'd
//   int lt_info(path, &sr, &channels, &frames)
//   void lt_free(ptr)
//   const char* lt_last_error()
//
// Returns 0 on success, negative on failure.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <dlfcn.h>
#include <string>
#include <vector>

static thread_local std::string g_error;

static void set_error(const std::string &msg) { g_error = msg; }

extern "C" const char *lt_last_error() { return g_error.c_str(); }
extern "C" void lt_free(void *p) { free(p); }

// ---------------------------------------------------------------------------
// Helpers
// ---------------------------------------------------------------------------

static bool read_file(const char *path, std::vector<uint8_t> &buf) {
  FILE *f = fopen(path, "rb");
  if (!f) {
    set_error(std::string("cannot open file: ") + path);
    return false;
  }
  fseek(f, 0, SEEK_END);
  long n = ftell(f);
  fseek(f, 0, SEEK_SET);
  buf.resize((size_t)n);
  size_t got = fread(buf.data(), 1, (size_t)n, f);
  fclose(f);
  if (got != (size_t)n) {
    set_error("short read");
    return false;
  }
  return true;
}

static inline uint32_t rd_u32le(const uint8_t *p) {
  return (uint32_t)p[0] | ((uint32_t)p[1] << 8) | ((uint32_t)p[2] << 16) |
         ((uint32_t)p[3] << 24);
}
static inline uint16_t rd_u16le(const uint8_t *p) {
  return (uint16_t)(p[0] | (p[1] << 8));
}

// ---------------------------------------------------------------------------
// WAV
// ---------------------------------------------------------------------------

static int decode_wav(const std::vector<uint8_t> &buf, float **out,
                      long *frames, int *channels, int *sr) {
  if (buf.size() < 44 || memcmp(buf.data(), "RIFF", 4) ||
      memcmp(buf.data() + 8, "WAVE", 4)) {
    set_error("not a RIFF/WAVE file");
    return -1;
  }
  size_t pos = 12;
  uint16_t fmt = 0, nch = 0, bits = 0;
  uint32_t rate = 0;
  const uint8_t *data = nullptr;
  size_t data_len = 0;
  while (pos + 8 <= buf.size()) {
    const uint8_t *hdr = buf.data() + pos;
    uint32_t clen = rd_u32le(hdr + 4);
    const uint8_t *body = hdr + 8;
    if (!memcmp(hdr, "fmt ", 4) && clen >= 16) {
      fmt = rd_u16le(body);
      nch = rd_u16le(body + 2);
      rate = rd_u32le(body + 4);
      bits = rd_u16le(body + 14);
      if (fmt == 0xFFFE && clen >= 40) {
        // WAVE_FORMAT_EXTENSIBLE: subformat GUID's first two bytes
        fmt = rd_u16le(body + 24);
      }
    } else if (!memcmp(hdr, "data", 4)) {
      data = body;
      data_len = clen;
      if (pos + 8 + data_len > buf.size()) data_len = buf.size() - pos - 8;
    }
    pos += 8 + clen + (clen & 1);
  }
  if (!data || !nch || !rate) {
    set_error("WAV missing fmt/data chunk");
    return -1;
  }
  size_t bytes_per = bits / 8;
  if (!bytes_per) {
    set_error("bad WAV bit depth");
    return -1;
  }
  size_t n_samp = data_len / bytes_per;
  long n_frames = (long)(n_samp / nch);
  float *o = (float *)malloc(sizeof(float) * n_samp);
  if (!o) {
    set_error("oom");
    return -2;
  }
  if (fmt == 1) { // integer PCM
    if (bits == 16) {
      for (size_t i = 0; i < n_samp; i++) {
        int16_t v = (int16_t)rd_u16le(data + 2 * i);
        o[i] = (float)v / 32768.0f;
      }
    } else if (bits == 24) {
      for (size_t i = 0; i < n_samp; i++) {
        const uint8_t *p = data + 3 * i;
        int32_t v = (int32_t)(p[0] | (p[1] << 8) | (p[2] << 16));
        if (v & 0x800000) v -= 0x1000000;
        o[i] = (float)v / 8388608.0f;
      }
    } else if (bits == 32) {
      for (size_t i = 0; i < n_samp; i++) {
        int32_t v = (int32_t)rd_u32le(data + 4 * i);
        o[i] = (float)((double)v / 2147483648.0);
      }
    } else if (bits == 8) {
      for (size_t i = 0; i < n_samp; i++)
        o[i] = ((float)data[i] - 128.0f) / 128.0f;
    } else {
      free(o);
      set_error("unsupported WAV PCM depth");
      return -1;
    }
  } else if (fmt == 3) { // IEEE float
    if (bits == 32) {
      memcpy(o, data, n_samp * 4);
    } else if (bits == 64) {
      for (size_t i = 0; i < n_samp; i++) {
        double d;
        memcpy(&d, data + 8 * i, 8);
        o[i] = (float)d;
      }
    } else {
      free(o);
      set_error("unsupported WAV float depth");
      return -1;
    }
  } else {
    free(o);
    set_error("unsupported WAV format tag");
    return -1;
  }
  *out = o;
  *frames = n_frames;
  *channels = nch;
  *sr = (int)rate;
  return 0;
}

// ---------------------------------------------------------------------------
// FLAC — from-scratch decoder against the FLAC format specification
// ---------------------------------------------------------------------------

struct BitReader {
  const uint8_t *data;
  size_t size;
  size_t byte = 0;
  int bit = 0; // 0..7, MSB-first
  bool ok = true;

  BitReader(const uint8_t *d, size_t n) : data(d), size(n) {}

  inline uint32_t read_bit() {
    if (byte >= size) {
      ok = false;
      return 0;
    }
    uint32_t v = (data[byte] >> (7 - bit)) & 1;
    if (++bit == 8) {
      bit = 0;
      byte++;
    }
    return v;
  }

  inline uint64_t read_bits(int n) {
    uint64_t v = 0;
    // fast path: byte-aligned whole bytes
    while (n >= 8 && bit == 0 && byte < size) {
      v = (v << 8) | data[byte++];
      n -= 8;
    }
    while (n > 0) {
      v = (v << 1) | read_bit();
      n--;
    }
    return v;
  }

  inline int64_t read_signed(int n) {
    uint64_t v = read_bits(n);
    if (n > 0 && (v >> (n - 1)) & 1) return (int64_t)(v | (~0ULL << n));
    return (int64_t)v;
  }

  inline uint32_t read_unary() {
    uint32_t q = 0;
    while (ok && read_bit() == 0) q++;
    return q;
  }

  inline void align() {
    if (bit) {
      bit = 0;
      byte++;
    }
  }
};

static const int64_t *fixed_coefs(int order, int &n) {
  static const int64_t c1[] = {1};
  static const int64_t c2[] = {2, -1};
  static const int64_t c3[] = {3, -3, 1};
  static const int64_t c4[] = {4, -6, 4, -1};
  switch (order) {
  case 1: n = 1; return c1;
  case 2: n = 2; return c2;
  case 3: n = 3; return c3;
  case 4: n = 4; return c4;
  default: n = 0; return nullptr;
  }
}

static bool flac_residual(BitReader &br, int blocksize, int pred_order,
                          std::vector<int64_t> &out) {
  uint32_t method = (uint32_t)br.read_bits(2);
  if (method > 1) {
    set_error("FLAC: bad residual method");
    return false;
  }
  int pbits = method == 0 ? 4 : 5;
  uint32_t esc = method == 0 ? 15 : 31;
  uint32_t porder = (uint32_t)br.read_bits(4);
  uint32_t partitions = 1u << porder;
  if (blocksize % partitions) {
    set_error("FLAC: partition mismatch");
    return false;
  }
  int idx = pred_order;
  for (uint32_t p = 0; p < partitions; p++) {
    int count = blocksize >> porder;
    if (p == 0) count -= pred_order;
    uint32_t param = (uint32_t)br.read_bits(pbits);
    if (param == esc) {
      int nbits = (int)br.read_bits(5);
      for (int i = 0; i < count; i++) out[idx++] = br.read_signed(nbits);
    } else {
      for (int i = 0; i < count; i++) {
        uint32_t q = br.read_unary();
        uint64_t r = br.read_bits(param);
        uint64_t v = ((uint64_t)q << param) | r;
        out[idx++] = (int64_t)((v >> 1) ^ -(int64_t)(v & 1));
      }
    }
    if (!br.ok) {
      set_error("FLAC: bitstream exhausted in residual");
      return false;
    }
  }
  return true;
}

static bool flac_subframe(BitReader &br, int blocksize, int bps,
                          std::vector<int64_t> &out) {
  if (br.read_bit() != 0) {
    set_error("FLAC: bad subframe padding bit");
    return false;
  }
  uint32_t type = (uint32_t)br.read_bits(6);
  int wasted = 0;
  if (br.read_bit()) {
    wasted = 1 + (int)br.read_unary();
    bps -= wasted;
  }
  out.assign(blocksize, 0);

  if (type == 0) { // CONSTANT
    int64_t v = br.read_signed(bps);
    for (int i = 0; i < blocksize; i++) out[i] = v;
  } else if (type == 1) { // VERBATIM
    for (int i = 0; i < blocksize; i++) out[i] = br.read_signed(bps);
  } else if (type >= 8 && type <= 12) { // FIXED, order = type - 8
    int order = (int)type - 8;
    for (int i = 0; i < order; i++) out[i] = br.read_signed(bps);
    if (!flac_residual(br, blocksize, order, out)) return false;
    int nc;
    const int64_t *c = fixed_coefs(order, nc);
    for (int i = order; i < blocksize; i++) {
      int64_t pred = 0;
      for (int j = 0; j < nc; j++) pred += c[j] * out[i - 1 - j];
      out[i] += pred;
    }
  } else if (type >= 32) { // LPC, order = type - 31
    int order = (int)type - 31;
    for (int i = 0; i < order; i++) out[i] = br.read_signed(bps);
    int precision = (int)br.read_bits(4) + 1;
    if (precision == 16) {
      set_error("FLAC: invalid qlp precision");
      return false;
    }
    int shift = (int)br.read_signed(5);
    if (shift < 0) shift = 0;
    std::vector<int64_t> coef(order);
    for (int i = 0; i < order; i++) coef[i] = br.read_signed(precision);
    if (!flac_residual(br, blocksize, order, out)) return false;
    for (int i = order; i < blocksize; i++) {
      int64_t pred = 0;
      for (int j = 0; j < order; j++) pred += coef[j] * out[i - 1 - j];
      out[i] += pred >> shift;
    }
  } else {
    set_error("FLAC: reserved subframe type");
    return false;
  }
  if (wasted)
    for (int i = 0; i < blocksize; i++) out[i] <<= wasted;
  return br.ok;
}

static int decode_flac(const std::vector<uint8_t> &buf, float **out,
                       long *frames, int *channels, int *sr,
                       bool info_only = false) {
  if (buf.size() < 8 || memcmp(buf.data(), "fLaC", 4)) {
    set_error("not a FLAC file");
    return -1;
  }
  size_t pos = 4;
  int stream_sr = 0, stream_ch = 0, stream_bps = 0;
  uint64_t total_samples = 0;
  bool last = false;
  while (!last && pos + 4 <= buf.size()) {
    uint8_t h = buf[pos];
    last = h & 0x80;
    int btype = h & 0x7F;
    uint32_t blen =
        ((uint32_t)buf[pos + 1] << 16) | ((uint32_t)buf[pos + 2] << 8) | buf[pos + 3];
    const uint8_t *body = buf.data() + pos + 4;
    if (btype == 0 && blen >= 34) { // STREAMINFO
      stream_sr = ((int)body[10] << 12) | ((int)body[11] << 4) | (body[12] >> 4);
      stream_ch = ((body[12] >> 1) & 0x7) + 1;
      stream_bps = (((body[12] & 1) << 4) | (body[13] >> 4)) + 1;
      total_samples = ((uint64_t)(body[13] & 0xF) << 32) |
                      ((uint64_t)body[14] << 24) | ((uint64_t)body[15] << 16) |
                      ((uint64_t)body[16] << 8) | body[17];
    }
    pos += 4 + blen;
  }
  if (!stream_sr || !stream_ch) {
    set_error("FLAC: missing STREAMINFO");
    return -1;
  }
  *sr = stream_sr;
  *channels = stream_ch;
  *frames = (long)total_samples;
  if (info_only) return 0;

  std::vector<float> pcm;
  pcm.reserve((size_t)total_samples * stream_ch);

  std::vector<std::vector<int64_t>> chan((size_t)stream_ch);

  BitReader br(buf.data() + pos, buf.size() - pos);
  while (br.byte < br.size - 1) {
    // Frame sync: 14 bits 0b11111111111110
    uint32_t sync = (uint32_t)br.read_bits(14);
    if (!br.ok) break;
    if (sync != 0x3FFE) {
      set_error("FLAC: lost frame sync");
      return -1;
    }
    br.read_bit();                  // reserved
    br.read_bit();                  // blocking strategy
    uint32_t bs_code = (uint32_t)br.read_bits(4);
    uint32_t sr_code = (uint32_t)br.read_bits(4);
    uint32_t ch_code = (uint32_t)br.read_bits(4);
    uint32_t ss_code = (uint32_t)br.read_bits(3);
    br.read_bit(); // reserved

    // UTF-8 coded frame/sample number: skip
    uint32_t first = (uint32_t)br.read_bits(8);
    int follow = 0;
    for (uint32_t m = 0x80; first & m; m >>= 1) follow++;
    if (follow) follow--; // leading-1 count minus 1 = continuation bytes
    for (int i = 0; i < follow; i++) br.read_bits(8);

    int blocksize;
    switch (bs_code) {
    case 1: blocksize = 192; break;
    case 2: case 3: case 4: case 5:
      blocksize = 576 << (bs_code - 2); break;
    case 6: blocksize = (int)br.read_bits(8) + 1; break;
    case 7: blocksize = (int)br.read_bits(16) + 1; break;
    default:
      if (bs_code >= 8) blocksize = 256 << (bs_code - 8);
      else { set_error("FLAC: reserved blocksize"); return -1; }
    }
    if (sr_code == 12) br.read_bits(8);
    else if (sr_code == 13 || sr_code == 14) br.read_bits(16);

    int n_ch;
    int stereo_mode = 0; // 0=independent, 1=L/S, 2=R/S, 3=M/S
    if (ch_code < 8) n_ch = (int)ch_code + 1;
    else if (ch_code == 8) { n_ch = 2; stereo_mode = 1; }
    else if (ch_code == 9) { n_ch = 2; stereo_mode = 2; }
    else if (ch_code == 10) { n_ch = 2; stereo_mode = 3; }
    else { set_error("FLAC: reserved channel assignment"); return -1; }
    if (n_ch != stream_ch) {
      set_error("FLAC: channel count change unsupported");
      return -1;
    }

    int bps;
    switch (ss_code) {
    case 0: bps = stream_bps; break;
    case 1: bps = 8; break;
    case 2: bps = 12; break;
    case 4: bps = 16; break;
    case 5: bps = 20; break;
    case 6: bps = 24; break;
    case 7: bps = 32; break;
    default: set_error("FLAC: reserved sample size"); return -1;
    }
    br.read_bits(8); // CRC-8 (unchecked)

    for (int c = 0; c < n_ch; c++) {
      int sub_bps = bps;
      if ((stereo_mode == 1 && c == 1) || (stereo_mode == 2 && c == 0) ||
          (stereo_mode == 3 && c == 1))
        sub_bps += 1; // side channel carries one extra bit
      if (!flac_subframe(br, blocksize, sub_bps, chan[(size_t)c])) return -1;
    }
    br.align();
    br.read_bits(16); // CRC-16 (unchecked)
    if (!br.ok) {
      set_error("FLAC: bitstream exhausted in frame");
      return -1;
    }

    // Undo stereo decorrelation
    if (stereo_mode == 1) { // left/side → right = left - side
      for (int i = 0; i < blocksize; i++) chan[1][i] = chan[0][i] - chan[1][i];
    } else if (stereo_mode == 2) { // right/side → left = side + right
      for (int i = 0; i < blocksize; i++) chan[0][i] = chan[0][i] + chan[1][i];
    } else if (stereo_mode == 3) { // mid/side
      for (int i = 0; i < blocksize; i++) {
        int64_t side = chan[1][i];
        int64_t mid = (chan[0][i] << 1) | (side & 1);
        chan[0][i] = (mid + side) >> 1;
        chan[1][i] = (mid - side) >> 1;
      }
    }

    float scale = 1.0f / (float)(1LL << (bps - 1));
    for (int i = 0; i < blocksize; i++)
      for (int c = 0; c < n_ch; c++)
        pcm.push_back((float)chan[(size_t)c][i] * scale);

    if (total_samples && pcm.size() >= total_samples * (size_t)stream_ch)
      break;
  }

  long n_frames = (long)(pcm.size() / (size_t)stream_ch);
  float *o = (float *)malloc(pcm.size() * sizeof(float));
  if (!o) {
    set_error("oom");
    return -2;
  }
  memcpy(o, pcm.data(), pcm.size() * sizeof(float));
  *out = o;
  *frames = n_frames;
  return 0;
}

// ---------------------------------------------------------------------------
// Ogg Vorbis via dlopen(libvorbisfile)
// ---------------------------------------------------------------------------

// Public vorbisfile API shapes (declared here; no system headers available)
struct lt_vorbis_info {
  int version;
  int channels;
  long rate;
  long bitrate_upper, bitrate_nominal, bitrate_lower, bitrate_window;
  void *codec_setup;
};

typedef int (*ov_fopen_t)(const char *, void *);
typedef lt_vorbis_info *(*ov_info_t)(void *, int);
typedef int64_t (*ov_pcm_total_t)(void *, int);
typedef long (*ov_read_float_t)(void *, float ***, int, int *);
typedef int (*ov_clear_t)(void *);

static int decode_vorbis(const char *path, float **out, long *frames,
                         int *channels, int *sr, bool info_only) {
  static void *lib = dlopen("libvorbisfile.so.3", RTLD_NOW | RTLD_GLOBAL);
  if (!lib) lib = dlopen("libvorbisfile.so", RTLD_NOW | RTLD_GLOBAL);
  if (!lib) {
    set_error("libvorbisfile not available");
    return -3;
  }
  static auto p_fopen = (ov_fopen_t)dlsym(lib, "ov_fopen");
  static auto p_info = (ov_info_t)dlsym(lib, "ov_info");
  static auto p_total = (ov_pcm_total_t)dlsym(lib, "ov_pcm_total");
  static auto p_readf = (ov_read_float_t)dlsym(lib, "ov_read_float");
  static auto p_clear = (ov_clear_t)dlsym(lib, "ov_clear");
  if (!p_fopen || !p_info || !p_total || !p_readf || !p_clear) {
    set_error("libvorbisfile symbols missing");
    return -3;
  }

  // OggVorbis_File is ~944 bytes; allocate generously
  std::vector<uint8_t> vf(2048, 0);
  if (p_fopen(path, vf.data()) != 0) {
    set_error("ov_fopen failed (not a vorbis stream?)");
    return -1;
  }
  lt_vorbis_info *vi = p_info(vf.data(), -1);
  if (!vi) {
    p_clear(vf.data());
    set_error("ov_info failed");
    return -1;
  }
  int nch = vi->channels;
  *channels = nch;
  *sr = (int)vi->rate;
  int64_t total = p_total(vf.data(), -1);
  *frames = (long)(total > 0 ? total : 0);
  if (info_only) {
    p_clear(vf.data());
    return 0;
  }

  std::vector<float> pcm;
  if (total > 0) pcm.reserve((size_t)total * (size_t)nch);
  int bitstream = 0;
  for (;;) {
    float **ch_data = nullptr;
    long got = p_readf(vf.data(), &ch_data, 4096, &bitstream);
    if (got <= 0) break;
    for (long i = 0; i < got; i++)
      for (int c = 0; c < nch; c++) pcm.push_back(ch_data[c][i]);
  }
  p_clear(vf.data());

  long n_frames = (long)(pcm.size() / (size_t)nch);
  float *o = (float *)malloc(pcm.size() * sizeof(float));
  if (!o) {
    set_error("oom");
    return -2;
  }
  memcpy(o, pcm.data(), pcm.size() * sizeof(float));
  *out = o;
  *frames = n_frames;
  return 0;
}

// ---------------------------------------------------------------------------
// MP3 via dlopen(libmpg123)
// ---------------------------------------------------------------------------

typedef int (*mpg123_init_t)(void);
typedef void *(*mpg123_new_t)(const char *, int *);
typedef int (*mpg123_open_t)(void *, const char *);
typedef int (*mpg123_getformat_t)(void *, long *, int *, int *);
typedef int (*mpg123_format_none_t)(void *);
typedef int (*mpg123_format_t)(void *, long, int, int);
typedef int (*mpg123_read_t)(void *, void *, size_t, size_t *);
typedef int (*mpg123_close_t)(void *);
typedef void (*mpg123_delete_t)(void *);

static int decode_mp3(const char *path, float **out, long *frames,
                      int *channels, int *sr, bool info_only) {
  static void *lib = dlopen("libmpg123.so.0", RTLD_NOW);
  if (!lib) lib = dlopen("libmpg123.so", RTLD_NOW);
  if (!lib) {
    set_error("libmpg123 not available");
    return -3;
  }
  static auto p_init = (mpg123_init_t)dlsym(lib, "mpg123_init");
  static auto p_new = (mpg123_new_t)dlsym(lib, "mpg123_new");
  static auto p_open = (mpg123_open_t)dlsym(lib, "mpg123_open");
  static auto p_getfmt = (mpg123_getformat_t)dlsym(lib, "mpg123_getformat");
  static auto p_fnone = (mpg123_format_none_t)dlsym(lib, "mpg123_format_none");
  static auto p_fmt = (mpg123_format_t)dlsym(lib, "mpg123_format");
  static auto p_read = (mpg123_read_t)dlsym(lib, "mpg123_read");
  static auto p_close = (mpg123_close_t)dlsym(lib, "mpg123_close");
  static auto p_del = (mpg123_delete_t)dlsym(lib, "mpg123_delete");
  if (!p_init || !p_new || !p_open || !p_getfmt || !p_read) {
    set_error("libmpg123 symbols missing");
    return -3;
  }
  static bool inited = (p_init(), true);
  (void)inited;
  int err = 0;
  void *mh = p_new(nullptr, &err);
  if (!mh) {
    set_error("mpg123_new failed");
    return -1;
  }
  if (p_open(mh, path) != 0) {
    p_del(mh);
    set_error("mpg123_open failed");
    return -1;
  }
  long rate = 0;
  int nch = 0, enc = 0;
  p_getfmt(mh, &rate, &nch, &enc);
  // force float32 output
  const int MPG123_ENC_FLOAT_32 = 0x200;
  if (p_fnone && p_fmt) {
    p_fnone(mh);
    p_fmt(mh, rate, nch, MPG123_ENC_FLOAT_32);
  }
  *sr = (int)rate;
  *channels = nch;

  std::vector<float> pcm;
  std::vector<uint8_t> chunk(65536);
  for (;;) {
    size_t done = 0;
    int r = p_read(mh, chunk.data(), chunk.size(), &done);
    size_t n = done / sizeof(float);
    const float *fp = (const float *)chunk.data();
    pcm.insert(pcm.end(), fp, fp + n);
    if (r != 0 && done == 0) break; // MPG123_DONE or error
  }
  p_close(mh);
  p_del(mh);

  long n_frames = (long)(pcm.size() / (size_t)(nch ? nch : 1));
  *frames = n_frames;
  if (info_only) return 0;
  float *o = (float *)malloc(pcm.size() * sizeof(float));
  if (!o) {
    set_error("oom");
    return -2;
  }
  memcpy(o, pcm.data(), pcm.size() * sizeof(float));
  *out = o;
  return 0;
}

// ---------------------------------------------------------------------------
// Dispatch
// ---------------------------------------------------------------------------

static int dispatch(const char *path, float **out, long *frames, int *channels,
                    int *sr, bool info_only) {
  FILE *f = fopen(path, "rb");
  if (!f) {
    set_error(std::string("cannot open file: ") + path);
    return -1;
  }
  uint8_t magic[4] = {0};
  size_t got = fread(magic, 1, 4, f);
  fclose(f);
  if (got < 4) {
    set_error("file too small");
    return -1;
  }
  if (!memcmp(magic, "OggS", 4))
    return decode_vorbis(path, out, frames, channels, sr, info_only);
  if (!memcmp(magic, "fLaC", 4)) {
    std::vector<uint8_t> buf;
    if (!read_file(path, buf)) return -1;
    return decode_flac(buf, out, frames, channels, sr, info_only);
  }
  if (!memcmp(magic, "RIFF", 4)) {
    std::vector<uint8_t> buf;
    if (!read_file(path, buf)) return -1;
    return decode_wav(buf, out, frames, channels, sr);
  }
  if (!memcmp(magic, "ID3", 3) || (magic[0] == 0xFF && (magic[1] & 0xE0) == 0xE0))
    return decode_mp3(path, out, frames, channels, sr, info_only);
  set_error("unrecognized audio format");
  return -1;
}

extern "C" int lt_decode(const char *path, float **out, long *frames,
                         int *channels, int *sr) {
  return dispatch(path, out, frames, channels, sr, false);
}

extern "C" int lt_info(const char *path, int *sr, int *channels, long *frames) {
  float *dummy = nullptr;
  long fr = 0;
  int ch = 0, s = 0;
  // WAV info requires a full parse anyway (cheap); others honor info_only
  int rc = dispatch(path, &dummy, &fr, &ch, &s, true);
  if (dummy) free(dummy);
  if (rc == 0) {
    *sr = s;
    *channels = ch;
    *frames = fr;
  }
  return rc;
}
