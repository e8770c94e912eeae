// Native WAV segment decoder for the training data hot path.
//
// The reference delegates audio IO to soundfile/torchaudio
// (librimix_dataset.py:110, musdbhq_dataset.py:174, both reading with
// frame offsets). This C++ equivalent parses RIFF chunks, seeks straight
// to the requested frame range, and converts PCM16/PCM24/PCM32/float32 to
// float32 planar [channels][frames] — so a 3 s crop of a 60 s file costs
// one seek + one small read instead of decoding the whole file (the host
// here has a single CPU core feeding the TPU).
//
// Exposed via a plain C ABI for ctypes (no pybind11 in the image).

#include <cstdint>
#include <cstdio>
#include <cstring>

extern "C" {

typedef struct {
  int32_t channels;
  int32_t sample_rate;
  int64_t n_frames;
  int32_t bits;          // 16/24/32
  int32_t is_float;      // fmt tag 3
  int64_t data_offset;   // byte offset of PCM data
} WavInfo;

static int parse_header(FILE* f, WavInfo* info) {
  uint8_t hdr[12];
  if (fread(hdr, 1, 12, f) != 12) return -1;
  if (memcmp(hdr, "RIFF", 4) != 0 || memcmp(hdr + 8, "WAVE", 4) != 0) return -2;

  uint16_t fmt_tag = 0, channels = 0, bits = 0;
  uint32_t sample_rate = 0;
  int64_t data_offset = -1;
  uint32_t data_size = 0;

  for (;;) {
    uint8_t chunk[8];
    if (fread(chunk, 1, 8, f) != 8) break;
    uint32_t size;
    memcpy(&size, chunk + 4, 4);
    if (memcmp(chunk, "fmt ", 4) == 0) {
      // Read up to the full extensible header (16 base + 2 cbSize +
      // 22 extension = 40 bytes) so WAVE_FORMAT_EXTENSIBLE resolves to its
      // real SubFormat instead of being guessed as PCM.
      uint8_t buf[40] = {0};
      size_t take = size < sizeof(buf) ? size : sizeof(buf);
      if (size < 16 || fread(buf, 1, take, f) != take) return -3;
      memcpy(&fmt_tag, buf + 0, 2);
      memcpy(&channels, buf + 2, 2);
      memcpy(&sample_rate, buf + 4, 4);
      memcpy(&bits, buf + 14, 2);
      if (fmt_tag == 0xFFFE) {
        uint16_t cb_size = 0;
        if (size >= 18) memcpy(&cb_size, buf + 16, 2);
        if (size < 40 || cb_size < 22) return -7;  // malformed extensible fmt
        // SubFormat GUID at offset 24; its first two bytes are the real tag.
        memcpy(&fmt_tag, buf + 24, 2);
      }
      if (size > take) fseek(f, (long)(size - take), SEEK_CUR);
      if (size & 1) fseek(f, 1, SEEK_CUR);
    } else if (memcmp(chunk, "data", 4) == 0) {
      data_offset = ftell(f);
      data_size = size;
      fseek(f, (size + 1) & ~1u, SEEK_CUR);  // chunks are 2-byte aligned
    } else {
      fseek(f, (size + 1) & ~1u, SEEK_CUR);
    }
    if (data_offset >= 0 && fmt_tag) break;
  }
  if (data_offset < 0 || !channels || !bits) return -4;
  if (fmt_tag != 1 && fmt_tag != 3) return -5;

  info->channels = channels;
  info->sample_rate = (int32_t)sample_rate;
  info->bits = bits;
  info->is_float = (fmt_tag == 3);
  info->data_offset = data_offset;
  info->n_frames = (int64_t)data_size / (channels * (bits / 8));
  return 0;
}

// -> 0 on success; fills channels/sample_rate/frames.
int wav_info(const char* path, int32_t* channels, int32_t* sample_rate, int64_t* frames) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  WavInfo info;
  int rc = parse_header(f, &info);
  fclose(f);
  if (rc != 0) return rc;
  *channels = info.channels;
  *sample_rate = info.sample_rate;
  *frames = info.n_frames;
  return 0;
}

// Reads [offset, offset+n) frames as planar float32 out[channel][frame].
// `stride` is the caller's per-channel allocation stride in frames (out is
// indexed out[c*stride + i]); it must be >= the number of frames actually
// read, which may be less than n when the request crosses EOF — using the
// clamped count as the stride would scatter channels across the caller's
// buffer. n < 0 means "to end of file". Returns frames read, or a negative
// error.
int64_t wav_read_f32(const char* path, int64_t offset, int64_t n, float* out,
                     int64_t stride, int32_t* channels, int32_t* sample_rate) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  WavInfo info;
  int rc = parse_header(f, &info);
  if (rc != 0) { fclose(f); return rc; }
  if (offset < 0) offset = 0;
  if (offset > info.n_frames) offset = info.n_frames;
  int64_t avail = info.n_frames - offset;
  if (n < 0 || n > avail) n = avail;
  if (stride < n) { fclose(f); return -8; }

  const int bytes_per = info.bits / 8;
  const int ch = info.channels;
  fseek(f, info.data_offset + offset * ch * bytes_per, SEEK_SET);

  const int64_t CHUNK = 65536;
  uint8_t buf[65536 * 4];
  int64_t done = 0;
  while (done < n) {
    int64_t todo = n - done < CHUNK / ch ? n - done : CHUNK / ch;
    size_t want = (size_t)(todo * ch * bytes_per);
    if (fread(buf, 1, want, f) != want) break;
    for (int64_t i = 0; i < todo; ++i) {
      for (int c = 0; c < ch; ++c) {
        const uint8_t* p = buf + (i * ch + c) * bytes_per;
        float v;
        if (info.is_float && info.bits == 32) {
          memcpy(&v, p, 4);
        } else if (info.bits == 16) {
          int16_t s;
          memcpy(&s, p, 2);
          v = (float)s / 32768.0f;
        } else if (info.bits == 32) {
          int32_t s;
          memcpy(&s, p, 4);
          v = (float)((double)s / 2147483648.0);
        } else if (info.bits == 24) {
          int32_t s = (int32_t)((uint32_t)p[0] << 8 | (uint32_t)p[1] << 16 |
                                (uint32_t)p[2] << 24) >> 8;
          v = (float)((double)s / 8388608.0);
        } else {
          fclose(f);
          return -6;
        }
        out[(int64_t)c * stride + done + i] = v;
      }
    }
    done += todo;
  }
  fclose(f);
  *channels = ch;
  *sample_rate = info.sample_rate;
  return done;
}

}  // extern "C"
