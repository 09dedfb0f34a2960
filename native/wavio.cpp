// Native data-loading runtime for demucs_tpu.
//
// The reference's input pipeline is native via dependencies (torchaudio's
// C++ wav seek-reads + torch DataLoader worker processes). This is our
// equivalent: a small C++ library doing GIL-free WAV window decoding and
// multi-threaded batch prefetch, exposed to Python over a plain C ABI
// (ctypes — no pybind11 in this image).
//
// Features:
//  - RIFF/WAVE parsing: PCM 16/24/32 and IEEE float32, chunk-seeking reads
//    of [frame_offset, frame_offset+num_frames) windows (the
//    ta.load(frame_offset, num_frames) equivalent, demucs/wav.py:163-172)
//  - a prefetcher: a thread pool walks a job list of (files..., offset,
//    frames) stem-groups, decodes + channel-converts + stacks each example,
//    and parks finished examples in bounded slots for the Python side to
//    collect in order.
//
// Build: make native   (g++ -O3 -shared -fPIC -pthread)

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <queue>
#include <string>
#include <thread>
#include <vector>

namespace {

struct WavInfo {
  uint16_t format = 0;       // 1 = PCM, 3 = IEEE float
  uint16_t channels = 0;
  uint32_t samplerate = 0;
  uint16_t bits = 0;
  uint16_t block_align = 0;
  uint64_t data_offset = 0;  // byte offset of data payload
  uint64_t data_size = 0;    // bytes
};

bool parse_header(FILE* f, WavInfo* info) {
  char id[4];
  uint32_t size;
  if (fread(id, 1, 4, f) != 4 || memcmp(id, "RIFF", 4) != 0) return false;
  if (fread(&size, 4, 1, f) != 1) return false;
  if (fread(id, 1, 4, f) != 4 || memcmp(id, "WAVE", 4) != 0) return false;
  bool have_fmt = false, have_data = false;
  while (fread(id, 1, 4, f) == 4 && fread(&size, 4, 1, f) == 1) {
    if (memcmp(id, "fmt ", 4) == 0) {
      struct __attribute__((packed)) {
        uint16_t format, channels;
        uint32_t samplerate, byte_rate;
        uint16_t block_align, bits;
      } fmt;
      if (size < sizeof(fmt) || fread(&fmt, sizeof(fmt), 1, f) != 1) return false;
      info->format = fmt.format;
      info->channels = fmt.channels;
      info->samplerate = fmt.samplerate;
      info->bits = fmt.bits;
      info->block_align = fmt.block_align;
      if (info->format == 0xFFFE) info->format = (fmt.bits == 32 ? 3 : 1);
      long skip = (long)size - (long)sizeof(fmt) + (size & 1);
      if (skip) fseek(f, skip, SEEK_CUR);
      have_fmt = true;
    } else if (memcmp(id, "data", 4) == 0) {
      info->data_offset = (uint64_t)ftell(f);
      info->data_size = size;
      fseek(f, (long)(size + (size & 1)), SEEK_CUR);
      have_data = true;
    } else {
      fseek(f, (long)(size + (size & 1)), SEEK_CUR);
    }
  }
  return have_fmt && have_data;
}

// Decode [frame_offset, frame_offset+num_frames) into out (channels-major:
// out[c * num_frames + t]), zero-padding past EOF. Returns frames read, or
// negative on error.
int64_t read_window(const char* path, int64_t frame_offset, int64_t num_frames,
                    int out_channels, float* out) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  WavInfo info;
  if (!parse_header(f, &info) || info.block_align == 0) {
    fclose(f);
    return -2;
  }
  const int64_t total = (int64_t)(info.data_size / info.block_align);
  int64_t avail = total - frame_offset;
  if (avail < 0) avail = 0;
  if (avail > num_frames) avail = num_frames;
  const int C = info.channels;

  std::vector<uint8_t> raw((size_t)avail * info.block_align);
  if (avail > 0) {
    fseek(f, (long)(info.data_offset + (uint64_t)frame_offset * info.block_align),
          SEEK_SET);
    if (fread(raw.data(), 1, raw.size(), f) != raw.size()) {
      fclose(f);
      return -3;
    }
  }
  fclose(f);

  // decode to interleaved float
  std::vector<float> tmp((size_t)avail * C, 0.f);
  const uint8_t* p = raw.data();
  if (info.format == 3 && info.bits == 32) {
    memcpy(tmp.data(), p, tmp.size() * sizeof(float));
  } else if (info.format == 1 && info.bits == 16) {
    const int16_t* s = (const int16_t*)p;
    for (size_t i = 0; i < tmp.size(); ++i) tmp[i] = s[i] / 32768.f;
  } else if (info.format == 1 && info.bits == 24) {
    for (size_t i = 0; i < tmp.size(); ++i) {
      int32_t v = (int32_t)p[3 * i] | ((int32_t)p[3 * i + 1] << 8) |
                  ((int32_t)p[3 * i + 2] << 16);
      v = (v << 8) >> 8;  // sign extend
      tmp[i] = (float)v / 8388608.f;
    }
  } else if (info.format == 1 && info.bits == 32) {
    const int32_t* s = (const int32_t*)p;
    for (size_t i = 0; i < tmp.size(); ++i) tmp[i] = (float)s[i] / 2147483648.f;
  } else {
    return -4;
  }

  // channel conversion (demucs/audio.py:143-166 semantics) + layout
  memset(out, 0, sizeof(float) * (size_t)out_channels * num_frames);
  for (int64_t t = 0; t < avail; ++t) {
    const float* frame = &tmp[(size_t)t * C];
    if (out_channels == C) {
      for (int c = 0; c < C; ++c) out[(size_t)c * num_frames + t] = frame[c];
    } else if (out_channels == 1) {
      float acc = 0.f;
      for (int c = 0; c < C; ++c) acc += frame[c];
      out[t] = acc / C;
    } else if (C == 1) {
      for (int c = 0; c < out_channels; ++c)
        out[(size_t)c * num_frames + t] = frame[0];
    } else {  // take first out_channels
      int n = out_channels < C ? out_channels : C;
      for (int c = 0; c < n; ++c) out[(size_t)c * num_frames + t] = frame[c];
    }
  }
  return avail;
}

// ------------------------------- prefetcher -------------------------------

struct Job {
  std::vector<std::string> files;  // one per source
  int64_t offset = 0;
  int64_t frames = 0;
  double mean = 0.0, std = 1.0;    // track normalization (wav.py:178-179)
};

struct Prefetcher {
  std::vector<Job> jobs;
  int channels = 2;
  int64_t frames = 0;   // uniform window length
  size_t sources = 0;
  std::vector<std::vector<float>> results;   // per job: (S*C*frames)
  std::vector<std::atomic<int>> *state = nullptr;  // 0 pending,1 running,2 done
  std::atomic<size_t> next{0};
  std::vector<std::thread> threads;
  std::atomic<bool> stop{false};

  ~Prefetcher() {
    stop = true;
    for (auto& t : threads) t.join();
    delete state;
  }

  void worker() {
    while (!stop) {
      size_t i = next.fetch_add(1);
      if (i >= jobs.size()) return;
      const Job& j = jobs[i];
      auto& dst = results[i];
      dst.assign((size_t)sources * channels * frames, 0.f);
      for (size_t s = 0; s < j.files.size(); ++s) {
        read_window(j.files[s].c_str(), j.offset, frames, channels,
                    dst.data() + s * (size_t)channels * frames);
      }
      if (j.std != 1.0 || j.mean != 0.0) {
        const float inv = (float)(1.0 / j.std);
        const float mu = (float)j.mean;
        for (auto& v : dst) v = (v - mu) * inv;
      }
      (*state)[i].store(2);
    }
  }
};

}  // namespace

extern "C" {

int64_t wavio_info(const char* path, int64_t* out5) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  WavInfo info;
  bool ok = parse_header(f, &info);
  fclose(f);
  if (!ok || info.block_align == 0) return -2;
  out5[0] = info.samplerate;
  out5[1] = info.channels;
  out5[2] = (int64_t)(info.data_size / info.block_align);
  out5[3] = info.bits;
  out5[4] = info.format;
  return 0;
}

int64_t wavio_read(const char* path, int64_t frame_offset, int64_t num_frames,
                   int out_channels, float* out) {
  return read_window(path, frame_offset, num_frames, out_channels, out);
}

void* prefetch_create(int num_threads, int channels, int64_t frames,
                      int64_t sources) {
  auto* p = new Prefetcher();
  p->channels = channels;
  p->frames = frames;
  p->sources = (size_t)sources;
  p->threads.reserve(num_threads);
  (void)num_threads;
  return p;
}

void prefetch_add_job(void* handle, const char** files, int64_t n_files,
                      int64_t offset, double mean, double stddev) {
  auto* p = (Prefetcher*)handle;
  Job j;
  for (int64_t i = 0; i < n_files; ++i) j.files.emplace_back(files[i]);
  j.offset = offset;
  j.frames = p->frames;
  j.mean = mean;
  j.std = stddev;
  p->jobs.push_back(std::move(j));
}

void prefetch_start(void* handle, int num_threads) {
  auto* p = (Prefetcher*)handle;
  p->results.resize(p->jobs.size());
  p->state = new std::vector<std::atomic<int>>(p->jobs.size());
  for (auto& s : *p->state) s.store(0);
  for (int i = 0; i < num_threads; ++i)
    p->threads.emplace_back([p] { p->worker(); });
}

// Blocks until job i is ready, copies it out. Returns 0 on success.
int prefetch_get(void* handle, int64_t i, float* out) {
  auto* p = (Prefetcher*)handle;
  if (i < 0 || (size_t)i >= p->jobs.size()) return -1;
  while ((*p->state)[i].load() != 2)
    std::this_thread::sleep_for(std::chrono::microseconds(200));
  auto& src = p->results[i];
  memcpy(out, src.data(), src.size() * sizeof(float));
  src.clear();
  src.shrink_to_fit();
  return 0;
}

void prefetch_destroy(void* handle) { delete (Prefetcher*)handle; }

// FLAC frame CRCs (the codec in demucs_tpu/flacio.py assembles frames with
// numpy; the byte-sequential CRC is the one loop Python can't vectorize).
// CRC-8 poly 0x07 init 0; CRC-16 poly 0x8005 init 0, both MSB-first.
uint32_t flac_crc8(const uint8_t* data, int64_t n) {
  static uint8_t table[256];
  static bool init = false;
  if (!init) {
    for (int i = 0; i < 256; ++i) {
      uint8_t c = (uint8_t)i;
      for (int k = 0; k < 8; ++k) c = (c & 0x80) ? (uint8_t)((c << 1) ^ 0x07) : (uint8_t)(c << 1);
      table[i] = c;
    }
    init = true;
  }
  uint8_t crc = 0;
  for (int64_t i = 0; i < n; ++i) crc = table[crc ^ data[i]];
  return crc;
}

// Decode `count` Rice codes with parameter k from absolute MSB-first bit
// offset `bitpos` into zigzag-decoded residuals. Returns the new bit offset,
// or -1 on stream overrun. (The per-sample scan is the FLAC decoder's one
// loop numpy cannot vectorize — remainder bits alias the unary terminators.)
int64_t flac_rice_decode(const uint8_t* data, int64_t nbytes, int64_t bitpos,
                         int64_t count, int k, int64_t* out) {
  const int64_t nbits = nbytes * 8;
  for (int64_t i = 0; i < count; ++i) {
    int64_t q = 0;
    while (bitpos < nbits && !((data[bitpos >> 3] >> (7 - (bitpos & 7))) & 1)) {
      ++bitpos;
      ++q;
    }
    if (bitpos >= nbits) return -1;
    ++bitpos;  // the terminating 1 bit
    uint64_t u = (uint64_t)q << k;
    for (int j = k - 1; j >= 0; --j) {
      if (bitpos >= nbits) return -1;
      u |= (uint64_t)((data[bitpos >> 3] >> (7 - (bitpos & 7))) & 1) << j;
      ++bitpos;
    }
    out[i] = (int64_t)(u >> 1) ^ -(int64_t)(u & 1);
  }
  return bitpos;
}

// In-place LPC reconstruction: x[0..order) = warmup, x[order..n) = residuals
// on input; on output x holds the restored samples (x[i] += (sum coef[j] *
// x[i-1-j]) >> shift — the FLAC integer predictor).
void flac_lpc_restore(const int32_t* coefs, int order, int shift, int64_t* x,
                      int64_t n) {
  for (int64_t i = order; i < n; ++i) {
    int64_t pred = 0;
    for (int j = 0; j < order; ++j) pred += (int64_t)coefs[j] * x[i - 1 - j];
    x[i] += pred >> shift;
  }
}

uint32_t flac_crc16(const uint8_t* data, int64_t n) {
  static uint16_t table[256];
  static bool init = false;
  if (!init) {
    for (int i = 0; i < 256; ++i) {
      uint16_t c = (uint16_t)(i << 8);
      for (int k = 0; k < 8; ++k)
        c = (c & 0x8000) ? (uint16_t)((c << 1) ^ 0x8005) : (uint16_t)(c << 1);
      table[i] = c;
    }
    init = true;
  }
  uint16_t crc = 0;
  for (int64_t i = 0; i < n; ++i)
    crc = (uint16_t)((crc << 8) ^ table[(crc >> 8) ^ data[i]]);
  return crc;
}

}  // extern "C"
