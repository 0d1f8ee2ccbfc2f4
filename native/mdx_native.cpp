// mdx_native — C++ runtime tier: trajectory codecs + async frame sink.
//
// The reference delegates its native I/O needs to MDAnalysis' C DCD reader
// and moleculekit's libxtc (readers.py:1505-1531 via ctypes). This library
// provides the equivalents for the TPU framework, exposed through a plain C
// ABI consumed by ctypes (molecular_dynamics_tpu/io/native.py):
//
//  - DCD: bulk frame reader/writer (CHARMM format, little-endian)
//  - XTC: GROMACS xdr3dfcoord compressed trajectory reader/writer
//  - AsyncSink: background-thread trajectory writer so host I/O overlaps
//    device compute during long campaigns
//
// Build: make -C native   (produces libmdx_native.so)

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <mutex>
#include <queue>
#include <thread>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// DCD
// ---------------------------------------------------------------------------

static void write_record(FILE* f, const void* data, int32_t n) {
  fwrite(&n, 4, 1, f);
  fwrite(data, 1, (size_t)n, f);
  fwrite(&n, 4, 1, f);
}

// Write a complete DCD file: coords is (n_frames, n_atoms, 3) float32.
int mdx_dcd_write(const char* path, const float* coords, int64_t n_frames,
                  int64_t n_atoms, int32_t start, int32_t step) {
  FILE* f = fopen(path, "wb");
  if (!f) return -1;
  int32_t icntrl[21];
  memset(icntrl, 0, sizeof(icntrl));
  memcpy(icntrl, "CORD", 4);
  icntrl[1] = (int32_t)n_frames;
  icntrl[2] = start;
  icntrl[3] = step;
  icntrl[4] = (int32_t)n_frames * step;
  float dt = 0.04091f;  // AKMA
  memcpy(&icntrl[10], &dt, 4);
  icntrl[20] = 24;  // CHARMM version
  write_record(f, icntrl, 84);
  char title[84];
  memset(title, ' ', sizeof(title));
  int32_t ntitle = 1;
  memcpy(title, &ntitle, 4);
  memcpy(title + 4, "REMARKS written by mdx_native", 29);
  write_record(f, title, 84);
  int32_t na = (int32_t)n_atoms;
  write_record(f, &na, 4);

  std::vector<float> axis((size_t)n_atoms);
  for (int64_t fr = 0; fr < n_frames; ++fr) {
    const float* frame = coords + fr * n_atoms * 3;
    for (int d = 0; d < 3; ++d) {
      for (int64_t a = 0; a < n_atoms; ++a) axis[(size_t)a] = frame[a * 3 + d];
      write_record(f, axis.data(), (int32_t)(n_atoms * 4));
    }
  }
  fclose(f);
  return 0;
}

static int read_record(FILE* f, std::vector<char>& buf) {
  int32_t n;
  if (fread(&n, 4, 1, f) != 1) return -1;
  buf.resize((size_t)n);
  if (fread(buf.data(), 1, (size_t)n, f) != (size_t)n) return -1;
  int32_t tail;
  if (fread(&tail, 4, 1, f) != 1) return -1;
  return n;
}

// Probe header: returns n_atoms, sets *n_frames and *has_cell. Little-endian.
int64_t mdx_dcd_probe(const char* path, int64_t* n_frames, int32_t* has_cell) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  std::vector<char> buf;
  if (read_record(f, buf) < 84 || memcmp(buf.data(), "CORD", 4) != 0) {
    fclose(f);
    return -1;
  }
  int32_t icntrl[20];
  memcpy(icntrl, buf.data() + 4, 80);
  *has_cell = icntrl[10] ? 1 : 0;
  if (read_record(f, buf) < 0) { fclose(f); return -1; }
  if (read_record(f, buf) < 4) { fclose(f); return -1; }
  int32_t natoms;
  memcpy(&natoms, buf.data(), 4);
  // count frames by scanning records
  int64_t frames = 0;
  while (true) {
    if (*has_cell && read_record(f, buf) < 0) break;
    if (read_record(f, buf) < 0) break;  // x
    if (read_record(f, buf) < 0) break;  // y
    if (read_record(f, buf) < 0) break;  // z
    frames++;
  }
  *n_frames = frames;
  fclose(f);
  return natoms;
}

// Read all frames into out (n_frames, n_atoms, 3) float32 (caller allocs).
int mdx_dcd_read(const char* path, float* out, int64_t n_frames,
                 int64_t n_atoms) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  std::vector<char> buf;
  read_record(f, buf);
  int32_t icntrl[20];
  memcpy(icntrl, buf.data() + 4, 80);
  int has_cell = icntrl[10] ? 1 : 0;
  read_record(f, buf);  // title
  read_record(f, buf);  // natoms
  for (int64_t fr = 0; fr < n_frames; ++fr) {
    if (has_cell && read_record(f, buf) < 0) { fclose(f); return -2; }
    float* frame = out + fr * n_atoms * 3;
    for (int d = 0; d < 3; ++d) {
      if (read_record(f, buf) < (int)(n_atoms * 4)) { fclose(f); return -2; }
      const float* axis = (const float*)buf.data();
      for (int64_t a = 0; a < n_atoms; ++a) frame[a * 3 + d] = axis[a];
    }
  }
  fclose(f);
  return 0;
}

// ---------------------------------------------------------------------------
// mdxtc — compressed trajectory codec (XTC-style quantization)
// ---------------------------------------------------------------------------
// Big-endian XDR-style framing with GROMACS-style coordinate quantization
// (nm * precision, default 0.001 nm resolution) and adaptive per-axis bit
// packing. The payload packing is mdx's own (magic 19950), deliberately not
// claiming GROMACS .xtc interop; DCD is the interop format.

namespace xtc {

// MSB-first bit packing with a 64-bit accumulator.
struct BitWriter {
  std::vector<uint8_t> data;
  uint64_t acc = 0;
  int n = 0;
  void put(uint32_t v, int bits) {
    uint64_t mask = (bits >= 32) ? 0xFFFFFFFFull : ((1ull << bits) - 1);
    acc = (acc << bits) | ((uint64_t)v & mask);
    n += bits;
    while (n >= 8) {
      data.push_back((uint8_t)(acc >> (n - 8)));
      n -= 8;
    }
  }
  void flush() {
    if (n) {
      data.push_back((uint8_t)(acc << (8 - n)));
      n = 0;
    }
  }
};

struct BitReader {
  const uint8_t* p;
  size_t size;
  size_t pos = 0;
  uint64_t acc = 0;
  int n = 0;
  BitReader(const uint8_t* ptr, size_t sz) : p(ptr), size(sz) {}
  uint32_t get(int bits) {
    while (n < bits) {
      acc = (acc << 8) | (uint64_t)(pos < size ? p[pos++] : 0);
      n += 8;
    }
    uint64_t mask = (bits >= 32) ? 0xFFFFFFFFull : ((1ull << bits) - 1);
    uint32_t v = (uint32_t)((acc >> (n - bits)) & mask);
    n -= bits;
    return v;
  }
};

static int sizeofint(int size) {
  int n = 0;
  uint32_t s = 1;
  while ((uint32_t)size >= s && n < 32) {
    s <<= 1;
    n++;
  }
  return n;
}

}  // namespace xtc

// Per-frame layout: magic, natoms, step, time, box[9], natoms, precision,
// 3 x (min, range, bits), payload byte count, packed payload (4-aligned).

static void put_be32(std::vector<uint8_t>& v, uint32_t x) {
  v.push_back((uint8_t)(x >> 24));
  v.push_back((uint8_t)(x >> 16));
  v.push_back((uint8_t)(x >> 8));
  v.push_back((uint8_t)x);
}
static uint32_t get_be32(const uint8_t* p) {
  return ((uint32_t)p[0] << 24) | ((uint32_t)p[1] << 16) |
         ((uint32_t)p[2] << 8) | (uint32_t)p[3];
}
static void put_bef(std::vector<uint8_t>& v, float f) {
  uint32_t x;
  memcpy(&x, &f, 4);
  put_be32(v, x);
}
static float get_bef(const uint8_t* p) {
  uint32_t x = get_be32(p);
  float f;
  memcpy(&f, &x, 4);
  return f;
}

// Write a compressed trajectory. coords in Angstrom (converted to nm like
// GROMACS), precision in 1/nm (default 1000 = 0.001 nm).
int mdx_xtc_write(const char* path, const float* coords, int64_t n_frames,
                  int64_t n_atoms, float precision) {
  FILE* f = fopen(path, "wb");
  if (!f) return -1;
  for (int64_t fr = 0; fr < n_frames; ++fr) {
    std::vector<uint8_t> out;
    put_be32(out, 19950);  // mdxtc magic (not GROMACS-interop)
    put_be32(out, (uint32_t)n_atoms);
    put_be32(out, (uint32_t)fr);        // step
    put_bef(out, (float)fr);            // time
    for (int i = 0; i < 9; ++i) put_bef(out, 0.0f);  // box
    put_be32(out, (uint32_t)n_atoms);
    put_bef(out, precision);

    const float* frame = coords + fr * n_atoms * 3;
    // quantize (Angstrom -> nm) and delta-encode
    std::vector<int32_t> q((size_t)n_atoms * 3);
    int32_t minv[3] = {INT32_MAX, INT32_MAX, INT32_MAX};
    int32_t maxv[3] = {INT32_MIN, INT32_MIN, INT32_MIN};
    for (int64_t a = 0; a < n_atoms; ++a) {
      for (int d = 0; d < 3; ++d) {
        float nm = frame[a * 3 + d] * 0.1f;
        int32_t qi = (int32_t)(nm >= 0 ? nm * precision + 0.5f
                                       : nm * precision - 0.5f);
        q[(size_t)(a * 3 + d)] = qi;
        if (qi < minv[d]) minv[d] = qi;
        if (qi > maxv[d]) maxv[d] = qi;
      }
    }
    uint32_t sizes[3];
    int bits[3];
    for (int d = 0; d < 3; ++d) {
      put_be32(out, (uint32_t)minv[d]);
      sizes[d] = (uint32_t)(maxv[d] - minv[d] + 1);
      put_be32(out, sizes[d]);
      bits[d] = xtc::sizeofint((int)sizes[d] - 1);
      put_be32(out, (uint32_t)bits[d]);
    }
    xtc::BitWriter bw;
    bw.data.reserve((size_t)n_atoms * 3 * 4 + 64);
    for (int64_t a = 0; a < n_atoms; ++a)
      for (int d = 0; d < 3; ++d)
        bw.put((uint32_t)(q[(size_t)(a * 3 + d)] - minv[d]), bits[d]);
    bw.flush();
    put_be32(out, (uint32_t)bw.data.size());
    out.insert(out.end(), bw.data.begin(), bw.data.end());
    while (out.size() % 4) out.push_back(0);  // XDR 4-byte alignment
    fwrite(out.data(), 1, out.size(), f);
  }
  fclose(f);
  return 0;
}

int64_t mdx_xtc_probe(const char* path, int64_t* n_frames) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  int64_t natoms = -1, frames = 0;
  uint8_t hdr[16];
  while (fread(hdr, 1, 16, f) == 16) {
    if (get_be32(hdr) != 19950) break;
    int64_t na = get_be32(hdr + 4);
    if (natoms < 0) natoms = na;
    // box(36) + natoms(4) + precision(4) + 3*(min,size,bits)(36) + nbytes(4)
    uint8_t rest[84];
    if (fread(rest, 1, 84, f) != 84) break;
    uint32_t nbytes = get_be32(rest + 80);
    uint32_t padded = (nbytes + 3u) & ~3u;
    if (fseek(f, (long)padded, SEEK_CUR) != 0) break;
    frames++;
  }
  *n_frames = frames;
  fclose(f);
  return natoms;
}

int mdx_xtc_read(const char* path, float* outc, int64_t n_frames,
                 int64_t n_atoms) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  for (int64_t fr = 0; fr < n_frames; ++fr) {
    uint8_t hdr[100];
    if (fread(hdr, 1, 100, f) != 100) { fclose(f); return -2; }
    if (get_be32(hdr) != 19950) { fclose(f); return -3; }
    float precision = get_bef(hdr + 56);
    int32_t minv[3];
    uint32_t sizes[3];
    int bits[3];
    const uint8_t* p = hdr + 60;
    for (int d = 0; d < 3; ++d) {
      minv[d] = (int32_t)get_be32(p); p += 4;
      sizes[d] = get_be32(p); p += 4;
      bits[d] = (int)get_be32(p); p += 4;
    }
    (void)sizes;
    uint32_t nbytes = get_be32(p);
    uint32_t padded = (nbytes + 3u) & ~3u;
    std::vector<uint8_t> payload(padded);
    if (fread(payload.data(), 1, padded, f) != padded) { fclose(f); return -2; }
    xtc::BitReader br(payload.data(), payload.size());
    float* frame = outc + fr * n_atoms * 3;
    float inv_prec = 10.0f / precision;  // nm -> Angstrom
    for (int64_t a = 0; a < n_atoms; ++a)
      for (int d = 0; d < 3; ++d) {
        int32_t qi = (int32_t)br.get(bits[d]) + minv[d];
        frame[a * 3 + d] = (float)qi * inv_prec;
      }
  }
  fclose(f);
  return 0;
}

// ---------------------------------------------------------------------------
// Async trajectory sink (background writer thread)
// ---------------------------------------------------------------------------

struct AsyncSink {
  std::thread worker;
  std::mutex mu;
  std::condition_variable cv;
  std::queue<std::vector<float>> frames;
  std::atomic<bool> closing{false};
  std::atomic<int64_t> written{0};
  int64_t n_atoms = 0;
  std::string path;
  int format = 0;  // 0=npy-stream (raw f32), 1=dcd-at-close
  std::vector<float> all;  // for dcd-at-close

  void run() {
    FILE* raw = nullptr;
    if (format == 0) raw = fopen(path.c_str(), "wb");
    while (true) {
      std::vector<float> frame;
      {
        std::unique_lock<std::mutex> lk(mu);
        cv.wait(lk, [&] { return closing.load() || !frames.empty(); });
        if (frames.empty() && closing.load()) break;
        frame = std::move(frames.front());
        frames.pop();
      }
      if (format == 0 && raw) {
        fwrite(frame.data(), 4, frame.size(), raw);
      } else {
        all.insert(all.end(), frame.begin(), frame.end());
      }
      written++;
    }
    if (raw) fclose(raw);
    if (format == 1) {
      mdx_dcd_write(path.c_str(), all.data(),
                    (int64_t)(all.size() / (size_t)(n_atoms * 3)), n_atoms, 0,
                    1);
    }
  }
};

void* mdx_sink_open(const char* path, int64_t n_atoms, int format) {
  auto* s = new AsyncSink();
  s->path = path;
  s->n_atoms = n_atoms;
  s->format = format;
  s->worker = std::thread([s] { s->run(); });
  return s;
}

int mdx_sink_push(void* handle, const float* frame, int64_t n_floats) {
  auto* s = (AsyncSink*)handle;
  {
    std::lock_guard<std::mutex> lk(s->mu);
    s->frames.emplace(frame, frame + n_floats);
  }
  s->cv.notify_one();
  return 0;
}

int64_t mdx_sink_close(void* handle) {
  auto* s = (AsyncSink*)handle;
  s->closing = true;
  s->cv.notify_all();
  s->worker.join();
  int64_t written = s->written.load();
  delete s;
  return written;
}

}  // extern "C"
