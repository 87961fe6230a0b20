// Native NIST SPHERE (.sph) audio reader: header parse, PCM16 (both
// byte orders), PCM8, mu-law, A-law, and embedded-shorten v1/v2
// payloads, with per-channel extraction.
//
// Replaces the reference's external `sph2pipe -f wav -p -c N` pipeline
// stage (invoked from local/make_sre.pl and every LDC corpus walker —
// SURVEY.md §2.3 "data prep"): LDC speech corpora (SRE, SWBD, Fisher)
// ship as 2-channel SPHERE files, most of them shorten-compressed, and
// the reference resolves them lazily through wav.scp command pipes.
// Here decoding is a native library call feeding the typed AudioStore
// (sepi_tpu/data/audio.py) — no shell, no temp files.
//
// The shorten decoder is a clean-room implementation of the published
// bitstream format (T. Robinson, "SHORTEN: simple lossless and
// near-lossless waveform compression", CUED/F-INFENG/TR.156, 1994):
// 32-bit big-endian word bit reader, Rice/unary "uvar" codes, block
// commands DIFF0-3/QLPC/ZERO/BLOCKSIZE/BITSHIFT/VERBATIM/QUIT, rolling
// block means (nmean) and per-block residual sizes.  Conformance is
// pinned by round-trip tests against an independently written Python
// encoder of the same spec (tests/test_sphere.py): every command and
// state transition, the bitshift x nmean interplay (v1 and v2,
// mid-stream shift changes), wide residuals, verbatim chunks, and a
// randomized property fuzz; corrupt/truncated streams must fail with
// SPH_E_SHORTEN/SPH_E_TRUNCATED, never crash (also fuzzed).
//
// C ABI (ctypes-consumed by sepi_tpu/utils/sphere.py):
//   sph_info(path, &rate, &channels, &samples, coding, cap) -> 0/err
//   sph_read(path, channel /*1-based; 0 = all interleaved*/,
//            &out /*malloc int16*/, &n) -> 0/err
//   sph_free(ptr)

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>

#include <string>
#include <vector>

namespace {

// ---------------------------------------------------------------------
// error codes
enum {
  SPH_OK = 0,
  SPH_E_OPEN = -1,
  SPH_E_HEADER = -2,
  SPH_E_CODING = -3,
  SPH_E_TRUNCATED = -4,
  SPH_E_CHANNEL = -5,
  SPH_E_SHORTEN = -6,
  SPH_E_ALLOC = -7,
};

// ---------------------------------------------------------------------
// header

struct SphHeader {
  long header_bytes = 0;
  long sample_rate = 0;
  long channel_count = 1;
  long sample_count = 0;      // per channel
  long sample_n_bytes = 2;
  std::string byte_format;    // "01" little, "10" big, "1" single byte
  std::string coding = "pcm"; // pcm | ulaw | alaw [+ ",embedded-shorten-vX"]
};

bool parse_header(FILE* f, SphHeader* h) {
  char line0[16], line1[16];
  if (fread(line0, 1, 8, f) != 8 || memcmp(line0, "NIST_1A\n", 8) != 0)
    return false;
  if (fread(line1, 1, 8, f) != 8) return false;
  line1[8] = 0;  // "   1024\n"
  h->header_bytes = strtol(line1, nullptr, 10);
  if (h->header_bytes < 16 || h->header_bytes > (1 << 20)) return false;
  std::vector<char> buf(h->header_bytes - 16 + 1, 0);
  if (fread(buf.data(), 1, h->header_bytes - 16, f) !=
      (size_t)(h->header_bytes - 16))
    return false;
  // parse "name -t value" lines until end_head
  char* save = nullptr;
  for (char* ln = strtok_r(buf.data(), "\n", &save); ln;
       ln = strtok_r(nullptr, "\n", &save)) {
    if (strncmp(ln, "end_head", 8) == 0) break;
    char name[128], type[32];
    const char* rest;
    {
      int off = 0;
      if (sscanf(ln, "%127s %31s %n", name, type, &off) < 2) continue;
      rest = ln + off;
    }
    long ival = 0;
    if (type[1] == 'i') ival = strtol(rest, nullptr, 10);
    if (strcmp(name, "sample_rate") == 0) h->sample_rate = ival;
    else if (strcmp(name, "channel_count") == 0) h->channel_count = ival;
    else if (strcmp(name, "sample_count") == 0) h->sample_count = ival;
    else if (strcmp(name, "sample_n_bytes") == 0) h->sample_n_bytes = ival;
    else if (strcmp(name, "sample_byte_format") == 0) h->byte_format = rest;
    else if (strcmp(name, "sample_coding") == 0) h->coding = rest;
  }
  return h->sample_rate > 0 && h->channel_count > 0;
}

// ---------------------------------------------------------------------
// companding tables (ITU-T G.711 exact)

int16_t ulaw_to_lin(uint8_t u) {
  u = ~u;
  int sign = u & 0x80;
  int exp = (u >> 4) & 7;
  int mant = u & 0x0f;
  int lin = ((mant << 3) + 0x84) << exp;  // 0x84 = 132 bias
  lin -= 0x84;
  return (int16_t)(sign ? -lin : lin);
}

int16_t alaw_to_lin(uint8_t a) {
  a ^= 0x55;
  int sign = a & 0x80;  // G.711 A-law: sign bit SET means positive
  int exp = (a >> 4) & 7;
  int mant = a & 0x0f;
  int lin = (mant << 4) + 8;
  if (exp > 0) lin = (lin + 0x100) << (exp - 1);
  return (int16_t)(sign ? lin : -lin);
}

// ---------------------------------------------------------------------
// shorten bitstream

constexpr int kFnSize = 2;
constexpr int kEnergySize = 3;
constexpr int kBitshiftSize = 2;
constexpr int kLpcQSize = 2;
constexpr int kLpcQuant = 5;
constexpr int kXByteSize = 7;
constexpr int kULongSize = 2;
constexpr int kVerbCkSize = 5;   // VERBATIM chunk-count code size
constexpr int kVerbByteSize = 8; // VERBATIM byte code size
constexpr int kNWrap = 3;

enum {
  FN_DIFF0 = 0, FN_DIFF1 = 1, FN_DIFF2 = 2, FN_DIFF3 = 3,
  FN_QUIT = 4, FN_BLOCKSIZE = 5, FN_BITSHIFT = 6, FN_QLPC = 7,
  FN_ZERO = 8, FN_VERBATIM = 9,
};

// shorten internal sample types (spec table)
enum {
  TYPE_AU1 = 0, TYPE_S8 = 1, TYPE_U8 = 2, TYPE_S16HL = 3, TYPE_U16HL = 4,
  TYPE_S16LH = 5, TYPE_U16LH = 6, TYPE_ULAW = 7, TYPE_AU2 = 8,
  TYPE_AU3 = 9, TYPE_ALAW = 10,
};

struct BitReader {
  const uint8_t* p;
  const uint8_t* end;
  uint32_t buf = 0;
  int nbit = 0;
  bool overrun = false;

  uint32_t word() {
    uint32_t w = 0;
    for (int i = 0; i < 4; i++) {
      w <<= 8;
      if (p < end) w |= *p++;
      else overrun = true;
    }
    return w;
  }
  int bit() {
    if (nbit == 0) { buf = word(); nbit = 32; }
    nbit--;
    return (buf >> nbit) & 1;
  }
  uint32_t uvar(int k) {
    uint32_t cnt = 0;
    while (bit() == 0) {
      if (overrun || cnt > (1u << 24)) { overrun = true; return 0; }
      cnt++;
    }
    uint32_t low = 0;
    for (int i = 0; i < k; i++) low = (low << 1) | bit();
    return (cnt << k) | low;
  }
  uint32_t ulong_() {
    uint32_t nbit_ = uvar(kULongSize);
    if (nbit_ > 31) { overrun = true; return 0; }
    return uvar(nbit_);
  }
  int32_t var(int k) {
    uint32_t u = uvar(k + 1);
    return (u & 1) ? -(int32_t)(u >> 1) - 1 : (int32_t)(u >> 1);
  }
};

// Decode a shorten stream into per-channel int32 sample buffers.
// Returns SPH_OK or an error.  `want` = per-channel sample cap from the
// sphere header (stream FN_QUIT may come later for padded files).
int shorten_decode(const uint8_t* data, size_t size, long want,
                   std::vector<std::vector<int32_t>>* out_chans,
                   int* out_ftype) {
  if (size < 5 || memcmp(data, "ajkg", 4) != 0) return SPH_E_SHORTEN;
  int version = data[4];
  if (version < 1 || version > 2) return SPH_E_SHORTEN;
  BitReader br{data + 5, data + size};

  uint32_t ftype = br.ulong_();
  uint32_t nchan = br.ulong_();
  uint32_t blocksize = br.ulong_();
  uint32_t maxnlpc = br.ulong_();
  uint32_t nmean = br.ulong_();
  uint32_t nskip = br.ulong_();
  if (br.overrun || nchan == 0 || nchan > 64 || blocksize == 0 ||
      blocksize > (1u << 20) || maxnlpc > 1024)
    return SPH_E_SHORTEN;
  for (uint32_t i = 0; i < nskip; i++) br.uvar(kXByteSize);

  int nwrap = (int)maxnlpc > kNWrap ? (int)maxnlpc : kNWrap;
  // history-prefixed channel work buffers
  std::vector<std::vector<int32_t>> work(
      nchan, std::vector<int32_t>(nwrap + blocksize, 0));
  std::vector<std::vector<int32_t>> offsets(nchan);
  // initial offset: midpoint for unsigned/companded types
  int32_t mean0 = 0;
  if (ftype == TYPE_U8) mean0 = 0x80;
  if (ftype == TYPE_U16HL || ftype == TYPE_U16LH) mean0 = 0x8000;
  for (auto& o : offsets) o.assign(nmean ? nmean : 1, mean0);

  out_chans->assign(nchan, {});
  for (auto& c : *out_chans) c.reserve(want > 0 ? want : 4096);

  uint32_t chan = 0;
  int bitshift = 0;
  std::vector<int32_t> qlpc(maxnlpc ? maxnlpc : 1);
  long produced = 0;

  while (!br.overrun) {
    uint32_t cmd = br.uvar(kFnSize);
    if (br.overrun) break;
    if (cmd == FN_QUIT) break;
    switch (cmd) {
      case FN_BLOCKSIZE: {
        uint32_t nb = br.ulong_();
        if (nb == 0 || nb > blocksize) return SPH_E_SHORTEN;  // spec: never grows
        blocksize = nb;
        break;
      }
      case FN_BITSHIFT:
        bitshift = (int)br.uvar(kBitshiftSize);
        if (bitshift > 31) return SPH_E_SHORTEN;
        break;
      case FN_VERBATIM: {
        uint32_t cnt = br.uvar(kVerbCkSize);
        for (uint32_t i = 0; i < cnt; i++) br.uvar(kVerbByteSize);
        break;
      }
      case FN_ZERO:
      case FN_DIFF0: case FN_DIFF1: case FN_DIFF2: case FN_DIFF3:
      case FN_QLPC: {
        int resn = 0;
        if (cmd != FN_ZERO) {
          resn = (int)br.uvar(kEnergySize);
          if (resn > 30) return SPH_E_SHORTEN;
        }
        // rolling block-mean offset
        int64_t coffset;
        auto& off = offsets[chan];
        if (nmean == 0) {
          coffset = off[0];
        } else {
          int64_t sum = (version < 2) ? 0 : (int64_t)nmean / 2;
          for (uint32_t i = 0; i < nmean; i++) sum += off[i];
          coffset = sum / (int64_t)nmean;
          // v2 stores offsets pre-bitshift; bring back to coded domain
          if (version >= 2 && bitshift > 0)
            coffset = (coffset >> (bitshift - 1)) >> 1;
        }
        int32_t* cbuf = work[chan].data() + nwrap;  // cbuf[-1..-nwrap] history
        switch (cmd) {
          case FN_ZERO:
            for (uint32_t i = 0; i < blocksize; i++) cbuf[i] = 0;
            break;
          case FN_DIFF0:
            for (uint32_t i = 0; i < blocksize; i++)
              cbuf[i] = br.var(resn) + (int32_t)coffset;
            break;
          case FN_DIFF1:
            for (uint32_t i = 0; i < blocksize; i++)
              cbuf[i] = br.var(resn) + cbuf[(int)i - 1];
            break;
          case FN_DIFF2:
            for (uint32_t i = 0; i < blocksize; i++)
              cbuf[i] = br.var(resn) + 2 * cbuf[(int)i - 1] - cbuf[(int)i - 2];
            break;
          case FN_DIFF3:
            for (uint32_t i = 0; i < blocksize; i++)
              cbuf[i] = br.var(resn) +
                        3 * (cbuf[(int)i - 1] - cbuf[(int)i - 2]) +
                        cbuf[(int)i - 3];
            break;
          case FN_QLPC: {
            uint32_t nlpc = br.uvar(kLpcQSize);
            if (nlpc > maxnlpc) return SPH_E_SHORTEN;
            for (uint32_t j = 0; j < nlpc; j++) qlpc[j] = br.var(kLpcQuant);
            for (uint32_t j = 0; j < nlpc; j++)
              cbuf[-(int)j - 1] -= (int32_t)coffset;
            for (uint32_t i = 0; i < blocksize; i++) {
              int64_t sum = (version < 2) ? 0 : (1 << (kLpcQuant - 1));
              for (uint32_t j = 0; j < nlpc; j++)
                sum += (int64_t)qlpc[j] * cbuf[(int)i - (int)j - 1];
              cbuf[i] = br.var(resn) + (int32_t)(sum >> kLpcQuant);
            }
            if (coffset != 0)
              for (uint32_t i = 0; i < blocksize; i++)
                cbuf[i] += (int32_t)coffset;
            break;
          }
        }
        if (br.overrun) return SPH_E_TRUNCATED;
        // update rolling mean (stored post-bitshift for v2)
        if (nmean > 0) {
          int64_t sum = (version < 2) ? 0 : (int64_t)blocksize / 2;
          for (uint32_t i = 0; i < blocksize; i++) sum += cbuf[i];
          for (uint32_t i = 0; i + 1 < nmean; i++) off[i] = off[i + 1];
          int64_t m = sum / (int64_t)blocksize;
          if (version >= 2) m <<= bitshift;
          off[nmean - 1] = (int32_t)m;
        }
        // wrap history
        for (int i = 0; i < nwrap; i++)
          work[chan][i] = work[chan][i + blocksize];
        // undo bitshift into output
        auto& dst = (*out_chans)[chan];
        if (bitshift > 0)
          for (uint32_t i = 0; i < blocksize; i++)
            dst.push_back(cbuf[i] << bitshift);
        else
          for (uint32_t i = 0; i < blocksize; i++) dst.push_back(cbuf[i]);
        chan = (chan + 1) % nchan;
        if (chan == 0) {
          produced += blocksize;
          if (want > 0 && produced >= want) goto done;
        }
        break;
      }
      default:
        return SPH_E_SHORTEN;
    }
  }
done:
  *out_ftype = (int)ftype;
  return SPH_OK;
}

// A shorten stream reconstructs the ORIGINAL sample values of the
// sphere payload (the embedded-shorten convention: compression is over
// the stored byte stream; the sphere-level sample_coding still applies
// afterwards, exactly as for an uncompressed file).  Map one decoded
// value to linear int16 given both the shorten internal type and the
// sphere coding.  AU2/AU3 (shorten's "lossless ulaw transform" modes)
// are not byte-transparent and are rejected rather than guessed.
int16_t shorten_sample_to_lin(int32_t v, int ftype, bool coding_ulaw,
                              bool coding_alaw, int* err) {
  if (coding_ulaw) {
    if (ftype == TYPE_U8 || ftype == TYPE_ULAW || ftype == TYPE_AU1)
      return ulaw_to_lin((uint8_t)(v & 0xff));
    *err = 1;
    return 0;
  }
  if (coding_alaw) {
    if (ftype == TYPE_U8 || ftype == TYPE_ALAW)
      return alaw_to_lin((uint8_t)(v & 0xff));
    *err = 1;
    return 0;
  }
  switch (ftype) {  // pcm coding: values are already linear
    case TYPE_S8: return (int16_t)(v << 8);
    case TYPE_U8: return (int16_t)((v - 128) << 8);
    case TYPE_S16HL: case TYPE_S16LH:
      return (int16_t)v;
    case TYPE_U16HL: case TYPE_U16LH:
      return (int16_t)(v - 0x8000);
    default:
      *err = 1;
      return 0;
  }
}

int read_file(const char* path, SphHeader* h, std::vector<uint8_t>* payload) {
  FILE* f = fopen(path, "rb");
  if (!f) return SPH_E_OPEN;
  if (!parse_header(f, h)) { fclose(f); return SPH_E_HEADER; }
  if (fseek(f, h->header_bytes, SEEK_SET) != 0) { fclose(f); return SPH_E_HEADER; }
  payload->clear();
  uint8_t buf[1 << 16];
  size_t n;
  while ((n = fread(buf, 1, sizeof buf, f)) > 0)
    payload->insert(payload->end(), buf, buf + n);
  fclose(f);
  return SPH_OK;
}

}  // namespace

extern "C" {

int sph_info(const char* path, long* sample_rate, long* channels,
             long* samples, char* coding, long coding_cap) {
  FILE* f = fopen(path, "rb");
  if (!f) return SPH_E_OPEN;
  SphHeader h;
  bool ok = parse_header(f, &h);
  fclose(f);
  if (!ok) return SPH_E_HEADER;
  *sample_rate = h.sample_rate;
  *channels = h.channel_count;
  *samples = h.sample_count;
  if (coding && coding_cap > 0) {
    strncpy(coding, h.coding.c_str(), coding_cap - 1);
    coding[coding_cap - 1] = 0;
  }
  return SPH_OK;
}

// channel: 1-based selector; 0 returns all channels interleaved.
// On success *out is malloc'd (caller frees via sph_free), *out_n set.
int sph_read(const char* path, int channel, int16_t** out, long* out_n) {
  SphHeader h;
  std::vector<uint8_t> raw;
  int rc = read_file(path, &h, &raw);
  if (rc != SPH_OK) return rc;
  if (channel < 0 || channel > h.channel_count) return SPH_E_CHANNEL;

  const bool shortened = h.coding.find("embedded-shorten") != std::string::npos;
  const bool ulaw = h.coding.compare(0, 4, "ulaw") == 0 ||
                    h.coding.compare(0, 6, "mu-law") == 0;
  const bool alaw = h.coding.compare(0, 4, "alaw") == 0;
  const bool pcm = h.coding.compare(0, 3, "pcm") == 0 || h.coding.empty();
  if (!(ulaw || alaw || pcm)) return SPH_E_CODING;

  long nch = h.channel_count;
  std::vector<int16_t> lin;  // interleaved linear samples

  if (shortened) {
    std::vector<std::vector<int32_t>> chans;
    int ftype = 0;
    rc = shorten_decode(raw.data(), raw.size(), h.sample_count, &chans,
                        &ftype);
    if (rc != SPH_OK) return rc;
    if ((long)chans.size() != nch) return SPH_E_SHORTEN;
    long n = h.sample_count;
    for (auto& c : chans)
      if ((long)c.size() < n) n = (long)c.size();
    lin.resize(n * nch);
    int err = 0;
    for (long i = 0; i < n; i++)
      for (long c = 0; c < nch; c++)
        lin[i * nch + c] =
            shorten_sample_to_lin(chans[c][i], ftype, ulaw, alaw, &err);
    if (err) return SPH_E_CODING;
  } else {
    long n_bytes = h.sample_n_bytes;
    long total = (long)(raw.size() / n_bytes);
    long n = h.sample_count > 0 && h.sample_count * nch <= total
                 ? h.sample_count * nch
                 : total;
    lin.resize(n);
    if (n_bytes == 2 && pcm) {
      const bool big = h.byte_format == "10";
      for (long i = 0; i < n; i++) {
        uint8_t b0 = raw[2 * i], b1 = raw[2 * i + 1];
        lin[i] = big ? (int16_t)((b0 << 8) | b1) : (int16_t)((b1 << 8) | b0);
      }
    } else if (n_bytes == 1 && ulaw) {
      for (long i = 0; i < n; i++) lin[i] = ulaw_to_lin(raw[i]);
    } else if (n_bytes == 1 && alaw) {
      for (long i = 0; i < n; i++) lin[i] = alaw_to_lin(raw[i]);
    } else if (n_bytes == 1 && pcm) {
      for (long i = 0; i < n; i++) lin[i] = (int16_t)((int8_t)raw[i] << 8);
    } else {
      return SPH_E_CODING;
    }
  }

  long frames = (long)(lin.size() / nch);
  if (channel == 0) {
    *out = (int16_t*)malloc(sizeof(int16_t) * lin.size());
    if (*out == nullptr) return SPH_E_ALLOC;
    memcpy(*out, lin.data(), sizeof(int16_t) * lin.size());
    *out_n = (long)lin.size();
  } else {
    *out = (int16_t*)malloc(sizeof(int16_t) * frames);
    if (*out == nullptr) return SPH_E_ALLOC;
    for (long i = 0; i < frames; i++)
      (*out)[i] = lin[i * nch + (channel - 1)];
    *out_n = frames;
  }
  return SPH_OK;
}

void sph_free(int16_t* p) { free(p); }

}  // extern "C"
