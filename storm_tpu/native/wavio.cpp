// Native WAV decode core for the data-loading hot path.
//
// The reference's host hot loop is per-item torchaudio.load in DataLoader
// worker processes (sgmse/data_module.py:80-81, SURVEY.md §3.1). This image
// has a single host core and no torchaudio; this C++ core decodes PCM WAVs
// with zero Python overhead and, because ctypes releases the GIL during the
// call, the Python thread-pool loader gets true decode parallelism.
//
// Supports RIFF/WAVE with PCM16 / PCM24 / PCM32 / IEEE float32, arbitrary
// channel counts (returns up to `max_ch` channels, interleaved -> planar).
//
// Build: g++ -O3 -shared -fPIC -o libwavio.so wavio.cpp (done lazily by
// storm_tpu/native/__init__.py and cached next to this file).

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

namespace {

struct Riff {
    FILE* f = nullptr;
    uint16_t format = 0;      // 1 = PCM, 3 = IEEE float
    uint16_t channels = 0;
    uint32_t sample_rate = 0;
    uint16_t bits = 0;
    long data_offset = 0;
    long data_bytes = 0;

    ~Riff() { if (f) fclose(f); }

    bool open(const char* path) {
        f = fopen(path, "rb");
        if (!f) return false;
        char id[4];
        uint32_t sz;
        if (fread(id, 1, 4, f) != 4 || memcmp(id, "RIFF", 4)) return false;
        if (fread(&sz, 4, 1, f) != 1) return false;
        if (fread(id, 1, 4, f) != 4 || memcmp(id, "WAVE", 4)) return false;
        // chunk walk
        while (fread(id, 1, 4, f) == 4 && fread(&sz, 4, 1, f) == 1) {
            if (!memcmp(id, "fmt ", 4)) {
                uint8_t buf[16];
                if (sz < 16 || fread(buf, 1, 16, f) != 16) return false;
                memcpy(&format, buf + 0, 2);
                memcpy(&channels, buf + 2, 2);
                memcpy(&sample_rate, buf + 4, 4);
                memcpy(&bits, buf + 14, 2);
                if (sz > 16) fseek(f, sz - 16, SEEK_CUR);
            } else if (!memcmp(id, "data", 4)) {
                data_offset = ftell(f);
                data_bytes = (long)sz;
                return format != 0;
            } else {
                fseek(f, sz + (sz & 1), SEEK_CUR);
            }
        }
        return false;
    }

    long frames() const {
        int bytes_per = bits / 8;
        if (!bytes_per || !channels) return 0;
        return data_bytes / (bytes_per * channels);
    }
};

inline float cvt16(const uint8_t* p) {
    int16_t v;
    memcpy(&v, p, 2);
    return (float)v / 32768.0f;
}
inline float cvt24(const uint8_t* p) {
    int32_t v = (int32_t)((uint32_t)p[0] << 8 | (uint32_t)p[1] << 16 |
                          (uint32_t)p[2] << 24) >> 8;
    return (float)v / 8388608.0f;
}
inline float cvt32i(const uint8_t* p) {
    int32_t v;
    memcpy(&v, p, 4);
    return (float)v / 2147483648.0f;
}
inline float cvt32f(const uint8_t* p) {
    float v;
    memcpy(&v, p, 4);
    return v;
}

}  // namespace

extern "C" {

// Probe a WAV file. Returns 0 on success.
int wav_info(const char* path, int* sample_rate, int* channels,
             long* n_frames) {
    Riff r;
    if (!r.open(path)) return -1;
    *sample_rate = (int)r.sample_rate;
    *channels = (int)r.channels;
    *n_frames = r.frames();
    return 0;
}

// Decode up to `max_ch` channels into planar float32 `out`
// (shape [max_ch, n_frames_requested]); frames beyond the file are
// zero-filled. Also writes max(|x|) over ALL decoded samples of channel 0..
// max_ch to *absmax (the reference normalizes by the noisy max of the full
// file, sgmse/data_module.py:92). Returns frames decoded or -1.
long wav_read(const char* path, float* out, long max_frames, int max_ch,
              float* absmax) {
    Riff r;
    if (!r.open(path)) return -1;
    const int bytes_per = r.bits / 8;
    const int ch = r.channels;
    const long frames_in_file = r.frames();
    const long n = frames_in_file < max_frames ? frames_in_file : max_frames;
    const int out_ch = max_ch < ch ? max_ch : ch;

    float (*cvt)(const uint8_t*) = nullptr;
    if (r.format == 1 && r.bits == 16) cvt = cvt16;
    else if (r.format == 1 && r.bits == 24) cvt = cvt24;
    else if (r.format == 1 && r.bits == 32) cvt = cvt32i;
    else if (r.format == 3 && r.bits == 32) cvt = cvt32f;
    else return -1;

    fseek(r.f, r.data_offset, SEEK_SET);
    const long stride = (long)bytes_per * ch;
    std::vector<uint8_t> buf((size_t)(stride * 4096));
    float amax = 0.0f;
    long done = 0;
    // zero everything first (handles padding region)
    memset(out, 0, sizeof(float) * (size_t)max_frames * out_ch);
    while (done < n) {
        long want = n - done < 4096 ? n - done : 4096;
        size_t got = fread(buf.data(), (size_t)stride, (size_t)want, r.f);
        if (got == 0) break;
        for (size_t i = 0; i < got; ++i) {
            const uint8_t* fr = buf.data() + i * stride;
            for (int c = 0; c < out_ch; ++c) {
                float v = cvt(fr + (size_t)c * bytes_per);
                out[(size_t)c * max_frames + done + (long)i] = v;
                float a = v < 0 ? -v : v;
                if (a > amax) amax = a;
            }
        }
        done += (long)got;
    }
    if (absmax) *absmax = amax;
    return done;
}

}  // extern "C"
