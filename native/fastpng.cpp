// Minimal fast PNG encoder for RGB8 images.
//
// The figure pipeline's largest host cost is PNG encoding: PIL runs
// adaptive per-scanline filtering plus zlib level-N on a single core.
// This encoder writes PNGs with a fixed filter strategy (Up, which
// compresses spectrogram tiles nearly as well as adaptive at a fraction
// of the filtering cost) and a caller-chosen zlib level.  Exposed via
// ctypes; the Python wrapper releases the GIL for the whole call so
// batch-driver worker threads overlap encode with device readback.
//
// PNG container: 8-byte signature, IHDR, one IDAT (zlib stream), IEND.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

// libdeflate compresses a whole buffer ~2-3x faster than zlib at the same
// ratio; the build tries it first (-DFASTPNG_USE_LIBDEFLATE -ldeflate) and
// falls back to plain zlib when the library is absent.
#ifdef FASTPNG_USE_LIBDEFLATE
#include <libdeflate.h>
#else
#include <zlib.h>
#endif

namespace {

uint32_t crc_table_once[256];
bool crc_ready = false;

void init_crc() {
    if (crc_ready) return;
    for (uint32_t n = 0; n < 256; ++n) {
        uint32_t c = n;
        for (int k = 0; k < 8; ++k) c = (c & 1) ? 0xEDB88320u ^ (c >> 1) : c >> 1;
        crc_table_once[n] = c;
    }
    crc_ready = true;
}

uint32_t crc32_of(const uint8_t* a, size_t n, uint32_t crc = 0xFFFFFFFFu) {
    init_crc();
    for (size_t i = 0; i < n; ++i) crc = crc_table_once[(crc ^ a[i]) & 0xFF] ^ (crc >> 8);
    return crc;
}

void put_be32(std::vector<uint8_t>& v, uint32_t x) {
    v.push_back(uint8_t(x >> 24));
    v.push_back(uint8_t(x >> 16));
    v.push_back(uint8_t(x >> 8));
    v.push_back(uint8_t(x));
}

void chunk(std::vector<uint8_t>& out, const char type[4], const uint8_t* data, size_t n) {
    put_be32(out, uint32_t(n));
    size_t start = out.size();
    out.insert(out.end(), type, type + 4);
    out.insert(out.end(), data, data + n);
#ifdef FASTPNG_USE_LIBDEFLATE
    uint32_t crc = libdeflate_crc32(0, out.data() + start, out.size() - start);
#else
    uint32_t crc = crc32_of(out.data() + start, out.size() - start) ^ 0xFFFFFFFFu;
#endif
    put_be32(out, crc);
}

}  // namespace

extern "C" int fastpng_write_v2(
    const uint8_t* px,    // h*w*channels bytes, row-major
    int32_t w,
    int32_t h,
    int32_t channels,     // 3 (RGB) or 4 (RGBA; alpha dropped -- output is RGB)
    int32_t zlevel,
    const char* path
) {
    if (w <= 0 || h <= 0 || px == nullptr || path == nullptr) return -1;
    if (channels != 3 && channels != 4) return -1;
    const size_t stride = size_t(w) * 3;           // output scanline bytes
    const size_t in_stride = size_t(w) * size_t(channels);

    // Filtered scanlines: filter byte 2 ("Up") per row; row 0 uses "None".
    // RGBA input is repacked to RGB rows on the fly (one small row buffer),
    // which lets callers hand over a shared RGBA canvas with zero copies.
    //
    // Buffers are thread_local and grow-only: a fresh ~17 MB allocation per
    // call page-faults its way through the filter loop (measured 3x the
    // steady-state encode time on first touch), while reuse keeps the pages
    // warm across a batch.  Cost: up to ~40 MB retained per encoding thread.
    static thread_local std::vector<uint8_t> raw;
    raw.resize(size_t(h) * (stride + 1));
    static thread_local std::vector<uint8_t> rowbuf;
    rowbuf.resize(channels == 4 ? stride * 2 : 0);
    {
        uint8_t* dst = raw.data();
        const uint8_t* prev = nullptr;
        uint8_t* cur_rgb = rowbuf.data();
        uint8_t* prev_rgb = rowbuf.data() + stride;
        for (int32_t y = 0; y < h; ++y) {
            const uint8_t* src;
            if (channels == 3) {
                src = px + size_t(y) * in_stride;
            } else {
                const uint8_t* in = px + size_t(y) * in_stride;
                for (int32_t x = 0; x < w; ++x) {
                    cur_rgb[size_t(x) * 3 + 0] = in[size_t(x) * 4 + 0];
                    cur_rgb[size_t(x) * 3 + 1] = in[size_t(x) * 4 + 1];
                    cur_rgb[size_t(x) * 3 + 2] = in[size_t(x) * 4 + 2];
                }
                src = cur_rgb;
            }
            if (prev == nullptr) {
                *dst++ = 0;  // None
                std::memcpy(dst, src, stride);
                dst += stride;
            } else {
                *dst++ = 2;  // Up
                for (size_t x = 0; x < stride; ++x) dst[x] = uint8_t(src[x] - prev[x]);
                dst += stride;
            }
            if (channels == 3) {
                prev = src;
            } else {
                std::swap(cur_rgb, prev_rgb);
                prev = prev_rgb;
            }
        }
    }

#ifdef FASTPNG_USE_LIBDEFLATE
    int lvl = zlevel < 1 ? 1 : (zlevel > 12 ? 12 : zlevel);
    libdeflate_compressor* comp = libdeflate_alloc_compressor(lvl);
    if (comp == nullptr) return -2;
    size_t cap = libdeflate_zlib_compress_bound(comp, raw.size());
    static thread_local std::vector<uint8_t> zdata;
    zdata.resize(cap);
    size_t zn = libdeflate_zlib_compress(comp, raw.data(), raw.size(), zdata.data(), cap);
    libdeflate_free_compressor(comp);
    if (zn == 0) return -2;
    zdata.resize(zn);
#else
    uLongf bound = compressBound(uLong(raw.size()));
    std::vector<uint8_t> zdata(bound);
    if (compress2(zdata.data(), &bound, raw.data(), uLong(raw.size()),
                  zlevel < 1 ? 1 : (zlevel > 9 ? 9 : zlevel)) != Z_OK) {
        return -2;
    }
    zdata.resize(bound);
#endif

    std::vector<uint8_t> out;
    out.reserve(zdata.size() + 128);
    static const uint8_t sig[8] = {137, 80, 78, 71, 13, 10, 26, 10};
    out.insert(out.end(), sig, sig + 8);

    uint8_t ihdr[13];
    ihdr[0] = uint8_t(uint32_t(w) >> 24); ihdr[1] = uint8_t(uint32_t(w) >> 16);
    ihdr[2] = uint8_t(uint32_t(w) >> 8);  ihdr[3] = uint8_t(w);
    ihdr[4] = uint8_t(uint32_t(h) >> 24); ihdr[5] = uint8_t(uint32_t(h) >> 16);
    ihdr[6] = uint8_t(uint32_t(h) >> 8);  ihdr[7] = uint8_t(h);
    ihdr[8] = 8;   // bit depth
    ihdr[9] = 2;   // color type: truecolor RGB
    ihdr[10] = 0;  // compression
    ihdr[11] = 0;  // filter method
    ihdr[12] = 0;  // no interlace
    chunk(out, "IHDR", ihdr, 13);
    chunk(out, "IDAT", zdata.data(), zdata.size());
    chunk(out, "IEND", nullptr, 0);

    FILE* f = std::fopen(path, "wb");
    if (!f) return -3;
    size_t written = std::fwrite(out.data(), 1, out.size(), f);
    std::fclose(f);
    return written == out.size() ? 0 : -4;
}

extern "C" int fastpng_write_rgb(
    const uint8_t* rgb, int32_t w, int32_t h, int32_t zlevel, const char* path
) {
    return fastpng_write_v2(rgb, w, h, 3, zlevel, path);
}
