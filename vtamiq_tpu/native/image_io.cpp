// Native image decode + preprocessing for the vtamiq_tpu input pipeline.
//
// The host-side hot loop of IQA training is image decode (SURVEY.md §3 hot
// loops rank #4: "image decode (PIL/cv2)"); the reference spends it in
// Python DataLoader workers. This library decodes BMP (hand-rolled,
// TID/LIVE/PIPAL/KADIS are BMP), JPEG (libjpeg) and PNG (libpng) straight
// into caller-provided float32 HWC buffers with fused flip + normalize, and
// offers a pthread batch decoder so a multi-core host overlaps decode with
// TPU compute.
//
// C ABI (ctypes-friendly):
//   vtamiq_image_size(path, &h, &w)                  -> 0 on success
//   vtamiq_decode_rgb_f32(path, out, h, w, hflip, vflip, mean3, std3) -> 0
//   vtamiq_decode_batch(paths, n, outs, hs, ws, hflip, vflip, mean3, std3,
//                       num_threads)                 -> number of failures
//
// Build: see vtamiq_tpu/native/build.py (g++ -O3 -shared -fPIC, links
// -ljpeg -lpng -lz -lpthread).

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <atomic>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <png.h>
#include <csetjmp>

namespace {

enum class Format { UNKNOWN, BMP, JPEG, PNG };

Format sniff_format(FILE* f) {
    unsigned char magic[8] = {0};
    size_t n = fread(magic, 1, 8, f);
    rewind(f);
    if (n >= 2 && magic[0] == 'B' && magic[1] == 'M') return Format::BMP;
    if (n >= 3 && magic[0] == 0xFF && magic[1] == 0xD8 && magic[2] == 0xFF)
        return Format::JPEG;
    if (n >= 8 && png_sig_cmp(magic, 0, 8) == 0) return Format::PNG;
    return Format::UNKNOWN;
}

uint32_t rd_u32(const unsigned char* p) {
    return (uint32_t)p[0] | ((uint32_t)p[1] << 8) | ((uint32_t)p[2] << 16) |
           ((uint32_t)p[3] << 24);
}
int32_t rd_i32(const unsigned char* p) { return (int32_t)rd_u32(p); }
uint16_t rd_u16(const unsigned char* p) {
    return (uint16_t)p[0] | ((uint16_t)p[1] << 8);
}

// ---------------------------------------------------------------------------
// BMP: uncompressed 24/32-bit (+ 8-bit palette), bottom-up or top-down
// ---------------------------------------------------------------------------

struct BmpInfo {
    int width = 0, height = 0, bpp = 0;
    bool top_down = false;
    uint32_t data_offset = 0;
    uint32_t palette_offset = 0;
    uint32_t palette_count = 0;
};

bool bmp_read_info(FILE* f, BmpInfo* info) {
    unsigned char header[54];
    if (fread(header, 1, 54, f) != 54) return false;
    if (header[0] != 'B' || header[1] != 'M') return false;
    info->data_offset = rd_u32(header + 10);
    uint32_t dib_size = rd_u32(header + 14);
    if (dib_size < 40) return false;  // BITMAPINFOHEADER+
    info->width = rd_i32(header + 18);
    int32_t h = rd_i32(header + 22);
    info->top_down = h < 0;
    info->height = info->top_down ? -h : h;
    info->bpp = rd_u16(header + 28);
    uint32_t compression = rd_u32(header + 30);
    if (compression != 0) return false;  // only BI_RGB
    info->palette_count = rd_u32(header + 46);
    if (info->bpp == 8 && info->palette_count == 0) info->palette_count = 256;
    info->palette_offset = 14 + dib_size;
    return info->width > 0 && info->height > 0 &&
           (info->bpp == 24 || info->bpp == 32 || info->bpp == 8);
}

bool bmp_decode(FILE* f, const BmpInfo& info, unsigned char* rgb /*h*w*3*/) {
    const int w = info.width, h = info.height;
    const int channels = info.bpp / 8;
    const size_t row_size = ((size_t)w * channels + 3) & ~size_t(3);

    std::vector<unsigned char> palette;
    if (info.bpp == 8) {
        palette.resize(info.palette_count * 4);
        if (fseek(f, info.palette_offset, SEEK_SET) != 0) return false;
        if (fread(palette.data(), 1, palette.size(), f) != palette.size())
            return false;
    }

    if (fseek(f, info.data_offset, SEEK_SET) != 0) return false;
    std::vector<unsigned char> row(row_size);
    for (int y = 0; y < h; y++) {
        if (fread(row.data(), 1, row_size, f) != row_size) return false;
        const int out_y = info.top_down ? y : (h - 1 - y);
        unsigned char* dst = rgb + (size_t)out_y * w * 3;
        if (info.bpp == 8) {
            for (int x = 0; x < w; x++) {
                const unsigned char* e = &palette[row[x] * 4];  // BGRA entries
                dst[x * 3 + 0] = e[2];
                dst[x * 3 + 1] = e[1];
                dst[x * 3 + 2] = e[0];
            }
        } else {
            for (int x = 0; x < w; x++) {  // BGR(A) -> RGB
                dst[x * 3 + 0] = row[x * channels + 2];
                dst[x * 3 + 1] = row[x * channels + 1];
                dst[x * 3 + 2] = row[x * channels + 0];
            }
        }
    }
    return true;
}

// ---------------------------------------------------------------------------
// JPEG via libjpeg
// ---------------------------------------------------------------------------

struct JpegErrorMgr {
    jpeg_error_mgr pub;
    jmp_buf setjmp_buffer;
};

void jpeg_error_exit(j_common_ptr cinfo) {
    JpegErrorMgr* err = reinterpret_cast<JpegErrorMgr*>(cinfo->err);
    longjmp(err->setjmp_buffer, 1);
}

bool jpeg_read_size(FILE* f, int* h, int* w) {
    jpeg_decompress_struct cinfo;
    JpegErrorMgr jerr;
    cinfo.err = jpeg_std_error(&jerr.pub);
    jerr.pub.error_exit = jpeg_error_exit;
    if (setjmp(jerr.setjmp_buffer)) {
        jpeg_destroy_decompress(&cinfo);
        return false;
    }
    jpeg_create_decompress(&cinfo);
    jpeg_stdio_src(&cinfo, f);
    jpeg_read_header(&cinfo, TRUE);
    *w = cinfo.image_width;
    *h = cinfo.image_height;
    jpeg_destroy_decompress(&cinfo);
    return true;
}

bool jpeg_decode(FILE* f, int h, int w, unsigned char* rgb) {
    jpeg_decompress_struct cinfo;
    JpegErrorMgr jerr;
    cinfo.err = jpeg_std_error(&jerr.pub);
    jerr.pub.error_exit = jpeg_error_exit;
    if (setjmp(jerr.setjmp_buffer)) {
        jpeg_destroy_decompress(&cinfo);
        return false;
    }
    jpeg_create_decompress(&cinfo);
    jpeg_stdio_src(&cinfo, f);
    jpeg_read_header(&cinfo, TRUE);
    cinfo.out_color_space = JCS_RGB;
    jpeg_start_decompress(&cinfo);
    if ((int)cinfo.output_width != w || (int)cinfo.output_height != h ||
        cinfo.output_components != 3) {
        jpeg_destroy_decompress(&cinfo);
        return false;
    }
    while (cinfo.output_scanline < cinfo.output_height) {
        unsigned char* rowp = rgb + (size_t)cinfo.output_scanline * w * 3;
        jpeg_read_scanlines(&cinfo, &rowp, 1);
    }
    jpeg_finish_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    return true;
}

// ---------------------------------------------------------------------------
// PNG via libpng
// ---------------------------------------------------------------------------

bool png_read_size(FILE* f, int* h, int* w) {
    png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr,
                                             nullptr, nullptr);
    if (!png) return false;
    png_infop info = png_create_info_struct(png);
    if (!info || setjmp(png_jmpbuf(png))) {
        png_destroy_read_struct(&png, &info, nullptr);
        return false;
    }
    png_init_io(png, f);
    png_read_info(png, info);
    *w = png_get_image_width(png, info);
    *h = png_get_image_height(png, info);
    png_destroy_read_struct(&png, &info, nullptr);
    return true;
}

bool png_decode(FILE* f, int h, int w, unsigned char* rgb) {
    png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr,
                                             nullptr, nullptr);
    if (!png) return false;
    png_infop info = png_create_info_struct(png);
    if (!info || setjmp(png_jmpbuf(png))) {
        png_destroy_read_struct(&png, &info, nullptr);
        return false;
    }
    png_init_io(png, f);
    png_read_info(png, info);
    if ((int)png_get_image_width(png, info) != w ||
        (int)png_get_image_height(png, info) != h) {
        png_destroy_read_struct(&png, &info, nullptr);
        return false;
    }
    // normalize everything to 8-bit RGB
    png_byte color_type = png_get_color_type(png, info);
    png_byte bit_depth = png_get_bit_depth(png, info);
    if (bit_depth == 16) png_set_strip_16(png);
    if (color_type == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
    if (color_type == PNG_COLOR_TYPE_GRAY && bit_depth < 8)
        png_set_expand_gray_1_2_4_to_8(png);
    if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
    if (color_type == PNG_COLOR_TYPE_GRAY ||
        color_type == PNG_COLOR_TYPE_GRAY_ALPHA)
        png_set_gray_to_rgb(png);
    if (color_type & PNG_COLOR_MASK_ALPHA ||
        png_get_valid(png, info, PNG_INFO_tRNS))
        png_set_strip_alpha(png);
    png_read_update_info(png, info);
    if (png_get_rowbytes(png, info) != (size_t)w * 3) {
        png_destroy_read_struct(&png, &info, nullptr);
        return false;
    }
    std::vector<png_bytep> rows(h);
    for (int y = 0; y < h; y++) rows[y] = rgb + (size_t)y * w * 3;
    png_read_image(png, rows.data());
    png_destroy_read_struct(&png, &info, nullptr);
    return true;
}

// ---------------------------------------------------------------------------
// shared: decode to uint8 RGB, then fused flip + [0,1] scale + normalize
// ---------------------------------------------------------------------------

bool decode_rgb_u8(const char* path, int h, int w, unsigned char* rgb) {
    FILE* f = fopen(path, "rb");
    if (!f) return false;
    Format fmt = sniff_format(f);
    bool ok = false;
    if (fmt == Format::BMP) {
        BmpInfo info;
        ok = bmp_read_info(f, &info) && info.width == w && info.height == h &&
             bmp_decode(f, info, rgb);
    } else if (fmt == Format::JPEG) {
        ok = jpeg_decode(f, h, w, rgb);
    } else if (fmt == Format::PNG) {
        ok = png_decode(f, h, w, rgb);
    }
    fclose(f);
    return ok;
}

void postprocess(const unsigned char* rgb, float* out, int h, int w,
                 int hflip, int vflip, const float* mean, const float* std) {
    const float inv255 = 1.0f / 255.0f;
    float scale[3], bias[3];
    for (int c = 0; c < 3; c++) {
        const float s = std ? std[c] : 1.0f;
        const float m = mean ? mean[c] : 0.0f;
        scale[c] = inv255 / s;
        bias[c] = -m / s;
    }
    for (int y = 0; y < h; y++) {
        const int src_y = vflip ? (h - 1 - y) : y;
        const unsigned char* src_row = rgb + (size_t)src_y * w * 3;
        float* dst_row = out + (size_t)y * w * 3;
        for (int x = 0; x < w; x++) {
            const int src_x = hflip ? (w - 1 - x) : x;
            const unsigned char* px = src_row + (size_t)src_x * 3;
            dst_row[x * 3 + 0] = px[0] * scale[0] + bias[0];
            dst_row[x * 3 + 1] = px[1] * scale[1] + bias[1];
            dst_row[x * 3 + 2] = px[2] * scale[2] + bias[2];
        }
    }
}

}  // namespace

extern "C" {

// Query image dimensions. Returns 0 on success.
int vtamiq_image_size(const char* path, int* h, int* w) {
    FILE* f = fopen(path, "rb");
    if (!f) return 1;
    Format fmt = sniff_format(f);
    bool ok = false;
    if (fmt == Format::BMP) {
        BmpInfo info;
        ok = bmp_read_info(f, &info);
        if (ok) { *h = info.height; *w = info.width; }
    } else if (fmt == Format::JPEG) {
        ok = jpeg_read_size(f, h, w);
    } else if (fmt == Format::PNG) {
        ok = png_read_size(f, h, w);
    }
    fclose(f);
    return ok ? 0 : 2;
}

// Decode into caller-allocated float32 HWC buffer of exactly (h, w, 3),
// with optional flips and per-channel normalization ((x - mean) / std; pass
// NULL for raw [0,1]). Returns 0 on success.
int vtamiq_decode_rgb_f32(const char* path, float* out, int h, int w,
                          int hflip, int vflip,
                          const float* mean, const float* std_) {
    std::vector<unsigned char> rgb((size_t)h * w * 3);
    if (!decode_rgb_u8(path, h, w, rgb.data())) return 1;
    postprocess(rgb.data(), out, h, w, hflip, vflip, mean, std_);
    return 0;
}

// Decode a batch in parallel. outs[i] must be preallocated (hs[i]*ws[i]*3)
// float32. Returns the number of failed decodes (0 = all good).
int vtamiq_decode_batch(const char** paths, int n, float** outs,
                        const int* hs, const int* ws,
                        const int* hflips, const int* vflips,
                        const float* mean, const float* std_,
                        int num_threads) {
    if (num_threads < 1) num_threads = 1;
    if (num_threads > n) num_threads = n;
    std::atomic<int> next(0), failures(0);
    auto worker = [&]() {
        for (;;) {
            const int i = next.fetch_add(1);
            if (i >= n) break;
            if (vtamiq_decode_rgb_f32(paths[i], outs[i], hs[i], ws[i],
                                      hflips ? hflips[i] : 0,
                                      vflips ? vflips[i] : 0, mean, std_) != 0)
                failures.fetch_add(1);
        }
    };
    if (num_threads == 1) {
        worker();
    } else {
        std::vector<std::thread> threads;
        for (int t = 0; t < num_threads; t++) threads.emplace_back(worker);
        for (auto& t : threads) t.join();
    }
    return failures.load();
}

}  // extern "C"
