// Native JPEG decode + crop + bilinear resize for the image dataset path.
//
// TPU-native analog of the reference's stb_image decode inside
// ImageDataset (tools/train/source/datasets/ImageDataset.cpp:119-199 —
// decode, fractional crop of the ORIGINAL image, resize). Runs in the
// loader's worker threads so the Python side never touches pixels; linked
// against the system libjpeg. C ABI for ctypes (no pybind11 in this
// image).
//
// Contract mirrors the Python fallback in mandheling_tpu/data/image.py:
// RGB8 in, fractional center/pinned crop, bilinear resize with
// half-pixel-free corner mapping identical to PIL's BILINEAR for
// upscales/downscales within 1 ULP-ish tolerance (exactness is not
// required: both feed the same float normalize).

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>

#include <algorithm>
#include <cmath>
#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

extern "C" {

struct MndErr {
    jpeg_error_mgr mgr;
    jmp_buf jb;
};

static void mnd_jpeg_fail(j_common_ptr cinfo) {
    MndErr* e = reinterpret_cast<MndErr*>(cinfo->err);
    longjmp(e->jb, 1);
}

// Decode a JPEG file to RGB8. Returns 0 on success; *out is malloc'd
// (h*w*3), caller frees with mnd_free.
int mnd_decode_jpeg(const char* path, uint8_t** out, int* out_h, int* out_w) {
    FILE* f = fopen(path, "rb");
    if (!f) return -1;
    jpeg_decompress_struct cinfo;
    MndErr err;
    cinfo.err = jpeg_std_error(&err.mgr);
    err.mgr.error_exit = mnd_jpeg_fail;
    uint8_t* buf = nullptr;
    if (setjmp(err.jb)) {
        jpeg_destroy_decompress(&cinfo);
        fclose(f);
        free(buf);
        return -2;
    }
    jpeg_create_decompress(&cinfo);
    jpeg_stdio_src(&cinfo, f);
    jpeg_read_header(&cinfo, TRUE);
    cinfo.out_color_space = JCS_RGB;
    jpeg_start_decompress(&cinfo);
    const int h = cinfo.output_height, w = cinfo.output_width;
    buf = static_cast<uint8_t*>(malloc(size_t(h) * w * 3));
    if (!buf) {
        jpeg_destroy_decompress(&cinfo);
        fclose(f);
        return -3;
    }
    while (cinfo.output_scanline < cinfo.output_height) {
        uint8_t* row = buf + size_t(cinfo.output_scanline) * w * 3;
        jpeg_read_scanlines(&cinfo, &row, 1);
    }
    jpeg_finish_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    *out = buf;
    *out_h = h;
    *out_w = w;
    return 0;
}

void mnd_free(void* p) { free(p); }

// Bilinear resize RGB8 (in_h, in_w) -> (out_h, out_w) into caller buffer.
void mnd_resize_bilinear(const uint8_t* src, int in_h, int in_w,
                         uint8_t* dst, int out_h, int out_w) {
    const double sy = out_h > 1 ? double(in_h - 1) / (out_h - 1) : 0.0;
    const double sx = out_w > 1 ? double(in_w - 1) / (out_w - 1) : 0.0;
    for (int y = 0; y < out_h; ++y) {
        const double fy = y * sy;
        const int y0 = std::min(int(fy), in_h - 1);
        const int y1 = std::min(y0 + 1, in_h - 1);
        const double wy = fy - y0;
        for (int x = 0; x < out_w; ++x) {
            const double fx = x * sx;
            const int x0 = std::min(int(fx), in_w - 1);
            const int x1 = std::min(x0 + 1, in_w - 1);
            const double wx = fx - x0;
            for (int c = 0; c < 3; ++c) {
                const double p00 = src[(size_t(y0) * in_w + x0) * 3 + c];
                const double p01 = src[(size_t(y0) * in_w + x1) * 3 + c];
                const double p10 = src[(size_t(y1) * in_w + x0) * 3 + c];
                const double p11 = src[(size_t(y1) * in_w + x1) * 3 + c];
                const double v = p00 * (1 - wy) * (1 - wx) +
                                 p01 * (1 - wy) * wx +
                                 p10 * wy * (1 - wx) + p11 * wy * wx;
                dst[(size_t(y) * out_w + x) * 3 + c] =
                    uint8_t(std::lround(std::min(255.0, std::max(0.0, v))));
            }
        }
    }
}

// Full dataset transform: decode -> fractional crop (center, or pinned at
// (crop_y0, crop_x0) when >= 0 for the loader's seeded random crop) ->
// bilinear resize into out (out_h * out_w * 3 RGB8).
// Returns 0 on success, negative jpeg errors from mnd_decode_jpeg.
int mnd_load_image(const char* path, int out_h, int out_w,
                   double crop_frac_h, double crop_frac_w,
                   int crop_y0, int crop_x0, uint8_t* out) {
    uint8_t* img = nullptr;
    int h = 0, w = 0;
    const int rc = mnd_decode_jpeg(path, &img, &h, &w);
    if (rc != 0) return rc;
    int hc = h, wc = w, y0 = 0, x0 = 0;
    if (crop_frac_h < 1.0 || crop_frac_w < 1.0) {
        hc = std::max(1, int(h * crop_frac_h));
        wc = std::max(1, int(w * crop_frac_w));
        y0 = crop_y0 >= 0 ? std::min(crop_y0, h - hc) : (h - hc) / 2;
        x0 = crop_x0 >= 0 ? std::min(crop_x0, w - wc) : (w - wc) / 2;
    }
    std::vector<uint8_t> crop(size_t(hc) * wc * 3);
    for (int y = 0; y < hc; ++y) {
        memcpy(crop.data() + size_t(y) * wc * 3,
               img + (size_t(y0 + y) * w + x0) * 3, size_t(wc) * 3);
    }
    free(img);
    mnd_resize_bilinear(crop.data(), hc, wc, out, out_h, out_w);
    return 0;
}

}  // extern "C"
