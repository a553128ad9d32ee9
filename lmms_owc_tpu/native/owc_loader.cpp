// Native image loader: JPEG decode + antialiased bicubic resize to uint8 CHW.
//
// Replaces PIL in the hot preprocessing path (the reference decodes and resizes
// every sample with PIL on the Python side at batch_size=1). Exposed through ctypes;
// calls release the GIL, so decoding overlaps TPU compute even on a single core and
// scales across cores via a Python ThreadPoolExecutor.
//
// The resize implements the PIL convention: separable convolution with the bicubic
// kernel (a = -0.5), kernel support scaled by the downscale factor (antialiasing),
// per-output-pixel weight normalization — numerically within rounding of
// PIL.Image.resize(..., BICUBIC).
//
// Build: g++ -O3 -march=native -shared -fPIC owc_loader.cpp -o libowcloader.so -ljpeg

#include <algorithm>
#include <cmath>
#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

#include <jpeglib.h>

namespace {

struct ErrorMgr {
    jpeg_error_mgr pub;
    jmp_buf setjmp_buffer;
};

void error_exit(j_common_ptr cinfo) {
    ErrorMgr* err = reinterpret_cast<ErrorMgr*>(cinfo->err);
    longjmp(err->setjmp_buffer, 1);
}

inline double bicubic_filter(double x) {
    // PIL's bicubic: a = -0.5 (Catmull-Rom family).
    constexpr double a = -0.5;
    x = std::fabs(x);
    if (x < 1.0) return ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0;
    if (x < 2.0) return (((x - 5.0) * x + 8.0) * x - 4.0) * a;
    return 0.0;
}

// Precompute per-output-pixel taps for one axis (PIL precompute_coeffs).
struct AxisTaps {
    int ksize;
    std::vector<int> bounds;       // [out] start index
    std::vector<double> weights;   // [out * ksize]
};

AxisTaps compute_taps(int in_size, int out_size) {
    AxisTaps taps;
    double scale = static_cast<double>(in_size) / out_size;
    double filterscale = std::max(scale, 1.0);
    double support = 2.0 * filterscale;  // bicubic support = 2
    taps.ksize = static_cast<int>(std::ceil(support)) * 2 + 1;
    taps.bounds.resize(out_size);
    taps.weights.assign(static_cast<size_t>(out_size) * taps.ksize, 0.0);

    for (int xx = 0; xx < out_size; ++xx) {
        double center = (xx + 0.5) * scale;
        int xmin = static_cast<int>(std::max(0.0, std::floor(center - support)));
        int xmax = static_cast<int>(std::min(static_cast<double>(in_size), std::ceil(center + support)));
        double total = 0.0;
        double* w = &taps.weights[static_cast<size_t>(xx) * taps.ksize];
        for (int x = xmin; x < xmax; ++x) {
            double weight = bicubic_filter((x + 0.5 - center) / filterscale);
            w[x - xmin] = weight;
            total += weight;
        }
        if (total != 0.0) {
            for (int x = 0; x < xmax - xmin; ++x) w[x] /= total;
        }
        taps.bounds[xx] = xmin;
    }
    return taps;
}

inline uint8_t clip8(double v) {
    return static_cast<uint8_t>(std::min(255.0, std::max(0.0, std::round(v))));
}

// Separable resize HWC uint8 -> HWC uint8.
void resize_bicubic(const uint8_t* src, int in_h, int in_w, int channels,
                    uint8_t* dst, int out_h, int out_w) {
    AxisTaps xt = compute_taps(in_w, out_w);
    AxisTaps yt = compute_taps(in_h, out_h);

    // Horizontal pass into a float intermediate [in_h, out_w, C].
    std::vector<float> tmp(static_cast<size_t>(in_h) * out_w * channels);
    for (int y = 0; y < in_h; ++y) {
        const uint8_t* row = src + static_cast<size_t>(y) * in_w * channels;
        float* out_row = &tmp[static_cast<size_t>(y) * out_w * channels];
        for (int xx = 0; xx < out_w; ++xx) {
            const double* w = &xt.weights[static_cast<size_t>(xx) * xt.ksize];
            int x0 = xt.bounds[xx];
            for (int c = 0; c < channels; ++c) {
                double acc = 0.0;
                for (int k = 0; k < xt.ksize; ++k) {
                    int x = x0 + k;
                    if (x >= in_w || w[k] == 0.0) continue;
                    acc += row[static_cast<size_t>(x) * channels + c] * w[k];
                }
                out_row[static_cast<size_t>(xx) * channels + c] = static_cast<float>(acc);
            }
        }
    }

    // Vertical pass to the output [out_h, out_w, C].
    for (int yy = 0; yy < out_h; ++yy) {
        const double* w = &yt.weights[static_cast<size_t>(yy) * yt.ksize];
        int y0 = yt.bounds[yy];
        uint8_t* out_row = dst + static_cast<size_t>(yy) * out_w * channels;
        for (int xx = 0; xx < out_w; ++xx) {
            for (int c = 0; c < channels; ++c) {
                double acc = 0.0;
                for (int k = 0; k < yt.ksize; ++k) {
                    int y = y0 + k;
                    if (y >= in_h || w[k] == 0.0) continue;
                    acc += tmp[(static_cast<size_t>(y) * out_w + xx) * channels + c] * w[k];
                }
                out_row[static_cast<size_t>(xx) * channels + c] = clip8(acc);
            }
        }
    }
}

}  // namespace

extern "C" {

// Decode a JPEG from memory. Returns 0 on success. Fills (*h, *w); writes RGB HWC
// pixels into out (caller-allocated, max_bytes capacity). If out is null, only
// reports dimensions.
int owc_jpeg_dims(const uint8_t* data, size_t len, int* h, int* w) {
    jpeg_decompress_struct cinfo;
    ErrorMgr jerr;
    cinfo.err = jpeg_std_error(&jerr.pub);
    jerr.pub.error_exit = error_exit;
    if (setjmp(jerr.setjmp_buffer)) {
        jpeg_destroy_decompress(&cinfo);
        return 1;
    }
    jpeg_create_decompress(&cinfo);
    jpeg_mem_src(&cinfo, data, len);
    jpeg_read_header(&cinfo, TRUE);
    *h = cinfo.image_height;
    *w = cinfo.image_width;
    jpeg_destroy_decompress(&cinfo);
    return 0;
}

// Decode + resize in one call: JPEG bytes -> uint8 CHW [3, out_h, out_w].
int owc_decode_resize_jpeg(const uint8_t* data, size_t len, int out_h, int out_w,
                           uint8_t* out_chw) {
    jpeg_decompress_struct cinfo;
    ErrorMgr jerr;
    cinfo.err = jpeg_std_error(&jerr.pub);
    jerr.pub.error_exit = error_exit;
    if (setjmp(jerr.setjmp_buffer)) {
        jpeg_destroy_decompress(&cinfo);
        return 1;
    }
    jpeg_create_decompress(&cinfo);
    jpeg_mem_src(&cinfo, data, len);
    jpeg_read_header(&cinfo, TRUE);
    cinfo.out_color_space = JCS_RGB;
    jpeg_start_decompress(&cinfo);

    const int in_h = cinfo.output_height;
    const int in_w = cinfo.output_width;
    std::vector<uint8_t> hwc(static_cast<size_t>(in_h) * in_w * 3);
    while (cinfo.output_scanline < cinfo.output_height) {
        uint8_t* rowp = &hwc[static_cast<size_t>(cinfo.output_scanline) * in_w * 3];
        jpeg_read_scanlines(&cinfo, &rowp, 1);
    }
    jpeg_finish_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);

    std::vector<uint8_t> resized(static_cast<size_t>(out_h) * out_w * 3);
    resize_bicubic(hwc.data(), in_h, in_w, 3, resized.data(), out_h, out_w);

    // HWC -> CHW.
    for (int c = 0; c < 3; ++c) {
        uint8_t* plane = out_chw + static_cast<size_t>(c) * out_h * out_w;
        for (int y = 0; y < out_h; ++y) {
            const uint8_t* row = &resized[static_cast<size_t>(y) * out_w * 3];
            for (int x = 0; x < out_w; ++x) {
                plane[static_cast<size_t>(y) * out_w + x] = row[static_cast<size_t>(x) * 3 + c];
            }
        }
    }
    return 0;
}

// Resize raw uint8 HWC pixels (any channel count) -> uint8 CHW.
int owc_resize_u8(const uint8_t* src_hwc, int in_h, int in_w, int channels,
                  int out_h, int out_w, uint8_t* out_chw) {
    std::vector<uint8_t> resized(static_cast<size_t>(out_h) * out_w * channels);
    resize_bicubic(src_hwc, in_h, in_w, channels, resized.data(), out_h, out_w);
    for (int c = 0; c < channels; ++c) {
        uint8_t* plane = out_chw + static_cast<size_t>(c) * out_h * out_w;
        for (int y = 0; y < out_h; ++y) {
            for (int x = 0; x < out_w; ++x) {
                plane[static_cast<size_t>(y) * out_w + x] =
                    resized[(static_cast<size_t>(y) * out_w + x) * channels + c];
            }
        }
    }
    return 0;
}

}  // extern "C"
