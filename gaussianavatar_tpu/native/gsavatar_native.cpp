// gsavatar_native — C++ runtime components for gaussianavatar-tpu.
//
// The reference leans on native code for everything around its compute path
// (CUDA rasterizer, GL preprocessing, C-backed image IO). The TPU compute
// path here is Pallas/XLA; this library provides the native *runtime* pieces:
//
//   1. image decode (libpng/libjpeg) + mask thresholding + white-background
//      compositing + float32 CHW conversion — the per-item hot path of the
//      training data loader (reference: PIL + numpy per frame),
//   2. a multithreaded batch loader assembling (B, 3, H, W) float batches in
//      parallel worker threads,
//   3. the UV-atlas rasterizer (barycentric coverage over the pixel grid) —
//      the offline posmap generator, ~100x the pure-numpy loop on SMPL-size
//      meshes.
//
// Exposed as a plain C ABI for ctypes (no pybind11 dependency). Build:
//   g++ -O3 -shared -fPIC gsavatar_native.cpp -o libgsavatar_native.so \
//       -lpng -ljpeg -pthread

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <csetjmp>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <png.h>

extern "C" {

// ---------------------------------------------------------------------------
// image decode
// ---------------------------------------------------------------------------

// Decode PNG or JPEG (by magic bytes) into RGB8. Returns 0 on success.
// *w/*h are outputs; out must hold w*h*3 bytes when called with out != null
// after a probe call, OR use gs_decode_image_alloc semantics below.
static int decode_png(FILE* f, std::vector<uint8_t>& rgb, int* w, int* h) {
    png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
    if (!png) return 1;
    png_infop info = png_create_info_struct(png);
    if (!info) { png_destroy_read_struct(&png, nullptr, nullptr); return 1; }
    if (setjmp(png_jmpbuf(png))) { png_destroy_read_struct(&png, &info, nullptr); return 1; }
    png_init_io(png, f);
    png_read_info(png, info);

    png_uint_32 width = png_get_image_width(png, info);
    png_uint_32 height = png_get_image_height(png, info);
    int bit_depth = png_get_bit_depth(png, info);
    int color_type = png_get_color_type(png, info);

    if (bit_depth == 16) png_set_strip_16(png);
    if (color_type == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
    if (color_type == PNG_COLOR_TYPE_GRAY && bit_depth < 8) png_set_expand_gray_1_2_4_to_8(png);
    if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
    if (color_type == PNG_COLOR_TYPE_GRAY || color_type == PNG_COLOR_TYPE_GRAY_ALPHA)
        png_set_gray_to_rgb(png);
    png_set_strip_alpha(png);
    png_read_update_info(png, info);

    rgb.resize((size_t)width * height * 3);
    std::vector<png_bytep> rows(height);
    for (png_uint_32 y = 0; y < height; ++y) rows[y] = rgb.data() + (size_t)y * width * 3;
    png_read_image(png, rows.data());
    png_destroy_read_struct(&png, &info, nullptr);
    *w = (int)width; *h = (int)height;
    return 0;
}

struct JpegErr {
    jpeg_error_mgr mgr;
    jmp_buf jb;
};

static void jpeg_err_exit(j_common_ptr cinfo) {
    JpegErr* e = (JpegErr*)cinfo->err;
    longjmp(e->jb, 1);
}

static int decode_jpeg(FILE* f, std::vector<uint8_t>& rgb, int* w, int* h) {
    jpeg_decompress_struct cinfo;
    JpegErr jerr;
    cinfo.err = jpeg_std_error(&jerr.mgr);
    jerr.mgr.error_exit = jpeg_err_exit;
    if (setjmp(jerr.jb)) { jpeg_destroy_decompress(&cinfo); return 1; }
    jpeg_create_decompress(&cinfo);
    jpeg_stdio_src(&cinfo, f);
    jpeg_read_header(&cinfo, TRUE);
    cinfo.out_color_space = JCS_RGB;
    jpeg_start_decompress(&cinfo);
    *w = cinfo.output_width; *h = cinfo.output_height;
    rgb.resize((size_t)(*w) * (*h) * 3);
    while (cinfo.output_scanline < cinfo.output_height) {
        uint8_t* row = rgb.data() + (size_t)cinfo.output_scanline * (*w) * 3;
        jpeg_read_scanlines(&cinfo, &row, 1);
    }
    jpeg_finish_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    return 0;
}

static int decode_any(const char* path, std::vector<uint8_t>& rgb, int* w, int* h) {
    FILE* f = fopen(path, "rb");
    if (!f) return 2;
    uint8_t magic[4] = {0};
    if (fread(magic, 1, 4, f) != 4) { fclose(f); return 3; }
    rewind(f);
    int rc;
    if (magic[0] == 0x89 && magic[1] == 'P') rc = decode_png(f, rgb, w, h);
    else if (magic[0] == 0xFF && magic[1] == 0xD8) rc = decode_jpeg(f, rgb, w, h);
    else rc = 4;
    fclose(f);
    return rc;
}

// Decode a grayscale-able mask file; any channel >= 128 counts as foreground.
static int decode_mask(const char* path, std::vector<uint8_t>& fg, int* w, int* h) {
    std::vector<uint8_t> rgb;
    int rc = decode_any(path, rgb, w, h);
    if (rc) return rc;
    size_t n = (size_t)(*w) * (*h);
    fg.resize(n);
    for (size_t i = 0; i < n; ++i) fg[i] = rgb[i * 3] >= 128 ? 1 : 0;
    return 0;
}

// Probe image dimensions without converting. Returns 0 on success.
int gs_image_size(const char* path, int* w, int* h) {
    std::vector<uint8_t> rgb;
    return decode_any(path, rgb, w, h);
}

// Decode image (+ optional mask: composite bg where mask=0), write float32
// CHW [0,1] into out (3*H*W floats, caller-allocated with known size).
int gs_load_frame(const char* img_path, const char* mask_path, float bg,
                  float* out, int expect_w, int expect_h) {
    std::vector<uint8_t> rgb;
    int w, h;
    int rc = decode_any(img_path, rgb, &w, &h);
    if (rc) return rc;
    if (w != expect_w || h != expect_h) return 5;

    std::vector<uint8_t> fg;
    bool masked = mask_path && mask_path[0];
    if (masked) {
        int mw, mh;
        rc = decode_mask(mask_path, fg, &mw, &mh);
        if (rc) return 10 + rc;
        if (mw != w || mh != h) return 6;
    }
    size_t n = (size_t)w * h;
    const float inv = 1.0f / 255.0f;
    for (size_t i = 0; i < n; ++i) {
        bool keep = !masked || fg[i];
        for (int c = 0; c < 3; ++c) {
            float v = keep ? rgb[i * 3 + c] * inv : bg;
            out[(size_t)c * n + i] = v;
        }
    }
    return 0;
}

// Multithreaded batch loader: decode B frames in parallel into (B,3,H,W).
// img_paths/mask_paths are arrays of B C-strings (mask_paths may be null).
// Returns 0 if every frame decoded, else the first nonzero item error code.
int gs_load_batch(const char** img_paths, const char** mask_paths, int batch,
                  float bg, float* out, int w, int h, int n_threads) {
    std::atomic<int> next(0), err(0);
    size_t frame_elems = (size_t)3 * w * h;
    auto worker = [&]() {
        while (true) {
            int i = next.fetch_add(1);
            if (i >= batch || err.load()) break;
            const char* mp = mask_paths ? mask_paths[i] : nullptr;
            int rc = gs_load_frame(img_paths[i], mp, bg, out + frame_elems * i, w, h);
            if (rc) err.store(rc);
        }
    };
    int nt = std::max(1, std::min(n_threads, batch));
    std::vector<std::thread> threads;
    for (int t = 0; t < nt; ++t) threads.emplace_back(worker);
    for (auto& t : threads) t.join();
    return err.load();
}

// ---------------------------------------------------------------------------
// UV-atlas rasterizer (offline posmap preprocessing; mirrors ops/uv_raster.py)
// ---------------------------------------------------------------------------

// verts3d: (V,3) f32, uvs: (VT,2) f32 in [0,1], faces_v/faces_vt: (F,3) i32.
// Outputs: pos (R,R,3) f32, fid (R,R) i32 (-1 bg), bary (R,R,3) f32.
void gs_rasterize_uv(const float* verts3d, const float* uvs,
                     const int32_t* faces_v, const int32_t* faces_vt,
                     int n_faces, int R,
                     float* pos, int32_t* fid, float* bary) {
    const double eps = 1e-7;
    std::fill(pos, pos + (size_t)R * R * 3, 0.0f);
    std::fill(fid, fid + (size_t)R * R, -1);
    std::fill(bary, bary + (size_t)R * R * 3, 0.0f);

    for (int f = 0; f < n_faces; ++f) {
        double x[3], y[3];
        const float* t3[3];
        for (int k = 0; k < 3; ++k) {
            int vt = faces_vt[f * 3 + k];
            x[k] = (double)uvs[vt * 2 + 0] * R - 0.5;
            y[k] = (double)uvs[vt * 2 + 1] * R - 0.5;
            t3[k] = verts3d + (size_t)faces_v[f * 3 + k] * 3;
        }
        int cmin = std::max((int)std::floor(std::min({x[0], x[1], x[2]})), 0);
        int cmax = std::min((int)std::ceil(std::max({x[0], x[1], x[2]})) + 1, R);
        int rmin = std::max((int)std::floor(std::min({y[0], y[1], y[2]})), 0);
        int rmax = std::min((int)std::ceil(std::max({y[0], y[1], y[2]})) + 1, R);
        double denom = (y[1] - y[2]) * (x[0] - x[2]) + (x[2] - x[1]) * (y[0] - y[2]);
        if (std::fabs(denom) < eps || cmin >= cmax || rmin >= rmax) continue;
        double inv = 1.0 / denom;
        for (int r = rmin; r < rmax; ++r) {
            for (int c = cmin; c < cmax; ++c) {
                double w0 = ((y[1] - y[2]) * (c - x[2]) + (x[2] - x[1]) * (r - y[2])) * inv;
                double w1 = ((y[2] - y[0]) * (c - x[2]) + (x[0] - x[2]) * (r - y[2])) * inv;
                double w2 = 1.0 - w0 - w1;
                if (w0 < -eps || w1 < -eps || w2 < -eps) continue;
                size_t px = (size_t)r * R + c;
                fid[px] = f;
                bary[px * 3 + 0] = (float)w0;
                bary[px * 3 + 1] = (float)w1;
                bary[px * 3 + 2] = (float)w2;
                for (int d = 0; d < 3; ++d)
                    pos[px * 3 + d] = (float)(w0 * t3[0][d] + w1 * t3[1][d] + w2 * t3[2][d]);
            }
        }
    }
}

}  // extern "C"
