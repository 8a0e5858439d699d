// Native image decode/encode for the input pipeline.
//
// The reference delegates JPEG decode + resize to TensorFlow's C++ ops
// (tf.io.decode_jpeg / tf.image.resize inside its tf.data pipeline); this is
// the framework-native equivalent: libjpeg/libpng decoders with a fused
// DCT-scaled decode+resize path, exposed through a pure C ABI so ctypes calls
// release the GIL and a Python thread pool gets real decode parallelism.
//
// All functions are thread-safe (no global state) and return 0 on success,
// -1 on malformed input.

#include <csetjmp>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <utility>
#include <vector>

#ifdef __AVX2__
#include <immintrin.h>
#endif

#include <jpeglib.h>
#include <png.h>

namespace {

// libjpeg's default error handler calls exit(); route it to longjmp instead.
struct JpegErr {
    jpeg_error_mgr pub;
    jmp_buf jb;
};

void jpeg_err_exit(j_common_ptr cinfo) {
    JpegErr* err = reinterpret_cast<JpegErr*>(cinfo->err);
    longjmp(err->jb, 1);
}

void jpeg_err_silence(j_common_ptr, int) {}

void setup_jpeg_err(jpeg_decompress_struct* cinfo, JpegErr* jerr) {
    cinfo->err = jpeg_std_error(&jerr->pub);
    jerr->pub.error_exit = jpeg_err_exit;
    jerr->pub.emit_message = jpeg_err_silence;
}

}  // namespace

extern "C" {

void tfimm_free(void* p) { free(p); }

// ---------------------------------------------------------------------------
// JPEG
// ---------------------------------------------------------------------------

int tfimm_jpeg_info(const unsigned char* buf, size_t len,
                    int* h, int* w, int* c) {
    jpeg_decompress_struct cinfo;
    JpegErr jerr;
    setup_jpeg_err(&cinfo, &jerr);
    if (setjmp(jerr.jb)) {
        jpeg_destroy_decompress(&cinfo);
        return -1;
    }
    jpeg_create_decompress(&cinfo);
    jpeg_mem_src(&cinfo, buf, len);
    jpeg_read_header(&cinfo, TRUE);
    *h = static_cast<int>(cinfo.image_height);
    *w = static_cast<int>(cinfo.image_width);
    *c = cinfo.num_components;
    jpeg_destroy_decompress(&cinfo);
    return 0;
}

// Decode to RGB8 into caller-provided out (h*w*3). out_h/out_w must match
// tfimm_jpeg_info dims.
int tfimm_decode_jpeg(const unsigned char* buf, size_t len,
                      unsigned char* out, int out_h, int out_w) {
    jpeg_decompress_struct cinfo;
    JpegErr jerr;
    setup_jpeg_err(&cinfo, &jerr);
    if (setjmp(jerr.jb)) {
        jpeg_destroy_decompress(&cinfo);
        return -1;
    }
    jpeg_create_decompress(&cinfo);
    jpeg_mem_src(&cinfo, buf, len);
    jpeg_read_header(&cinfo, TRUE);
    cinfo.out_color_space = JCS_RGB;
    jpeg_start_decompress(&cinfo);
    if (static_cast<int>(cinfo.output_height) != out_h ||
        static_cast<int>(cinfo.output_width) != out_w ||
        cinfo.output_components != 3) {
        jpeg_destroy_decompress(&cinfo);
        return -1;
    }
    const size_t stride = static_cast<size_t>(out_w) * 3;
    while (cinfo.output_scanline < cinfo.output_height) {
        JSAMPROW row = out + cinfo.output_scanline * stride;
        jpeg_read_scanlines(&cinfo, &row, 1);
    }
    jpeg_finish_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    return 0;
}

// Bilinear resize, half-pixel centres (matches jax.image.resize / TF "bilinear"
// with antialias off for upscaling; good enough for training-pipeline
// downscale after DCT pre-scaling has done the heavy reduction).
//
// Separable two-pass form for every scale: each needed SOURCE row is
// horizontally resampled once into a float row via a FLAT element-indexed
// gather loop (per-element source indices and weights precomputed, so the
// loop is 8-wide AVX2 gathers where available), cached, and each output row
// blends two float rows in a unit-stride loop the compiler auto-vectorizes.
// When output rows share source rows (sh < 2*dh) the cache saves half the
// horizontal work; above that the gather loop reads exactly the bytes the
// old per-pixel form read, but vectorized.

// out[i] = r[i0[i]] + (r[i1[i]] - r[i0[i]]) * w[i] over n flat elements.
// allow_overread: the AVX2 path gathers 32-bit words at byte offsets, so it
// reads up to 3 bytes past r + (max index); callers pass true only when that
// tail is still inside their buffer (any source row but the last).
static void hresample_row(const unsigned char* r, int n,
                          const int* i0, const int* i1, const float* w,
                          float* out, bool allow_overread) {
    int i = 0;
#ifdef __AVX2__
    if (allow_overread) {
        const __m256i bytemask = _mm256_set1_epi32(0xFF);
        for (; i + 8 <= n; i += 8) {
            const __m256i idx0 =
                _mm256_loadu_si256(reinterpret_cast<const __m256i*>(i0 + i));
            const __m256i idx1 =
                _mm256_loadu_si256(reinterpret_cast<const __m256i*>(i1 + i));
            const __m256i g0 = _mm256_i32gather_epi32(
                reinterpret_cast<const int*>(r), idx0, 1);
            const __m256i g1 = _mm256_i32gather_epi32(
                reinterpret_cast<const int*>(r), idx1, 1);
            const __m256 a =
                _mm256_cvtepi32_ps(_mm256_and_si256(g0, bytemask));
            const __m256 b =
                _mm256_cvtepi32_ps(_mm256_and_si256(g1, bytemask));
            const __m256 ww = _mm256_loadu_ps(w + i);
            const __m256 v =
                _mm256_fmadd_ps(_mm256_sub_ps(b, a), ww, a);
            _mm256_storeu_ps(out + i, v);
        }
    }
#else
    (void)allow_overread;
#endif
    for (; i < n; ++i) {
        const float a = r[i0[i]];
        const float b = r[i1[i]];
        out[i] = a + (b - a) * w[i];
    }
}

void tfimm_resize_bilinear_u8(const unsigned char* src, int sh, int sw,
                              unsigned char* dst, int dh, int dw, int ch) {
    const float ys = static_cast<float>(sh) / dh;
    const float xs = static_cast<float>(sw) / dw;
    const int row_elems = dw * ch;

    // Flat per-ELEMENT source indices/weights: i0[x*ch+k] points at channel
    // k of source column x0, so hresample_row needs no inner channel loop.
    std::vector<int> i0(row_elems), i1(row_elems);
    std::vector<float> wx(row_elems);
    for (int x = 0; x < dw; ++x) {
        float fx = (x + 0.5f) * xs - 0.5f;
        if (fx < 0) fx = 0;
        int x0 = static_cast<int>(fx);
        int x1 = x0 + 1 < sw ? x0 + 1 : sw - 1;
        for (int k = 0; k < ch; ++k) {
            i0[x * ch + k] = x0 * ch + k;
            i1[x * ch + k] = x1 * ch + k;
            wx[x * ch + k] = fx - x0;
        }
    }

    std::vector<float> row_a(row_elems), row_b(row_elems);
    int cached_a = -1, cached_b = -1;
    auto hresample = [&](int sy, float* out) {
        hresample_row(src + static_cast<size_t>(sy) * sw * ch, row_elems,
                      i0.data(), i1.data(), wx.data(), out,
                      /*allow_overread=*/sy + 1 < sh);
    };

    for (int y = 0; y < dh; ++y) {
        float fy = (y + 0.5f) * ys - 0.5f;
        if (fy < 0) fy = 0;
        const int y0 = static_cast<int>(fy);
        const int y1 = y0 + 1 < sh ? y0 + 1 : sh - 1;
        const float wy = fy - y0;
        // y advances monotonically, so cached rows roll forward.
        if (cached_a != y0) {
            if (cached_b == y0) {
                std::swap(row_a, row_b);
                cached_a = cached_b;
                cached_b = -1;
            } else {
                hresample(y0, row_a.data());
                cached_a = y0;
            }
        }
        if (cached_b != y1) {
            if (y1 == y0) {
                cached_b = -1;  // degenerate edge row: blend row_a with itself
            } else {
                hresample(y1, row_b.data());
                cached_b = y1;
            }
        }
        const float* ra = row_a.data();
        const float* rb = (y1 == y0) ? row_a.data() : row_b.data();
        unsigned char* q = dst + static_cast<size_t>(y) * row_elems;
        for (int i = 0; i < row_elems; ++i) {
            float v = ra[i] + (rb[i] - ra[i]) * wy;
            q[i] = static_cast<unsigned char>(v + 0.5f);
        }
    }
}

// Fused decode + resize to (out_h, out_w): libjpeg's DCT scaling (N/8) does
// the coarse reduction during entropy decode — decoding a 4000px photo to a
// 224px crop never materialises the full-res image — then one bilinear pass
// lands on the exact target.
int tfimm_decode_jpeg_resize(const unsigned char* buf, size_t len,
                             unsigned char* out, int out_h, int out_w) {
    jpeg_decompress_struct cinfo;
    JpegErr jerr;
    setup_jpeg_err(&cinfo, &jerr);
    unsigned char* tmp = nullptr;
    if (setjmp(jerr.jb)) {
        free(tmp);
        jpeg_destroy_decompress(&cinfo);
        return -1;
    }
    jpeg_create_decompress(&cinfo);
    jpeg_mem_src(&cinfo, buf, len);
    jpeg_read_header(&cinfo, TRUE);
    cinfo.out_color_space = JCS_RGB;
    // Largest num/8 scale whose output still covers the target.
    int num = 8;
    while (num > 1) {
        const long sh = (static_cast<long>(cinfo.image_height) * (num - 1) + 7) / 8;
        const long sw = (static_cast<long>(cinfo.image_width) * (num - 1) + 7) / 8;
        if (sh < out_h || sw < out_w) break;
        --num;
    }
    cinfo.scale_num = num;
    cinfo.scale_denom = 8;
    jpeg_start_decompress(&cinfo);
    const int sh = static_cast<int>(cinfo.output_height);
    const int sw = static_cast<int>(cinfo.output_width);
    if (cinfo.output_components != 3) {
        jpeg_destroy_decompress(&cinfo);
        return -1;
    }
    const size_t stride = static_cast<size_t>(sw) * 3;
    tmp = static_cast<unsigned char*>(malloc(stride * sh));
    if (!tmp) {
        jpeg_destroy_decompress(&cinfo);
        return -1;
    }
    while (cinfo.output_scanline < cinfo.output_height) {
        JSAMPROW row = tmp + cinfo.output_scanline * stride;
        jpeg_read_scanlines(&cinfo, &row, 1);
    }
    jpeg_finish_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    tfimm_resize_bilinear_u8(tmp, sh, sw, out, out_h, out_w, 3);
    free(tmp);
    return 0;
}

// Encode RGB8 -> JPEG. *out is malloc'd by libjpeg; free with tfimm_free.
int tfimm_encode_jpeg(const unsigned char* rgb, int h, int w, int quality,
                      unsigned char** out, unsigned long* out_len) {
    jpeg_compress_struct cinfo;
    JpegErr jerr;
    cinfo.err = jpeg_std_error(&jerr.pub);
    jerr.pub.error_exit = jpeg_err_exit;
    *out = nullptr;
    *out_len = 0;
    if (setjmp(jerr.jb)) {
        jpeg_destroy_compress(&cinfo);
        free(*out);
        *out = nullptr;
        return -1;
    }
    jpeg_create_compress(&cinfo);
    jpeg_mem_dest(&cinfo, out, out_len);
    cinfo.image_width = w;
    cinfo.image_height = h;
    cinfo.input_components = 3;
    cinfo.in_color_space = JCS_RGB;
    jpeg_set_defaults(&cinfo);
    jpeg_set_quality(&cinfo, quality, TRUE);
    jpeg_start_compress(&cinfo, TRUE);
    const size_t stride = static_cast<size_t>(w) * 3;
    while (cinfo.next_scanline < cinfo.image_height) {
        JSAMPROW row = const_cast<unsigned char*>(rgb) +
                       cinfo.next_scanline * stride;
        jpeg_write_scanlines(&cinfo, &row, 1);
    }
    jpeg_finish_compress(&cinfo);
    jpeg_destroy_compress(&cinfo);
    return 0;
}

// ---------------------------------------------------------------------------
// PNG
// ---------------------------------------------------------------------------

namespace {

struct PngReader {
    const unsigned char* data;
    size_t len;
    size_t off;
};

void png_read_cb(png_structp p, png_bytep dst, png_size_t n) {
    PngReader* r = static_cast<PngReader*>(png_get_io_ptr(p));
    if (r->off + n > r->len) png_error(p, "unexpected end of PNG data");
    memcpy(dst, r->data + r->off, n);
    r->off += n;
}

// Shared open + normalise-to-RGB8 path for info/decode.
bool png_begin(png_structp* pp, png_infop* ip, PngReader* reader,
               int* h, int* w) {
    *pp = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr,
                                 nullptr);
    if (!*pp) return false;
    *ip = png_create_info_struct(*pp);
    if (!*ip) {
        png_destroy_read_struct(pp, nullptr, nullptr);
        return false;
    }
    if (setjmp(png_jmpbuf(*pp))) {
        png_destroy_read_struct(pp, ip, nullptr);
        return false;
    }
    png_set_read_fn(*pp, reader, png_read_cb);
    png_read_info(*pp, *ip);
    // Normalise every PNG flavour to 8-bit RGB.
    png_set_palette_to_rgb(*pp);
    png_set_expand_gray_1_2_4_to_8(*pp);
    if (png_get_valid(*pp, *ip, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(*pp);
    png_set_strip_16(*pp);
    png_set_strip_alpha(*pp);
    png_set_gray_to_rgb(*pp);
    png_read_update_info(*pp, *ip);
    *h = static_cast<int>(png_get_image_height(*pp, *ip));
    *w = static_cast<int>(png_get_image_width(*pp, *ip));
    return true;
}

}  // namespace

int tfimm_png_info(const unsigned char* buf, size_t len, int* h, int* w) {
    PngReader reader{buf, len, 0};
    png_structp pp;
    png_infop ip;
    if (!png_begin(&pp, &ip, &reader, h, w)) return -1;
    png_destroy_read_struct(&pp, &ip, nullptr);
    return 0;
}

int tfimm_decode_png(const unsigned char* buf, size_t len,
                     unsigned char* out, int out_h, int out_w) {
    PngReader reader{buf, len, 0};
    png_structp pp;
    png_infop ip;
    int h, w;
    if (!png_begin(&pp, &ip, &reader, &h, &w)) return -1;
    if (h != out_h || w != out_w ||
        png_get_channels(pp, ip) != 3) {
        png_destroy_read_struct(&pp, &ip, nullptr);
        return -1;
    }
    if (setjmp(png_jmpbuf(pp))) {
        png_destroy_read_struct(&pp, &ip, nullptr);
        return -1;
    }
    const size_t stride = static_cast<size_t>(w) * 3;
    for (int y = 0; y < h; ++y) {
        png_bytep row = out + y * stride;
        png_read_row(pp, row, nullptr);
    }
    png_destroy_read_struct(&pp, &ip, nullptr);
    return 0;
}

}  // extern "C"
