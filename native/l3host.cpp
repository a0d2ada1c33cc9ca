// l3host — native host-side kernels for the AVC sample factory and
// input pipeline.
//
// The reference implements these stages with skimage/numpy chains that
// allocate several float64 temporaries per frame (HSV round-trip:
// reference l3embedding/image.py:5-49; dtype conversions:
// reference l3embedding/train.py:186-189). These fused single-pass
// implementations are loaded from Python via ctypes
// (l3embedding_tpu/native) with a numpy fallback when the shared
// library is unavailable.
//
// Build: make -C native   (g++ -O3 -shared -fPIC)

#include <cstdint>
#include <cmath>
#include <algorithm>

namespace {

// RGB [0,1] -> HSV, matching skimage.color.rgb2hsv conventions.
inline void rgb_to_hsv(double r, double g, double b,
                       double& h, double& s, double& v) {
    double maxc = std::max(r, std::max(g, b));
    double minc = std::min(r, std::min(g, b));
    v = maxc;
    double delta = maxc - minc;
    if (delta == 0.0 || maxc == 0.0) {
        h = 0.0;
        s = (maxc == 0.0) ? 0.0 : delta / maxc;
        return;
    }
    s = delta / maxc;
    double rc = (maxc - r) / delta;
    double gc = (maxc - g) / delta;
    double bc = (maxc - b) / delta;
    if (r == maxc)      h = bc - gc;
    else if (g == maxc) h = 2.0 + rc - bc;
    else                h = 4.0 + gc - rc;
    h = h / 6.0;
    h -= std::floor(h);
}

inline void hsv_to_rgb(double h, double s, double v,
                       double& r, double& g, double& b) {
    double i = std::floor(h * 6.0);
    double f = h * 6.0 - i;
    double p = v * (1.0 - s);
    double q = v * (1.0 - s * f);
    double t = v * (1.0 - s * (1.0 - f));
    switch (static_cast<long long>(i) % 6) {
        case 0: r = v; g = t; b = p; break;
        case 1: r = q; g = v; b = p; break;
        case 2: r = p; g = v; b = t; break;
        case 3: r = p; g = q; b = v; break;
        case 4: r = t; g = p; b = v; break;
        default: r = v; g = p; b = q; break;
    }
}

inline uint8_t to_u8(double x) {
    // np.rint semantics: round half to even.
    x = std::min(1.0, std::max(0.0, x)) * 255.0;
    return static_cast<uint8_t>(std::nearbyint(x));
}

}  // namespace

extern "C" {

// int16 PCM -> float32 in [-1, 1)  (reference audio.py pcm2float).
void pcm16_to_float(const int16_t* in, float* out, int64_t n) {
    const float scale = 1.0f / 32768.0f;
    for (int64_t i = 0; i < n; ++i) out[i] = in[i] * scale;
}

// uint8 image -> float32 in [-1, 1]  (reference train.py:186).
void u8_to_pm1(const uint8_t* in, float* out, int64_t n) {
    const float scale = 2.0f / 255.0f;
    for (int64_t i = 0; i < n; ++i) out[i] = in[i] * scale - 1.0f;
}

// Fused augmentation on a uint8 HxWx3 frame: optional horizontal flip,
// then saturation scale + brightness delta in the given order
// (sat_first != 0 -> saturation before brightness), writing uint8.
// One pass, no temporaries (reference sample.py:236-276 pipeline).
void augment_frame_u8(const uint8_t* in, uint8_t* out,
                      int64_t height, int64_t width,
                      int flip, double saturation_factor,
                      double brightness_delta, int sat_first) {
    for (int64_t y = 0; y < height; ++y) {
        for (int64_t x = 0; x < width; ++x) {
            int64_t sx = flip ? (width - 1 - x) : x;
            const uint8_t* p = in + (y * width + sx) * 3;
            double r = p[0] / 255.0, g = p[1] / 255.0, b = p[2] / 255.0;

            if (sat_first) {
                double h, s, v;
                rgb_to_hsv(r, g, b, h, s, v);
                s = std::min(1.0, std::max(0.0, s * saturation_factor));
                hsv_to_rgb(h, s, v, r, g, b);
                r = std::min(1.0, std::max(0.0, r + brightness_delta));
                g = std::min(1.0, std::max(0.0, g + brightness_delta));
                b = std::min(1.0, std::max(0.0, b + brightness_delta));
            } else {
                r = std::min(1.0, std::max(0.0, r + brightness_delta));
                g = std::min(1.0, std::max(0.0, g + brightness_delta));
                b = std::min(1.0, std::max(0.0, b + brightness_delta));
                double h, s, v;
                rgb_to_hsv(r, g, b, h, s, v);
                s = std::min(1.0, std::max(0.0, s * saturation_factor));
                hsv_to_rgb(h, s, v, r, g, b);
            }

            uint8_t* q = out + (y * width + x) * 3;
            q[0] = to_u8(r);
            q[1] = to_u8(g);
            q[2] = to_u8(b);
        }
    }
}

// Apply gain to int16 audio with clamping (reference sample.py:146-161
// applies gain in float then casts back).
void gain_i16(const int16_t* in, int16_t* out, int64_t n, double gain) {
    for (int64_t i = 0; i < n; ++i) {
        double v = in[i] * gain;
        v = std::min(32767.0, std::max(-32768.0, v));
        out[i] = static_cast<int16_t>(v);
    }
}

// Nearest-neighbor RGB resize (decode-path frame scaling fallback).
void resize_nn_u8(const uint8_t* in, int64_t in_h, int64_t in_w,
                  uint8_t* out, int64_t out_h, int64_t out_w) {
    for (int64_t y = 0; y < out_h; ++y) {
        int64_t sy = std::min(in_h - 1, y * in_h / out_h);
        for (int64_t x = 0; x < out_w; ++x) {
            int64_t sx = std::min(in_w - 1, x * in_w / out_w);
            const uint8_t* p = in + (sy * in_w + sx) * 3;
            uint8_t* q = out + (y * out_w + x) * 3;
            q[0] = p[0]; q[1] = p[1]; q[2] = p[2];
        }
    }
}

int l3host_abi_version() { return 1; }

}  // extern "C"
