// Native host-side image preprocessing for the SLAM frame pipeline.
//
// Role: the hot host path feeding the TPU — long-side resize to the
// 512-crop, center crop to /16 multiples, and ImgNorm normalization
// ((x/255 - 0.5) / 0.5) fused in one pass. The reference leans on
// PIL/OpenCV for this (dataloader.py + splatt3r_utils.resize_img); at
// 15+ FPS the Python/PIL path costs several ms/frame of host latency
// that this C++ path removes. Exposed through ctypes (no pybind11 in
// the image).
//
// Build: make -C splatt3r_slam_tpu/native   (g++ -O3 -march=native)

#include <cstdint>
#include <cstring>
#include <algorithm>

extern "C" {

// Bilinear resize uint8 HxWx3 -> dh x dw x 3 (half-pixel centers, like
// cv2.INTER_LINEAR), then center-crop to (ch, cw) writing both the
// normalized float32 tensor and the uint8 crop.
void resize_crop_normalize(const uint8_t* src, int sh, int sw,
                           int rh, int rw,      // resize target
                           int ch, int cw,      // center crop
                           float* dst_norm,     // ch*cw*3 float32
                           uint8_t* dst_u8) {   // ch*cw*3 uint8
    const float sy = (float)sh / rh;
    const float sx = (float)sw / rw;
    const int y0 = (rh - ch) / 2;
    const int x0 = (rw - cw) / 2;

    for (int y = 0; y < ch; ++y) {
        const float fy = ((float)(y + y0) + 0.5f) * sy - 0.5f;
        int iy = (int)fy;
        float dy = fy - iy;
        if (fy < 0) { iy = 0; dy = 0.f; }
        if (iy >= sh - 1) { iy = sh - 2; dy = 1.f; }
        const uint8_t* r0 = src + (size_t)iy * sw * 3;
        const uint8_t* r1 = r0 + (size_t)sw * 3;
        float* on = dst_norm + (size_t)y * cw * 3;
        uint8_t* ou = dst_u8 + (size_t)y * cw * 3;
        for (int x = 0; x < cw; ++x) {
            const float fx = ((float)(x + x0) + 0.5f) * sx - 0.5f;
            int ix = (int)fx;
            float dx = fx - ix;
            if (fx < 0) { ix = 0; dx = 0.f; }
            if (ix >= sw - 1) { ix = sw - 2; dx = 1.f; }
            const float w00 = (1 - dy) * (1 - dx), w01 = (1 - dy) * dx;
            const float w10 = dy * (1 - dx), w11 = dy * dx;
            for (int c = 0; c < 3; ++c) {
                const float v = w00 * r0[ix * 3 + c] + w01 * r0[(ix + 1) * 3 + c]
                              + w10 * r1[ix * 3 + c] + w11 * r1[(ix + 1) * 3 + c];
                const uint8_t u = (uint8_t)std::min(255.f, std::max(0.f, v + 0.5f));
                ou[x * 3 + c] = u;
                on[x * 3 + c] = (v / 255.0f - 0.5f) / 0.5f;
            }
        }
    }
}

// Grayscale undistort-free fast path: uint8 -> normalized float32 only.
void normalize_u8(const uint8_t* src, int n, float* dst) {
    for (int i = 0; i < n; ++i)
        dst[i] = ((float)src[i] / 255.0f - 0.5f) / 0.5f;
}

}  // extern "C"
