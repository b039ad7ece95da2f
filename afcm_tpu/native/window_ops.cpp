// Native host-side hot loops for the data pipeline.
//
// The reference delegates its host-side work to torch DataLoader worker
// processes (reference: data/__init__.py:61-92); this box has one CPU core,
// so the per-batch work must be tight single-thread code instead:
//  * assemble_windows: gather 4-slice thick windows from a uint8 volume and
//    normalize to [-1, 1] float32 in one pass (fuses the Normalize transform)
//  * accumulate_patches: overlap-add halo-cropped prediction patches into the
//    output volume accumulator.
//
// Built with `g++ -O3 -shared -fPIC` by afcm_tpu/native/build.py and loaded
// via ctypes; a numpy fallback covers toolchain-less environments.

#include <cstdint>
#include <cstring>
#include <algorithm>

extern "C" {

// volume: [depth, height, width] uint8
// window_indices: [batch * slices_per_window] int32 slice indices; -1 = zero pad
// out: [batch, slices_per_window, height, width] float32 in [-1, 1]
void assemble_windows(const uint8_t* volume, int depth, int height, int width,
                      const int32_t* window_indices, int batch,
                      int slices_per_window, float lo, float inv_range,
                      float* out) {
    const long plane = static_cast<long>(height) * width;
    const float pad_value = std::max(-1.0f, std::min(1.0f, 2.0f * (0.0f - lo) * inv_range - 1.0f));
    for (int b = 0; b < batch; ++b) {
        for (int s = 0; s < slices_per_window; ++s) {
            const int32_t z = window_indices[b * slices_per_window + s];
            float* dst = out + (static_cast<long>(b) * slices_per_window + s) * plane;
            if (z < 0 || z >= depth) {
                for (long i = 0; i < plane; ++i) dst[i] = pad_value;
                continue;
            }
            const uint8_t* src = volume + static_cast<long>(z) * plane;
            for (long i = 0; i < plane; ++i) {
                float v = 2.0f * (static_cast<float>(src[i]) - lo) * inv_range - 1.0f;
                dst[i] = std::max(-1.0f, std::min(1.0f, v));
            }
        }
    }
}

// pmap / nmask: [depth, height, width]; patches: [batch, ph, pw] float32
// coords: [batch * 3] (z, y0, x0) destination origins after halo crop
// sizes:  [batch * 2] (crop_h, crop_w); offsets: [batch * 2] in-patch offsets
void accumulate_patches(float* pmap, uint16_t* nmask, int depth, int height,
                        int width, const float* patches, int batch, int ph,
                        int pw, const int32_t* coords, const int32_t* offsets,
                        const int32_t* sizes) {
    (void)depth;
    const long plane = static_cast<long>(height) * width;
    for (int b = 0; b < batch; ++b) {
        const int z = coords[b * 3 + 0];
        const int y0 = coords[b * 3 + 1];
        const int x0 = coords[b * 3 + 2];
        const int oy = offsets[b * 2 + 0];
        const int ox = offsets[b * 2 + 1];
        const int ch = sizes[b * 2 + 0];
        const int cw = sizes[b * 2 + 1];
        const float* patch = patches + static_cast<long>(b) * ph * pw;
        float* pz = pmap + static_cast<long>(z) * plane;
        uint16_t* nz = nmask + static_cast<long>(z) * plane;
        for (int y = 0; y < ch; ++y) {
            const float* src = patch + static_cast<long>(oy + y) * pw + ox;
            float* dstp = pz + static_cast<long>(y0 + y) * width + x0;
            uint16_t* dstn = nz + static_cast<long>(y0 + y) * width + x0;
            for (int x = 0; x < cw; ++x) {
                dstp[x] += src[x];
                dstn[x] += 1;
            }
        }
    }
}

}  // extern "C"
