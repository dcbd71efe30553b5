/* Native host-side kernels for adanerf_tpu.
 *
 * disc_depth_features: windowed discretized-depth feature fill — the CPU
 * equivalent of the reference's disc_depth_multiclass CUDA extension
 * (src/native/disc_depth_multiclass_cuda.cu:40-272). Per sampled pixel, scan
 * a window_size^2 neighborhood, bin each neighbor depth into n_feat bins and
 * keep the max distance weight per bin.
 *
 * Built by native/build.py:  cc -O3 -march=native -shared -fPIC -fopenmp
 */

#include <math.h>
#include <stddef.h>
#include <stdint.h>

#ifdef _OPENMP
#include <omp.h>
#endif

void disc_depth_features(const float *depth_map, const int64_t *sample_indices,
                         float *out, int h, int w, int n, int window_size,
                         int n_feat, float ignore_value) {
  const float step = 1.0f / (float)n_feat;
  const int center = window_size / 2;
  const float max_dist = (float)(window_size / 2 + 1) * sqrtf(2.0f);

#pragma omp parallel for schedule(static)
  for (int s = 0; s < n; ++s) {
    const int64_t idx = sample_indices[s];
    const int cx = (int)(idx % w);
    const int cy = (int)(idx / w);
    float *feat = out + (size_t)s * n_feat;

    if (window_size == 1) {
      const float val = depth_map[idx];
      if (val < ignore_value) {
        int d = (int)(val / step);
        if (d > n_feat - 1) d = n_feat - 1;
        if (d >= 0) feat[d] = 1.0f;
      }
      continue;
    }

    for (int i = 0; i < window_size; ++i) {
      for (int j = 0; j < window_size; ++j) {
        const float di = (float)(i - center);
        const float dj = (float)(j - center);
        const float weight = 1.0f - sqrtf(di * di + dj * dj) / max_dist;
        int x = cx - center + i;
        int y = cy - center + j;
        if (x < 0) x = 0;
        if (x > w - 1) x = w - 1;
        if (y < 0) y = 0;
        if (y > h - 1) y = h - 1;
        const float val = depth_map[(size_t)y * w + x];
        int d = (int)(val / step);
        if (val < ignore_value && d >= 0) {
          if (d > n_feat - 1) d = n_feat - 1;
          if (weight > feat[d]) feat[d] = weight;
        }
      }
    }
  }
}

/* Martin Roberts R-sequence window evaluation (sampled_sequence.py:127-147):
 * val_i = (seed + alpha_j * (i+1)) mod 1, discretized to
 * floor(val * range * 0.99999) + minv. Writes (count, dims) int64. */
void r_sequence_discrete(double seed, const double *alpha, int dims,
                         int64_t start, int64_t count, const int64_t *minv,
                         const int64_t *maxv, int64_t *out) {
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < count; ++i) {
    for (int d = 0; d < dims; ++d) {
      double v = fmod(seed + alpha[d] * (double)(start + i + 1), 1.0);
      /* match float32 rounding of the python path */
      float vf = (float)v;
      double range = (double)(maxv[d] - minv[d]);
      out[i * dims + d] = (int64_t)floorf(vf * (float)range * 0.99999f) + minv[d];
    }
  }
}
