/* Ground-truth SIFT oracle: thin C harness over the reference's
 * vendored vlfeat (compiled from /root/reference/libraries/vlfeat at
 * build time — the library itself is NOT copied into this repo).
 *
 * Purpose: tests/test_sift_vlfeat_parity.py gates the JAX SIFT
 * frontend (theiasfm_tpu/image/sift.py) against the exact detector+
 * descriptor the reference uses (sift_descriptor.cc:216-280
 * DetectAndExtractDescriptors). The extraction flow below mirrors
 * that call sequence: process octaves, detect, per-keypoint
 * orientations (first only = upright), 128-float descriptor.
 *
 * Build: make -C native vlfeat (produces libvlfeat_oracle.so).
 */
#include <stdlib.h>
#include <string.h>

#include <vl/generic.h>
#include <vl/sift.h>

/* Returns the number of keypoints written (<= max_kp).
 * out_kp rows: x, y, sigma, orientation.
 * out_desc rows: 128 floats (raw vlfeat normalization, not RootSIFT —
 * the caller applies RootSIFT like ConvertToRootSift if wanted). */
int vlfeat_sift_extract(const float* image, int width, int height,
                        int num_octaves, int num_levels,
                        int first_octave, double peak_thresh,
                        double edge_thresh, int upright,
                        float* out_kp, float* out_desc, int max_kp) {
  VlSiftFilt* filt =
      vl_sift_new(width, height, num_octaves, num_levels, first_octave);
  if (!filt) return -1;
  vl_sift_set_edge_thresh(filt, edge_thresh);
  vl_sift_set_peak_thresh(filt, peak_thresh);

  int n = 0;
  int status = vl_sift_process_first_octave(filt, image);
  while (status != VL_ERR_EOF) {
    vl_sift_detect(filt);
    const VlSiftKeypoint* kps = vl_sift_get_keypoints(filt);
    int nkp = vl_sift_get_nkeypoints(filt);
    for (int i = 0; i < nkp; ++i) {
      double angles[4];
      int na = vl_sift_calc_keypoint_orientations(filt, angles, &kps[i]);
      if (upright && na > 1) na = 1;
      for (int a = 0; a < na; ++a) {
        if (n >= max_kp) {
          vl_sift_delete(filt);
          return n;
        }
        vl_sift_calc_keypoint_descriptor(filt, out_desc + 128 * n,
                                         &kps[i], angles[a]);
        out_kp[4 * n + 0] = (float)kps[i].x;
        out_kp[4 * n + 1] = (float)kps[i].y;
        out_kp[4 * n + 2] = (float)kps[i].sigma;
        out_kp[4 * n + 3] = (float)angles[a];
        ++n;
      }
    }
    status = vl_sift_process_next_octave(filt);
  }
  vl_sift_delete(filt);
  return n;
}
