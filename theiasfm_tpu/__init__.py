"""theiasfm_tpu — a TPU-native Structure-from-Motion framework.

A ground-up JAX/XLA/Pallas redesign of the capabilities of TheiaSfM
(reference: sweeneychris/TheiaSfM, surveyed in SURVEY.md). The compute
path (minimal solvers, RANSAC, triangulation, rotation/position
averaging, bundle adjustment, matching) is batched, fixed-shape JAX
targeting the TPU MXU/VPU; the host path (data model, graphs, I/O)
is Python/C++.

Layer map (mirrors reference layers, SURVEY.md §1):
  utils/     — PRNG threading, timing            (ref: src/theia/util)
  math/      — polynomials, rotations, graphs    (ref: src/theia/math)
  solvers/   — batched RANSAC engine             (ref: src/theia/solvers)
  camera/    — intrinsics models, projection     (ref: src/theia/sfm/camera)
  sfm/       — data model, pose solvers, BA,
               global/incremental pipelines      (ref: src/theia/sfm)
  matching/  — MXU brute-force + cascade hashing (ref: src/theia/matching)
  image/     — SIFT pyramid on TPU               (ref: src/theia/image)
  io/        — dataset readers/writers           (ref: src/theia/io)
  parallel/  — mesh/sharding helpers for multi-chip BA
"""

__version__ = "0.1.0"
