"""stereo_reconstruction_tpu — a TPU-native stereo reconstruction framework.

A from-scratch JAX/XLA/Pallas re-design of the classical two-view stereo
pipeline found in the reference C++ implementation
(Bizilizi/stereo_reconstruction): feature detection + matching, eight-point
essential-matrix pose estimation with RANSAC, Gauss-Newton/LM bundle
adjustment (Schur complement), Loop-Zhang projective rectification, dense
window-search disparity (SSD/NCC/perceptual cost volumes), disparity
post-processing, depth back-projection and mesh output.

Design stance (TPU-first, not a port):
  * every pipeline stage is a pure, jittable function over static shapes;
  * the dense cost-volume build/aggregation runs as Pallas TPU kernels with
    an XLA fallback, O(H*W*D) via separable box-filter window sums instead
    of the reference's O(H*W*D*B^2) scalar loops;
  * multi-chip scaling is expressed as shardings over one
    ``jax.sharding.Mesh`` (axes ``("data", "tile")``) with XLA collectives;
  * host-side I/O (PNG/PFM/calib/OFF) stays on host, feeding padded batches.
"""

__version__ = "0.1.0"

from stereo_reconstruction_tpu.config import PipelineConfig  # noqa: F401
