"""nct_tpu — TPU-native Neural Color Transfer framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
hmmlillian/Neural-Color-Transfer ("Progressive Color Transfer with Dense
Semantic Correspondences", He et al., ACM TOG 2019): exemplar-based color
transfer driven by dense deep-feature correspondences, restructured for TPU
(SPMD over device meshes, functional transforms, compiler-friendly control
flow, Pallas kernels for the hot ops).

Layout (TPU-native analogue of the reference layer map, see SURVEY.md):
  nct_tpu.config     -- hyper-parameters   (ref: Config.h)
  nct_tpu.ops        -- compute ops: color/resize/patchmatch/bds/knn/...
                        (ref: GeneralizedPatchMatch.cu, ColorTransfer.cpp)
  nct_tpu.models     -- VGG-19 feature extractor + weight conversion
                        (ref: Classifier.{h,cpp} + vendored Caffe)
  nct_tpu.solve      -- clustering/kNN + matrix-free CG/PCG colour solvers
                        (ref: ColorTransfer.cpp, SparseSolver_{GPU,CPU})
  nct_tpu.pipeline   -- 5-level progressive orchestrator (ref: main.cu)
  nct_tpu.cli        -- pairs.txt batch CLI (ref: main.cu CLI)
  nct_tpu.nn         -- config-driven NN graph framework (ref: Caffe Net/Layer)
  nct_tpu.train      -- solvers/LR policies/snapshot-restore (ref: Caffe Solver)
  nct_tpu.parallel   -- mesh / sharding / bucketing / data-parallel step
                        (ref: Caffe P2PSync, rebuilt on jax.sharding)
  nct_tpu.data       -- native C++ decode/resize/prefetch pipeline
                        (ref: OpenCV imread path + Caffe DataReader)
  nct_tpu.utils      -- timers, profiler hooks, SSIM, visualization
"""

__version__ = "0.1.0"

from nct_tpu.config import Config  # noqa: F401
