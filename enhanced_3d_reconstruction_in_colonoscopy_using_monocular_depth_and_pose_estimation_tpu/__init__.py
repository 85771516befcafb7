"""TPU-native colonoscopy 3D reconstruction framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
``prototypeanugrah/Enhanced-3D-Reconstruction-in-Colonoscopy-Using-Monocular-
Depth-and-Pose-Estimation`` (reference mounted at /root/reference):

- Metric monocular depth via a DepthAnythingV2-style network
  (DINOv2 ViT encoder + DPT decoder) fine-tuned with SiLog loss
  (reference: lightning_model.py).
- Relative camera pose via a ResNet-18 regressor over consecutive RGB-D
  frame pairs (reference: pose_estimation_model.py).
- Depth/pose evaluation (D1, AbsRel, RMSE, L1, ATE, RTE, ROTE) and
  trajectory composition (reference: eval/evaluation.py).
- Depth -> point cloud -> mesh reconstruction (reference:
  depth_to_pointcloud*.py, re-designed as XLA backprojection + FFT Poisson
  indicator + native marching cubes instead of Open3D).

Everything on the compute path is functional JAX compiled under ``jax.jit`` /
``pjit`` over a ``jax.sharding.Mesh``; hot kernels have Pallas TPU
implementations with XLA fallbacks for CPU tests.

Import alias: ``import e3d_tpu`` (see e3d_tpu/__init__.py).
"""

__version__ = "0.1.0"
