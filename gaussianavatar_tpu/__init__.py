"""gaussianavatar_tpu — a TPU-native (JAX/Flax/Pallas/pjit) framework for animatable
3D-Gaussian human avatars from monocular video.

Capability parity target: aipixel/GaussianAvatar (CVPR 2024). The design is
TPU-first: the differentiable Gaussian rasterizer is a tile-binned XLA+Pallas
pipeline instead of the reference's CUDA extension, SMPL/SMPL-X linear blend
skinning is a pure jitted function, the POP-style UV decoder is Flax, and the
whole train step (embedding lookup -> LBS -> decoder -> skinning -> splatting
-> losses -> optax updates) compiles to a single XLA program that scales over
`jax.sharding.Mesh` data-parallel axes.
"""

__version__ = "0.1.0"
