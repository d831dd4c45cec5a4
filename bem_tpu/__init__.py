"""bem_tpu — a TPU-native (JAX/XLA/Pallas) Bayesian Enhancement Model framework.

A from-scratch rebuild of the capabilities of the reference PyTorch/CUDA
"Bayesian Enhancement Model" stack (BasicSR trainer + VMamba SS2D backbone +
quaternion Retinex decomposition), designed TPU-first:

- the 2D selective scan runs as a Pallas blockwise associative-scan kernel
  (``bem_tpu.ops.scan``) instead of a CUDA cub BlockScan kernel;
- networks are flax.linen modules in NHWC (channels-last) layout so convs and
  the per-direction projections tile onto the MXU;
- Bayesian K-sample inference is a single ``jax.vmap`` over PRNG keys instead
  of a Python loop over stateful weight re-sampling;
- data parallelism is a ``jax.sharding.Mesh`` + ``pjit`` sharded train step
  (``bem_tpu.parallel``) instead of NCCL DDP.

Reference parity citations in docstrings point into the upstream repo
(vfrantc/Bayesian-Enhancement-Model) as ``file:line``.
"""

__version__ = "0.1.0"
