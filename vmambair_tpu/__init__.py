"""VmambaIR-TPU: a TPU-native (JAX/Flax/Pallas) image-restoration framework.

A ground-up rebuild of the capabilities of VmambaIR (visual state-space-model
image restoration: deraining, classical SISR, real-world blind SR) designed
for TPU hardware: channels-last (NHWC) tensor layout, XLA-compiled training
steps, a Pallas selective-scan kernel, and `jax.sharding`-based data
parallelism instead of NCCL DDP.

Reference behavior: AlphacatPlus/VmambaIR (see SURVEY.md for the layer map).
"""

__version__ = "0.1.0"
