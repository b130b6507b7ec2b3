"""trex_tpu — a TPU-native (JAX/XLA/Pallas) multi-animal tracking framework.

Re-implements the capabilities of TRex (Walter & Couzin, eLife 2021;10:e64000;
reference tree mounted at /root/reference) with a TPU-first architecture:

- host-side C++/Python IO (pv container, video decode, LZO codec)
- fused JAX/Pallas device kernels for background subtraction, connected
  components, crop normalization, and visual-field raycasting
- vectorized per-frame tracking (motion-model probability matrices +
  Hungarian/greedy matching) designed around static shapes and `lax.scan`
- flax-based identity-classification CNNs replacing the embedded
  PyTorch/TensorFlow path

The public surface (CLI flags, parameter names, `.pv` container format,
NPZ/CSV export layouts) stays compatible with the reference.
"""

__version__ = "0.1.0"
