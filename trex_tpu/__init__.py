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


def _configure_jax_cache():
    """Enable jax's persistent compilation cache.

    The axon TPU backend on this machine compiles large conv-grad graphs
    very slowly (the V118_3 train step takes ~8 min cold); the persistent
    cache makes that a one-time cost across processes."""
    import os

    try:
        import jax

        cache_dir = os.environ.get(
            "TREX_JAX_CACHE",
            os.path.join(os.path.expanduser("~"), ".cache", "trex_tpu",
                         "jax"),
        )
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass


_configure_jax_cache()
