"""toc3d_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework with the capabilities
of DYZhang09/ToC3D: streaming multi-view 3D detection on nuScenes with an EVA-02
ViT backbone accelerated by Motion Query-guided Token Compression.

Subpackages:
  ops      — numerically-careful primitive ops (RoPE, windowing, gathers, pos-enc,
             resize) plus Pallas TPU kernels for the hot attention paths.
  models   — EVA-ViT backbone, ToC3D compression backbone, CPFPN neck, FocalHead,
             StreamPETR decoder head, and the Petr3D detector orchestration.
  core     — box math, NMS-free decoding, Hungarian assignment, losses.
  data     — nuScenes temporal dataset, deterministic eval preprocessing,
             streaming batch-lane sampler.
  parallel — mesh / sharding helpers (pjit data parallelism over ICI/DCN).
  runtime  — checkpoint conversion + orbax IO, timing harness, eval/train loops.
  tracking — offline tracking-by-detection (greedy / Hungarian) on detections.
"""

__version__ = "0.1.0"

# Persistent XLA compilation cache: the ViT-L Pallas megakernel programs take
# ~25 min to compile through the axon remote-compile tunnel; with the cache a
# rerun loads them in seconds (verified working against the axon backend).
# The 10 s floor keeps thousands of tiny CPU test programs out of the cache.
# Opt out / redirect with JAX_COMPILATION_CACHE_DIR.
import os as _os

if "JAX_COMPILATION_CACHE_DIR" not in _os.environ:
    import jax as _jax

    _jax.config.update("jax_compilation_cache_dir",
                       _os.path.expanduser("~/.cache/toc3d_tpu_xla"))
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
