"""deepv_tpu — a TPU-native JAX framework with the capabilities of DeepVerse.

DeepVerse (lorenzocean/deepv) is a 4D autoregressive video world model: one
input image plus a text prompt or game-pad action string is rolled out into
RGB video generated jointly with disparity (depth) and camera raymaps, chunk
by chunk, using a pyramid flow-matching MMDiT over a causal video-VAE latent
space.

This package is a ground-up TPU-first redesign (jax / XLA / pallas / pjit),
not a port: functional models with pytree parameters, explicit PRNG keys,
`lax.scan` denoise loops, static-shape packed attention with on-the-fly
masks, causal-conv state as explicit carries, and `shard_map` context /
tensor parallelism over a `jax.sharding.Mesh`.

Layer map (mirrors reference capability, see SURVEY.md §1):
  - io / cli        : run.py contract, video + PLY export       (ref run.py)
  - pipeline        : chunked AR rollout, CFG, history retrieval (ref pipeline.py)
  - models          : MMDiT, causal video VAE, flow-match scheduler,
                      SD3 text encoders                          (ref model/)
  - ops             : pallas kernels + core math (attention, rope,
                      causal conv, block noise, resampling)
  - parallel        : mesh construction, CP/TP shardings
"""

__version__ = "0.1.0"
