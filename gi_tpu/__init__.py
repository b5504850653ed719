"""gi_tpu — a TPU-native differentiable photon-mapping renderer.

A from-scratch JAX/XLA/Pallas re-design of Jensen-style photon mapping with
the capabilities of the reference C++ CPU renderer
(ReillyBova/Global-Illumination): distributed ray tracing, Monte Carlo path
tracing, photon maps (global + caustic) with filtered radiance estimates,
five light types with soft shadows, Fresnel reflection/refraction,
depth of field, supersampled anti-aliasing, and irradiance caching —
re-expressed as batched wavefront ray/photon streams that shard across
TPU device meshes, with a sorted spatial-hash photon gather replacing the
CPU kd-tree, and end-to-end differentiability w.r.t. materials, lights,
and camera.

Layout:
  scene/     .scn/.off scene compiler -> flat SoA device tensors
  ops/       intersection / sampling / gather kernels (jnp + Pallas)
  models/    integrator pipelines (direct, wavefront path tracer, photon mapper)
  photon/    photon emission, tracing, spatial-hash maps
  parallel/  device-mesh sharding (pjit/shard_map) of ray + photon batches
  utils/     config/flags, RNG, image IO, stats
"""

__version__ = "0.1.0"
