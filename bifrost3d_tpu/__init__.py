"""bifrost3d_tpu — a TPU-native differentiable path-tracing framework.

A brand-new JAX/XLA/Pallas implementation of the capabilities of
papaboo/Bifrost3D's OptiXRenderer (see SURVEY.md): a wavefront Monte-Carlo
path tracer with a data-oriented scene datamodel, GGX/EON shading models,
next-event estimation with RIS + MIS, environment-map importance sampling,
progressive accumulation, AOVs, camera post effects, and glTF/OBJ loading —
designed TPU-first: rays and pixel tiles shard across a `jax.sharding.Mesh`,
scene buffers replicate in HBM, and the hot kernels are Pallas.

Subpackages
-----------
- ``math``       : vectors, transforms, colors, distributions-as-tables
- ``sampling``   : RNG hashes, Owen-scrambled Sobol, PMJ, unit-sphere samplers
- ``bsdf``       : Lambert / EON Oren-Nayar / Burley / GGX reflection+transmission
- ``shading``    : Default / Diffuse / Transmissive shading models + rho fittings
- ``lights``     : sphere / spot / directional / environment light sampling
- ``geometry``   : triangle meshes, BVH build + traversal (Pallas kernel)
- ``integrator`` : wavefront path tracer, progressive accumulation, AOVs
- ``scene``      : data-oriented scene description (cameras, materials, nodes)
- ``io``         : image + OBJ/glTF I/O, image comparison metrics
- ``post``       : camera effects (exposure, bloom, tonemapping)
- ``parallel``   : device-mesh sharding helpers, distributed rendering
"""

__version__ = "0.1.0"

# Persistent XLA compilation cache: the flagship render + post chain costs
# minutes of compile on the tunneled TPU (measured 2026-08-20: viewer
# CornellBox cold 373 s -> warm 12.6 s); caching makes every CLI relaunch
# (viewer, bench, tests-on-TPU) start warm. Opt out: BIFROST_NO_COMPILE_CACHE.
import os as _os

if not _os.environ.get("BIFROST_NO_COMPILE_CACHE"):
    import jax as _jax

    _cache_dir = _os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        _os.path.join(_os.path.expanduser("~"), ".cache", "bifrost3d_jax"))
    try:
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:  # older jax without the knobs — run uncached
        pass
