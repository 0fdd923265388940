"""ckrenderengine_tpu — a TPU-native rebuild of the Virtools CK2 render engine.

A retained-mode scene-graph renderer (the capability set of doyaGu/CKRenderEngine)
re-architected for JAX/XLA/Pallas:

- The CK object API (RenderManager / RenderContext / Mesh / Material / 3dEntity /
  Camera / Light / Render()) is preserved as a thin host layer over flat SoA scene
  state (a pytree of arrays).
- The transform hierarchy (reference: src/CK3dEntity.cpp WorldMatrixChanged recursion)
  becomes batched level-ordered matrix composition.
- The DX9 rasterizer backend (reference: src/CKRasterizer/CKDX9Rasterizer/) is replaced
  by a tile-binned software rasterizer in XLA/Pallas: vertex transform + Gouraud
  lighting on the MXU/VPU, Z-buffered perspective-correct textured raster writing
  framebuffer tiles.
- Many render contexts batch over a `jax.sharding.Mesh` axis via shard_map/pjit.

Subpackages:
    math      — VxMath-equivalent linear algebra (row-vector 4x4 convention)
    raster    — rasterizer HAL, numpy oracle ("NULL device"), JAX/Pallas backend
    scene     — SoA scene state, scene graph ordering/culling, render manager/context
    objects   — CK object model (mesh, material, texture, light, camera, 2d/3d entities)
    anim      — keyframe controllers, object/keyed animation, character, skin, IK
    utils     — geometry-optimization utilities (striper, cache optimizer, radix, ...)
    parallel  — device-mesh sharding of the context batch axis
"""

__version__ = "0.1.0"
