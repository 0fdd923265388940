"""Many-render-context batching + mesh sharding.

The reference renders up to 32 contexts sequentially
(RCKRenderManager::Process, /root/reference/src/CKRenderManager.cpp:521-527;
mask allocation :131). The TPU-native scale story (SURVEY §5, BASELINE config
5: "64 render contexts batched across a v5e slice") maps contexts to a batch
axis: SceneDevice pytrees are stacked on a leading ``ctx`` axis, the frame
program is vmapped over it, and the axis is sharded over a 1-D device mesh.
No collectives are required in the frame program — each context's framebuffer
lives wholly on one chip, so XLA partitions the batch embarrassingly across
ICI with zero communication.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..pipeline.frame import SceneDevice, render_frame_full_impl, render_frame_impl


def stack_scenes(scenes: list[SceneDevice]) -> SceneDevice:
    """Stack same-topology SceneDevice pytrees on a leading context axis.

    Numpy leaves (per-frame dynamic state) stack HOST-side so the batch
    uploads once per field; device leaves (cached pools/streams) stack on
    device with no host round trip."""
    def stack(*xs):
        if all(isinstance(x, np.ndarray) or np.isscalar(x)
               or type(x).__module__ == "numpy" for x in xs):
            return np.stack([np.asarray(x) for x in xs], axis=0)
        return jnp.stack([jnp.asarray(x) for x in xs], axis=0)
    return jax.tree_util.tree_map(stack, *scenes)


def replicate_scene(scene: SceneDevice, n: int) -> SceneDevice:
    return jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x[None], (n,) + x.shape), scene)


@functools.partial(jax.jit, static_argnames=("levels", "height", "width",
                                             "ordered_cap", "chunk"))
def render_frames_batched(scenes: SceneDevice, levels: tuple, height: int,
                          width: int, ordered_cap: int | None = None,
                          chunk: int = 64):
    """(B,...) SceneDevice -> (B,4,H,W) fb, (B,H,W) zb."""
    # Pallas kernels cannot be vmapped over the ctx axis; the XLA reduce
    # handles the batched path.
    fn = functools.partial(render_frame_impl, levels=levels, height=height,
                           width=width, ordered_cap=ordered_cap, chunk=chunk,
                           allow_pallas=False)
    return jax.vmap(fn)(scenes)


@functools.partial(jax.jit, static_argnames=("levels", "height", "width",
                                             "ordered_cap", "chunk",
                                             "want_cube"))
def render_frames_full_batched(scenes: SceneDevice, levels: tuple, height: int,
                               width: int, skin=None, anim=None,
                               anim_t=None, ordered_cap: int | None = None,
                               chunk: int = 64, want_cube: bool = False):
    """Full step (animate -> compose -> skin -> render) over the ctx batch.

    ``skin``/``anim`` are shared (replicated) banks; ``anim_t`` is a (B,)
    per-context animation time — contexts render different frames of the
    same clip (the many-context analogue of a batched training step).
    """
    def fn(scene, t):
        return render_frame_full_impl(
            scene, levels, height, width, skin=skin, anim=anim, anim_t=t,
            ordered_cap=ordered_cap, chunk=chunk, allow_pallas=False,
            want_cube=want_cube)

    if anim_t is None:
        anim_t = jnp.zeros(jax.tree_util.tree_leaves(scenes)[0].shape[0])
    return jax.vmap(fn)(scenes, anim_t)


def make_context_mesh(n_devices: int | None = None,
                      platform: str | None = None) -> Mesh:
    """1-D ``ctx`` mesh over the first ``n_devices`` devices.

    ``platform`` pins the backend (e.g. ``"cpu"`` for the virtual host mesh
    used by the driver's multichip dryrun) instead of whatever backend
    happened to initialize first."""
    devs = jax.devices(platform) if platform else jax.devices()
    n = n_devices if n_devices is not None else len(devs)
    if len(devs) < n:
        raise ValueError(f"need {n} devices on platform {platform or 'default'}, "
                         f"have {len(devs)}")
    return Mesh(np.array(devs[:n]), axis_names=("ctx",))


def shard_scenes(scenes: SceneDevice, mesh: Mesh) -> SceneDevice:
    """Place the leading context axis of every leaf on the ``ctx`` mesh axis."""
    def put(x):
        spec = P("ctx", *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))
    return jax.tree_util.tree_map(put, scenes)


def render_frames_sharded(scenes: SceneDevice, mesh: Mesh, levels: tuple,
                          height: int, width: int, ordered_cap: int | None = None,
                          chunk: int = 64):
    """Jit the batched frame program with the ctx axis sharded over the mesh.

    Output framebuffers inherit the ctx sharding (each chip holds its own
    contexts' pixels — the BackToFront / readback path gathers per context
    on demand, not per frame).
    """
    scenes = shard_scenes(scenes, mesh)
    out_spec = NamedSharding(mesh, P("ctx"))
    fn = functools.partial(render_frames_batched, levels=levels, height=height,
                           width=width, ordered_cap=ordered_cap, chunk=chunk)
    fn = jax.jit(fn, out_shardings=(out_spec, out_spec))
    return fn(scenes)


def render_frames_full_sharded(scenes: SceneDevice, mesh: Mesh, levels: tuple,
                               height: int, width: int, skin=None, anim=None,
                               anim_t=None, ordered_cap: int | None = None,
                               chunk: int = 64):
    """Sharded FULL training-step analogue: per-context animation times,
    shared anim/skin banks (replicated), ctx axis over the device mesh."""
    scenes = shard_scenes(scenes, mesh)
    if anim_t is not None:
        anim_t = jax.device_put(
            jnp.asarray(anim_t, jnp.float32), NamedSharding(mesh, P("ctx")))
    out_spec = NamedSharding(mesh, P("ctx"))
    base = functools.partial(render_frames_full_batched, levels=levels,
                             height=height, width=width,
                             ordered_cap=ordered_cap, chunk=chunk)
    fn = jax.jit(lambda s, sk, an, t: base(s, skin=sk, anim=an, anim_t=t),
                 out_shardings=(out_spec, out_spec))
    return fn(scenes, skin, anim, anim_t)


def render_frames_packed_sharded(static: dict, dyn_f, dyn_i, mesh: Mesh,
                                 **params):
    """Sharded packed batch: the (B, F) f32 / (B, I) i32 dynamic buffers
    shard on the ``ctx`` mesh axis (still one transfer pair for the whole
    batch); statics replicate. Each chip renders its contexts' frames with
    zero collectives — the packed-path version of render_frames_sharded."""
    from ..pipeline.frame import render_frames_packed_batched

    shard = NamedSharding(mesh, P("ctx"))
    rep = NamedSharding(mesh, P())
    dyn_f = jax.device_put(np.asarray(dyn_f), shard)
    dyn_i = jax.device_put(np.asarray(dyn_i), shard)
    static = {k: jax.device_put(v, rep) for k, v in static.items()}
    world_in = params.pop("world_in", None)
    if world_in is not None:       # (B,N,4,4) bound-anim worlds: ctx-sharded
        world_in = jax.device_put(np.asarray(world_in), shard)
    return render_frames_packed_batched(static, dyn_f, dyn_i,
                                        world_in=world_in, **params)
