"""VxMath-equivalent linear algebra, TPU-first.

Conventions match the Virtools VxMath library the reference engine is built on
(reference: /root/reference/include/CKRenderEngineTypes.h uses VxMatrix/VxVector
throughout; matrix semantics are visible in e.g. RCKLight::Setup which reads
position from world-matrix row 3 and direction from row 2,
/root/reference/src/CKLight.cpp:592-656):

- Matrices are 4x4, **row-vector** convention: ``v' = v @ M``.
  Row 0..2 are the X/Y/Z basis axes, row 3 is the translation.
- Composition applies left-to-right: ``world = local @ parent_world``.
- Clip space is D3D-style left-handed: after ``v @ world @ view @ proj``,
  visible points satisfy ``-w <= x <= w``, ``-w <= y <= w``, ``0 <= z <= w``
  (reference: CKRasterizerContext::TransformVertices clip-flag computation,
  /root/reference/src/CKRasterizer/CKRasterizerLib/CKRasterizerContext.cpp:339-362).

All functions are pure jnp and jit/vmap-friendly; they accept batched inputs
(leading axes broadcast). Nothing here holds state.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# Clip flags (Virtools VXCLIP_* semantics; values are the public SDK ones)
# ---------------------------------------------------------------------------
VXCLIP_LEFT = 0x010
VXCLIP_RIGHT = 0x020
VXCLIP_TOP = 0x040
VXCLIP_BOTTOM = 0x080
VXCLIP_FRONT = 0x100
VXCLIP_BACK = 0x200
VXCLIP_ALL = VXCLIP_LEFT | VXCLIP_RIGHT | VXCLIP_TOP | VXCLIP_BOTTOM | VXCLIP_FRONT | VXCLIP_BACK

# Box-visibility results (reference: CKRasterizerContext::ComputeBoxVisibility,
# CKRasterizerLib/CKRasterizerContext.cpp:394-421)
CBV_OFFSCREEN = 0
CBV_VISIBLE = 1
CBV_ALLINSIDE = 3


# ---------------------------------------------------------------------------
# Matrix constructors
# ---------------------------------------------------------------------------

# ---------------------------------------------------------------------------
# Numpy twins for HOST-side object-API math. The jnp versions below trace into
# device programs; calling them from per-tick host code (Rotate, SetStep,
# projection_matrix) would cost a device dispatch + readback round trip per
# call — fatal under the axon TPU tunnel (~30 ms RTT).
# ---------------------------------------------------------------------------

def np_rotation_axis_angle(axis, angle) -> np.ndarray:
    # Scalar-math Rodrigues + one array build: this runs per Rotate() call
    # in host animation loops (128-bone rigs = thousands of calls/s), where
    # eye()/norm()/row-slice assembly costs ~5x the arithmetic.
    import math

    x, y, z = float(axis[0]), float(axis[1]), float(axis[2])
    n = math.sqrt(x * x + y * y + z * z)
    if n > 1e-30:
        x, y, z = x / n, y / n, z / n
    else:
        x, y, z = 0.0, 0.0, 1.0
    c = math.cos(angle)
    s = math.sin(angle)
    t = 1.0 - c
    return np.array([
        [t * x * x + c, t * x * y + s * z, t * x * z - s * y, 0.0],
        [t * x * y - s * z, t * y * y + c, t * y * z + s * x, 0.0],
        [t * x * z + s * y, t * y * z - s * x, t * z * z + c, 0.0],
        [0.0, 0.0, 0.0, 1.0]], np.float32)


def np_perspective(fov: float, aspect: float, near: float, far: float) -> np.ndarray:
    """Engine convention (matches :func:`perspective`): fov is the
    HORIZONTAL field of view, aspect scales y (Virtools SetFov semantics)."""
    m = np.zeros((4, 4), np.float32)
    f = 1.0 / np.tan(fov * 0.5)
    m[0, 0] = f
    m[1, 1] = f * aspect
    m[2, 2] = far / (far - near)
    m[2, 3] = 1.0
    m[3, 2] = -near * far / (far - near)
    return m


def np_orthographic(zoom: float, aspect: float, near: float, far: float) -> np.ndarray:
    """Engine convention (matches :func:`orthographic`)."""
    m = np.zeros((4, 4), np.float32)
    m[0, 0] = zoom
    m[1, 1] = zoom * aspect
    m[2, 2] = 1.0 / (far - near)
    m[3, 2] = -near / (far - near)
    m[3, 3] = 1.0
    return m


def np_quat_slerp(a, b, t: float) -> np.ndarray:
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    d = float(np.dot(a, b))
    if d < 0:
        b = -b
        d = -d
    if d > 0.9995:
        out = a + (b - a) * t
        return out / max(np.linalg.norm(out), 1e-30)
    th = np.arccos(np.clip(d, -1, 1))
    sth = np.sin(th)
    return (np.sin((1 - t) * th) * a + np.sin(t * th) * b) / sth


def np_quat_to_matrix3(q) -> np.ndarray:
    x, y, z, w = np.asarray(q, np.float32)
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y + z * w), 2 * (x * z - y * w)],
        [2 * (x * y - z * w), 1 - 2 * (x * x + z * z), 2 * (y * z + x * w)],
        [2 * (x * z + y * w), 2 * (y * z - x * w), 1 - 2 * (x * x + y * y)],
    ], np.float32)


def np_compose_prs(pos, rot_q, scale) -> np.ndarray:
    m = np.eye(4, dtype=np.float32)
    r = np_quat_to_matrix3(rot_q)
    s = np.asarray(scale, np.float32)
    m[:3, :3] = r * s[:, None]      # row-vector convention: row i * scale[i]
    m[3, :3] = np.asarray(pos, np.float32)
    return m


def np_quat_from_matrix3(r) -> np.ndarray:
    r = np.asarray(r, np.float32)
    tr = r[0, 0] + r[1, 1] + r[2, 2]
    if tr > 0:
        s = np.sqrt(tr + 1.0) * 2
        w = 0.25 * s
        x = (r[1, 2] - r[2, 1]) / s
        y = (r[2, 0] - r[0, 2]) / s
        z = (r[0, 1] - r[1, 0]) / s
    elif r[0, 0] > r[1, 1] and r[0, 0] > r[2, 2]:
        s = np.sqrt(1.0 + r[0, 0] - r[1, 1] - r[2, 2]) * 2
        w = (r[1, 2] - r[2, 1]) / s
        x = 0.25 * s
        y = (r[1, 0] + r[0, 1]) / s
        z = (r[2, 0] + r[0, 2]) / s
    elif r[1, 1] > r[2, 2]:
        s = np.sqrt(1.0 + r[1, 1] - r[0, 0] - r[2, 2]) * 2
        w = (r[2, 0] - r[0, 2]) / s
        x = (r[1, 0] + r[0, 1]) / s
        y = 0.25 * s
        z = (r[2, 1] + r[1, 2]) / s
    else:
        s = np.sqrt(1.0 + r[2, 2] - r[0, 0] - r[1, 1]) * 2
        w = (r[0, 1] - r[1, 0]) / s
        x = (r[2, 0] + r[0, 2]) / s
        y = (r[2, 1] + r[1, 2]) / s
        z = 0.25 * s
    q = np.array([x, y, z, w], np.float32)
    return q / max(np.linalg.norm(q), 1e-30)


def np_decompose_prs(m) -> tuple:
    m = np.asarray(m, np.float32)
    pos = m[3, :3].copy()
    scale = np.linalg.norm(m[:3, :3], axis=1)
    scale = np.where(scale < 1e-30, 1e-30, scale)
    r = m[:3, :3] / scale[:, None]
    if np.linalg.det(r) < 0:
        scale[0] = -scale[0]
        r = m[:3, :3] / scale[:, None]
    return pos, np_quat_from_matrix3(r), scale.astype(np.float32)


def identity(dtype=jnp.float32) -> jnp.ndarray:
    return jnp.eye(4, dtype=dtype)


def from_translation(t) -> jnp.ndarray:
    t = jnp.asarray(t, jnp.float32)
    m = jnp.eye(4, dtype=jnp.float32)
    return m.at[3, :3].set(t)


def from_scale(s) -> jnp.ndarray:
    s = jnp.broadcast_to(jnp.asarray(s, jnp.float32), (3,))
    return jnp.diag(jnp.concatenate([s, jnp.ones((1,), jnp.float32)]))


def rotation_axis_angle(axis, angle) -> jnp.ndarray:
    """Rotation matrix about an (unnormalized) axis, row-vector convention.

    Matches Vx3DMatrixFromRotation semantics: rotating a row vector v via
    ``v @ R`` rotates it by +angle about axis (right-hand rule in the engine's
    left-handed world gives the D3D rotation direction).
    """
    axis = jnp.asarray(axis, jnp.float32)
    axis = axis / jnp.maximum(jnp.linalg.norm(axis), 1e-30)
    x, y, z = axis[0], axis[1], axis[2]
    c = jnp.cos(angle)
    s = jnp.sin(angle)
    t = 1.0 - c
    # Row-vector convention: this is the transpose of the usual column-vector
    # rotation matrix.
    r = jnp.array(
        [
            [t * x * x + c, t * x * y + s * z, t * x * z - s * y, 0.0],
            [t * x * y - s * z, t * y * y + c, t * y * z + s * x, 0.0],
            [t * x * z + s * y, t * y * z - s * x, t * z * z + c, 0.0],
            [0.0, 0.0, 0.0, 1.0],
        ],
        jnp.float32,
    )
    return r


def perspective(fov: float, aspect: float, near: float, far: float) -> jnp.ndarray:
    """D3D-LH perspective projection, Virtools VxMatrix::Perspective semantics.

    ``fov`` is the horizontal field of view; ``aspect = width / height``
    multiplies the Y scale (reference: RCKRenderContext::UpdateProjection,
    /root/reference/src/CKRenderContext.cpp:2783-2808, and the m[2][2]/m[3][2]/
    m[2][3] structure visible in SetClipRect, :2743-2781).
    """
    cot = jnp.cos(fov * 0.5) / jnp.sin(fov * 0.5)
    zf = far / (far - near)
    z = jnp.zeros((), jnp.float32)
    o = jnp.ones((), jnp.float32)
    return jnp.stack(
        [
            jnp.stack([cot, z, z, z]),
            jnp.stack([z, cot * aspect, z, z]),
            jnp.stack([z, z, zf, o]),
            jnp.stack([z, z, -zf * near, z]),
        ]
    ).astype(jnp.float32)


def orthographic(zoom: float, aspect: float, near: float, far: float) -> jnp.ndarray:
    """D3D-LH orthographic projection, VxMatrix::Orthographic semantics."""
    izf = 1.0 / (far - near)
    z = jnp.zeros((), jnp.float32)
    o = jnp.ones((), jnp.float32)
    zoom = jnp.asarray(zoom, jnp.float32)
    return jnp.stack(
        [
            jnp.stack([zoom, z, z, z]),
            jnp.stack([z, zoom * aspect, z, z]),
            jnp.stack([z, z, izf * o, z]),
            jnp.stack([z, z, -near * izf, o]),
        ]
    ).astype(jnp.float32)


def look_at(pos, target, up=(0.0, 1.0, 0.0)) -> jnp.ndarray:
    """World matrix for an entity at `pos` looking at `target` (LH, +Z forward).

    Row 2 is the view direction, row 3 the position — the layout RCKLight::Setup
    and CKRenderedScene::PrepareCameras rely on (reference:
    src/CKRenderedScene.cpp:484-536).
    """
    pos = jnp.asarray(pos, jnp.float32)
    target = jnp.asarray(target, jnp.float32)
    up = jnp.asarray(up, jnp.float32)
    zaxis = target - pos
    zaxis = zaxis / jnp.maximum(jnp.linalg.norm(zaxis), 1e-30)
    xaxis = jnp.cross(up, zaxis)
    xn = jnp.linalg.norm(xaxis)
    # Degenerate up||dir: pick any perpendicular.
    xaxis = jnp.where(xn > 1e-6, xaxis / jnp.maximum(xn, 1e-30), jnp.array([1.0, 0.0, 0.0], jnp.float32))
    yaxis = jnp.cross(zaxis, xaxis)
    m = jnp.stack(
        [
            jnp.concatenate([xaxis, jnp.zeros((1,), jnp.float32)]),
            jnp.concatenate([yaxis, jnp.zeros((1,), jnp.float32)]),
            jnp.concatenate([zaxis, jnp.zeros((1,), jnp.float32)]),
            jnp.concatenate([pos, jnp.ones((1,), jnp.float32)]),
        ]
    )
    return m


# ---------------------------------------------------------------------------
# Matrix ops
# ---------------------------------------------------------------------------

def multiply(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Compose: apply `a` first, then `b` (row-vector convention) = a @ b."""
    return jnp.matmul(a, b)


def inverse(m: jnp.ndarray) -> jnp.ndarray:
    return jnp.linalg.inv(m)


def inverse_rigid(m: jnp.ndarray) -> jnp.ndarray:
    """Fast inverse for orthonormal-rotation + translation matrices.

    The lazy inverse-world cache of RCK3dEntity (reference:
    src/CK3dEntity.cpp:2770-2781) is replaced by recomputation — on TPU a 4x4
    inverse is cheaper than cache bookkeeping.
    """
    r = m[..., :3, :3]
    t = m[..., 3, :3]
    rt = jnp.swapaxes(r, -1, -2)
    nt = -jnp.einsum("...i,...ij->...j", t, rt)
    top = jnp.concatenate([rt, jnp.zeros(rt.shape[:-2] + (3, 1), m.dtype)], axis=-1)
    bot = jnp.concatenate([nt, jnp.ones(nt.shape[:-1] + (1,), m.dtype)], axis=-1)[..., None, :]
    return jnp.concatenate([top, bot], axis=-2)


def transform_points(points: jnp.ndarray, m: jnp.ndarray) -> jnp.ndarray:
    """Affine-transform (...,3) points by a 4x4 matrix (no perspective divide).

    Equivalent of Vx3DMultiplyMatrixVector (strided batch form used by
    CKRasterizerContext::TransformVertices).
    """
    return jnp.einsum("...i,...ij->...j", points, m[..., :3, :3]) + m[..., 3, :3]


def transform_vectors(vectors: jnp.ndarray, m: jnp.ndarray) -> jnp.ndarray:
    """Rotate (...,3) direction vectors (ignores translation)."""
    return jnp.einsum("...i,...ij->...j", vectors, m[..., :3, :3])


def transform_points4(points: jnp.ndarray, m: jnp.ndarray) -> jnp.ndarray:
    """Full homogeneous transform: (...,3) points -> (...,4) clip coords.

    Equivalent of Vx3DMultiplyMatrixVector4 (reference:
    CKRasterizerLib/CKRasterizerContext.cpp:335).
    """
    return transform_h4(jnp.concatenate([points, jnp.ones(points.shape[:-1] + (1,), points.dtype)], -1), m)


def transform_h4(points4: jnp.ndarray, m: jnp.ndarray) -> jnp.ndarray:
    """(...,4) @ (4,4)."""
    return jnp.einsum("...i,...ij->...j", points4, m)


def clip_flags(clip: jnp.ndarray) -> jnp.ndarray:
    """Per-vertex VXCLIP flags from (...,4) clip-space coords.

    Mirrors CKRasterizerContext::TransformVertices
    (CKRasterizerLib/CKRasterizerContext.cpp:341-361).
    """
    x, y, z, w = clip[..., 0], clip[..., 1], clip[..., 2], clip[..., 3]
    f = jnp.zeros(clip.shape[:-1], jnp.uint32)
    f = f | jnp.where(-w > x, jnp.uint32(VXCLIP_LEFT), jnp.uint32(0))
    f = f | jnp.where(x > w, jnp.uint32(VXCLIP_RIGHT), jnp.uint32(0))
    f = f | jnp.where(-w > y, jnp.uint32(VXCLIP_BOTTOM), jnp.uint32(0))
    f = f | jnp.where(y > w, jnp.uint32(VXCLIP_TOP), jnp.uint32(0))
    f = f | jnp.where(z < 0.0, jnp.uint32(VXCLIP_FRONT), jnp.uint32(0))
    f = f | jnp.where(z > w, jnp.uint32(VXCLIP_BACK), jnp.uint32(0))
    return f


def clip_to_screen(clip: jnp.ndarray, view_x, view_y, view_w, view_h) -> jnp.ndarray:
    """Viewport mapping: (...,4) clip coords -> (...,4) screen coords.

    Output layout matches the reference's screen vertices
    (CKRasterizerLib/CKRasterizerContext.cpp:366-390):
    ``x_s = cx + x/w * W/2``, ``y_s = cy - y/w * H/2``, ``z_s = z/w``,
    ``w_s = 1/w`` (the reciprocal is kept for perspective-correct interpolation).
    """
    half_w = view_w * 0.5
    half_h = view_h * 0.5
    cx = view_x + half_w
    cy = view_y + half_h
    rw = 1.0 / clip[..., 3]
    xs = cx + clip[..., 0] * rw * half_w
    ys = cy - clip[..., 1] * rw * half_h
    zs = clip[..., 2] * rw
    return jnp.stack([xs, ys, zs, rw], axis=-1)


# ---------------------------------------------------------------------------
# Quaternions (x, y, z, w) — used by the animation controllers
# ---------------------------------------------------------------------------

def quat_identity() -> jnp.ndarray:
    return jnp.array([0.0, 0.0, 0.0, 1.0], jnp.float32)


def quat_normalize(q: jnp.ndarray) -> jnp.ndarray:
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-30)


def quat_multiply(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product a*b = rotation b-then-a in column convention; with our
    row-vector matrices, ``quat_to_matrix(quat_multiply(a, b))`` equals
    ``quat_to_matrix(b) @ quat_to_matrix(a)``."""
    ax, ay, az, aw = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bx, by, bz, bw = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
            aw * bw - ax * bx - ay * by - az * bz,
        ],
        axis=-1,
    )


def quat_from_axis_angle(axis, angle) -> jnp.ndarray:
    axis = jnp.asarray(axis, jnp.float32)
    axis = axis / jnp.maximum(jnp.linalg.norm(axis, axis=-1, keepdims=True), 1e-30)
    half = jnp.asarray(angle, jnp.float32) * 0.5
    s = jnp.sin(half)
    return jnp.concatenate([axis * s[..., None], jnp.cos(half)[..., None]], axis=-1)


def quat_to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion -> 4x4 rotation matrix (row-vector convention).

    Built so that ``transform_vectors(v, quat_to_matrix(q))`` rotates v by q.
    """
    q = quat_normalize(q)
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    o = jnp.ones_like(x)
    zr = jnp.zeros_like(x)
    rows = [
        jnp.stack([o - 2 * (yy + zz), 2 * (xy + wz), 2 * (xz - wy), zr], -1),
        jnp.stack([2 * (xy - wz), o - 2 * (xx + zz), 2 * (yz + wx), zr], -1),
        jnp.stack([2 * (xz + wy), 2 * (yz - wx), o - 2 * (xx + yy), zr], -1),
        jnp.stack([zr, zr, zr, o], -1),
    ]
    return jnp.stack(rows, axis=-2)


def quat_from_matrix(m: jnp.ndarray) -> jnp.ndarray:
    """Rotation part of a (possibly scaled) row-vector matrix -> quaternion.

    Branch-free Shepperd's method (jit-safe): computes all four candidate
    solutions and selects the numerically best by the largest pivot.
    """
    r = m[..., :3, :3]
    # Remove scale.
    scale = jnp.linalg.norm(r, axis=-1, keepdims=True)
    r = r / jnp.maximum(scale, 1e-30)
    m00, m01, m02 = r[..., 0, 0], r[..., 0, 1], r[..., 0, 2]
    m10, m11, m12 = r[..., 1, 0], r[..., 1, 1], r[..., 1, 2]
    m20, m21, m22 = r[..., 2, 0], r[..., 2, 1], r[..., 2, 2]
    tr = m00 + m11 + m22

    def safe_sqrt(v):
        return jnp.sqrt(jnp.maximum(v, 1e-30))

    # candidate w-major
    qw0 = safe_sqrt(1.0 + tr) * 0.5
    s0 = 0.25 / jnp.maximum(qw0, 1e-30)
    c0 = jnp.stack([(m12 - m21) * s0, (m20 - m02) * s0, (m01 - m10) * s0, qw0], -1)
    # candidate x-major
    qx1 = safe_sqrt(1.0 + m00 - m11 - m22) * 0.5
    s1 = 0.25 / jnp.maximum(qx1, 1e-30)
    c1 = jnp.stack([qx1, (m01 + m10) * s1, (m02 + m20) * s1, (m12 - m21) * s1], -1)
    # candidate y-major
    qy2 = safe_sqrt(1.0 - m00 + m11 - m22) * 0.5
    s2 = 0.25 / jnp.maximum(qy2, 1e-30)
    c2 = jnp.stack([(m01 + m10) * s2, qy2, (m12 + m21) * s2, (m20 - m02) * s2], -1)
    # candidate z-major
    qz3 = safe_sqrt(1.0 - m00 - m11 + m22) * 0.5
    s3 = 0.25 / jnp.maximum(qz3, 1e-30)
    c3 = jnp.stack([(m02 + m20) * s3, (m12 + m21) * s3, qz3, (m01 - m10) * s3], -1)

    pivots = jnp.stack([tr, m00 - m11 - m22, m11 - m00 - m22, m22 - m00 - m11], -1)
    idx = jnp.argmax(pivots, axis=-1)
    cands = jnp.stack([c0, c1, c2, c3], axis=-2)
    onehot = jax.nn.one_hot(idx, 4, dtype=cands.dtype)
    q = jnp.einsum("...c,...cd->...d", onehot, cands)
    return quat_normalize(q)


def quat_slerp(a: jnp.ndarray, b: jnp.ndarray, t) -> jnp.ndarray:
    """Shortest-arc slerp with lerp fallback for nearly-parallel quaternions."""
    t = jnp.asarray(t, jnp.float32)
    dot = jnp.sum(a * b, axis=-1, keepdims=True)
    b = jnp.where(dot < 0.0, -b, b)
    dot = jnp.abs(dot)
    dot = jnp.minimum(dot, 1.0)
    theta = jnp.arccos(jnp.clip(dot, -1.0, 1.0))
    sin_theta = jnp.sin(theta)
    use_lerp = sin_theta < 1e-5
    wa = jnp.where(use_lerp, 1.0 - t, jnp.sin((1.0 - t) * theta) / jnp.where(use_lerp, 1.0, sin_theta))
    wb = jnp.where(use_lerp, t, jnp.sin(t * theta) / jnp.where(use_lerp, 1.0, sin_theta))
    return quat_normalize(wa * a + wb * b)


# ---------------------------------------------------------------------------
# Quaternion log/exp + squad (TCB rotation controllers,
# reference RCKTCBRotationController, src/CKKeyframeData.cpp:1134-1210)
# ---------------------------------------------------------------------------

def quat_conjugate(q: jnp.ndarray) -> jnp.ndarray:
    return q * jnp.array([-1.0, -1.0, -1.0, 1.0], jnp.float32)


def quat_log(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion -> 3-vector (axis * half-angle)."""
    q = quat_normalize(q)
    v = q[..., :3]
    vn = jnp.linalg.norm(v, axis=-1, keepdims=True)
    phi = jnp.arctan2(vn, q[..., 3:4])
    scale = jnp.where(vn > 1e-9, phi / jnp.maximum(vn, 1e-30), 1.0)
    return v * scale


def quat_exp(v: jnp.ndarray) -> jnp.ndarray:
    """3-vector (axis * half-angle) -> unit quaternion."""
    phi = jnp.linalg.norm(v, axis=-1, keepdims=True)
    s = jnp.where(phi > 1e-9, jnp.sin(phi) / jnp.maximum(phi, 1e-30), 1.0)
    return jnp.concatenate([v * s, jnp.cos(phi)], axis=-1)


def quat_slerp_noflip(a: jnp.ndarray, b: jnp.ndarray, t) -> jnp.ndarray:
    """Slerp WITHOUT the shortest-arc sign flip — squad's inner terms must
    interpolate the exact control quaternions or C1 continuity breaks."""
    t = jnp.asarray(t, jnp.float32)
    dot = jnp.clip(jnp.sum(a * b, axis=-1, keepdims=True), -1.0, 1.0)
    theta = jnp.arccos(dot)
    sin_theta = jnp.sin(theta)
    use_lerp = jnp.abs(sin_theta) < 1e-5
    safe = jnp.where(use_lerp, 1.0, sin_theta)
    wa = jnp.where(use_lerp, 1.0 - t, jnp.sin((1.0 - t) * theta) / safe)
    wb = jnp.where(use_lerp, t, jnp.sin(t * theta) / safe)
    return quat_normalize(wa * a + wb * b)


def quat_squad(q0, a, b, q1, t) -> jnp.ndarray:
    """Spherical quadrangle interpolation Squad(t; q0, a, b, q1)."""
    t = jnp.asarray(t, jnp.float32)
    outer = quat_slerp_noflip(q0, q1, t)
    inner = quat_slerp_noflip(a, b, t)
    return quat_slerp_noflip(outer, inner, 2.0 * t * (1.0 - t))


def np_quat_mul(a, b) -> np.ndarray:
    """Numpy twin of quat_multiply (Hamilton product, xyzw)."""
    ax, ay, az, aw = np.asarray(a, np.float32)
    bx, by, bz, bw = np.asarray(b, np.float32)
    return np.array([
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
        aw * bw - ax * bx - ay * by - az * bz,
    ], np.float32)


def np_quat_conj(q) -> np.ndarray:
    q = np.asarray(q, np.float32)
    return q * np.array([-1, -1, -1, 1], np.float32)


def np_quat_log(q) -> np.ndarray:
    q = np.asarray(q, np.float32)
    q = q / max(np.linalg.norm(q), 1e-30)
    vn = float(np.linalg.norm(q[:3]))
    if vn < 1e-9:
        return q[:3].copy()
    phi = float(np.arctan2(vn, q[3]))
    return (q[:3] * (phi / vn)).astype(np.float32)


def np_quat_exp(v) -> np.ndarray:
    v = np.asarray(v, np.float32)
    phi = float(np.linalg.norm(v))
    if phi < 1e-9:
        return np.array([v[0], v[1], v[2], np.cos(phi)], np.float32)
    s = np.sin(phi) / phi
    return np.array([v[0] * s, v[1] * s, v[2] * s, np.cos(phi)], np.float32)


def np_quat_slerp_noflip(a, b, t: float) -> np.ndarray:
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    d = float(np.clip(np.dot(a, b), -1.0, 1.0))
    th = float(np.arccos(d))
    sth = np.sin(th)
    if abs(sth) < 1e-5:
        out = a + (b - a) * t
        return (out / max(np.linalg.norm(out), 1e-30)).astype(np.float32)
    out = (np.sin((1 - t) * th) * a + np.sin(t * th) * b) / sth
    return (out / max(np.linalg.norm(out), 1e-30)).astype(np.float32)


def np_quat_squad(q0, a, b, q1, t: float) -> np.ndarray:
    outer = np_quat_slerp_noflip(q0, q1, t)
    inner = np_quat_slerp_noflip(a, b, t)
    return np_quat_slerp_noflip(outer, inner, 2.0 * t * (1.0 - t))


# ---------------------------------------------------------------------------
# PRS decompose / compose (for animation matrix rebuild,
# reference: RCKObjectAnimation::SetStep, src/CKObjectAnimation.cpp:1716-1752)
# ---------------------------------------------------------------------------

def compose_prs(pos: jnp.ndarray, rot_q: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    """local = S @ R @ T (row-vector: scale first, then rotate, then translate)."""
    r = quat_to_matrix(rot_q)
    m = r.at[..., 0, :3].multiply(scale[..., 0:1])
    m = m.at[..., 1, :3].multiply(scale[..., 1:2])
    m = m.at[..., 2, :3].multiply(scale[..., 2:3])
    m = m.at[..., 3, :3].set(pos)
    return m


def decompose_prs(m: jnp.ndarray):
    """Matrix -> (position, rotation quat, scale). Assumes no shear."""
    pos = m[..., 3, :3]
    scale = jnp.linalg.norm(m[..., :3, :3], axis=-1)
    rot = quat_from_matrix(m)
    return pos, rot, scale


def oct_encode(r: "jnp.ndarray") -> "jnp.ndarray":
    """Octahedral encode of (..., 3) unit direction vectors to (..., 2)
    UVs in [0,1] — the cube-environment atlas parameterization
    (CKTexture.SetCubeMapFaces bakes the 6 faces into this layout)."""
    denom = jnp.maximum(jnp.sum(jnp.abs(r), axis=-1, keepdims=True), 1e-12)
    p = r / denom
    snz = lambda a: jnp.where(a >= 0, 1.0, -1.0)
    flip = jnp.stack([
        (1.0 - jnp.abs(p[..., 1])) * snz(p[..., 0]),
        (1.0 - jnp.abs(p[..., 0])) * snz(p[..., 1]),
    ], -1)
    xy = jnp.where((p[..., 2] < 0)[..., None], flip, p[..., :2])
    return xy * 0.5 + 0.5
