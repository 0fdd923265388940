"""Device skinning: batched vertex-major bone blending.

The reference deforms skins bone-major — RCKSkin::CalcPointsEx walks each
bone's gather list and scatter-accumulates weighted vec4s into the mesh's
modifier vertex array (/root/reference/src/CKSkin.cpp:183-331, per-bone
RCKSkinBonePoints built by BuildBonePointLists :419+). That is a CPU cache
optimization; on TPU a scatter-accumulate serializes. We invert it to the
classic vertex-major gather (SURVEY §2.5 TPU mapping):

    pos'(v) = sum_k  w_k(v) * (rest(v) @ B[bone_k(v)])

with a fixed per-vertex bone budget K (pad weights with 0). Each vertex is
independent — the whole skin pass is a few (SV,K,...) gathers + one einsum,
VPU/MXU-friendly and fused by XLA into the frame program.

Bone matrix semantics follow RCKSkinBoneData (src/CKSkin.cpp:153-181,266-271):
in row-vector convention the full chain applied to a rest-pose vertex is

    B = object_init @ bone_initial_inverse @ bone_world @ object_inv_world

where ``object_init @ bone_initial_inverse`` is constant (precomputed host-
side into ``pre``), and ``bone_world``/``object_inv_world`` come from the
frame's composed world matrices.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..math import vxmath as vx


class SkinBank(NamedTuple):
    """All skins of a scene flattened into one device bank.

    SV = total skinned vertices (padded), B = total bones (padded),
    K = per-vertex bone budget.
    """

    pool_idx: jnp.ndarray    # (SV,) int32 — vertex-pool rows to overwrite
    rest_pos: jnp.ndarray    # (SV,3) rest-pose positions (mesh local)
    rest_nrm: jnp.ndarray    # (SV,3) rest-pose normals
    bone_idx: jnp.ndarray    # (SV,K) int32 into the bone axis
    bone_w: jnp.ndarray      # (SV,K) f32, rows sum to 1 (0-padded)
    valid: jnp.ndarray       # (SV,) bool — false for pad rows
    bone_row: jnp.ndarray    # (B,) int32 entity-table row of each bone
    obj_row: jnp.ndarray     # (B,) int32 entity-table row of the skinned object
    pre: jnp.ndarray         # (B,4,4) object_init @ bone_initial_inverse

    @staticmethod
    def empty(k: int = 4) -> "SkinBank":
        return SkinBank(
            pool_idx=jnp.zeros((0,), jnp.int32),
            rest_pos=jnp.zeros((0, 3), jnp.float32),
            rest_nrm=jnp.zeros((0, 3), jnp.float32),
            bone_idx=jnp.zeros((0, k), jnp.int32),
            bone_w=jnp.zeros((0, k), jnp.float32),
            valid=jnp.zeros((0,), bool),
            bone_row=jnp.zeros((0,), jnp.int32),
            obj_row=jnp.zeros((0,), jnp.int32),
            pre=jnp.zeros((0, 4, 4), jnp.float32),
        )


def bone_matrices(world: jnp.ndarray, bank: SkinBank) -> jnp.ndarray:
    """(B,4,4) full bone transforms from composed world matrices."""
    bw = jnp.take(world, bank.bone_row, axis=0)              # (B,4,4)
    ow = jnp.take(world, bank.obj_row, axis=0)               # (B,4,4)
    inv_ow = jax.vmap(vx.inverse)(ow)
    return jnp.matmul(bank.pre, jnp.matmul(bw, inv_ow))


def apply_skin(world: jnp.ndarray, positions: jnp.ndarray, normals: jnp.ndarray,
               bank: SkinBank,
               ranges: tuple = ()) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Write skinned positions/normals into the vertex pool.

    positions/normals: (V,3) pool arrays. Returns updated copies.

    ``ranges``: static ((bank_row0, pool_row0, count), ...) when every
    skin's pool rows are contiguous (they are — bank_descriptor maps
    ``pool_offset + arange(v)``): the pool write is then a dense
    ``dynamic_update_slice`` per skin at copy bandwidth. Without ranges it
    falls back to the general row scatter, which the TPU executes at ~8
    ns/ELEMENT — ~3 ms/frame at 60k verts x 3 components x 2 arrays, 10x
    the cost of the whole skinning math (config 4's hidden top term).
    """
    if bank.pool_idx.shape[0] == 0:
        return positions, normals
    bmats = bone_matrices(world, bank)                       # (B,4,4)
    # Bone-matrix fetch through the one-hot MXU join (bit-exact, see
    # deferred.take_small): the general gather costs ~8 ns/row regardless
    # of table size — at 60k verts x 4 bones that is ~2 ms/frame, vs ~0.2
    # ms of dense one-hot matmul against the tiny (B<=128, 16) bank.
    from ..raster.deferred import take_small

    sv, k = bank.bone_idx.shape
    vb = take_small(bmats.reshape(-1, 16),
                    bank.bone_idx.reshape(-1)).reshape(sv, k, 4, 4)

    p4 = jnp.concatenate(
        [bank.rest_pos, jnp.ones(bank.rest_pos.shape[:-1] + (1,), jnp.float32)], -1)
    # (SV,K,4) = (SV,1,4) @ (SV,K,4,4)
    pk = jnp.einsum("vi,vkij->vkj", p4, vb)
    pos = jnp.sum(pk[..., :3] * bank.bone_w[..., None], axis=1)

    # Normals: rotate by the 3x3 part (no translation), renormalize.
    nk = jnp.einsum("vi,vkij->vkj", bank.rest_nrm, vb[..., :3, :3])
    nrm = jnp.sum(nk * bank.bone_w[..., None], axis=1)
    nrm = nrm / jnp.maximum(jnp.linalg.norm(nrm, axis=-1, keepdims=True), 1e-12)

    if ranges:
        for (vo, po, v) in ranges:
            positions = jax.lax.dynamic_update_slice(
                positions, pos[vo:vo + v], (po, 0))
            normals = jax.lax.dynamic_update_slice(
                normals, nrm[vo:vo + v], (po, 0))
        return positions, normals
    idx = jnp.where(bank.valid, bank.pool_idx, positions.shape[0])  # OOB drop
    positions = positions.at[idx].set(pos, mode="drop")
    normals = normals.at[idx].set(nrm, mode="drop")
    return positions, normals


def build_skin_bank(skins: list, k: int = 4, pad: int = 8) -> SkinBank | None:
    """Host: flatten per-entity skin descriptors into one bank.

    ``skins``: list of dicts with keys pool_offset (int), rest_pos (V,3),
    rest_nrm (V,3), bone_idx (V,K') int, bone_w (V,K'), bone_rows (B',),
    obj_row (int), pre (B',4,4). Returns None when empty.
    """
    if not skins:
        return None
    sv = sum(s["rest_pos"].shape[0] for s in skins)
    b = sum(s["bone_rows"].shape[0] for s in skins)
    sv_pad = max(pad, ((sv + pad - 1) // pad) * pad)
    b_pad = max(1, b)

    pool_idx = np.zeros(sv_pad, np.int32)
    rest_pos = np.zeros((sv_pad, 3), np.float32)
    rest_nrm = np.zeros((sv_pad, 3), np.float32)
    bone_idx = np.zeros((sv_pad, k), np.int32)
    bone_w = np.zeros((sv_pad, k), np.float32)
    valid = np.zeros(sv_pad, bool)
    bone_row = np.zeros(b_pad, np.int32)
    obj_row = np.zeros(b_pad, np.int32)
    pre = np.tile(np.eye(4, dtype=np.float32), (b_pad, 1, 1))

    vo = 0
    bo = 0
    for s in skins:
        v = s["rest_pos"].shape[0]
        nb = s["bone_rows"].shape[0]
        kk = min(k, s["bone_idx"].shape[1])
        pool_idx[vo:vo + v] = s["pool_offset"] + np.arange(v)
        rest_pos[vo:vo + v] = s["rest_pos"]
        rest_nrm[vo:vo + v] = s["rest_nrm"]
        bone_idx[vo:vo + v, :kk] = s["bone_idx"][:, :kk] + bo
        w = s["bone_w"][:, :kk].astype(np.float32)
        wsum = w.sum(axis=1, keepdims=True)
        bone_w[vo:vo + v, :kk] = np.where(wsum > 1e-12, w / np.maximum(wsum, 1e-12), w)
        valid[vo:vo + v] = True
        bone_row[bo:bo + nb] = s["bone_rows"]
        obj_row[bo:bo + nb] = s["obj_row"]
        pre[bo:bo + nb] = s["pre"]
        vo += v
        bo += nb

    return SkinBank(
        pool_idx=jnp.asarray(pool_idx), rest_pos=jnp.asarray(rest_pos),
        rest_nrm=jnp.asarray(rest_nrm), bone_idx=jnp.asarray(bone_idx),
        bone_w=jnp.asarray(bone_w), valid=jnp.asarray(valid),
        bone_row=jnp.asarray(bone_row), obj_row=jnp.asarray(obj_row),
        pre=jnp.asarray(pre))
