"""Device animation bank: every PRS track of an animation evaluated in one call.

The reference evaluates controllers per entity per tick on the CPU
(RCKObjectAnimation::SetStep, /root/reference/src/CKObjectAnimation.cpp:
1674-1759: Evaluate{Position,Rotation,Scale,ScaleAxis} then rebuild the local
matrix, then LocalMatrixChanged recursion). TPU inversion: all tracks of all
animated entities are padded into one bank, a single vmapped evaluation
produces every local matrix, and one scatter updates the entity table — the
result feeds compose_world inside the SAME jitted frame program (animate ->
compose -> skin -> render, no host round trip).

Missing tracks fall back to the entity's base PRS decomposition, mirroring
the reference's "decompose to fill missing parts" (:1716-1752).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..math import vxmath as vx
from .keyframe import eval_quat_track, eval_vector_track


class AnimBank(NamedTuple):
    """A = animated entities, K = padded key count."""

    entity_row: jnp.ndarray   # (A,) int32 target entity-table rows
    # position track
    pos_times: jnp.ndarray    # (A,K)
    pos_values: jnp.ndarray   # (A,K,3)
    pos_tin: jnp.ndarray      # (A,K,3)
    pos_tout: jnp.ndarray     # (A,K,3)
    pos_mode: jnp.ndarray     # (A,) int32
    pos_ease: jnp.ndarray     # (A,K,2) per-key (ease_to, ease_from)
    pos_n: jnp.ndarray        # (A,) int32 (0 = no track)
    # rotation track (slerp or TCB squad)
    rot_times: jnp.ndarray    # (A,K)
    rot_quats: jnp.ndarray    # (A,K,4) (preflipped for TCB)
    rot_ta: jnp.ndarray       # (A,K,4) outgoing squad control quats
    rot_tb: jnp.ndarray       # (A,K,4) incoming squad control quats
    rot_mode: jnp.ndarray     # (A,) int32
    rot_ease: jnp.ndarray     # (A,K,2)
    rot_n: jnp.ndarray        # (A,) int32
    # scale track
    scl_times: jnp.ndarray
    scl_values: jnp.ndarray
    scl_tin: jnp.ndarray
    scl_tout: jnp.ndarray
    scl_mode: jnp.ndarray
    scl_ease: jnp.ndarray
    scl_n: jnp.ndarray
    # base PRS fallback (decomposed entity local at bank build)
    base_pos: jnp.ndarray     # (A,3)
    base_rot: jnp.ndarray     # (A,4)
    base_scl: jnp.ndarray     # (A,3)
    # Scatter-free application (built when n_entities is known): row i of the
    # entity table takes bank lane inv_row[i] (A = "keep local[i]"). Turns
    # the (A,4,4)->(N,4,4) scatter into gather+select, which XLA TPU fuses
    # freely (a scatter output feeding the frame program forces copy/alias
    # bookkeeping around the raster loops).
    inv_row: jnp.ndarray | None = None   # (N,) int32 in [0, A]
    has_anim: jnp.ndarray | None = None  # (N,) bool


def evaluate_bank_prs(bank: AnimBank, t: jnp.ndarray):
    """Evaluate every track at time t -> (pos (A,3), rot (A,4), scl (A,3))."""
    a = bank.entity_row.shape[0]
    tt = jnp.broadcast_to(jnp.asarray(t, jnp.float32), (a,))
    pos = jax.vmap(eval_vector_track)(
        bank.pos_times, bank.pos_values, bank.pos_tin, bank.pos_tout,
        bank.pos_mode, bank.pos_ease, bank.pos_n, tt)
    rot = jax.vmap(eval_quat_track)(
        bank.rot_times, bank.rot_quats, bank.rot_ta, bank.rot_tb,
        bank.rot_mode, bank.rot_ease, bank.rot_n, tt)
    scl = jax.vmap(eval_vector_track)(
        bank.scl_times, bank.scl_values, bank.scl_tin, bank.scl_tout,
        bank.scl_mode, bank.scl_ease, bank.scl_n, tt)
    pos = jnp.where((bank.pos_n > 0)[:, None], pos, bank.base_pos)
    rot = jnp.where((bank.rot_n > 0)[:, None], rot, bank.base_rot)
    scl = jnp.where((bank.scl_n > 0)[:, None], scl, bank.base_scl)
    return pos, rot, scl


def blend_prs(p0, r0, s0, p1, r1, s1, factor):
    """Blend two PRS sets (warper/merged-animation blending,
    reference RCKObjectAnimation merged evaluation + CKCharacter warps)."""
    f = jnp.asarray(factor, jnp.float32)
    pos = p0 * (1.0 - f) + p1 * f
    scl = s0 * (1.0 - f) + s1 * f
    rot = jax.vmap(lambda a, b: vx.quat_slerp(a, b, f))(r0, r1)
    return pos, rot, scl


def prs_to_locals(pos, rot, scl):
    """(A,3),(A,4),(A,3) -> (A,4,4) local matrices."""
    return jax.vmap(vx.compose_prs)(pos, rot, scl)


def _merge_locals(local: jnp.ndarray, bank: AnimBank,
                  mats: jnp.ndarray) -> jnp.ndarray:
    """Write the bank lanes' matrices into the entity-table rows.

    Prefers the scatter-free gather+select form (inv_row present); falls
    back to a scatter when the bank was built without the entity count."""
    if bank.inv_row is not None and bank.inv_row.shape[0] == local.shape[0]:
        padded = jnp.concatenate(
            [mats, jnp.eye(4, dtype=mats.dtype)[None]], axis=0)
        picked = jnp.take(padded, bank.inv_row, axis=0)
        return jnp.where(bank.has_anim[:, None, None], picked, local)
    return local.at[bank.entity_row].set(mats, mode="drop")


def apply_bank(local: jnp.ndarray, bank: AnimBank, t) -> jnp.ndarray:
    """Evaluate at time t and merge the (A,4,4) locals into (N,4,4)."""
    pos, rot, scl = evaluate_bank_prs(bank, t)
    mats = prs_to_locals(pos, rot, scl)
    return _merge_locals(local, bank, mats)


def apply_bank_blended(local: jnp.ndarray, bank_a: AnimBank, t_a,
                       bank_b: AnimBank, t_b, factor) -> jnp.ndarray:
    """Two-animation blend (transition warp): banks must target the same
    entity_row layout (built from the same character)."""
    p0, r0, s0 = evaluate_bank_prs(bank_a, t_a)
    p1, r1, s1 = evaluate_bank_prs(bank_b, t_b)
    pos, rot, scl = blend_prs(p0, r0, s0, p1, r1, s1, factor)
    mats = prs_to_locals(pos, rot, scl)
    return _merge_locals(local, bank_a, mats)


def build_anim_bank(object_anims: list, entity_rows: list[int],
                    pad_keys: int | None = None,
                    n_entities: int | None = None) -> AnimBank | None:
    """Host: pack CKObjectAnimation controllers into an AnimBank.

    object_anims[i] animates entity_rows[i]. Returns None when empty.
    ``n_entities`` (the entity-table row count) enables the scatter-free
    application path (inv_row/has_anim).
    """
    if not object_anims:
        return None
    a = len(object_anims)
    kmax = 1
    for oa in object_anims:
        for c in (oa.position_controller, oa.rotation_controller,
                  oa.scale_controller):
            if c is not None:
                kmax = max(kmax, c.GetKeyCount())
    k = pad_keys or max(2, kmax)

    def z(shape, fill=0.0):
        return np.full(shape, fill, np.float32)

    pos_times = z((a, k), 3.0e38)
    pos_values = z((a, k, 3))
    pos_tin = z((a, k, 3))
    pos_tout = z((a, k, 3))
    pos_mode = np.zeros(a, np.int32)
    pos_ease = z((a, k, 2))
    pos_n = np.zeros(a, np.int32)
    rot_times = z((a, k), 3.0e38)
    rot_quats = z((a, k, 4))
    rot_quats[..., 3] = 1.0
    rot_ta = rot_quats.copy()
    rot_tb = rot_quats.copy()
    rot_mode = np.zeros(a, np.int32)
    rot_ease = z((a, k, 2))
    rot_n = np.zeros(a, np.int32)
    scl_times = z((a, k), 3.0e38)
    scl_values = z((a, k, 3), 1.0)
    scl_tin = z((a, k, 3))
    scl_tout = z((a, k, 3))
    scl_mode = np.zeros(a, np.int32)
    scl_ease = z((a, k, 2))
    scl_n = np.zeros(a, np.int32)
    base_pos = z((a, 3))
    base_rot = z((a, 4))
    base_rot[:, 3] = 1.0
    base_scl = z((a, 3), 1.0)

    for i, oa in enumerate(object_anims):
        ent = oa.Get3dEntity()
        if ent is not None:
            bp, br, bs = vx.decompose_prs(jnp.asarray(ent.GetLocalMatrix()))
            base_pos[i] = np.asarray(bp)
            base_rot[i] = np.asarray(br)
            base_scl[i] = np.asarray(bs)
        c = oa.position_controller
        if c is not None and c.GetKeyCount() > 0:
            t_, v_, ti_, to_, m_, e_, n_ = c.bank_row(k)
            pos_times[i], pos_values[i] = t_, v_
            pos_tin[i], pos_tout[i] = ti_, to_
            pos_mode[i], pos_ease[i], pos_n[i] = m_, e_, n_
        c = oa.rotation_controller
        if c is not None and c.GetKeyCount() > 0:
            t_, q_, ta_, tb_, m_, e_, n_ = c.bank_row(k)
            rot_times[i], rot_quats[i], rot_n[i] = t_, q_, n_
            rot_ta[i], rot_tb[i] = ta_, tb_
            rot_mode[i], rot_ease[i] = m_, e_
        c = oa.scale_controller
        if c is not None and c.GetKeyCount() > 0:
            t_, v_, ti_, to_, m_, e_, n_ = c.bank_row(k)
            scl_times[i], scl_values[i] = t_, v_
            scl_tin[i], scl_tout[i] = ti_, to_
            scl_mode[i], scl_ease[i], scl_n[i] = m_, e_, n_

    inv_row = has_anim = None
    if n_entities is not None:
        inv_np = np.full(n_entities, a, np.int32)
        rows_np = np.asarray(entity_rows, np.int64)
        ok = (rows_np >= 0) & (rows_np < n_entities)
        inv_np[rows_np[ok]] = np.nonzero(ok)[0].astype(np.int32)
        inv_row = jnp.asarray(inv_np)
        has_anim = jnp.asarray(inv_np < a)

    j = jnp.asarray
    return AnimBank(
        entity_row=j(np.asarray(entity_rows, np.int32)),
        pos_times=j(pos_times), pos_values=j(pos_values), pos_tin=j(pos_tin),
        pos_tout=j(pos_tout), pos_mode=j(pos_mode), pos_ease=j(pos_ease),
        pos_n=j(pos_n),
        rot_times=j(rot_times), rot_quats=j(rot_quats), rot_ta=j(rot_ta),
        rot_tb=j(rot_tb), rot_mode=j(rot_mode), rot_ease=j(rot_ease),
        rot_n=j(rot_n),
        scl_times=j(scl_times), scl_values=j(scl_values), scl_tin=j(scl_tin),
        scl_tout=j(scl_tout), scl_mode=j(scl_mode), scl_ease=j(scl_ease),
        scl_n=j(scl_n),
        base_pos=j(base_pos), base_rot=j(base_rot), base_scl=j(base_scl),
        inv_row=inv_row, has_anim=has_anim)
