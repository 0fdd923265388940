"""Animation subsystem tests (SURVEY §2.5): controllers, object/keyed
animations, character state machine, skinning, IK, and the fused
animate->skin->render device program."""

import numpy as np
import jax.numpy as jnp
import pytest

from ckrenderengine_tpu.objects import (
    CKContext, CK3dObject, CKCamera, CKMaterial, CKMesh,
)
from ckrenderengine_tpu.anim import (
    CKANIMATION_LINEAR_POS, CKANIMATION_LINEAR_ROT, CKANIMATION_LINEAR_SCL,
    CKANIMATION_TCB_POS, CKAnimation, CKBodyPart, CKCharacter,
    CKKeyedAnimation, CKKinematicChain, CKObjectAnimation, build_anim_bank,
    apply_bank, evaluate_bank_prs,
)
from ckrenderengine_tpu.math import vxmath as vx


def _quat_axis_angle(axis, angle):
    axis = np.asarray(axis, np.float32)
    axis = axis / np.linalg.norm(axis)
    s = np.sin(angle / 2)
    return np.array([axis[0] * s, axis[1] * s, axis[2] * s,
                     np.cos(angle / 2)], np.float32)


# ---------------------------------------------------------------------------
# Controllers
# ---------------------------------------------------------------------------

class TestControllers:
    def test_linear_position_interpolation(self):
        ctx = CKContext()
        oa = CKObjectAnimation(ctx)
        c = oa.CreateController(CKANIMATION_LINEAR_POS)
        c.AddKey(0.0, (0, 0, 0))
        c.AddKey(10.0, (10, 20, 30))
        np.testing.assert_allclose(c.Evaluate(5.0), [5, 10, 15], atol=1e-5)
        # clamping outside range
        np.testing.assert_allclose(c.Evaluate(-1.0), [0, 0, 0], atol=1e-5)
        np.testing.assert_allclose(c.Evaluate(99.0), [10, 20, 30], atol=1e-5)

    def test_tcb_passes_through_keys(self):
        ctx = CKContext()
        oa = CKObjectAnimation(ctx)
        c = oa.CreateController(CKANIMATION_TCB_POS)
        keys = [(0.0, (0, 0, 0)), (5.0, (3, 1, -2)), (10.0, (0, 4, 0))]
        for t, v in keys:
            c.AddKey(t, v)
        for t, v in keys:
            np.testing.assert_allclose(c.Evaluate(t), v, atol=1e-4)

    def test_rotation_slerp_midpoint(self):
        ctx = CKContext()
        oa = CKObjectAnimation(ctx)
        c = oa.CreateController(CKANIMATION_LINEAR_ROT)
        c.AddKey(0.0, _quat_axis_angle((0, 1, 0), 0.0))
        c.AddKey(1.0, _quat_axis_angle((0, 1, 0), np.pi / 2))
        mid = c.Evaluate(0.5)
        expect = _quat_axis_angle((0, 1, 0), np.pi / 4)
        assert min(np.linalg.norm(mid - expect),
                   np.linalg.norm(mid + expect)) < 1e-4


# ---------------------------------------------------------------------------
# Object / keyed animation
# ---------------------------------------------------------------------------

class TestObjectAnimation:
    def test_setstep_writes_local_matrix(self):
        ctx = CKContext()
        ent = CK3dObject(ctx, "e")
        oa = CKObjectAnimation(ctx, "a")
        oa.Set3dEntity(ent)
        pc = oa.CreateController(CKANIMATION_LINEAR_POS)
        pc.AddKey(0.0, (0, 0, 0))
        pc.AddKey(10.0, (4, 0, 0))
        oa.SetStep(5.0)
        np.testing.assert_allclose(ent.GetPosition(), [2, 0, 0], atol=1e-5)

    def test_missing_tracks_fall_back_to_base(self):
        ctx = CKContext()
        ent = CK3dObject(ctx, "e")
        ent.SetScale((2.0, 2.0, 2.0))
        oa = CKObjectAnimation(ctx, "a")
        oa.Set3dEntity(ent)
        pc = oa.CreateController(CKANIMATION_LINEAR_POS)
        pc.AddKey(0.0, (1, 1, 1))
        oa.SetStep(0.0)
        m = ent.GetLocalMatrix()
        # scale preserved from base, position from track
        np.testing.assert_allclose(m[3, :3], [1, 1, 1], atol=1e-5)
        np.testing.assert_allclose(np.linalg.norm(m[0, :3]), 2.0, atol=1e-4)

    def test_bank_matches_host_evaluation(self):
        ctx = CKContext()
        ents, anims = [], []
        rng = np.random.default_rng(0)
        for i in range(3):
            ent = CK3dObject(ctx, f"e{i}")
            oa = CKObjectAnimation(ctx, f"a{i}")
            oa.Set3dEntity(ent)
            pc = oa.CreateController(CKANIMATION_LINEAR_POS)
            rc = oa.CreateController(CKANIMATION_LINEAR_ROT)
            for t in (0.0, 3.0, 7.0, 10.0):
                pc.AddKey(t, rng.normal(size=3))
                rc.AddKey(t, _quat_axis_angle(rng.normal(size=3) + 0.1,
                                              rng.uniform(0, np.pi)))
            ents.append(ent)
            anims.append(oa)
        bank = build_anim_bank(anims, [e.row for e in ents])
        t = 4.7
        pos, rot, scl = evaluate_bank_prs(bank, t)
        for i, oa in enumerate(anims):
            np.testing.assert_allclose(np.asarray(pos)[i],
                                       oa.EvaluatePosition(t), atol=1e-5)
            hr = oa.EvaluateRotation(t)
            dr = np.asarray(rot)[i]
            assert min(np.linalg.norm(dr - hr), np.linalg.norm(dr + hr)) < 1e-5

    def test_keyed_animation_applies_all(self):
        ctx = CKContext()
        ka = CKKeyedAnimation(ctx, "clip")
        ents = []
        for i in range(2):
            ent = CK3dObject(ctx, f"e{i}")
            oa = CKObjectAnimation(ctx)
            oa.Set3dEntity(ent)
            pc = oa.CreateController(CKANIMATION_LINEAR_POS)
            pc.AddKey(0.0, (0, 0, 0))
            pc.AddKey(10.0, (float(i + 1), 0, 0))
            ka.AddAnimation(oa)
            ents.append(ent)
        assert ka.GetLength() == 10.0
        ka.SetFrame(5.0)
        np.testing.assert_allclose(ents[0].GetPosition(), [0.5, 0, 0], atol=1e-5)
        np.testing.assert_allclose(ents[1].GetPosition(), [1.0, 0, 0], atol=1e-5)
        assert ka.GetAnimation(ents[1]) is ka.animations[1]

    def test_transition_snapshot(self):
        ctx = CKContext()
        ent = CK3dObject(ctx)
        a = CKObjectAnimation(ctx, "a")
        a.Set3dEntity(ent)
        pa = a.CreateController(CKANIMATION_LINEAR_POS)
        pa.AddKey(0.0, (0, 0, 0))
        pa.AddKey(10.0, (10, 0, 0))
        b = CKObjectAnimation(ctx, "b")
        b.Set3dEntity(ent)
        pb = b.CreateController(CKANIMATION_LINEAR_POS)
        pb.AddKey(0.0, (0, 5, 0))
        tr = a.CreateTransition(b, 4.0, from_t=10.0, to_t=0.0)
        tr.SetStep(0.0)
        np.testing.assert_allclose(ent.GetPosition(), [10, 0, 0], atol=1e-4)
        tr.SetStep(4.0)
        np.testing.assert_allclose(ent.GetPosition(), [0, 5, 0], atol=1e-4)
        tr.SetStep(2.0)
        np.testing.assert_allclose(ent.GetPosition(), [5, 2.5, 0], atol=1e-4)


# ---------------------------------------------------------------------------
# Character state machine
# ---------------------------------------------------------------------------

def _make_walk_char(ctx):
    ch = CKCharacter(ctx, "char")
    root = CKBodyPart(ctx, "hips")
    arm = CKBodyPart(ctx, "arm")
    ch.AddBodyPart(root)
    ch.AddBodyPart(arm)
    clip = CKKeyedAnimation(ctx, "walk")
    oa = CKObjectAnimation(ctx)
    oa.Set3dEntity(arm)
    pc = oa.CreateController(CKANIMATION_LINEAR_POS)
    pc.AddKey(0.0, (0, 0, 0))
    pc.AddKey(10.0, (0, 1, 0))
    clip.AddAnimation(oa)
    root_oa = CKObjectAnimation(ctx)
    root_oa.Set3dEntity(root)
    rp = root_oa.CreateController(CKANIMATION_LINEAR_POS)
    rp.AddKey(0.0, (0, 0, 0))
    rp.AddKey(10.0, (0, 0, 2.0))   # 2 units forward per loop
    clip.AddAnimation(root_oa)
    clip.SetRootAnimation(root_oa)
    ch.AddAnimation(clip)
    return ch, root, arm, clip


class TestCharacter:
    def test_frame_stepping_and_loop(self):
        ctx = CKContext()
        ch, root, arm, clip = _make_walk_char(ctx)
        ch.SetActiveAnimation(clip)
        for _ in range(4):
            ch.ProcessAnimation(3.0)      # 12 frames -> wraps at 10
        assert 0.0 <= clip.frame < 10.0
        assert clip.frame == pytest.approx(2.0)

    def test_root_motion_translates_character(self):
        ctx = CKContext()
        ch, root, arm, clip = _make_walk_char(ctx)
        ch.SetActiveAnimation(clip)
        ch.ProcessAnimation(10.0)         # one full loop = 2 units forward
        np.testing.assert_allclose(ch.GetPosition()[2], 2.0, atol=1e-4)
        # root part stays glued to the character origin (local translation 0)
        np.testing.assert_allclose(root.GetLocalMatrix()[3, :3], 0.0, atol=1e-4)

    def test_warp_transition_completes(self):
        ctx = CKContext()
        ch, root, arm, clip = _make_walk_char(ctx)
        run = CKKeyedAnimation(ctx, "run")
        oa = CKObjectAnimation(ctx)
        oa.Set3dEntity(arm)
        pc = oa.CreateController(CKANIMATION_LINEAR_POS)
        pc.AddKey(0.0, (1, 0, 0))
        pc.AddKey(8.0, (1, 2, 0))
        run.AddAnimation(oa)
        ch.AddAnimation(run)
        ch.SetActiveAnimation(clip)
        ch.ProcessAnimation(5.0)
        ch.SetNextActiveAnimation(
            run, CKAnimation.TRANSITION_BREAK | CKAnimation.TRANSITION_WARP,
            warp_length=4.0)
        assert ch._warping
        ch.ProcessAnimation(2.0)          # halfway through warp
        p = arm.GetLocalMatrix()[3, :3]
        assert 0 < p[0] < 1               # blending toward run pose x=1
        ch.ProcessAnimation(2.0)          # warp done
        assert not ch._warping
        assert ch.GetActiveAnimation() is run
        np.testing.assert_allclose(arm.GetLocalMatrix()[3, :3], [1, 0, 0],
                                   atol=1e-4)

    def test_secondary_animation_loops_then_stops(self):
        ctx = CKContext()
        ch, root, arm, clip = _make_walk_char(ctx)
        wave = CKKeyedAnimation(ctx, "wave")
        oa = CKObjectAnimation(ctx)
        oa.Set3dEntity(arm)
        pc = oa.CreateController(CKANIMATION_LINEAR_POS)
        pc.AddKey(0.0, (0, 0, 0))
        pc.AddKey(4.0, (0, 0, 1))
        wave.AddAnimation(oa)
        ch.PlaySecondaryAnimation(wave, loops=2)
        assert ch.GetSecondaryAnimationsCount() == 1
        ch.ProcessAnimation(4.0)          # loop 1 done
        assert ch.GetSecondaryAnimationsCount() == 1
        ch.ProcessAnimation(4.0)          # loop 2 done -> removed
        assert ch.GetSecondaryAnimationsCount() == 0

    def test_device_pose_matches_host(self):
        ctx = CKContext()
        ch, root, arm, clip = _make_walk_char(ctx)
        ch.SetActiveAnimation(clip)
        clip.frame = 5.0
        n = ctx.entity_table.count
        local0 = jnp.asarray(ctx.entity_table.local[:n])
        local1 = ch.apply_pose_device(local0)
        clip.SetFrame(5.0)                # host path
        np.testing.assert_allclose(
            np.asarray(local1)[arm.row], ctx.entity_table.local[arm.row],
            atol=1e-5)


# ---------------------------------------------------------------------------
# Skinning
# ---------------------------------------------------------------------------

def _make_two_bone_skin(ctx):
    """A 2-bone 'arm': a 2x4 vertex strip along +x (rows y=0 and y=1),
    bone0 at origin drives columns 0-1, bone1 at x=2 drives columns 2-3."""
    obj = CK3dObject(ctx, "skinned")
    mesh = CKMesh(ctx, "strip")
    pos = np.array([[c, r, 0] for r in (0, 1) for c in range(4)], np.float32)
    faces = []
    for c in range(3):
        faces.append([c, c + 5, c + 1])
        faces.append([c, c + 4, c + 5])
    mesh.SetPositions(pos)
    mesh.SetFaces(np.asarray(faces, np.int32))
    mesh.BuildNormals()
    obj.SetCurrentMesh(mesh)

    b0 = CK3dObject(ctx, "bone0")
    b1 = CK3dObject(ctx, "bone1")
    b1.SetPosition((2, 0, 0))

    skin = obj.CreateSkin()
    skin.SetObjectInitMatrix(np.eye(4, dtype=np.float32))
    skin.SetBoneCount(2)
    for i, b in enumerate((b0, b1)):
        bd = skin.GetBoneData(i)
        bd.SetBone(b)
        bd.SetBoneInitialInverseMatrix(np.linalg.inv(b.GetWorldMatrix()))
    skin.SetRestPose(pos, mesh.normals)
    for v in range(8):
        skin.SetVertexWeights(v, [0 if (v % 4) < 2 else 1], [1.0])
    return obj, mesh, skin, b0, b1


class TestSkin:
    def test_rest_pose_is_identity(self):
        ctx = CKContext()
        obj, mesh, skin, b0, b1 = _make_two_bone_skin(ctx)
        np.testing.assert_allclose(skin.CalcPoints(), skin.rest_pos, atol=1e-5)

    def test_bone_translation_moves_bound_vertices(self):
        ctx = CKContext()
        obj, mesh, skin, b0, b1 = _make_two_bone_skin(ctx)
        b1.SetPosition((2, 1, 0))         # lift outer bone by +y
        pts = skin.CalcPoints()
        np.testing.assert_allclose(pts[0], [0, 0, 0], atol=1e-5)
        np.testing.assert_allclose(pts[2], [2, 1, 0], atol=1e-5)
        np.testing.assert_allclose(pts[3], [3, 1, 0], atol=1e-5)

    def test_blended_vertex(self):
        ctx = CKContext()
        obj, mesh, skin, b0, b1 = _make_two_bone_skin(ctx)
        skin.SetVertexWeights(1, [0, 1], [0.5, 0.5])
        b1.Translate((0, 2, 0))
        pts = skin.CalcPoints()
        np.testing.assert_allclose(pts[1], [1, 1, 0], atol=1e-5)

    def test_device_matches_host(self):
        ctx = CKContext()
        obj, mesh, skin, b0, b1 = _make_two_bone_skin(ctx)
        from ckrenderengine_tpu.pipeline.skinning import apply_skin, build_skin_bank

        b1.SetPosition((1.5, 0.5, 0.3))
        b1.Rotate((0, 0, 1), 0.4)
        bank = build_skin_bank([skin.bank_descriptor(0)])
        world = ctx.entity_table.world_matrices()
        pool_pos = jnp.asarray(skin.rest_pos)
        pool_nrm = jnp.asarray(skin.rest_nrm)
        dpos, dnrm = apply_skin(world, pool_pos, pool_nrm, bank)
        np.testing.assert_allclose(np.asarray(dpos)[:8], skin.CalcPoints(),
                                   atol=1e-4)

    def test_skinned_render_changes_with_bone(self):
        ctx = CKContext()
        obj, mesh, skin, b0, b1 = _make_two_bone_skin(ctx)
        mat = CKMaterial(ctx, "m")
        mat.SetDiffuse((1, 0, 0, 1))
        mesh.ApplyGlobalMaterial(mat)
        rm = ctx.GetRenderManager()
        rc = rm.CreateRenderContext(64, 64)
        cam = CKCamera(ctx, "cam")
        cam.SetPosition((1.5, 0.5, -6.0))
        rc.AttachViewpointToCamera(cam)
        rc.Render()
        fb0 = rc.framebuffer().copy()
        b1.SetPosition((2, 2, 0))
        rc.Render()
        fb1 = rc.framebuffer()
        assert fb0.sum() > 0
        assert np.abs(fb1 - fb0).sum() > 1e-3


# ---------------------------------------------------------------------------
# IK
# ---------------------------------------------------------------------------

class TestIK:
    def test_three_joint_chain_reaches_target(self):
        ctx = CKContext()
        parts = []
        prev = None
        for i in range(4):
            p = CKBodyPart(ctx, f"j{i}")
            if prev is not None:
                p.SetParent(prev)
                p.SetPosition((1, 0, 0), ref=prev)   # unit links
            parts.append(p)
            prev = p
        chain = CKKinematicChain(ctx, "chain")
        chain.SetStartEffector(parts[0])
        chain.SetEndEffector(parts[3])
        assert chain.GetChainBodyCount() == 4
        assert chain.GetChainLength() == pytest.approx(3.0, abs=1e-4)
        target = np.array([1.5, 1.5, 0.5], np.float32)
        ok = chain.IKSetEffectorPos(target, max_iterations=60, tolerance=5e-3)
        eff = parts[3].GetWorldMatrix()[3, :3]
        assert np.linalg.norm(eff - target) < 1e-2, (ok, eff)


# ---------------------------------------------------------------------------
# Fused device frame: animate -> compose -> skin -> render
# ---------------------------------------------------------------------------

class TestFusedFrame:
    def test_anim_bank_in_frame_program(self):
        from ckrenderengine_tpu.pipeline import frame as fr

        ctx = CKContext()
        ent = CK3dObject(ctx, "cube")
        mesh = CKMesh(ctx, "m")
        s = 0.5
        v = np.array([[x, y, z] for x in (-s, s) for y in (-s, s)
                      for z in (-s, s)], np.float32)
        f = np.array([[0, 2, 3], [0, 3, 1], [4, 5, 7], [4, 7, 6],
                      [0, 1, 5], [0, 5, 4], [2, 6, 7], [2, 7, 3],
                      [0, 4, 6], [0, 6, 2], [1, 3, 7], [1, 7, 5]], np.int32)
        mesh.SetPositions(v)
        mesh.SetFaces(f)
        mesh.BuildNormals()
        mat = CKMaterial(ctx, "mat")
        mesh.ApplyGlobalMaterial(mat)
        ent.SetCurrentMesh(mesh)
        rm = ctx.GetRenderManager()
        rc = rm.CreateRenderContext(64, 64)
        cam = CKCamera(ctx, "cam")
        cam.SetPosition((0, 0, -3))
        rc.AttachViewpointToCamera(cam)

        oa = CKObjectAnimation(ctx)
        oa.Set3dEntity(ent)
        pc = oa.CreateController(CKANIMATION_LINEAR_POS)
        pc.AddKey(0.0, (0, 0, 0))
        pc.AddKey(10.0, (40, 0, 0))       # moves offscreen by frame 10
        bank = build_anim_bank([oa], [ent.row])

        rc._compile()
        scene = rc._build_scene_device()
        fb_t0, _ = fr.render_frame_full(
            scene, rc._compiled.levels, 64, 64, anim=bank, anim_t=0.0,
            ordered_cap=rc._compiled.ordered_cap)
        fb_t10, _ = fr.render_frame_full(
            scene, rc._compiled.levels, 64, 64, anim=bank, anim_t=10.0,
            ordered_cap=rc._compiled.ordered_cap)
        assert np.asarray(fb_t0).sum() > 0       # cube visible at t=0
        assert np.asarray(fb_t10).sum() == pytest.approx(0.0, abs=1e-6)


class TestScaleAxis:
    def test_scale_axis_rotated_frame(self):
        from ckrenderengine_tpu.anim import (
            CKANIMATION_LINEAR_SCL, CKANIMATION_LINEAR_SCLAXIS,
        )

        ctx = CKContext()
        ent = CK3dObject(ctx, "e")
        oa = CKObjectAnimation(ctx)
        oa.Set3dEntity(ent)
        sc = oa.CreateController(CKANIMATION_LINEAR_SCL)
        sc.AddKey(0.0, (2.0, 1.0, 1.0))      # stretch along the scale axis x
        sa = oa.CreateController(CKANIMATION_LINEAR_SCLAXIS)
        # scale axis rotated 90 deg about z: the stretch lands on world y
        sa.AddKey(0.0, _quat_axis_angle((0, 0, 1), np.pi / 2))
        oa.SetStep(0.0)
        m = ent.GetLocalMatrix()
        # row norms: y row stretched, x row unit
        np.testing.assert_allclose(np.linalg.norm(m[1, :3]), 2.0, atol=1e-4)
        np.testing.assert_allclose(np.linalg.norm(m[0, :3]), 1.0, atol=1e-4)


def test_object_animation_velocity():
    """GetVelocity = one-frame finite difference of the position track
    (reference RCKObjectAnimation::GetVelocity,
    src/CKObjectAnimation.cpp:1621+)."""
    from ckrenderengine_tpu.anim import (
        CKANIMATION_LINEAR_POS, CKObjectAnimation)
    from ckrenderengine_tpu.objects import CKContext

    ctx = CKContext()
    oa = CKObjectAnimation(ctx, "a")
    pc = oa.CreateController(CKANIMATION_LINEAR_POS)
    pc.AddKey(0.0, (0, 0, 0))
    pc.AddKey(10.0, (10, 0, 0))
    assert abs(oa.GetVelocity(0.5)[0] - 1.0) < 1e-4
    # at the clip end the difference flips to backward — same magnitude
    assert abs(oa.GetVelocity(1.0)[0] - 1.0) < 1e-4
    oa2 = CKObjectAnimation(ctx, "b")
    assert np.allclose(oa2.GetVelocity(0.3), 0.0)   # no track -> zero


# ---------------------------------------------------------------------------
# Vectorized host-bank SetFrame (anim/host_bank.py)
# ---------------------------------------------------------------------------

class TestHostBankSetFrame:
    """CKKeyedAnimation.SetFrame's batched numpy path must match the
    per-member SetStep loop bit-for-bit in behavior."""

    def _build_clip(self, ctx, n=7, seed=0):
        from ckrenderengine_tpu.anim import (
            CKANIMATION_BEZIER_POS, CKANIMATION_TCB_POS, CKANIMATION_TCB_SCL,
        )
        rng = np.random.default_rng(seed)
        clip = CKKeyedAnimation(ctx, "clip")
        ents = []
        for i in range(n):
            ent = CK3dObject(ctx, f"e{i}")
            # varied bases so missing-track fallbacks are visible
            ent.SetPosition(tuple(rng.normal(size=3)))
            ent.SetScale((1.0 + 0.3 * i % 2, 1.0, 2.0 - 0.2 * (i % 3)))
            oa = CKObjectAnimation(ctx, f"a{i}")
            oa.Set3dEntity(ent)
            kinds = i % 4
            if kinds in (0, 1, 2):      # pos track (different interp modes)
                ptype = [CKANIMATION_LINEAR_POS, CKANIMATION_TCB_POS,
                         CKANIMATION_BEZIER_POS][kinds]
                pc = oa.CreateController(ptype)
                for t in (0.0, 3.0, 7.5, 12.0):
                    pc.AddKey(t, rng.normal(size=3))
            if kinds in (0, 1, 3):      # rot track
                rc = oa.CreateController(CKANIMATION_LINEAR_ROT)
                for t in (0.0, 4.0, 9.0, 12.0):
                    rc.AddKey(t, _quat_axis_angle(rng.normal(size=3) + 0.05,
                                                  rng.uniform(0, np.pi)))
            if kinds in (1, 3):         # scale track
                sc = oa.CreateController(CKANIMATION_TCB_SCL)
                for t in (0.0, 6.0, 12.0):
                    sc.AddKey(t, rng.uniform(0.5, 2.0, 3))
            clip.AddAnimation(oa)
            ents.append(ent)
        return clip, ents

    def test_matches_per_member_setstep(self):
        for seed in range(3):
            ctx_a, ctx_b = CKContext(), CKContext()
            clip_a, ents_a = self._build_clip(ctx_a, seed=seed)
            clip_b, ents_b = self._build_clip(ctx_b, seed=seed)
            for t in (0.0, 1.3, 5.5, 7.5, 11.9, 12.0, 50.0):
                clip_a.SetFrame(t)              # batched path (>=2 simple)
                for a in clip_b.animations:     # reference: per-member loop
                    a.SetStep(t)
                for ea, eb in zip(ents_a, ents_b):
                    np.testing.assert_allclose(
                        ea.GetLocalMatrix(), eb.GetLocalMatrix(),
                        atol=1e-5, err_msg=f"seed={seed} t={t}")

    def test_marks_entities_moved(self):
        ctx = CKContext()
        rm = ctx.GetRenderManager()
        clip, ents = self._build_clip(ctx)
        rm.PreProcess()
        assert len(rm._moved_entities) == 0
        clip.SetFrame(2.0)
        for e in ents:
            assert e.id in rm._moved_entities

    def test_key_edit_invalidates_bank(self):
        ctx = CKContext()
        clip, ents = self._build_clip(ctx, n=3)
        clip.SetFrame(1.0)
        pc = clip.animations[0].position_controller
        if pc is None:
            pc = clip.animations[0].CreateController(CKANIMATION_LINEAR_POS)
        pc.AddKey(2.0, (100.0, 0.0, 0.0))
        clip.SetFrame(2.0)
        np.testing.assert_allclose(ents[0].GetPosition(), [100, 0, 0],
                                   atol=1e-4)

    def test_morph_member_uses_slow_path(self):
        from ckrenderengine_tpu.anim import CKANIMATION_MORPH
        ctx = CKContext()
        clip, ents = self._build_clip(ctx, n=3)
        ent = CK3dObject(ctx, "morphed")
        mesh = CKMesh(ctx, "m")
        base = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
        mesh.SetPositions(base)
        mesh.SetFaces(np.array([[0, 1, 2]], np.int32))
        ent.SetCurrentMesh(mesh)
        oa = CKObjectAnimation(ctx, "morph")
        oa.Set3dEntity(ent)
        mc = oa.CreateMorphController(3)
        mc.AddKey(0.0, base)
        mc.AddKey(10.0, base + np.float32([0, 0, 2]))
        clip.AddAnimation(oa)
        clip.SetFrame(5.0)
        np.testing.assert_allclose(mesh.positions[0], [0, 0, 1], atol=1e-5)


class TestHostBankCacheInvalidation:
    """The cached simple/rest partition (SetFrame) must invalidate on key
    edits, entity rebinds, and membership changes (full_signature covers
    them); stale caches would keep animating from old keys."""

    def _clip(self, ctx, n=3):
        clip = CKKeyedAnimation(ctx, "clip")
        ents = []
        for i in range(n):
            e = CK3dObject(ctx, f"e{i}")
            oa = CKObjectAnimation(ctx, f"oa{i}")
            oa.Set3dEntity(e)
            pc = oa.CreateController(CKANIMATION_LINEAR_POS)
            pc.AddKey(0.0, (0, 0, 0))
            pc.AddKey(10.0, (float(i + 1), 0, 0))
            clip.AddAnimation(oa)
            ents.append(e)
        return clip, ents

    def test_key_edit_invalidates(self):
        ctx = CKContext()
        clip, ents = self._clip(ctx)
        clip.SetFrame(5.0)
        np.testing.assert_allclose(ents[2].GetPosition()[0], 1.5, atol=1e-5)
        clip.animations[2].position_controller.AddKey(10.0, (30.0, 0, 0))
        clip.SetFrame(5.0)
        np.testing.assert_allclose(ents[2].GetPosition()[0], 15.0, atol=1e-5)

    def test_unbind_drops_member(self):
        ctx = CKContext()
        clip, ents = self._clip(ctx)
        clip.SetFrame(5.0)
        clip.animations[1].Set3dEntity(None)
        clip.SetFrame(10.0)
        np.testing.assert_allclose(ents[0].GetPosition()[0], 1.0, atol=1e-5)
        np.testing.assert_allclose(ents[2].GetPosition()[0], 3.0, atol=1e-5)

    def test_membership_change_invalidates(self):
        ctx = CKContext()
        clip, ents = self._clip(ctx)
        clip.SetFrame(5.0)
        e = CK3dObject(ctx, "late")
        oa = CKObjectAnimation(ctx, "late")
        oa.Set3dEntity(e)
        pc = oa.CreateController(CKANIMATION_LINEAR_POS)
        pc.AddKey(0.0, (0, 0, 0))
        pc.AddKey(10.0, (0, 8.0, 0))
        clip.AddAnimation(oa)
        clip.SetFrame(5.0)
        np.testing.assert_allclose(e.GetPosition()[1], 4.0, atol=1e-5)


class TestDeviceBoundAnimation:
    """rc.BindAnimation(clip): the clip's track bank evaluates inside the
    frame program (animate stage); SetFrame costs one packed scalar."""

    def _scene(self):
        from ckrenderengine_tpu.objects import CKCamera, CKMaterial, CKMesh
        ctx = CKContext()
        rc = ctx.GetRenderManager().CreateRenderContext(64, 64)
        cam = CKCamera(ctx, "cam")
        cam.SetPosition((0, 0, -6))
        rc.AttachViewpointToCamera(cam)
        mesh = CKMesh(ctx, "tri")
        mesh.SetPositions(np.array([[-1, -1, 0], [1, -1, 0], [0, 1, 0]],
                                   np.float32))
        mesh.SetFaces(np.array([[0, 2, 1]], np.int32))
        mesh.BuildNormals()
        mat = CKMaterial(ctx, "m")
        mat.SetEmissive((1, 0.5, 0.2, 1))
        mesh.ApplyGlobalMaterial(mat)
        obj = CK3dObject(ctx, "o")
        obj.SetCurrentMesh(mesh)
        clip = CKKeyedAnimation(ctx, "clip")
        oa = CKObjectAnimation(ctx, "oa")
        oa.Set3dEntity(obj)
        pc = oa.CreateController(CKANIMATION_LINEAR_POS)
        pc.AddKey(0.0, (0, 0, 0))
        pc.AddKey(10.0, (1.5, 0, 0))
        clip.AddAnimation(oa)
        return ctx, rc, obj, clip

    def test_bound_matches_host_render(self):
        ctx, rc, obj, clip = self._scene()
        host = []
        for t in (0.0, 3.0, 7.0):
            clip.SetFrame(t)
            rc.Render()
            host.append(np.asarray(rc.framebuffer()).copy())
        assert rc.BindAnimation(clip)
        dev = []
        for t in (0.0, 3.0, 7.0):
            clip.SetFrame(t)
            rc.Render()
            dev.append(np.asarray(rc.framebuffer()).copy())
        for h, d in zip(host, dev):
            assert np.abs(h - d).mean() < 1e-3
        assert np.abs(dev[0] - dev[2]).mean() > 1e-3   # really animates

    def test_key_edit_while_bound_rebuilds_bank(self):
        ctx, rc, obj, clip = self._scene()
        assert rc.BindAnimation(clip)
        clip.SetFrame(10.0)
        rc.Render()
        before = np.asarray(rc.framebuffer()).copy()
        clip.animations[0].position_controller.AddKey(10.0, (-1.5, 0, 0))
        rc.Render()
        after = np.asarray(rc.framebuffer()).copy()
        assert np.abs(before - after).mean() > 1e-3

    def test_unbind_syncs_host(self):
        ctx, rc, obj, clip = self._scene()
        assert rc.BindAnimation(clip)
        clip.SetFrame(10.0)            # host stays stale while bound
        np.testing.assert_allclose(obj.GetPosition()[0], 0.0, atol=1e-6)
        rc.UnbindAnimation()
        np.testing.assert_allclose(obj.GetPosition()[0], 1.5, atol=1e-5)
        assert rc.GetBoundAnimation() is None

    def test_sync_to_host_on_demand(self):
        ctx, rc, obj, clip = self._scene()
        assert rc.BindAnimation(clip)
        clip.SetFrame(5.0)
        clip.SyncToHost()
        np.testing.assert_allclose(obj.GetPosition()[0], 0.75, atol=1e-5)

    def test_morph_member_rejected(self):
        ctx, rc, obj, clip = self._scene()
        from ckrenderengine_tpu.objects import CKMesh
        ent = CK3dObject(ctx, "morphed")
        mesh = CKMesh(ctx, "m2")
        base = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
        mesh.SetPositions(base)
        mesh.SetFaces(np.array([[0, 1, 2]], np.int32))
        ent.SetCurrentMesh(mesh)
        oa = CKObjectAnimation(ctx, "morph")
        oa.Set3dEntity(ent)
        mc = oa.CreateMorphController(3)
        mc.AddKey(0.0, base)
        mc.AddKey(10.0, base + 1.0)
        clip.AddAnimation(oa)
        assert not rc.BindAnimation(clip)
