"""Animation layer tests: clip playback, pose application, ABSM, skinning."""
import numpy as np
import jax
import jax.numpy as jnp

from fyrox_tpu.animation import (AnimationSetBuilder, MachineBuilder,
                                 SkinTemplate, init_animation_state,
                                 init_machine_state, machine, player, pose,
                                 skinning, track)
from fyrox_tpu.core import quat, transform as tfm
from fyrox_tpu.scene import SceneBuilder, init_state, graph


def lin_keys(t0, v0, t1, v1):
    return [dict(time=t0, value=v0), dict(time=t1, value=v1)]


def make_simple_set():
    """Two clips animating node 0: clip0 moves +x 0→1 over 1s, clip1 moves +y."""
    b = AnimationSetBuilder()
    c0 = b.add_clip("walk", length=1.0, looping=True)
    b.add_position_track(c0, node=0, keys_xyz=[lin_keys(0, 0, 1, 1),
                                               lin_keys(0, 0, 1, 0),
                                               lin_keys(0, 0, 1, 0)])
    c1 = b.add_clip("jump", length=1.0, looping=True)
    b.add_position_track(c1, node=0, keys_xyz=[lin_keys(0, 0, 1, 0),
                                               lin_keys(0, 0, 1, 1),
                                               lin_keys(0, 0, 1, 0)])
    return b.build()


class TestPlayback:
    def test_time_wrap_and_clamp(self):
        b = AnimationSetBuilder()
        b.add_clip("loop", length=1.0, looping=True)
        b.add_clip("once", length=1.0, looping=False, speed=1.0)
        aset = b.build()
        anim = init_animation_state(aset, num_worlds=1)
        for _ in range(90):  # 1.5 s
            anim = track.tick_times(aset, anim, 1.0 / 60.0)
        t = np.asarray(anim.time[0])
        assert abs(t[0] - 0.5) < 1e-3      # wrapped
        assert abs(t[1] - 1.0) < 1e-6      # clamped

    def test_pose_sampled_before_advance(self):
        """Player applies the pose at the CURRENT time then advances (lib.rs:471)."""
        aset = make_simple_set()
        anim = init_animation_state(aset, 1, enabled=np.array([True, False]))
        posn = jnp.zeros((1, 1, 3))
        rot = jnp.broadcast_to(jnp.asarray([0.0, 0, 0, 1]), (1, 1, 4))
        scl = jnp.ones((1, 1, 3))
        anim, p, r, s = player.step_player(aset, anim, posn, rot, scl, 0.25)
        assert abs(float(p[0, 0, 0]) - 0.0) < 1e-6  # pose at t=0
        anim, p, r, s = player.step_player(aset, anim, p, r, s, 0.25)
        assert abs(float(p[0, 0, 0]) - 0.25) < 1e-6  # pose at t=0.25

    def test_overwrite_order_last_enabled_wins(self):
        aset = make_simple_set()
        # both clips enabled: clip1 (higher index) wins on the shared node
        anim = init_animation_state(aset, 1)
        anim = anim._replace(time=jnp.full((1, 2), 0.5))
        sampled = track.sample_tracks(aset, anim)
        poses = pose.build_poses(aset, sampled, n_nodes=1)
        p, r, s = pose.apply_overwrite(poses, anim.enabled,
                                       jnp.full((1, 1, 3), 7.0),
                                       jnp.broadcast_to(jnp.asarray([0., 0, 0, 1]), (1, 1, 4)),
                                       jnp.ones((1, 1, 3)))
        np.testing.assert_allclose(np.asarray(p[0, 0]), [0, 0.5, 0], atol=1e-6)
        # only clip0 enabled → clip0's value; node untouched by tracks keeps current
        en = jnp.asarray([[True, False]])
        p, _, _ = pose.apply_overwrite(poses, en, jnp.full((1, 1, 3), 7.0),
                                       jnp.broadcast_to(jnp.asarray([0., 0, 0, 1]), (1, 1, 4)),
                                       jnp.ones((1, 1, 3)))
        np.testing.assert_allclose(np.asarray(p[0, 0]), [0.5, 0, 0], atol=1e-6)
        # nothing enabled → current kept
        en = jnp.asarray([[False, False]])
        p, _, _ = pose.apply_overwrite(poses, en, jnp.full((1, 1, 3), 7.0),
                                       jnp.broadcast_to(jnp.asarray([0., 0, 0, 1]), (1, 1, 4)),
                                       jnp.ones((1, 1, 3)))
        np.testing.assert_allclose(np.asarray(p[0, 0]), [7, 7, 7], atol=1e-6)

    def test_rotation_track_euler_to_quat(self):
        b = AnimationSetBuilder()
        c = b.add_clip("spin", length=1.0)
        b.add_rotation_track(c, node=0, keys_euler_xyz=[
            lin_keys(0, 0, 1, 0), lin_keys(0, 0, 1, np.pi), lin_keys(0, 0, 1, 0)])
        aset = b.build()
        anim = init_animation_state(aset, 1)
        anim = anim._replace(time=jnp.full((1, 1), 0.5))
        sampled = track.sample_tracks(aset, anim)
        q = np.asarray(sampled["rotation"][2][0, 0])
        want = np.asarray(quat.from_euler(0.0, np.pi / 2, 0.0))
        np.testing.assert_allclose(q, want, atol=1e-5)


class TestMachine:
    def _mt(self):
        mb = MachineBuilder()
        p = mb.add_parameter("run")
        s_idle = mb.add_state("idle", clip=0)
        s_run = mb.add_state("run", clip=1)
        mb.set_entry_state(s_idle)
        mb.add_transition(s_idle, s_run, p, duration=0.5)
        mb.add_transition(s_run, s_idle, p, duration=0.5, invert=True)
        return mb.build()

    def test_transition_blending(self):
        aset = make_simple_set()
        mt = self._mt()
        ms = init_machine_state(mt, 2)
        anim = init_animation_state(aset, 2)
        anim = anim._replace(time=jnp.full((2, 2), 0.5))
        sampled = track.sample_tracks(aset, anim)
        poses = pose.build_poses(aset, sampled, n_nodes=1)
        # world 0: run=True (transition), world 1: run=False (stay)
        params = jnp.asarray([[True], [False]])
        dt = 0.25
        ms = machine.update_machine(mt, ms, params, dt)  # blend → 0.5
        out = machine.evaluate_pose(mt, ms, poses)
        p = np.asarray(out[0])
        np.testing.assert_allclose(p[0, 0], [0.25, 0.25, 0], atol=1e-5)  # half blended
        np.testing.assert_allclose(p[1, 0], [0.5, 0, 0], atol=1e-5)      # idle pose
        ms = machine.update_machine(mt, ms, params, dt)  # blend → 1.0, settle
        assert int(ms.current[0]) == 1 and int(ms.source[0]) == 1
        out = machine.evaluate_pose(mt, ms, poses)
        np.testing.assert_allclose(np.asarray(out[0])[0, 0], [0, 0.5, 0], atol=1e-5)

    def test_transition_back(self):
        mt = self._mt()
        ms = init_machine_state(mt, 1)
        params_on = jnp.asarray([[True]])
        params_off = jnp.asarray([[False]])
        for _ in range(3):
            ms = machine.update_machine(mt, ms, params_on, 0.3)
        assert int(ms.current[0]) == 1
        for _ in range(3):
            ms = machine.update_machine(mt, ms, params_off, 0.3)
        assert int(ms.current[0]) == 0 and float(ms.blend[0]) == 1.0


class TestSkinning:
    def _make_skin(self, rng, n_bones=8, n_verts=256):
        sb = SceneBuilder()
        prev = -1
        bones = []
        for i in range(n_bones):
            prev = sb.add_pivot(f"bone{i}", parent=prev, position=(1.0, 0, 0))
            bones.append(prev)
        template = sb.build()
        state = init_state(template, num_worlds=2)
        state = graph.update_hierarchical_data(state, template)
        bind_globals = np.asarray(state.globals_[0])
        inv_bind = np.stack([np.linalg.inv(bind_globals[b]) for b in bones]).astype(np.float32)
        verts = rng.uniform(-1, 8, (n_verts, 3)).astype(np.float32)
        idx = rng.integers(0, n_bones, (n_verts, 4)).astype(np.int32)
        wts = rng.uniform(0.1, 1.0, (n_verts, 4)).astype(np.float32)
        wts /= wts.sum(-1, keepdims=True)
        skin = SkinTemplate(bones=np.asarray(bones, np.int32), inv_bind=inv_bind,
                            vertices=verts, bone_indices=idx, bone_weights=wts)
        return template, state, skin, bones

    def test_bind_pose_is_identity(self):
        rng = np.random.default_rng(0)
        template, state, skin, bones = self._make_skin(rng)
        bm = skinning.bone_matrices(state.globals_, skin)
        out = skinning.skin_positions_gather(bm, skin)
        np.testing.assert_allclose(np.asarray(out[0]), skin.vertices, atol=1e-4)

    def test_dense_equals_gather_after_motion(self):
        rng = np.random.default_rng(1)
        template, state, skin, bones = self._make_skin(rng)
        # rotate bone 2 in world 0 only
        q = np.asarray(quat.from_euler(0.0, 0.0, 0.7), np.float32)
        rot = state.rotation.at[0, bones[2]].set(jnp.asarray(q))
        state = state._replace(rotation=rot)
        state = graph.update_hierarchical_data(state, template)
        bm = skinning.bone_matrices(state.globals_, skin)
        a = np.asarray(skinning.skin_positions_gather(bm, skin))
        b = np.asarray(skinning.skin_positions_dense(bm, skin))
        np.testing.assert_allclose(a, b, atol=2e-4)
        # world 1 (unmoved) must still be bind pose; world 0 must differ
        np.testing.assert_allclose(a[1], skin.vertices, atol=1e-4)
        assert np.abs(a[0] - skin.vertices).max() > 0.1

    def test_rigid_single_bone_motion_exact(self):
        """Verts bound 100% to one bone move rigidly with it."""
        rng = np.random.default_rng(2)
        template, state, skin, bones = self._make_skin(rng, n_verts=16)
        skin.bone_indices = np.full((16, 4), 3, np.int32)
        skin.bone_weights = np.tile(np.array([1.0, 0, 0, 0], np.float32), (16, 1))
        skin._dense_weights = None
        off = jnp.asarray([0.0, 5.0, 0.0])
        posn = state.position.at[:, bones[3]].add(off)
        state = state._replace(position=posn)
        state = graph.update_hierarchical_data(state, template)
        bm = skinning.bone_matrices(state.globals_, skin)
        out = np.asarray(skinning.skin_positions_dense(bm, skin))
        np.testing.assert_allclose(out[0], skin.vertices + np.array([0, 5, 0]), atol=1e-4)


class TestBlendAnimationsState:
    def test_two_clip_weighted_state(self):
        """A state sourcing 50/50 from two clips poses at their midpoint
        (BlendAnimations N-way blend)."""
        aset = make_simple_set()
        mb = MachineBuilder()
        mb.add_state("mix", clips=[(0, 0.5), (1, 0.5)])
        mt = mb.build()
        ms = init_machine_state(mt, 1)
        anim = init_animation_state(aset, 1)
        anim = anim._replace(time=jnp.full((1, 2), 0.5))
        sampled = track.sample_tracks(aset, anim)
        poses = pose.build_poses(aset, sampled, n_nodes=1)
        out = machine.evaluate_pose(mt, ms, poses)
        p = np.asarray(out[0])
        np.testing.assert_allclose(p[0, 0], [0.25, 0.25, 0], atol=1e-5)

    def test_uneven_weights(self):
        aset = make_simple_set()
        mb = MachineBuilder()
        mb.add_state("mix", clips=[(0, 3.0), (1, 1.0)])
        mt = mb.build()
        ms = init_machine_state(mt, 1)
        anim = init_animation_state(aset, 1)
        anim = anim._replace(time=jnp.full((1, 2), 1.0))
        # clamp/wrap: both clips loop length 1.0 → time wraps to 0... use 0.5
        anim = anim._replace(time=jnp.full((1, 2), 0.5))
        sampled = track.sample_tracks(aset, anim)
        poses = pose.build_poses(aset, sampled, n_nodes=1)
        out = machine.evaluate_pose(mt, ms, poses)
        p = np.asarray(out[0])
        np.testing.assert_allclose(p[0, 0], [0.375, 0.125, 0], atol=1e-5)


class TestSpriteSheet:
    def test_frame_advance_and_wrap(self):
        from fyrox_tpu.animation.spritesheet import (SpriteSheetAnimation,
                                                     current_frame,
                                                     frame_uv_rect)
        sheet = SpriteSheetAnimation(columns=4, rows=2, fps=10.0)
        t = jnp.asarray([0.0, 0.15, 0.75, 0.85])  # frames 0,1,7,wrap->0
        f = np.asarray(current_frame(sheet, t))
        np.testing.assert_array_equal(f, [0, 1, 7, 0])
        uv = np.asarray(frame_uv_rect(sheet, jnp.asarray([0, 5])))
        np.testing.assert_allclose(uv[0], [0, 0, 0.25, 0.5], atol=1e-6)
        np.testing.assert_allclose(uv[1], [0.25, 0.5, 0.5, 1.0], atol=1e-6)

    def test_non_looping_clamps(self):
        from fyrox_tpu.animation.spritesheet import (SpriteSheetAnimation,
                                                     current_frame)
        sheet = SpriteSheetAnimation(columns=3, rows=1, fps=10.0, looping=False)
        f = np.asarray(current_frame(sheet, jnp.asarray([10.0])))
        assert f[0] == 2
