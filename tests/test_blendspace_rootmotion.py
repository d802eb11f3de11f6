"""2D blend spaces + root motion extraction.

Mirrors the reference's test strategy: blendspace.rs:455 tests the
triangulation of a unit square; root motion semantics follow
Animation::update_root_motion (fyrox-animation/src/lib.rs:498).
"""
import numpy as np
import jax.numpy as jnp

from fyrox_tpu.animation import (AnimationSetBuilder, MachineBuilder,
                                 blendspace as bs_mod, init_animation_state,
                                 init_machine_state, pose as pose_mod,
                                 rootmotion as rm_mod, track as track_mod)
from fyrox_tpu.core import quat


def lin(keys):
    return [dict(time=t, value=v) for t, v in keys]


def make_clips():
    """Three 1s looping clips moving node 0 to x=1 / y=1 / z=1."""
    b = AnimationSetBuilder()
    for axis in range(3):
        c = b.add_clip(f"c{axis}", length=1.0)
        keys = [lin([(0.0, 0.0), (1.0, 0.0)]) for _ in range(3)]
        keys[axis] = lin([(0.0, 0.0), (1.0, 1.0)])
        b.add_position_track(c, 0, keys)
    return b.build()


# ---------------------------------------------------------------- blendspace

def test_delaunay_unit_square():
    # blendspace.rs:455 test_blend_space_triangulation: 4 corners → 2 triangles
    tris = bs_mod.delaunay(np.asarray([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32))
    assert tris.shape == (2, 3)
    # together the two triangles cover all 4 points
    assert set(tris.flatten().tolist()) == {0, 1, 2, 3}


def test_blendspace_weights_inside_and_outside():
    bst = bs_mod.build_blend_space([[0, 0], [1, 0], [0, 1]], [0, 1, 2])
    xy = jnp.asarray([[0.25, 0.25],   # inside
                      [1.0, 0.0],     # vertex
                      [2.0, -1.0],    # outside, beyond vertex 1
                      [0.5, -3.0]])   # outside, below edge 0-1
    idx, w = bs_mod.sample_weights(bst, xy)
    idx, w = np.asarray(idx), np.asarray(w)
    np.testing.assert_allclose(w.sum(-1), 1.0, atol=1e-6)
    # inside: barycentric (0.5, 0.25, 0.25) for corners (0,1,2)
    got = np.zeros(3)
    for k in range(3):
        got[idx[0, k]] += w[0, k]
    np.testing.assert_allclose(got, [0.5, 0.25, 0.25], atol=1e-5)
    # vertex: all weight on point 1
    assert w[1, idx[1].tolist().index(1)] > 0.999
    # beyond vertex 1: clamps to vertex 1 (documented deviation: the
    # reference returns no pose in corner regions)
    got = np.zeros(3)
    for k in range(3):
        got[idx[2, k]] += w[2, k]
    np.testing.assert_allclose(got, [0, 1, 0], atol=1e-5)
    # below the 0-1 edge: projection at x=0.5 → 50/50 between 0 and 1
    got = np.zeros(3)
    for k in range(3):
        got[idx[3, k]] += w[3, k]
    np.testing.assert_allclose(got, [0.5, 0.5, 0], atol=1e-5)


def test_blendspace_two_points_edge():
    # blendspace.rs:349: 2-point space projects on the single edge
    bst = bs_mod.build_blend_space([[0, 0], [1, 0]], [0, 1])
    idx, w = bs_mod.sample_weights(bst, jnp.asarray([[0.75, 0.3]]))
    idx, w = np.asarray(idx), np.asarray(w)
    got = np.zeros(2)
    for k in range(3):
        got[idx[0, k]] += w[0, k]
    np.testing.assert_allclose(got, [0.25, 0.75], atol=1e-5)


def test_blendspace_pose_blends_clips():
    aset = make_clips()
    anim = init_animation_state(aset, 2)
    anim = anim._replace(time=jnp.full_like(anim.time, 0.5))  # all clips at t=.5
    sampled = track_mod.sample_tracks(aset, anim)
    poses = pose_mod.build_poses(aset, sampled, n_nodes=1)
    bst = bs_mod.build_blend_space([[0, 0], [1, 0], [0, 1]], [0, 1, 2])
    # sample at centroid → equal thirds of (x,0,0),(0,y,0),(0,0,z) at .5
    p = bs_mod.blendspace_pose(bst, jnp.asarray([[1 / 3, 1 / 3], [0.0, 0.0]]), poses)
    pos = np.asarray(p[0])  # [W,N,3]
    np.testing.assert_allclose(pos[0, 0], [0.5 / 3] * 3, atol=1e-5)
    np.testing.assert_allclose(pos[1, 0], [0.5, 0, 0], atol=1e-5)  # pure clip 0


def test_machine_blendspace_state():
    aset = make_clips()
    anim = init_animation_state(aset, 1)
    anim = anim._replace(time=jnp.full_like(anim.time, 0.5))
    sampled = track_mod.sample_tracks(aset, anim)
    poses = pose_mod.build_poses(aset, sampled, n_nodes=1)
    mb = MachineBuilder()
    bst = bs_mod.build_blend_space([[0, 0], [1, 0], [0, 1]], [0, 1, 2])
    s = mb.add_state("locomotion", blendspace=bst)
    mb.set_entry_state(s)
    mt = mb.build()
    ms = init_machine_state(mt, 1)
    from fyrox_tpu.animation.machine import evaluate_pose
    pose = evaluate_pose(mt, ms, poses, sampling=jnp.asarray([[0.0, 1.0]]))
    np.testing.assert_allclose(np.asarray(pose[0])[0, 0], [0, 0, 0.5], atol=1e-5)


# --------------------------------------------------------------- root motion

def make_walk(loop=True, with_rot=False):
    """1s clip: root (node 0) walks 0→2 on z, bobs 0→.1 on y; child node 1
    has its own track that must be untouched by extraction."""
    b = AnimationSetBuilder()
    c = b.add_clip("walk", length=1.0, looping=loop)
    b.add_position_track(c, 0, [lin([(0.0, 0.0), (1.0, 0.0)]),
                                lin([(0.0, 0.0), (1.0, 0.1)]),
                                lin([(0.0, 0.0), (1.0, 2.0)])])
    b.add_position_track(c, 1, [lin([(0.0, 5.0), (1.0, 5.0)]),
                                lin([(0.0, 0.0), (1.0, 1.0)]),
                                lin([(0.0, 0.0), (1.0, 0.0)])])
    if with_rot:
        b.add_rotation_track(c, 0, [lin([(0.0, 0.0), (1.0, 0.0)]),
                                    lin([(0.0, 0.0), (1.0, np.pi / 2)]),
                                    lin([(0.0, 0.0), (1.0, 0.0)])])
    return b.build()


def run_ticks(aset, rmd, n, dt, w=2):
    anim = init_animation_state(aset, w)
    st = rm_mod.init_root_motion_state(rmd, w)
    deltas, pinned = [], None
    for _ in range(n):
        sampled = track_mod.sample_tracks(aset, anim)
        t_old = anim.time
        anim = track_mod.tick_times(aset, anim, dt)
        st, dp, dr, sampled = rm_mod.extract_root_motion(
            rmd, aset, sampled, t_old, anim.time, st)
        deltas.append((np.asarray(dp), np.asarray(dr)))
        pinned = sampled
    return deltas, pinned


def test_root_motion_delta_accumulates_across_wrap():
    aset = make_walk()
    rmd = rm_mod.build_root_motion(
        aset, rm_mod.RootMotionSettings(node=0, ignore_y=True))
    # 18 ticks of 1/12s; poses are sampled pre-advance so delta k covers
    # motion t_{k-1}→t_k and delta 0 is zero → 17 frames of motion total
    deltas, _ = run_ticks(aset, rmd, 18, 1 / 12)
    total = sum(d[0] for d in deltas)[0, 0]  # world 0, clip 0
    np.testing.assert_allclose(total, [0.0, 0.0, 17 / 12 * 2.0], atol=1e-4)
    # every per-tick delta is the smooth per-frame displacement — no jump
    # at the loop seam (tick 13 samples t=1/12 after wrapping past 1.0)
    for dp, _ in deltas[1:]:
        np.testing.assert_allclose(dp[0, 0, 2], 2.0 / 12, atol=1e-4)


def test_root_motion_pins_pose_root_only():
    aset = make_walk()
    rmd = rm_mod.build_root_motion(
        aset, rm_mod.RootMotionSettings(node=0, ignore_y=True))
    anim = init_animation_state(aset, 1)
    anim = anim._replace(time=jnp.full_like(anim.time, 0.5))
    sampled = track_mod.sample_tracks(aset, anim)
    t_old = anim.time
    anim2 = track_mod.tick_times(aset, anim, 1 / 60)
    st = rm_mod.init_root_motion_state(rmd, 1)
    _, _, _, pinned = rm_mod.extract_root_motion(
        rmd, aset, sampled, t_old, anim2.time, st)
    nodes, anims, vals = pinned["position"]
    vals = np.asarray(vals)
    root_row = int(np.nonzero(nodes == 0)[0][0])
    child_row = int(np.nonzero(nodes == 1)[0][0])
    # root: extracted axes (x,z) pinned to slice start (0), ignored y keeps bob
    np.testing.assert_allclose(vals[0, root_row], [0.0, 0.05, 0.0], atol=1e-5)
    # child track untouched
    np.testing.assert_allclose(vals[0, child_row], [5.0, 0.5, 0.0], atol=1e-5)


def test_root_motion_rotation_delta():
    aset = make_walk(with_rot=True)
    rmd = rm_mod.build_root_motion(
        aset, rm_mod.RootMotionSettings(node=0, ignore_y=True,
                                        ignore_rotations=False))
    deltas, pinned = run_ticks(aset, rmd, 12, 1 / 12, w=1)
    # compose all rotation deltas: 12 ticks = 11 frames of the 90° yaw
    # (poses sample pre-advance, so the first delta is identity)
    q = jnp.asarray([0.0, 0, 0, 1])
    for _, dr in deltas:
        q = quat.mul(q, jnp.asarray(dr[0, 0]))
    expect = quat.from_euler(0.0, jnp.asarray(11 / 12 * np.pi / 2), 0.0)
    qn, en = np.asarray(quat.normalize(q)), np.asarray(expect)
    assert min(np.abs(qn - en).max(), np.abs(qn + en).max()) < 1e-3
    # pose rotation pinned to slice start (identity)
    _, _, vals = pinned["rotation"]
    np.testing.assert_allclose(np.asarray(vals)[0, 0], [0, 0, 0, 1], atol=1e-5)


def test_root_motion_non_looping_clamps():
    aset = make_walk(loop=False)
    rmd = rm_mod.build_root_motion(
        aset, rm_mod.RootMotionSettings(node=0, ignore_y=True))
    deltas, _ = run_ticks(aset, rmd, 18, 1 / 12, w=1)
    total = sum(d[0] for d in deltas)[0, 0]
    # clamped at the end: exactly one clip's worth of motion
    np.testing.assert_allclose(total, [0.0, 0.0, 2.0], atol=1e-4)


class TestEngineRootMotionAutoApply:
    """Engine-level root motion (ROADMAP #11): the player pins the root
    bone and the engine velocity-drives the character body."""

    def test_character_body_walks_forward(self):
        import jax
        import numpy as np
        from fyrox_tpu.animation import AnimationSetBuilder
        from fyrox_tpu.animation import rootmotion as rm_mod
        from fyrox_tpu.engine import Engine
        from fyrox_tpu.physics import world as wd, shapes as sh
        from fyrox_tpu.scene import SceneBuilder

        def lin(t0, v0, t1, v1):
            return [dict(time=t0, value=v0), dict(time=t1, value=v1)]

        sb = SceneBuilder()
        root = sb.add_pivot("char_root", position=(0, 0.9, 0))
        ab = AnimationSetBuilder()
        walk = ab.add_clip("walk", length=1.0, looping=True)
        ab.add_position_track(walk, node=root,
                              keys_xyz=[lin(0, 0, 1, 1.2), lin(0, 0, 1, 0),
                                        lin(0, 0, 1, 0)])
        aset = ab.build()
        rmd = rm_mod.build_root_motion(
            aset, rm_mod.RootMotionSettings(node=root))

        pb = wd.PhysicsBuilder()
        g = pb.add_body(body_type=wd.BodyType.STATIC)
        pb.add_collider(g, sh.HALFSPACE, [0, 0, 0])
        body = pb.add_body(node=root, position=(0, 0.9, 0),
                           lock_rotation=(0, 0, 0))
        pb.add_collider(body, sh.CAPSULE, [0.4, 0.3])
        pt = pb.build(broadphase="dense")

        eng = Engine(template=sb.build(), physics=pt, animations=aset,
                     root_motion=rmd, root_motion_body=body)
        st = eng.init_state(2)
        step = jax.jit(lambda s: eng.step(s))
        for _ in range(120):
            st = step(st)
        x = float(st.physics.position[0, body, 0])
        y = float(st.physics.position[0, body, 1])
        assert 1.8 < x < 2.6, x            # ~1.2 m/s for 2 s
        assert 0.55 < y < 0.8, y           # standing on the ground
        # the standalone ground body must NOT inherit a node pose
        assert abs(float(st.physics.position[0, g, 1])) < 1e-5
        # worlds agree (pure batched determinism)
        np.testing.assert_allclose(np.asarray(st.physics.position[0]),
                                   np.asarray(st.physics.position[1]),
                                   atol=1e-6)
