"""Joint constraint tests: pendulum, fixed weld, revolute hinge, chains."""
import numpy as np
import jax
import jax.numpy as jnp

from fyrox_tpu.physics import (BALL, BodyType, PhysicsBuilder,
                               init_physics_state, step_physics)
from fyrox_tpu.physics.joints import JointKind

DT = 1.0 / 60.0


class TestJoints:
    def test_ball_joint_pendulum_keeps_length(self):
        b = PhysicsBuilder()
        anchor = b.add_body(body_type=BodyType.STATIC, position=(0, 5, 0))
        b.add_collider(anchor, BALL, [0.1])
        bob = b.add_body(position=(2.0, 5.0, 0))
        b.add_collider(bob, BALL, [0.2])
        b.add_joint(JointKind.BALL, anchor, bob,
                    anchor_a=(0, 0, 0), anchor_b=(-2.0, 0, 0))
        t = b.build()
        s = init_physics_state(b, t, 1)
        step = jax.jit(lambda s: step_physics(s, t, DT))
        lengths = []
        for i in range(240):
            s = step(s)
            if i % 40 == 0:
                p = np.asarray(s.position[0, 1])
                anchor_pt = p + np.asarray(
                    jnp.asarray([-2.0, 0, 0]))  # bob-local anchor (unrotated approx)
                lengths.append(np.linalg.norm(p - np.asarray([0, 5, 0])))
        # bob swings (moved from start) but stays ~2m from the pivot
        assert abs(float(s.position[0, 1, 0]) - 2.0) > 0.2  # swung
        p = np.asarray(s.position[0, 1])
        q = np.asarray(s.rotation[0, 1])
        # world position of the bob-local anchor point
        from fyrox_tpu.core import quat as qm
        world_anchor = p + np.asarray(qm.rotate(jnp.asarray(q),
                                                jnp.asarray([-2.0, 0, 0])))
        dist = np.linalg.norm(world_anchor - np.asarray([0, 5, 0]))
        assert dist < 0.15, f"joint separated by {dist}"

    def test_fixed_joint_welds_orientation(self):
        b = PhysicsBuilder()
        base = b.add_body(body_type=BodyType.STATIC, position=(0, 3, 0))
        b.add_collider(base, BALL, [0.1])
        arm = b.add_body(position=(1.0, 3.0, 0))
        b.add_collider(arm, BALL, [0.2])
        b.add_joint(JointKind.FIXED, base, arm,
                    anchor_a=(0, 0, 0), anchor_b=(-1.0, 0, 0))
        t = b.build()
        s = init_physics_state(b, t, 1)
        step = jax.jit(lambda s: step_physics(s, t, DT))
        for _ in range(240):
            s = step(s)
        # arm must NOT fall: held rigidly at its initial pose
        p = np.asarray(s.position[0, 1])
        np.testing.assert_allclose(p, [1.0, 3.0, 0.0], atol=0.1)
        # orientation stays identity-ish
        q = np.asarray(s.rotation[0, 1])
        assert abs(abs(q[3]) - 1.0) < 0.02, q

    def test_revolute_hinge_swings_in_plane(self):
        b = PhysicsBuilder()
        base = b.add_body(body_type=BodyType.STATIC, position=(0, 4, 0))
        b.add_collider(base, BALL, [0.1])
        door = b.add_body(position=(1.0, 4.0, 0))
        b.add_collider(door, BALL, [0.2])
        # hinge about z: door swings in the xy-plane only
        b.add_joint(JointKind.REVOLUTE, base, door,
                    anchor_a=(0, 0, 0), anchor_b=(-1.0, 0, 0), axis=(0, 0, 1))
        t = b.build()
        s = init_physics_state(b, t, 1)
        # out-of-plane kick that the hinge must resist
        s = s._replace(linvel=s.linvel.at[0, 1, 2].set(2.0))
        step = jax.jit(lambda s: step_physics(s, t, DT))
        for _ in range(240):
            s = step(s)
        p = np.asarray(s.position[0, 1])
        assert abs(p[2]) < 0.12, f"hinge let the door leave its plane: z={p[2]}"
        assert p[1] < 3.9  # it did swing down under gravity

    def test_prismatic_slides_along_axis_only(self):
        from fyrox_tpu.physics import CUBOID
        b = PhysicsBuilder()
        rail = b.add_body(body_type=BodyType.STATIC, position=(0, 5, 0))
        b.add_collider(rail, BALL, [0.1])
        slider = b.add_body(position=(1.0, 5.0, 0))
        b.add_collider(slider, CUBOID, [0.2, 0.2, 0.2])
        # slide axis = x; gravity must NOT pull it down, a push must move it
        # (slider offset from the rail so their colliders never touch)
        b.add_joint(JointKind.PRISMATIC, rail, slider,
                    anchor_a=(0, 0, 0), anchor_b=(-1.0, 0, 0), axis=(1, 0, 0))
        t = b.build()
        s = init_physics_state(b, t, 1)
        s = s._replace(linvel=s.linvel.at[0, 1, 0].set(1.0))
        step = jax.jit(lambda s: step_physics(s, t, DT))
        for _ in range(120):
            s = step(s)
        p = np.asarray(s.position[0, 1])
        assert p[0] > 1.5, f"slider did not slide: {p}"
        assert abs(p[1] - 5.0) < 0.05 and abs(p[2]) < 0.05, p
        q = np.asarray(s.rotation[0, 1])
        assert abs(abs(q[3]) - 1.0) < 0.02  # no rotation picked up


class TestJointReferenceFrames:
    def test_fixed_joint_holds_initial_relative_rotation(self):
        """rapier stores local_frame1/2 at creation: a fixed joint between
        bodies created 90 deg apart must HOLD that pose, not torque them
        into alignment (advisor round-1 finding)."""
        from fyrox_tpu.core import quat as q
        b = PhysicsBuilder()
        qa = (0, 0, 0, 1)
        qb = tuple(np.asarray(q.from_euler(0.0, 0.0, np.pi / 2)))
        b0 = b.add_body(body_type=BodyType.STATIC, position=(0, 0, 0), rotation=qa)
        b1 = b.add_body(body_type=BodyType.DYNAMIC, position=(0, -1, 0),
                        rotation=qb, gravity_scale=0.0)
        b.add_collider(b0, BALL, [0.1])
        b.add_collider(b1, BALL, [0.1], density=1.0)
        b.add_joint(JointKind.FIXED, b0, b1, anchor_a=(0, -0.5, 0),
                    anchor_b=(0, 0.5, 0))
        t = b.build()
        s = init_physics_state(b, t, 1)
        step = jax.jit(lambda s: step_physics(s, t, 1.0 / 60.0))
        for _ in range(120):
            s = step(s)
        got = np.asarray(s.rotation[0, 1])
        want = np.asarray(qb)
        # same orientation up to sign
        dot = abs(float(np.sum(got * want)))
        assert dot > 0.999, (got, want)
        np.testing.assert_allclose(np.asarray(s.angvel[0, 1]), 0.0, atol=1e-3)
