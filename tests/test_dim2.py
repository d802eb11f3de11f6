"""2D physics shape set (scene/dim2/collider.rs:195) on the z-locked
3D pipeline."""
import numpy as np
import jax

from fyrox_tpu.physics.dim2 import Physics2DBuilder
from fyrox_tpu.physics.world import (BodyType, init_physics_state,
                                     step_physics)

DT = 1.0 / 60.0


def run(builder, steps=120, worlds=1):
    t = builder.build()
    s = init_physics_state(builder.pb, t, worlds)
    step = jax.jit(lambda s: step_physics(s, t, DT))
    for _ in range(steps):
        s = step(s)
    return s


class TestDim2Shapes:
    def test_circle_rests_on_segment_ground(self):
        b = Physics2DBuilder()
        g = b.add_body(body_type=BodyType.STATIC)
        b.add_segment(g, (-5.0, 0.0), (5.0, 0.0), thickness=0.1)
        c = b.add_body(position=(0.0, 2.0))
        b.add_circle(c, 0.5)
        s = run(b, steps=180)
        y = float(s.position[0, 1, 1])
        assert abs(y - 0.6) < 0.05            # radius + half thickness
        assert abs(float(s.position[0, 1, 2])) < 1e-4   # z locked

    def test_rectangle_stack_plane_locked(self):
        b = Physics2DBuilder()
        g = b.add_body(body_type=BodyType.STATIC)
        b.add_halfspace(g)
        for i in range(3):
            bi = b.add_body(position=(0.0, 0.6 + 1.1 * i))
            b.add_rectangle(bi, 0.5, 0.5)
        s = run(b, steps=240)
        ys = np.asarray(s.position[0, 1:, 1])
        assert abs(ys[0] - 0.5) < 0.06
        assert ys[1] > ys[0] and ys[2] > ys[1]          # stacked
        assert np.all(np.abs(np.asarray(s.position[0, 1:, 2])) < 1e-4)

    def test_ball_rolls_down_triangle_ramp(self):
        b = Physics2DBuilder()
        g = b.add_body(body_type=BodyType.STATIC)
        b.add_triangle(g, (-3.0, 2.0), (3.0, 0.0), (-3.0, 0.0),
                       friction=0.1)
        b.add_halfspace(g)
        c = b.add_body(position=(-2.0, 3.0))
        b.add_circle(c, 0.4, friction=0.1)
        s = run(b, steps=240)
        x = float(s.position[0, 1, 0])
        assert x > -1.5                       # slid/rolled +x down the slope
        assert abs(float(s.position[0, 1, 2])) < 1e-4

    def test_heightfield_1d_valley(self):
        b = Physics2DBuilder()
        g = b.add_body(body_type=BodyType.STATIC)
        # V-valley: high at edges, 0 in the middle
        heights = np.abs(np.linspace(-2.0, 2.0, 17, dtype=np.float32))
        b.add_heightfield(g, heights, size_x=8.0)
        c = b.add_body(position=(1.5, 3.0))
        b.add_circle(c, 0.4)
        s = run(b, steps=400)
        x = float(s.position[0, 1, 0])
        assert abs(x) < 1.2                   # settled toward the middle
        assert float(s.position[0, 1, 1]) < 1.5

    def test_revolute_pendulum_swings_in_plane(self):
        b = Physics2DBuilder()
        pivot = b.add_body(body_type=BodyType.STATIC, position=(0.0, 3.0))
        bob = b.add_body(position=(1.0, 3.0))
        b.add_circle(bob, 0.2)
        b.add_revolute_joint(pivot, bob, anchor_a=(0.0, 0.0),
                             anchor_b=(-1.0, 0.0))
        s = run(b, steps=60)
        p = np.asarray(s.position[0, 1])
        assert abs(np.linalg.norm(p[:2] - [0.0, 3.0]) - 1.0) < 0.1
        assert p[1] < 3.0                     # swung downward
        assert abs(p[2]) < 1e-3
