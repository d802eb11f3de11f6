"""Ragdoll node: capsule limbs + joints over skeleton bones
(fyrox-impl/src/scene/ragdoll.rs:94 equivalent, scene/ragdoll.py)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fyrox_tpu.physics import BodyType, HALFSPACE, PhysicsBuilder
from fyrox_tpu.physics import world as wm
from fyrox_tpu.scene import RagdollBuilder, SceneBuilder, drive_kinematic
from fyrox_tpu.scene import graph as graph_mod, init_state


def _build_chain(n_limbs=4):
    """Vertical limb chain standing on the ground (a 'spine')."""
    sb = SceneBuilder()
    seg0 = 0.4
    bones = [sb.add_pivot(f"bone{i}", position=(0.0, 0.3 + i * seg0, 0.0))
             for i in range(n_limbs)]
    pb = PhysicsBuilder()
    g = pb.add_body(body_type=BodyType.STATIC)
    pb.add_collider(g, HALFSPACE, [], friction=0.8)
    rb = RagdollBuilder(pb)
    seg = 0.4
    limbs = []
    for i in range(n_limbs):
        head = (0.0, 0.3 + i * seg, 0.0)
        tail = (0.0, 0.3 + (i + 1) * seg, 0.0)
        limbs.append(rb.add_limb(bones[i], head, tail, radius=0.08,
                                 parent=(limbs[-1] if limbs else None)))
    rd = rb.build()
    t = pb.build(broadphase="dense")
    return sb, pb, t, rd


@pytest.mark.slow
def test_ragdoll_falls_limply():
    """An unsupported standing chain must crumple to the ground with its
    joints intact (limbs stay connected, bodies end up near the floor)."""
    _, pb, t, rd = _build_chain(4)
    s = wm.init_physics_state(pb, t, 1)
    # push the top limb sideways so the chain topples deterministically
    lv = s.linvel.at[:, int(rd.bodies[-1]), 0].set(1.5)
    s = s._replace(linvel=lv)
    step = jax.jit(lambda s: wm.step_physics(s, t, 1 / 60))
    for _ in range(240):
        s = step(s)
    pos = np.asarray(s.position[0])
    assert np.isfinite(pos).all()
    heights = pos[rd.bodies][:, 1]
    # crumpled: every limb's center within capsule reach of the floor
    assert (heights < 0.45).all(), heights
    # joints intact: consecutive limb centers stay within limb length + slack
    limb_len = 0.4
    for a, b in zip(rd.bodies[:-1], rd.bodies[1:]):
        d = np.linalg.norm(pos[a] - pos[b])
        assert d < limb_len * 1.5, (a, b, d)


def test_drive_kinematic_follows_bones():
    sb, pb, t, rd = _build_chain(3)
    st = graph_mod.update_hierarchical_data(init_state(sb.build(), 2), sb.build())
    s = wm.init_physics_state(pb, t, 2)
    moved = s._replace(position=s.position + 5.0)
    active = jnp.asarray([True, False])
    out = drive_kinematic(moved, st, rd, active)
    # world 0 active: bodies keep their (moved) physics pose
    assert np.allclose(np.asarray(out.position[0, rd.bodies]),
                       np.asarray(moved.position[0, rd.bodies]))
    # world 1 inactive: bodies snap to bone-driven placement (bind pose
    # here → the builder's original capsule centers) with zero velocity
    expect = np.asarray(s.position[1, rd.bodies])
    assert np.allclose(np.asarray(out.position[1, rd.bodies]), expect,
                       atol=1e-5)
    assert np.allclose(np.asarray(out.linvel[1, rd.bodies]), 0.0)
