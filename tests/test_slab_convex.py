"""Slab-mode convex hulls (VERDICT r3 #6; collider.rs:511 ConvexPolyhedron).

slab2.supports() no longer rejects CONVEX: candidate windows thread
slot-aligned hull tables through the SAME dense SAT kernels
(narrowphase.generate_contacts_class convex section), so the slab-v2
production path and the dense path share contact math exactly — their
single-step diffs pin the slab plumbing (window binning, compaction,
plane solver) at the oracle matrix's 2e-4.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fyrox_tpu.physics import (BALL, CUBOID, HALFSPACE, BodyType,
                               PhysicsBuilder)
from fyrox_tpu.physics import shapes as sh
from fyrox_tpu.physics import slab2
from fyrox_tpu.physics import world as wm

CONVEX = sh.CONVEX

pytestmark = pytest.mark.slow


def _octa(r=0.3):
    return [(r, 0, 0), (-r, 0, 0), (0, r, 0), (0, -r, 0), (0, 0, r),
            (0, 0, -r)]


def _cloud(seed, r=0.3, n=12):
    rng = np.random.default_rng(seed)
    p = rng.normal(size=(n, 3))
    return (p / np.linalg.norm(p, axis=1, keepdims=True) * r).tolist()


def _convex_cluster():
    rng = np.random.default_rng(11)
    pb = PhysicsBuilder()
    g = pb.add_body(body_type=BodyType.STATIC)
    pb.add_collider(g, HALFSPACE, [], friction=0.5, restitution=0.1)
    kinds = ["octa", "ball", "cloud", "cube", "octa", "cloud", "ball"]
    for i, kind in enumerate(kinds):
        p = (rng.uniform(-0.7, 0.7), 0.5 + 0.45 * i, rng.uniform(-0.7, 0.7))
        b = pb.add_body(position=p)
        if kind == "octa":
            pb.add_collider(b, CONVEX, points=_octa(), friction=0.4)
        elif kind == "cloud":
            pb.add_collider(b, CONVEX, points=_cloud(100 + i), friction=0.4)
        elif kind == "ball":
            pb.add_collider(b, BALL, [0.25], friction=0.4)
        else:
            pb.add_collider(b, CUBOID, [0.22, 0.22, 0.22], friction=0.4)
    return pb


class TestSlabConvex:
    def test_supports_convex_now(self):
        pb = _convex_cluster()
        pt = pb.build(broadphase="slab")
        assert slab2.supports(pt)

    def test_single_step_matches_dense(self):
        """Evolve with slab-v2; at sampled states run ONE cold step of
        both paths from the identical state and diff (oracle-matrix
        methodology, tests/test_oracle.py)."""
        pb = _convex_cluster()
        ts = pb.build(broadphase="slab")
        td = pb.build(broadphase="dense")
        assert slab2.supports(ts)
        s = wm.init_physics_state(pb, ts, 1)
        sd0 = wm.init_physics_state(pb, td, 1)
        step = jax.jit(lambda st: wm.step_physics(st, ts, 1 / 60))
        worst = 0.0
        for i in range(60):
            if i in (0, 15, 30, 59):
                cold_s = s._replace(warm_n=jnp.zeros_like(s.warm_n),
                                    warm_t1=jnp.zeros_like(s.warm_t1),
                                    warm_t2=jnp.zeros_like(s.warm_t2))
                cold_d = sd0._replace(position=s.position,
                                      rotation=s.rotation,
                                      linvel=s.linvel, angvel=s.angvel)
                out_s = wm.step_physics(cold_s, ts, 1 / 60)
                out_d = wm.step_physics(cold_d, td, 1 / 60)
                dp = np.abs(np.asarray(out_s.position)
                            - np.asarray(out_d.position)).max()
                dv = np.abs(np.asarray(out_s.linvel)
                            - np.asarray(out_d.linvel)).max()
                worst = max(worst, dp, dv)
            s = step(s)
        assert worst < 2e-4, worst

    def test_convex_pile_settles_on_slab(self):
        pb = _convex_cluster()
        pt = pb.build(broadphase="slab")
        st = wm.init_physics_state(pb, pt, 2)

        @jax.jit
        def roll(s):
            return jax.lax.scan(
                lambda s, _: (wm.step_physics(s, pt, 1 / 60), None),
                s, None, length=150)[0]

        st = roll(st)
        min_y = float(jnp.min(st.position[:, 1:, 1]))
        assert min_y > -0.2, min_y                # nothing tunnels
        assert float(jnp.max(jnp.abs(st.linvel))) < 5.0

    def test_no_shape_rejections_left(self):
        """supports() keeps only the convex+scenery exclusion."""
        pb = PhysicsBuilder()
        g = pb.add_body(body_type=BodyType.STATIC)
        hf = np.zeros((4, 4), np.float32)
        pb.add_collider(g, HALFSPACE, [])
        b = pb.add_body(position=(0, 1, 0))
        pb.add_collider(b, CONVEX, points=_octa())
        pt = pb.build(broadphase="slab")
        assert slab2.supports(pt)
