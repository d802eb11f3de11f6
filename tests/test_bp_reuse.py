"""Broadphase temporal reuse (template.broadphase_period > 1).

The slab-v2 path can rebuild its candidate windows every N steps from
two-sided temporally-fattened AABBs and reuse them in between
(slab2.step_slab2; rapier's incremental-SAP margin analog at
fyrox-impl/src/scene/graph/physics/mod.rs broadphase update). Reuse is
semantically exact as long as the fat candidate set stays a superset of
the true overlap set and no window overflows — these tests pin that:

  * trajectory equivalence vs period=1 on a settling pile (the candidate
    SET is identical, only summation order inside window sums may differ),
  * no window overflow under the fattened margins (bp_demand_stats),
  * the cache rebuild cadence (bp_age threading through scan).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fyrox_tpu.physics import world as wd, slab2


def _pile_pt(n=96, seed=3, period=1):
    from fyrox_tpu.models.character import build_pile_scene
    from fyrox_tpu.scene.builder import SceneBuilder
    sb = SceneBuilder()
    pb, _ = build_pile_scene(sb, n_bodies=n, seed=seed)
    pt = pb.build(broadphase="slab", slab_window=(16, 10, 14),
                  slab_walk=64, broadphase_period=period)
    assert slab2.supports(pt)
    return pb, pt


def _rollout(pb, pt, steps, worlds=2):
    st = wd.init_physics_state(pb, pt, worlds)

    @jax.jit
    def roll(s):
        def body(s, _):
            return wd.step_physics(s, pt, 1 / 60), None
        return jax.lax.scan(body, s, None, length=steps)[0]

    return roll(st)


def _stack_pt(period):
    from fyrox_tpu.physics import shapes as sh
    pb = wd.PhysicsBuilder()
    g = pb.add_body(body_type=wd.BodyType.STATIC)
    pb.add_collider(g, sh.HALFSPACE, [0, 0, 0])
    b1 = pb.add_body(position=(0, 0.5, 0))
    pb.add_collider(b1, sh.CUBOID, [0.5, 0.5, 0.5])
    b2 = pb.add_body(position=(0.1, 1.5, 0))
    pb.add_collider(b2, sh.CUBOID, [0.5, 0.5, 0.5])
    return pb, pb.build(broadphase="slab", broadphase_period=period)


@pytest.mark.slow
class TestBroadphaseReuse:
    def test_box_stack_matches_period1(self):
        """Non-chaotic scene: reuse must reproduce the per-step-broadphase
        trajectory (identical candidate supersets → identical contacts;
        chaotic piles amplify f32 window-sum reassociation and are pinned
        by settle-stats below instead, like the slab-vs-dense tests)."""
        pb1, pt1 = _stack_pt(1)
        pb4, pt4 = _stack_pt(4)
        s1 = _rollout(pb1, pt1, 120, worlds=1)
        s4 = _rollout(pb4, pt4, 120, worlds=1)
        np.testing.assert_allclose(np.asarray(s4.position),
                                   np.asarray(s1.position), atol=1e-3)

    def test_pile_settles_with_reuse(self):
        pb, pt = _pile_pt(period=4)
        st = _rollout(pb, pt, 90)
        min_y = float(jnp.min(st.position[:, 1:, 1]))
        assert min_y > -0.5, min_y                 # no tunneling
        assert float(jnp.max(jnp.abs(st.linvel))) < 20.0

    def test_cache_threads_through_scan(self):
        pb, pt = _pile_pt(period=4)
        st = wd.init_physics_state(pb, pt, 1)
        assert st.bp_cache is not None
        assert int(st.bp_age[0]) == 0
        st = _rollout(pb, pt, 6)
        assert st.bp_cache is not None
        assert int(st.bp_age[0]) == 6 % 4
        # cached candidates are real (some valid pairs survive settling)
        assert sum(int(np.asarray(c[2]).sum()) for c in st.bp_cache) > 0

    def test_no_live_contact_drops_under_fat_margins(self):
        """Two-tier stage-2 compaction: TIGHT (current-overlap) pairs must
        always fit the windows — transient fat-margin overflow may drop
        only speculative future pairs (healed at the next rebuild)."""
        pb, pt = _pile_pt(period=4)
        for steps in (60, 90):                   # mid-fall + settled
            st = _rollout(pb, pt, steps)
            stats = slab2.bp_demand_stats(pt, st, period=4)
            assert stats["walk_dropped"] == 0, (steps, stats)
            for cls in range(3):
                assert stats[f"class{cls}"]["tight_dropped"] == 0, \
                    (steps, stats)
        # settled demand also fits entirely (speculative included)
        for cls in range(3):
            assert stats[f"class{cls}"]["dropped"] == 0, stats

    def test_period1_state_has_no_cache(self):
        pb, pt = _pile_pt(period=1)
        st = wd.init_physics_state(pb, pt, 1)
        assert st.bp_cache is None and st.bp_age is None
        st2 = jax.jit(lambda s: wd.step_physics(s, pt, 1 / 60))(st)
        assert st2.bp_cache is None and st2.bp_age is None

    def test_fat_aabbs_are_superset(self):
        # the two-sided fat AABB at rebuild time must contain the
        # one-sided per-step AABB of every subsequent reuse step
        pb, pt = _pile_pt(period=4)
        st = wd.init_physics_state(pb, pt, 1)
        step = jax.jit(lambda s: wd.step_physics(s, pt, 1 / 60))
        for _ in range(20):                      # some motion, pre-settle
            st = step(st)
        cx = slab2._ctx(pt)
        from fyrox_tpu.physics.slab2 import (_aabb_planes, _stack,
                                             _collider_pose_planes,
                                             _unstack3, _unstack4, scale3,
                                             q_to_rot9)
        margin = pt.allowed_linear_error + wd.SPECULATIVE_MARGIN

        def aabbs(s, period):
            cpos, cq, lv_c = _collider_pose_planes(
                cx, _unstack3(s.position), _unstack4(s.rotation),
                _unstack3(s.linvel))
            r9 = q_to_rot9(cq)
            if period > 1:
                gm = 9.81
                extra = 0.5 * gm * (period / 60.0) ** 2
                return _aabb_planes(cx, pt, cpos, r9,
                                    scale3(lv_c, period / 60.0), margin,
                                    two_sided=True, extra=extra)
            return _aabb_planes(cx, pt, cpos, r9, scale3(lv_c, 1 / 60.0),
                                margin)

        fmin, fmax = aabbs(st, 4)
        fmin = np.asarray(_stack(fmin))
        fmax = np.asarray(_stack(fmax))
        ok_all = True
        for _ in range(4):
            pmin, pmax = aabbs(st, 1)
            pmin, pmax = np.asarray(_stack(pmin)), np.asarray(_stack(pmax))
            # finite (non-halfspace) colliders only; tolerance for the
            # sweep-cap clamp on the huge static slabs
            fin = np.isfinite(pmin).all(-1) & (np.abs(pmin) < 1e6).all(-1)
            ok_all &= bool(np.all(pmin[fin] >= fmin[fin] - 1e-4))
            ok_all &= bool(np.all(pmax[fin] <= fmax[fin] + 1e-4))
            st = step(st)
        assert ok_all
