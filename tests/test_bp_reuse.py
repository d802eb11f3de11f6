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
        # adaptive rebuilds may reset the cadence, but age stays in range
        assert 0 <= int(st.bp_age[0]) < 4
        # cached candidates are real (some valid pairs while falling)
        cands, pos0, cov = st.bp_cache
        assert sum(int(np.asarray(c[2]).sum()) for c in cands) > 0
        assert np.asarray(cov).max() > 0.0       # budgets were written

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
        # settled speculative drops stay marginal (they heal at the next
        # rebuild by design; live contacts are pinned above)
        for cls in range(3):
            assert stats[f"class{cls}"]["dropped"] <= 8, stats

    def test_period1_state_has_no_cache(self):
        pb, pt = _pile_pt(period=1)
        st = wd.init_physics_state(pb, pt, 1)
        assert st.bp_cache is None and st.bp_age is None
        st2 = jax.jit(lambda s: wd.step_physics(s, pt, 1 / 60))(st)
        assert st2.bp_cache is None and st2.bp_age is None

    def test_fast_fall_matches_period1_via_adaptive_rebuild(self):
        """Fast transients exceed the cell-capped fat margins (the
        largest grid collider has ~zero sweep headroom by cell
        construction), so reuse correctness rests on the VELOCITY-
        ADAPTIVE rebuild: any body leaving its cached coverage budget
        forces an early rebuild. End-to-end guarantee: spread-out
        fast-falling spinning bodies produce the same trajectory as
        period=1 — through free fall AND landing."""
        from fyrox_tpu.physics import shapes as sh

        def build(period):
            pb = wd.PhysicsBuilder()
            g = pb.add_body(body_type=wd.BodyType.STATIC)
            pb.add_collider(g, sh.HALFSPACE, [0, 0, 0], friction=0.5)
            rng = np.random.default_rng(5)
            for i in range(190):                 # >=192 colliders
                p = (6.0 * (i % 14), 3.0 + 0.02 * i, 6.0 * (i // 14))
                b = pb.add_body(position=p)
                if i % 2:
                    pb.add_collider(b, sh.CUBOID, [0.3, 0.2, 0.25])
                else:
                    pb.add_collider(b, sh.BALL, [0.25])
            pt = pb.build(broadphase="slab", broadphase_period=period)
            assert slab2.supports(pt)
            st = wd.init_physics_state(pb, pt, 1)
            rng2 = np.random.default_rng(7)
            lv = rng2.uniform(-3, 3, st.linvel.shape).astype(np.float32)
            av = rng2.uniform(-5, 5, st.angvel.shape).astype(np.float32)
            lv[:, 0] = 0.0                       # body 0 is the STATIC ground
            av[:, 0] = 0.0
            st = st._replace(linvel=jnp.asarray(lv), angvel=jnp.asarray(av))

            @jax.jit
            def roll(s):
                return jax.lax.scan(
                    lambda s, _: (wd.step_physics(s, pt, 1 / 60), None),
                    s, None, length=140)[0]

            return roll(st)

        s1 = build(1)
        s4 = build(4)
        # tumbling cubes are chaotic (bounces amplify f32 window-sum
        # reassociation), so per-body equality is only meaningful for
        # non-chaotic scenes (box-stack test above). Here the contract is
        # PHYSICAL: a missed ground/pair contact during reuse would show
        # as tunneling or a wrong resting height.
        for s in (s1, s4):
            y = np.asarray(s.position[0, 1:, 1])
            assert y.min() > 0.1, y.min()        # nothing tunneled
            assert y.max() < 1.5, y.max()        # nothing launched
            assert float(jnp.max(jnp.abs(s.linvel))) < 8.0
        # aggregate agreement: the two configs settle at the same heights
        m1 = float(np.mean(np.asarray(s1.position[0, 1:, 1])))
        m4 = float(np.mean(np.asarray(s4.position[0, 1:, 1])))
        assert abs(m1 - m4) < 0.02, (m1, m4)
