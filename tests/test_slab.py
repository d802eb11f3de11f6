"""Slab broadphase + MXU-native solver path.

The slab path (physics/broadphase.py SlabConfig, physics/world.py
_step_physics_slab) is the TPU production pipeline for large collider
counts: static per-collider per-class candidate windows, one-hot MXU
gathers (physics/pallas_ops.py), reshape-sum scatters. These tests pin

  * gather_rows / count_lt exactness (CPU fallback path),
  * candidate coverage vs a brute-force AABB broadphase,
  * trajectory equivalence with the dense path on non-chaotic scenes
    (elastic bounce, box stack) — same physics, different plumbing.

Reference fidelity points: rapier defaults at
fyrox-impl/src/scene/graph/physics/mod.rs:892-908.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fyrox_tpu.physics import world as wd, broadphase as bp_mod, shapes as sh
from fyrox_tpu.physics.pallas_ops import gather_rows, count_lt


class TestPlaneOps:
    def test_gather_rows_matches_take(self):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(3, 17, 5)).astype(np.float32))
        idx = jnp.asarray(rng.integers(0, 17, size=(3, 29)).astype(np.int32))
        out = np.asarray(gather_rows(x, idx))
        ref = np.take_along_axis(np.asarray(x),
                                 np.broadcast_to(np.asarray(idx)[..., None],
                                                 (3, 29, 5)), axis=1)
        np.testing.assert_array_equal(out, ref)

    def test_gather_rows_out_of_range_is_zero(self):
        x = jnp.ones((1, 4, 2))
        idx = jnp.asarray([[0, 4, -1, 3]], jnp.int32)
        out = np.asarray(gather_rows(x, idx))
        np.testing.assert_array_equal(out[0, :, 0], [1.0, 0.0, 0.0, 1.0])

    def test_count_lt_is_searchsorted(self):
        rng = np.random.default_rng(1)
        keys = np.sort(rng.integers(0, 100, size=(2, 33)), axis=1)
        q = rng.integers(0, 100, size=(2, 11))
        left = np.asarray(count_lt(jnp.asarray(keys), jnp.asarray(q)))
        right = np.asarray(count_lt(jnp.asarray(keys), jnp.asarray(q),
                                    strict=False))
        for w in range(2):
            np.testing.assert_array_equal(
                left[w], np.searchsorted(keys[w], q[w], side="left"))
            np.testing.assert_array_equal(
                right[w], np.searchsorted(keys[w], q[w], side="right"))


def _pile(n=64, seed=3):
    from fyrox_tpu.models.character import build_pile_scene
    from fyrox_tpu.scene.builder import SceneBuilder
    sb = SceneBuilder()
    pb, _ = build_pile_scene(sb, n_bodies=n, seed=seed)
    return pb


class TestSlabCoverage:
    def test_candidates_cover_aabb_overlaps(self):
        pb = _pile(96, seed=5)
        pt = pb.build(broadphase="slab", slab_window=24)
        st = wd.init_physics_state(pb, pt, 1)
        step = jax.jit(lambda s: wd.step_physics(s, pt, 1 / 60))
        for _ in range(40):
            st = step(st)
        cpos, crot = wd._collider_world(st, pt)
        ctype = jnp.asarray(pt.col_shape)
        cparams = jnp.asarray(pt.col_params)
        margin = pt.allowed_linear_error + wd.SPECULATIVE_MARGIN
        he = sh.shape_aabb_half_extents(ctype[None], cparams[None], crot) + margin
        amin = np.asarray(cpos - he)
        amax = np.asarray(cpos + he)
        is_hs = np.asarray(ctype == sh.HALFSPACE)
        col_body = np.asarray(pt.col_body)
        dyn = np.asarray(pt.body_type)[col_body] == wd.DYNAMIC
        cands = bp_mod.slab_candidates(pt.grid, col_body, dyn,
                                       jnp.asarray(amin), jnp.asarray(amax))
        got = set()
        for cls_idx, cand in enumerate(cands):
            if cand.j_real.shape[1] == 0:
                continue
            i_static = np.repeat(pt.grid.grid_cols, pt.grid.nslot(cls_idx))
            jr = np.asarray(cand.j_real)[0]
            vv = np.asarray(cand.valid)[0]
            got |= {(int(i_static[k]), int(jr[k]))
                    for k in range(len(jr)) if vv[k]}
        missing = 0
        total = 0
        c = pt.num_colliders
        for i in range(c):
            if is_hs[i]:
                continue                       # big colliders don't scan
            for j in range(c):
                if i == j or col_body[i] == col_body[j]:
                    continue
                if not (dyn[i] or dyn[j]):
                    continue
                if np.all((amin[0, i] <= amax[0, j])
                          & (amax[0, i] >= amin[0, j])):
                    total += 1
                    if (i, j) not in got:
                        missing += 1
        assert total > 50
        # static windows may drop an extreme-density tail; anything beyond
        # ~1% means the walk or the compaction is broken
        assert missing <= max(2, total // 100), (missing, total)


@pytest.mark.slow
class TestSlabDynamics:
    def _bounce_peak(self, mode):
        pb = wd.PhysicsBuilder()
        g = pb.add_body(body_type=wd.BodyType.STATIC)
        pb.add_collider(g, sh.HALFSPACE, [0, 0, 0])
        ball = pb.add_body(position=(0, 2, 0))
        pb.add_collider(ball, sh.BALL, [0.5], restitution=1.0)
        pt = pb.build(broadphase=mode)
        st = wd.init_physics_state(pb, pt, 1)
        step = jax.jit(lambda s: wd.step_physics(s, pt, 1 / 60))
        peak = 0.0
        for i in range(130):
            st = step(st)
            if i > 55:
                peak = max(peak, float(st.position[0, ball, 1]))
        return peak

    def test_elastic_bounce_matches_dense(self):
        dense = self._bounce_peak("dense")
        slab = self._bounce_peak("slab")
        assert abs(dense - slab) < 1e-3, (dense, slab)
        assert dense > 1.8

    def test_box_stack_stays(self):
        pb = wd.PhysicsBuilder()
        g = pb.add_body(body_type=wd.BodyType.STATIC)
        pb.add_collider(g, sh.HALFSPACE, [0, 0, 0])
        b1 = pb.add_body(position=(0, 0.5, 0))
        pb.add_collider(b1, sh.CUBOID, [0.5, 0.5, 0.5])
        b2 = pb.add_body(position=(0.1, 1.5, 0))
        pb.add_collider(b2, sh.CUBOID, [0.5, 0.5, 0.5])
        pt = pb.build(broadphase="slab")
        st = wd.init_physics_state(pb, pt, 1)
        step = jax.jit(lambda s: wd.step_physics(s, pt, 1 / 60))
        for _ in range(120):
            st = step(st)
        drift = float(jnp.linalg.norm(
            st.position[0, b2] - jnp.asarray([0.1, 1.5, 0.0])))
        assert drift < 0.05, drift

    def test_pile_settles_no_tunneling(self):
        pb = _pile(48, seed=7)
        pt = pb.build(broadphase="slab")
        st = wd.init_physics_state(pb, pt, 2)
        step = jax.jit(lambda s: wd.step_physics(s, pt, 1 / 60))
        for _ in range(90):
            st = step(st)
        min_y = float(jnp.min(st.position[:, 1:, 1]))
        assert min_y > -0.5, min_y
        assert float(jnp.max(jnp.abs(st.linvel))) < 20.0


@pytest.mark.slow
class TestCCD:
    """Speculative-contact CCD (rapier max_ccd_substeps fidelity point,
    fyrox-impl/src/scene/graph/physics/mod.rs:905): fat AABBs sweep along
    the motion and the prediction distance scales with closing speed, so
    the solver's sep/h bias clamps fast movers at the surface instead of
    tunneling."""

    @pytest.mark.parametrize("mode", ["dense", "slab"])
    def test_bullet_does_not_tunnel(self, mode):
        pb = wd.PhysicsBuilder()
        wall = pb.add_body(body_type=wd.BodyType.STATIC, position=(0, 1, 0))
        pb.add_collider(wall, sh.CUBOID, [1.0, 0.05, 1.0])
        b = pb.add_body(position=(0, 3, 0))
        pb.add_collider(b, sh.BALL, [0.05])
        pt = pb.build(broadphase=mode)
        st = wd.init_physics_state(pb, pt, 1)
        # 100 m/s: crosses the 0.1-thick wall in 1/16 of a step
        st = st._replace(linvel=st.linvel.at[0, b, 1].set(-100.0))
        step = jax.jit(lambda s: wd.step_physics(s, pt, 1 / 60))
        min_y = 3.0
        for _ in range(30):
            st = step(st)
            min_y = min(min_y, float(st.position[0, b, 1]))
        assert min_y > 1.05, min_y      # rests on wall top (1.05 + r=0.05)
