"""Grid broadphase + directed solver tests.

Covers the hash-grid candidate generator against a brute-force reference
(exactness: no missing pairs, no duplicates, correct class split), the
directed-twin solver's agreement with the dense path on non-chaotic
scenes, exact Newton-pair symmetry (momentum conservation), and the
restitution fixes (max-λ gating, speculative relax bias).
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from fyrox_tpu.physics import (BALL, CUBOID, HALFSPACE, BodyType,
                               PhysicsBuilder)
from fyrox_tpu.physics import broadphase as bp_mod
from fyrox_tpu.physics import shapes as sh
from fyrox_tpu.physics import world as wm


def test_grid_candidates_match_bruteforce():
    rng = np.random.default_rng(0)
    C, W = 80, 2
    col_shape = np.asarray([sh.BALL if i % 2 else sh.CUBOID
                            for i in range(C)], np.int32)
    col_shape[0] = sh.HALFSPACE
    col_params = np.zeros((C, 6), np.float32)
    col_params[:, 0] = 0.3
    col_params[:, 1] = 0.25
    col_params[:, 2] = 0.2
    col_body = np.arange(C, dtype=np.int32)
    body_type = np.zeros(C, np.int32)
    body_type[0] = 1  # halfspace body static

    gb = bp_mod.build_grid_config(col_shape, col_params, col_body,
                                  body_type, margin=0.052, window=48)
    pos = rng.uniform(-3, 3, (W, C, 3)).astype(np.float32)
    pos[:, :30] = rng.uniform(-0.8, 0.8, (W, 30, 3))   # dense cluster
    he = np.zeros((W, C, 3), np.float32)
    for i in range(C):
        t = int(col_shape[i])
        he[:, i] = (col_params[i, 0] if t == sh.BALL
                    else np.abs(col_params[i, :3]) if t == sh.CUBOID
                    else 1e9)
    he = he + 0.052
    amin, amax = pos - he, pos + he
    dyn_col = body_type[col_body] == 0

    sets = bp_mod.grid_candidates(gb, col_body, dyn_col,
                                  jnp.asarray(amin), jnp.asarray(amax))
    kinds = gb._kinds
    for w in range(W):
        ref = set()
        for i in gb.grid_cols:
            for j in range(C):
                if j == i or col_body[j] == col_body[i]:
                    continue
                if not (dyn_col[i] or dyn_col[j]):
                    continue
                if np.all((amin[w, i] <= amax[w, j])
                          & (amax[w, i] >= amin[w, j])):
                    ref.add((int(i), int(j)))
        got = set()
        for ci, cs in enumerate(sets):
            v = np.asarray(cs.valid[w])
            for a, b in zip(np.asarray(cs.ia[w])[v], np.asarray(cs.ib[w])[v]):
                key = (int(a), int(b))
                assert key not in got, "duplicate directed candidate"
                assert gb.cls_tab[kinds[a], kinds[b]] == ci
                got.add(key)
        assert got == ref


def _run(build_fn, broadphase, steps, w=2, **kw):
    pb = build_fn()
    t = pb.build(broadphase=broadphase, **kw)
    s = wm.init_physics_state(pb, t, w)
    step = jax.jit(lambda s: wm.step_physics(s, t, 1 / 60))
    for _ in range(steps):
        s = step(s)
    return s


def _stack_builder():
    pb = PhysicsBuilder()
    g = pb.add_body(body_type=BodyType.STATIC)
    pb.add_collider(g, HALFSPACE, [], friction=0.8)
    for k in range(3):
        b = pb.add_body(position=(0, 0.55 + 1.05 * k, 0))
        pb.add_collider(b, CUBOID, [0.5, 0.5, 0.5], friction=0.8)
    return pb


def test_grid_matches_dense_on_stack():
    sd = _run(_stack_builder, "dense", 240)
    sg = _run(_stack_builder, "grid", 240)
    err = np.abs(np.asarray(sd.position) - np.asarray(sg.position)).max()
    assert err < 2e-3
    # boxes rest at ~0.5 / ~1.5 / ~2.5, not floating at the speculative
    # activation distance (the relax-pass bias regression)
    ys = np.sort(np.asarray(sg.position[0, 1:, 1]))
    assert np.allclose(ys, [0.5, 1.5, 2.5], atol=0.03)


def test_directed_twins_conserve_momentum():
    def build():
        pb = PhysicsBuilder()
        a = pb.add_body(position=(-1.2, 0, 0), gravity_scale=0.0)
        pb.add_collider(a, BALL, [0.5], restitution=1.0)
        b = pb.add_body(position=(1.2, 0, 0), gravity_scale=0.0)
        pb.add_collider(b, BALL, [0.5], restitution=1.0)
        return pb
    pb = build()
    t = pb.build(broadphase="grid")
    s = wm.init_physics_state(pb, t, 1)
    s = s._replace(linvel=jnp.asarray([[[2.0, 0, 0], [-2.0, 0, 0]]],
                                      jnp.float32))
    step = jax.jit(lambda s: wm.step_physics(s, t, 1 / 60))
    for _ in range(60):
        s = step(s)
    v = np.asarray(s.linvel[0])
    assert np.abs(v.sum(0)).max() < 1e-4          # Newton pairs exact
    assert v[0, 0] < -1.9 and v[1, 0] > 1.9       # e=1 rebound


def test_restitution_apex():
    """e=0.8 drop from 3.0: rebound apex ~2.1 (was dead before the
    max-λ restitution gate fix)."""
    pb = PhysicsBuilder()
    g = pb.add_body(body_type=BodyType.STATIC)
    pb.add_collider(g, HALFSPACE, [], restitution=0.0)
    b = pb.add_body(position=(0, 3.0, 0))
    pb.add_collider(b, BALL, [0.5], restitution=0.8)
    t = pb.build(broadphase="dense")
    s = wm.init_physics_state(pb, t, 1)
    step = jax.jit(lambda s: wm.step_physics(s, t, 1 / 60))
    ys = []
    for _ in range(160):
        s = step(s)
        ys.append(float(s.position[0, 1, 1]))
    ys = np.asarray(ys)
    imp = int(np.argmin(ys[:100]))
    apex = ys[imp:].max()
    assert 1.8 < apex < 2.3, apex


def test_grid_pile_settles():
    """27-body mixed pile on the grid path settles on the ground."""
    from fyrox_tpu.models.character import build_pile_scene
    from fyrox_tpu.scene import SceneBuilder
    sb = SceneBuilder()
    pb, _ = build_pile_scene(sb, n_bodies=27, seed=1)
    t = pb.build(broadphase="grid")
    s = wm.init_physics_state(pb, t, 2)
    step = jax.jit(lambda s: wm.step_physics(s, t, 1 / 60))
    for _ in range(240):
        s = step(s)
    p = np.asarray(s.position)
    v = np.asarray(s.linvel)
    assert np.isfinite(p).all()
    assert p[:, 1:, 1].min() > 0.15          # nothing sank through
    # balls may still be rolling away (no rolling resistance — matches
    # rapier); the pile itself must be calm: no body faster than a gentle
    # roll, and no vertical kinetic energy to speak of
    assert np.abs(v).max() < 3.0
    assert np.abs(v[..., 1]).max() < 0.5


def test_rank_rows_inverts_argsort_and_scatter_permutes():
    """rank_rows = stable inverse argsort; scatter_rows(rank) == the
    sorted-order gather (the counting-rank slab broadphase path)."""
    from fyrox_tpu.physics.pallas_ops import (gather_rows, rank_rows,
                                              scatter_rows)
    rng = np.random.default_rng(3)
    k = jnp.asarray(rng.integers(0, 40, (5, 300)).astype(np.int32))
    r = rank_rows(k)
    order = jnp.argsort(k, axis=1)
    assert np.array_equal(np.asarray(r), np.asarray(jnp.argsort(order, 1)))
    x = jnp.asarray(rng.standard_normal((5, 300, 6)).astype(np.float32))
    assert np.array_equal(np.asarray(scatter_rows(x, r, 300)),
                          np.asarray(gather_rows(x, order)))


def test_slab_rank_modes_identical():
    """FYROX_BP_RANK=sort (default: XLA argsort won the round-4 A/B)
    vs =count (the counting-rank A/B mode, measured -2.9%) produce
    identical slab candidate windows on a settled pile."""
    import os
    from fyrox_tpu.models.character import build_pile_scene
    from fyrox_tpu.scene import SceneBuilder
    from fyrox_tpu.physics import slab2

    sb = SceneBuilder()
    pb, _ = build_pile_scene(sb, n_bodies=200, seed=5)
    t = pb.build(broadphase="slab", slab_window=(12, 8, 10))
    s = wm.init_physics_state(pb, t, 2)
    step = jax.jit(lambda s: wm.step_physics(s, t, 1 / 60))
    for _ in range(30):
        s = step(s)

    def run(mode):
        old = os.environ.get("FYROX_BP_RANK")
        os.environ["FYROX_BP_RANK"] = mode
        try:
            # fresh jit so the env-dependent trace isn't cached
            out = jax.jit(lambda s: wm.step_physics(s, t, 1 / 60))(s)
        finally:
            if old is None:
                os.environ.pop("FYROX_BP_RANK", None)
            else:
                os.environ["FYROX_BP_RANK"] = old
        return np.asarray(out.position), np.asarray(out.linvel)

    p1, v1 = run("count")
    p2, v2 = run("sort")
    assert np.array_equal(p1, p2) and np.array_equal(v1, v2)
