"""Fused narrow+compact+solve kernel (physics/pallas_step.py) vs the
staged XLA pipeline (slab2 narrowphase → compaction → solver), verified
in interpreter mode on CPU.

The kernel rebuilds the candidate-window manifolds, the two-tier
compaction and the warmstart pid matching in VMEM from ONE int tensor
per step; these tests pin its semantics to the XLA stages it replaces."""
import os
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fyrox_tpu.physics import (BALL, CAPSULE, CUBOID, HALFSPACE, BodyType,
                               PhysicsBuilder)
from fyrox_tpu.physics import world as wm
from fyrox_tpu.physics import slab2


def _scene(with_capsules=True, seed=3, n=24):
    rng = np.random.default_rng(seed)
    pb = PhysicsBuilder()
    g = pb.add_body(body_type=BodyType.STATIC)
    pb.add_collider(g, HALFSPACE, [], friction=0.7)
    for i in range(n):
        p = (rng.uniform(-1.5, 1.5), 0.4 + 0.45 * (i // 6),
             rng.uniform(-1.5, 1.5))
        b = pb.add_body(position=p)
        if with_capsules and i % 5 == 0:
            pb.add_collider(b, CAPSULE, [0.15, 0.12], friction=0.5)
        elif i % 2:
            pb.add_collider(b, BALL, [0.22], friction=0.5, restitution=0.2)
        else:
            pb.add_collider(b, CUBOID, [0.18, 0.18, 0.18], friction=0.5)
    t = pb.build(broadphase="slab")
    assert slab2.supports(t)
    return pb, t


def _run(monkeypatch, t, s0, env, steps=30):
    for k, v in env.items():
        if v is None:
            monkeypatch.delenv(k, raising=False)
        else:
            monkeypatch.setenv(k, v)
    step = jax.jit(lambda s: wm.step_physics(s, t, 1 / 60))
    s = s0
    for _ in range(steps):
        s = step(s)
    return jax.tree_util.tree_map(np.asarray, s)


@pytest.mark.slow
def test_fused_step_matches_staged_xla(monkeypatch):
    """30-step trajectory: fused kernel vs the staged narrowphase →
    compact → XLA solver path. split3 gathers are bit-exact, so the
    only drift is f32 reduction-order noise."""
    pb, t = _scene()
    from fyrox_tpu.physics import pallas_step as pf
    assert pf.supports_fused(slab2._ctx(t), t)
    s0 = wm.init_physics_state(pb, t, 2)

    ref = _run(monkeypatch, t, s0,
               {"FYROX_PALLAS_INTERPRET": None,
                "FYROX_NO_PALLAS_SOLVER": "1"})
    got = _run(monkeypatch, t, s0,
               {"FYROX_PALLAS_INTERPRET": "1",
                "FYROX_NO_PALLAS_SOLVER": None,
                "FYROX_NO_FUSED_STEP": None})
    dp = np.abs(ref.position - got.position).max()
    dv = np.abs(ref.linvel - got.linvel).max()
    assert dp < 5e-4, dp
    assert dv < 5e-3, dv
    assert np.isfinite(got.position).all()
    # pile actually interacts (the equivalence isn't vacuous)
    assert np.abs(np.asarray(s0.position) - got.position).max() > 1e-3


@pytest.mark.slow
def test_fused_matches_solver_kernel_single_step(monkeypatch):
    """ONE cold step from a settled state: fused kernel vs the
    solver-kernel path (XLA narrowphase + pallas_solver). Identical
    contact sets and split3 (bit-exact) gathers — agreement to plain
    f32 elementwise noise, no trajectory amplification."""
    pb, t = _scene(with_capsules=False, seed=11)
    s0 = wm.init_physics_state(pb, t, 2)
    monkeypatch.setenv("FYROX_NO_PALLAS_SOLVER", "1")
    step = jax.jit(lambda s: wm.step_physics(s, t, 1 / 60))
    for _ in range(40):
        s0 = step(s0)
    monkeypatch.delenv("FYROX_NO_PALLAS_SOLVER")
    cold = s0._replace(warm_n=jnp.zeros_like(s0.warm_n),
                       warm_t1=jnp.zeros_like(s0.warm_t1),
                       warm_t2=jnp.zeros_like(s0.warm_t2))

    a = _run(monkeypatch, t, cold,
             {"FYROX_PALLAS_INTERPRET": "1", "FYROX_NO_FUSED_STEP": "1"},
             steps=1)
    b = _run(monkeypatch, t, cold,
             {"FYROX_PALLAS_INTERPRET": "1", "FYROX_NO_FUSED_STEP": None},
             steps=1)
    assert np.abs(a.position - b.position).max() < 1e-6
    assert np.abs(a.linvel - b.linvel).max() < 1e-5
    # warm carries must match too: same pids, same impulses
    assert np.abs(a.warm_n - b.warm_n).max() < 1e-4
    same_pid = (a.warm_pair == b.warm_pair)
    # slots beyond a pair's manifold can differ only when inactive on
    # both sides (pid −1 vs compaction zeros) — active slots must agree
    active = (np.abs(a.warm_n) > 1e-7) | (np.abs(b.warm_n) > 1e-7)
    assert same_pid[active].all()


@pytest.mark.slow
def test_split_mode_matches_monolithic(monkeypatch):
    """FYROX_FUSED_STEP=2 (narrow+compact kernel -> solver kernel, the
    Mosaic-AOT-sized split) must produce the same step as the monolithic
    fused kernel: identical in-kernel math, only an HBM hop for the
    compacted planes between them."""
    pb, t = _scene(with_capsules=False, seed=7, n=12)
    s0 = wm.init_physics_state(pb, t, 1)
    mono = _run(monkeypatch, t, s0,
                {"FYROX_PALLAS_INTERPRET": "1",
                 "FYROX_FUSED_STEP": None}, steps=3)
    split = _run(monkeypatch, t, s0,
                 {"FYROX_PALLAS_INTERPRET": "1",
                  "FYROX_FUSED_STEP": "2"}, steps=3)
    np.testing.assert_allclose(mono.position, split.position, atol=1e-7)
    np.testing.assert_allclose(mono.warm_n, split.warm_n, atol=1e-6)
    np.testing.assert_array_equal(mono.warm_pair, split.warm_pair)


@pytest.mark.slow
def test_fused_warmstart_carries(monkeypatch):
    """Warmstarted steady-state: the fused kernel's in-kernel pid match
    must reproduce the XLA warm matching (no impulse loss between
    steps). A settled stack under warmstart stays settled."""
    pb, t = _scene(with_capsules=False, seed=5, n=12)
    s0 = wm.init_physics_state(pb, t, 1)
    got = _run(monkeypatch, t, s0,
               {"FYROX_PALLAS_INTERPRET": "1"}, steps=60)
    ref = _run(monkeypatch, t, s0,
               {"FYROX_PALLAS_INTERPRET": None,
                "FYROX_NO_PALLAS_SOLVER": "1"}, steps=60)
    # the two paths' velocity envelopes and warm-impulse mass must
    # agree — a broken warm pid match loses impulses every step, which
    # shows up as diverging velocities and a drained warm carry
    # (measured traces are IDENTICAL at 3 decimals on both paths; the
    # scene itself is still rolling at ~0.9 m/s after 60 steps, so a
    # settledness bound would test the scene, not the kernel)
    v_ref = np.abs(ref.linvel).max()
    v_got = np.abs(got.linvel).max()
    assert abs(v_got - v_ref) < 0.2 * max(v_ref, 0.1), (v_ref, v_got)
    wr = np.abs(ref.warm_n).sum()
    wg = np.abs(got.warm_n).sum()
    assert wg > 0.0 and abs(wg - wr) < 0.5 * max(wr, 1e-3), (wr, wg)
    dp = np.abs(ref.position - got.position).max()
    # measured 2.1e-3 after 60 contact-chaos steps (f32 reduction-order
    # noise compounding); bound at 2x
    assert dp < 5e-3, dp
