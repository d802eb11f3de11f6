"""Fused Pallas TGS solver (physics/pallas_solver.py) vs the XLA plane
solver: identical semantics, verified in interpreter mode on CPU."""
import os
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fyrox_tpu.physics import BALL, CUBOID, HALFSPACE, BodyType, PhysicsBuilder
from fyrox_tpu.physics import world as wm
from fyrox_tpu.physics import slab2


def _scene():
    rng = np.random.default_rng(7)
    pb = PhysicsBuilder()
    g = pb.add_body(body_type=BodyType.STATIC)
    pb.add_collider(g, HALFSPACE, [], friction=0.7)
    for i in range(24):
        p = (rng.uniform(-1.5, 1.5), 0.4 + 0.45 * (i // 6),
             rng.uniform(-1.5, 1.5))
        b = pb.add_body(position=p)
        if i % 2:
            pb.add_collider(b, BALL, [0.22], friction=0.5, restitution=0.2)
        else:
            pb.add_collider(b, CUBOID, [0.18, 0.18, 0.18], friction=0.5)
    t = pb.build(broadphase="slab")
    assert slab2.supports(t)
    return pb, t


@pytest.mark.slow
def test_kernel_matches_xla_path(monkeypatch):
    pb, t = _scene()
    s0 = wm.init_physics_state(pb, t, 2)

    def run(env):
        for k, v in env.items():
            if v is None:
                monkeypatch.delenv(k, raising=False)
            else:
                monkeypatch.setenv(k, v)
        # fresh jit wrapper each time so the env-dependent trace isn't
        # reused from the cache
        step = jax.jit(lambda s: wm.step_physics(s, t, 1 / 60))
        s = s0
        for _ in range(30):
            s = step(s)
        return jax.tree_util.tree_map(np.asarray, s)

    # FYROX_NO_FUSED_STEP isolates the solver kernel (XLA narrowphase);
    # the fused narrow+compact+solve kernel has its own equivalence
    # suite in test_pallas_step.py
    ref = run({"FYROX_PALLAS_INTERPRET": None,
               "FYROX_NO_PALLAS_SOLVER": "1",
               "FYROX_NO_FUSED_STEP": "1"})
    got = run({"FYROX_PALLAS_INTERPRET": "1",
               "FYROX_NO_PALLAS_SOLVER": None,
               "FYROX_NO_FUSED_STEP": "1"})
    dp = np.abs(ref.position - got.position).max()
    dv = np.abs(ref.linvel - got.linvel).max()
    # same algorithm, different reduction orders (kernel dots vs XLA
    # einsums) — agreement to f32 accumulation noise over 30 steps
    assert dp < 5e-4, dp
    assert dv < 5e-3, dv
    assert np.isfinite(got.position).all()


@pytest.mark.slow
def test_gather_precision_variants(monkeypatch):
    """split2 (2 exact-one-hot bf16 passes) and highest match the
    default-precision kernel on ONE cold step from a settled state
    (oracle methodology — trajectory diffs would amplify split2's
    2^-16 value rounding chaotically). Interpret mode evaluates the
    split arithmetic itself."""
    from fyrox_tpu.physics import pallas_solver as ps
    pb, t = _scene()
    s0 = wm.init_physics_state(pb, t, 2)
    # settle on the fast XLA path
    monkeypatch.setenv("FYROX_NO_PALLAS_SOLVER", "1")
    step = jax.jit(lambda s: wm.step_physics(s, t, 1 / 60))
    for _ in range(30):
        s0 = step(s0)
    monkeypatch.delenv("FYROX_NO_PALLAS_SOLVER")
    monkeypatch.setenv("FYROX_PALLAS_INTERPRET", "1")
    monkeypatch.setenv("FYROX_NO_FUSED_STEP", "1")
    cold = s0._replace(warm_n=jnp.zeros_like(s0.warm_n),
                       warm_t1=jnp.zeros_like(s0.warm_t1),
                       warm_t2=jnp.zeros_like(s0.warm_t2))

    def run(prec):
        monkeypatch.setattr(ps, "_GATHER_PREC", prec)
        out = jax.jit(lambda s: wm.step_physics(s, t, 1 / 60))(cold)
        return jax.tree_util.tree_map(np.asarray, out)

    ref = run("default")
    for prec, tol_p, tol_v in (("highest", 1e-6, 1e-5),
                               # split3 reconstructs all 24 mantissa
                               # bits — matches the f32 dots bit-near-
                               # exactly (only op-order differs)
                               ("split3", 1e-6, 1e-5),
                               ("split2", 5e-4, 2e-3)):
        got = run(prec)
        dp = np.abs(ref.position - got.position).max()
        dv = np.abs(ref.linvel - got.linvel).max()
        assert dp < tol_p, (prec, dp)
        assert dv < tol_v, (prec, dv)

    # alternate gather formulations: identical math, different dot shapes
    for mode in ("premask", "wide"):
        monkeypatch.setattr(ps, "_GATHER_MODE", mode)
        got = run("default")
        dp = np.abs(ref.position - got.position).max()
        dv = np.abs(ref.linvel - got.linvel).max()
        assert dp < 1e-6, (mode, dp)
        assert dv < 1e-5, (mode, dv)
    monkeypatch.setattr(ps, "_GATHER_MODE", "select")


def _jointed_scene(with_com=False):
    """Ragdoll-style chain: static anchor + 4-link BALL/REVOLUTE chain
    falling onto the ground plane — joints AND contacts active in the
    same solve. with_com offsets each link's center of mass."""
    from fyrox_tpu.physics import CAPSULE
    from fyrox_tpu.physics.joints import JointKind
    pb = PhysicsBuilder()
    g = pb.add_body(body_type=BodyType.STATIC)
    pb.add_collider(g, HALFSPACE, [], friction=0.6)
    anchor = pb.add_body(body_type=BodyType.STATIC, position=(0, 2.4, 0))
    pb.add_collider(anchor, BALL, [0.05])
    prev = anchor
    for i in range(4):
        b = pb.add_body(position=(0.55 * (i + 1), 2.4, 0.0))
        # a collider offset shifts the body's center of mass
        # (PhysicsBuilder derives com_local from collider placement)
        off = (0.06, -0.04, 0.02) if with_com else (0, 0, 0)
        pb.add_collider(b, CAPSULE, [0.18, 0.1], friction=0.5,
                        offset=off)
        pb.add_joint(JointKind.BALL if i % 2 else JointKind.REVOLUTE,
                     prev, b, anchor_a=(0.25, 0, 0) if i else (0, 0, 0),
                     anchor_b=(-0.3, 0, 0), axis=(0, 0, 1))
        prev = b
    # a loose ball that lands on the chain: contact + joint interaction
    fb = pb.add_body(position=(1.1, 3.2, 0.0))
    pb.add_collider(fb, BALL, [0.2], friction=0.5, restitution=0.1)
    t = pb.build(broadphase="slab")
    assert slab2.supports(t)
    return pb, t


def _run_paths(monkeypatch, pb, t, steps=40):
    s0 = wm.init_physics_state(pb, t, 2)

    def run(env):
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

    ref = run({"FYROX_PALLAS_INTERPRET": None,
               "FYROX_NO_PALLAS_SOLVER": "1",
               "FYROX_NO_FUSED_STEP": "1"})
    got = run({"FYROX_PALLAS_INTERPRET": "1",
               "FYROX_NO_PALLAS_SOLVER": None,
               "FYROX_NO_FUSED_STEP": "1"})
    return ref, got


@pytest.mark.slow
def test_kernel_joints_match_xla_path(monkeypatch):
    """r4 VERDICT #5: jointed (ragdoll-chain) scenes keep the solver
    kernel — the in-kernel joint velocity/position passes must land on
    the XLA joints_mod trajectory."""
    from fyrox_tpu.physics.pallas_solver import supports_kernel
    pb, t = _jointed_scene()
    assert t.joints is not None and t.joints.num_joints == 4
    assert supports_kernel(t, False)          # joints now in scope
    ref, got = _run_paths(monkeypatch, pb, t)
    dp = np.abs(ref.position - got.position).max()
    dv = np.abs(ref.linvel - got.linvel).max()
    assert dp < 1e-3, dp
    assert dv < 2e-2, dv
    assert np.isfinite(got.position).all()
    # the chain actually hangs (joints did something): link 4 stays
    # within chain reach of the anchor instead of free-falling
    tip = got.position[0, 5]
    assert np.linalg.norm(tip - np.asarray([0, 2.4, 0])) < 2.6


@pytest.mark.slow
def test_kernel_com_offsets_match_xla_path(monkeypatch):
    """COM-offset bodies in the solver kernel: lever arms and
    integration track the offset center of mass."""
    pb, t = _jointed_scene(with_com=True)
    ref, got = _run_paths(monkeypatch, pb, t)
    dp = np.abs(ref.position - got.position).max()
    assert dp < 2e-3, dp
    assert np.isfinite(got.position).all()
