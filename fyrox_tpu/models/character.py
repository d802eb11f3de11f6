"""Flagship benchmark scene: animated skinned character + rigid-body pile.

This is the BASELINE.json north-star config: "animated character + 1k rigid
bodies" per world, stepped over thousands of worlds. The reference
equivalents are a skeletal mesh driven by fyrox-animation (~100 bones /
50k verts) plus a rapier3d contact-heavy pile.
"""
from __future__ import annotations

import numpy as np

from fyrox_tpu.animation import (AnimationSetBuilder, MachineBuilder,
                                 SkinTemplate)
from fyrox_tpu.engine import Engine
from fyrox_tpu.physics import BALL, CUBOID, HALFSPACE, BodyType, PhysicsBuilder
from fyrox_tpu.scene import NodeType, SceneBuilder

__all__ = ["build_flagship", "build_character_scene", "build_pile_scene"]


def _linear_keys(times, values):
    return [dict(time=float(t), value=float(v)) for t, v in zip(times, values)]


def build_character_scene(n_bones=100, n_verts=50_000, seed=0,
                          with_machine=True):
    """Animated skinned character: bone chain hierarchy, walk/run clips on
    an ABSM, dense-weight skinning template."""
    rng = np.random.default_rng(seed)
    sb = SceneBuilder()
    root = sb.add_pivot("character")
    bones = []
    prev = root
    for i in range(n_bones):
        # branch every 10 bones to make a tree, like limbs off a spine
        parent = prev if i % 10 else (bones[max(0, i - 10)] if bones else root)
        idx = sb.add_pivot(f"bone{i}", parent=parent, position=(0.15, 0.0, 0.0))
        bones.append(idx)
        prev = idx

    ab = AnimationSetBuilder()
    walk = ab.add_clip("walk", length=1.0, looping=True)
    run = ab.add_clip("run", length=0.6, looping=True)
    for k, bidx in enumerate(bones):
        if k % 2:
            continue  # animate half the bones
        phase = (k / len(bones)) * 2 * np.pi
        amp_w, amp_r = 0.35, 0.6
        times = [0.0, 0.25, 0.5, 0.75, 1.0]
        vals_w = [amp_w * np.sin(phase + 2 * np.pi * t) for t in times]
        ab.add_rotation_track(walk, bidx, [
            _linear_keys(times, [0] * 5),
            _linear_keys(times, [0] * 5),
            _linear_keys(times, vals_w)])
        times_r = [0.0, 0.15, 0.3, 0.45, 0.6]
        vals_r = [amp_r * np.sin(phase + 2 * np.pi * t / 0.6) for t in times_r]
        ab.add_rotation_track(run, bidx, [
            _linear_keys(times_r, [0] * 5),
            _linear_keys(times_r, [0] * 5),
            _linear_keys(times_r, vals_r)])
    aset = ab.build()

    mt = None
    if with_machine:
        mb = MachineBuilder()
        p_run = mb.add_parameter("run")
        s_walk = mb.add_state("walk", clip=walk)
        s_run = mb.add_state("run", clip=run)
        mb.set_entry_state(s_walk)
        mb.add_transition(s_walk, s_run, p_run, duration=0.3)
        mb.add_transition(s_run, s_walk, p_run, duration=0.3, invert=True)
        mt = mb.build()

    # skin: verts distributed along the skeleton, 4-bone weights
    verts = rng.uniform(-0.2, 0.2, (n_verts, 3)).astype(np.float32)
    verts[:, 0] += rng.uniform(0, 0.15 * n_bones, n_verts).astype(np.float32)
    nearest = np.clip((verts[:, 0] / 0.15).astype(np.int32), 0, n_bones - 1)
    idx4 = np.stack([np.clip(nearest + d, 0, n_bones - 1) for d in range(4)], 1)
    w4 = rng.uniform(0.1, 1.0, (n_verts, 4)).astype(np.float32)
    w4 /= w4.sum(-1, keepdims=True)
    return sb, aset, mt, bones, (verts, idx4.astype(np.int32), w4)


def build_pile_scene(sb: SceneBuilder, n_bodies=64, seed=1, spread=4.0):
    """Rigid-body pile dropped above a ground plane (the contact-heavy
    rapier stress config)."""
    rng = np.random.default_rng(seed)
    pb = PhysicsBuilder()
    ground_node = sb.add_pivot("ground")
    gb = pb.add_body(node=ground_node, body_type=BodyType.STATIC)
    pb.add_collider(gb, HALFSPACE, [], friction=0.6)
    body_nodes = []
    grid = max(int(np.ceil(n_bodies ** (1.0 / 3.0))), 1)
    for i in range(n_bodies):
        gx, gy, gz = i % grid, (i // grid) % grid, i // (grid * grid)
        pos = ((gx - grid / 2) * 0.7 + rng.uniform(-0.05, 0.05),
               0.6 + gy * 0.7,
               (gz - grid / 2) * 0.7 + rng.uniform(-0.05, 0.05))
        node = sb.add_node(f"body{i}", node_type=NodeType.RIGID_BODY,
                           position=pos,
                           bbox=(np.full(3, -0.3), np.full(3, 0.3)))
        bi = pb.add_body(node=node, position=pos)
        if i % 2:
            pb.add_collider(bi, BALL, [0.25], friction=0.5, restitution=0.1)
        else:
            pb.add_collider(bi, CUBOID, [0.22, 0.22, 0.22], friction=0.5)
        body_nodes.append(node)
    return pb, body_nodes


def build_flagship(n_bones=100, n_verts=50_000, n_bodies=64,
                   max_active_pairs=None, seed=0, real_asset=None,
                   with_audio=False):
    """Full flagship world: character + pile + camera. Returns
    (Engine, SkinTemplate).

    real_asset: binary FBX bytes or a path — the character then comes
    through the FULL import pipeline (io/fbx.fbx_to_engine: document →
    models → skin clusters → animation curves) instead of synthetic
    arrays, so import→skin→render fidelity is exercised end-to-end
    (fyrox-impl/src/resource/fbx/ intent). Use
    models.assets.make_character_fbx() to generate one."""
    if real_asset is not None:
        return _build_flagship_real(real_asset, n_bodies=n_bodies,
                                    seed=seed)
    sb, aset, mt, bones, (verts, idx4, w4) = build_character_scene(
        n_bones=n_bones, n_verts=n_verts, seed=seed)
    pb, body_nodes = build_pile_scene(sb, n_bodies=n_bodies, seed=seed + 1)
    cam = sb.add_camera("main_camera", position=(0, 3.0, -10.0))
    if with_audio:
        # optional audio block: footsteps hum on the character root, ears
        # on the camera (scene/sound/mod.rs per-frame sync; render with
        # Engine.render_audio alongside the rollout)
        from fyrox_tpu.sound.engine import SAMPLE_RATE
        t = np.arange(SAMPLE_RATE // 5) / SAMPLE_RATE
        hum = (0.3 * np.sin(2 * np.pi * 160 * t)).astype(np.float32)
        sb.add_listener("ears", parent=cam)
        sb.add_sound(hum, name="character_hum", parent=bones[0],
                     radius=1.0, max_distance=40.0)
    template = sb.build()
    if n_bodies >= 192:
        # slab broadphase (static per-collider per-class candidate
        # windows + MXU one-hot gathers) — the TPU production path.
        # Windows sized from the measured per-collider AABB-valid
        # directed-partner demand of the settled 1k pile
        # (FYROX_SLAB_* env overrides for tuning sweeps).
        import os as _os
        # default period=1 (no temporal reuse): the r4 TPU A/B measured
        # reuse at 2302 env·steps/s/chip vs 3040 without — the fattened
        # windows inflate narrowphase/solver more than the amortized
        # rebuild saves at this density, and overflow the compaction caps
        # (scripts/TPU_SESSION_r4.json bench_reuse_on/off, slab_demand_1k)
        period = int(_os.environ.get("FYROX_SLAB_BP_PERIOD", 1))
        # temporal reuse fattens candidate AABBs (rotation-invariant
        # bounds + |v|·period·dt two-sided sweep): measured class-0 demand
        # on the settled pile rises 11 → 14, so the default windows grow
        # with the reuse period (slab2.bp_demand_stats to re-measure)
        default_sw = "16,8,12" if period > 1 else "12,8,10"
        sw = tuple(int(x) for x in _os.environ.get(
            "FYROX_SLAB_WINDOW", default_sw).split(","))
        pt = pb.build(broadphase="slab", slab_window=sw,
                      slab_active=int(_os.environ.get("FYROX_SLAB_ACTIVE",
                                                      16)),
                      slab_walk=int(_os.environ.get(
                          "FYROX_SLAB_WALK", "64" if period > 1 else "48")),
                      # temporal broadphase reuse: rebuild candidates every
                      # N steps from two-sided fattened AABBs (slab2.py)
                      broadphase_period=period)
    else:
        if max_active_pairs is None:
            # dense (uncompacted) pair lists unlock the static-incidence
            # MXU solver path + kind-grouped narrowphase
            max_active_pairs = 0
        pt = pb.build(max_active_pairs=max_active_pairs, broadphase="dense")

    import jax.numpy as jnp
    from fyrox_tpu.scene import graph as graph_mod, init_state as _init
    # inverse bind pose from the initial hierarchy
    st = _init(template, 1)
    st = graph_mod.update_hierarchical_data(st, template)
    bind = np.asarray(st.globals_[0])
    inv_bind = np.linalg.inv(bind[np.asarray(bones)]).astype(np.float32)
    skin = SkinTemplate(bones=np.asarray(bones, np.int32), inv_bind=inv_bind,
                        vertices=verts, bone_indices=idx4, bone_weights=w4)

    engine = Engine(template=template, physics=pt, animations=aset, machine=mt)
    return engine, skin


def _build_flagship_real(asset, n_bodies=64, seed=0):
    """Flagship with an imported skinned character (see build_flagship)."""
    from fyrox_tpu.io.fbx import fbx_to_engine
    sb = SceneBuilder()
    sb2, names, skin, aset = fbx_to_engine(asset, scene_builder=sb)
    if skin is None:
        raise ValueError("real_asset has no skin deformer")
    pb, _ = build_pile_scene(sb, n_bodies=n_bodies, seed=seed + 1)
    sb.add_camera("main_camera", position=(0, 3.0, -10.0))
    template = sb.build()
    if n_bodies >= 192:
        pt = pb.build(broadphase="slab", slab_window=(12, 8, 10))
    else:
        pt = pb.build(max_active_pairs=0, broadphase="dense")
    engine = Engine(template=template, physics=pt, animations=aset)
    return engine, skin
