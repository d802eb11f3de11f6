"""Engine facade: the batched equivalent of `Engine::update`.

The reference's frame tick (fyrox-impl/src/engine/mod.rs:1616 `update` →
pre_update → per-scene Graph::update, scene/graph/mod.rs:1459) becomes one
pure jit-compiled function over the world batch:

    step(EngineState) -> EngineState:
        1. animation players / ABSMs write node local transforms
           (AnimationPlayer::update, scene/animation/mod.rs:340)
        2. hierarchical data: global transforms + visibility
           (update_hierarchical_data, graph/mod.rs:1275)
        3. physics step (PhysicsWorld::update, physics/mod.rs:1151)
        4. rapier→node sync-back: body poses written into node local
           transforms, decomposed against the parent global
           (sync_rigid_body_node, physics/mod.rs:1439-1475)
        5. hierarchy refresh so render consumers see post-physics globals

The fixed 60 Hz timestep of the reference executor
(engine/executor.rs:87 DEFAULT_UPDATE_RATE) is the default dt.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp

from fyrox_tpu.core import quat, transform as tfm
from fyrox_tpu.animation import machine as machine_mod
from fyrox_tpu.animation import player as player_mod
from fyrox_tpu.animation import track as track_mod
from fyrox_tpu.physics import world as phys_mod
from fyrox_tpu.scene import graph as graph_mod
from fyrox_tpu.scene.state import WorldState, init_state
from fyrox_tpu.scene.template import SceneTemplate

__all__ = ["Engine", "EngineState", "DEFAULT_DT", "debug_step"]

DEFAULT_DT = 1.0 / 60.0  # executor.rs:87


class AnimState(NamedTuple):
    anim: Optional[track_mod.AnimationState] = None
    machine: Optional[machine_mod.MachineState] = None
    rootmotion: Optional[NamedTuple] = None     # rootmotion.RootMotionState


class EngineState(NamedTuple):
    scene: WorldState
    physics: Optional[phys_mod.PhysicsState] = None
    animation: Optional[AnimState] = None
    particles: Optional[NamedTuple] = None
    # batched mixer state (sound/scene.py) when the scene has Sound nodes;
    # playheads advance per rendered block (Engine.render_audio), not per
    # engine tick — mirroring the reference's audio-thread cadence
    audio: Optional[NamedTuple] = None


@dataclass
class Engine:
    """Holds the static templates; all dynamics live in EngineState."""
    template: SceneTemplate
    physics: Optional[phys_mod.PhysicsTemplate] = None
    animations: Optional[track_mod.AnimationSet] = None
    machine: Optional[machine_mod.MachineTemplate] = None
    particles: Optional[object] = None   # ParticleTemplate
    dt: float = DEFAULT_DT
    # root motion (Animation::update_root_motion, lib.rs:498): when set,
    # the player pins the root bone and the engine velocity-drives the
    # character body with the extracted delta (the standard
    # root-motion-to-capsule pattern)
    root_motion: Optional[object] = None         # rootmotion.RootMotionData
    root_motion_body: int = -1                   # physics body index

    def init_state(self, num_worlds: int,
                   body_pose=None) -> EngineState:
        scene = init_state(self.template, num_worlds)
        scene = graph_mod.update_hierarchical_data(scene, self.template)
        phys = None
        if self.physics is not None:
            if body_pose is None:
                # bodies start at their nodes' initial global poses;
                # STANDALONE bodies (node == -1) keep their builder pose
                # (a -1 here must not python-wrap to the last node!)
                bn = self.physics.body_node
                g = np.asarray(scene.globals_[0])
                pos, rot, _ = tfm.decompose_mat4(
                    jnp.asarray(g[np.maximum(bn, 0)]))
                pos, rot = np.asarray(pos), np.asarray(rot)
                has_node = (bn >= 0)[:, None]
                if self.physics.init_body_pos is not None:
                    pos = np.where(has_node, pos, self.physics.init_body_pos)
                    rot = np.where(has_node, rot, self.physics.init_body_rot)
                body_pose = (pos, rot)
            phys = phys_mod.init_physics_state(body_pose, self.physics, num_worlds)
        anim = None
        if self.animations is not None:
            a = track_mod.init_animation_state(self.animations, num_worlds)
            m = (machine_mod.init_machine_state(self.machine, num_worlds)
                 if self.machine is not None else None)
            rm = None
            if self.root_motion is not None:
                from fyrox_tpu.animation import rootmotion as rm_mod
                rm = rm_mod.init_root_motion_state(self.root_motion,
                                                   num_worlds)
            anim = AnimState(anim=a, machine=m, rootmotion=rm)
        parts = None
        if self.particles is not None:
            from fyrox_tpu.scene.particles import init_particles
            parts = init_particles(self.particles, num_worlds)
        audio = None
        at = self.audio_template()
        if at is not None:
            from fyrox_tpu.sound.scene import init_audio_state
            audio = init_audio_state(at, num_worlds)
        return EngineState(scene=scene, physics=phys, animation=anim,
                           particles=parts, audio=audio)

    def audio_template(self):
        """Packed Sound/Listener layout (sound/scene.AudioTemplate), cached;
        None when the scene has no Sound nodes."""
        if not hasattr(self, "_audio_template"):
            from fyrox_tpu.sound.scene import build_audio_template
            self._audio_template = build_audio_template(self.template)
        return self._audio_template

    def render_audio(self, state: EngineState, block_len: int = 513,
                     distance_model=None):
        """Mix one stereo audio block per world from the CURRENT scene
        state — the batched equivalent of the reference's sound-context
        render (fyrox-impl/src/scene/sound/mod.rs sync + fyrox-sound
        SoundContext::render). Returns (block [W, block_len, 2], state
        with advanced playheads). Jittable."""
        at = self.audio_template()
        if at is None or state.audio is None:
            raise ValueError("scene has no Sound nodes (SceneBuilder"
                             ".add_sound) — nothing to render")
        from fyrox_tpu.sound.engine import DistanceModel
        from fyrox_tpu.sound.scene import render_scene_audio
        dm = DistanceModel.INVERSE if distance_model is None else distance_model
        block, new_audio = render_scene_audio(
            at, state.audio, state.scene.globals_, block_len=block_len,
            distance_model=dm)
        return block, state._replace(audio=new_audio)

    def step(self, state: EngineState, machine_params=None,
             dt: Optional[float] = None) -> EngineState:
        """One engine tick. machine_params: [W,P] bool ABSM rules."""
        dt = self.dt if dt is None else dt
        scene = state.scene
        anim = state.animation

        # ---- 1. animation ----
        rm_delta = None
        if anim is not None and self.animations is not None:
            if self.root_motion is not None and anim.rootmotion is not None:
                (a, rm, p, r, s,
                 rm_delta) = player_mod.step_player_root_motion(
                    self.animations, self.root_motion, anim.anim,
                    anim.rootmotion, scene.position, scene.rotation,
                    scene.scale, dt)
                anim = AnimState(anim=a, machine=anim.machine, rootmotion=rm)
                scene = scene._replace(position=p, rotation=r, scale=s)
            elif self.machine is not None and anim.machine is not None:
                if machine_params is None:
                    machine_params = jnp.zeros(
                        (scene.num_worlds, max(len(self.machine.param_names), 1)), bool)
                a, m, p, r, s = player_mod.step_absm(
                    self.animations, self.machine, anim.anim, anim.machine,
                    machine_params, scene.position, scene.rotation, scene.scale, dt)
                anim = AnimState(anim=a, machine=m)
            else:
                a, p, r, s = player_mod.step_player(
                    self.animations, anim.anim, scene.position, scene.rotation,
                    scene.scale, dt)
                anim = AnimState(anim=a, machine=anim.machine,
                                 rootmotion=anim.rootmotion)
            if self.root_motion is None:
                scene = scene._replace(position=p, rotation=r, scale=s)

        # ---- 2. hierarchy (pre-physics) ----
        # When every physics body node is a scene root, the body→node sync
        # needs no parent globals and the post-physics refresh recomputes
        # everything — so the pre-physics propagation is redundant work.
        skip_pre = (state.physics is not None and self.physics is not None
                    and self._bodies_at_root())
        scene = graph_mod.step(scene, self.template, dt,
                               update_hierarchy=not skip_pre)

        # ---- 3+4. physics + sync-back ----
        phys = state.physics
        if phys is not None and self.physics is not None:
            if rm_delta is not None and self.root_motion_body >= 0:
                # velocity-drive the character body horizontally from the
                # extracted root delta (rotated into the body's frame);
                # gravity/collisions keep owning the vertical axis
                from fyrox_tpu.core import quat as _q
                bi = self.root_motion_body
                wd = _q.rotate(phys.rotation[:, bi], rm_delta) / dt
                lv = phys.linvel
                lv = lv.at[:, bi, 0].set(wd[:, 0]).at[:, bi, 2].set(wd[:, 2])
                phys = phys._replace(linvel=lv)
            phys = phys_mod.step_physics(phys, self.physics, dt)
            scene = self._sync_bodies_to_nodes(scene, phys)
            # ---- 5. refresh globals after body sync ----
            scene = graph_mod.update_hierarchical_data(scene, self.template)

        # ---- particle systems (ParticleSystem::update equivalent) ----
        parts = state.particles
        if parts is not None and self.particles is not None:
            from fyrox_tpu.scene.particles import step_particles
            parts = step_particles(parts, self.particles, dt)

        return EngineState(scene=scene, physics=phys, animation=anim,
                           particles=parts, audio=state.audio)

    def _bodies_at_root(self) -> bool:
        if getattr(self, "_bodies_at_root_cache", None) is None:
            bn = self.physics.body_node
            nodes = bn[bn >= 0]
            self._bodies_at_root_cache = bool(
                (self.template.parent[nodes] < 0).all()) if len(nodes) else True
        return self._bodies_at_root_cache

    def _sync_bodies_to_nodes(self, scene: WorldState,
                              phys: phys_mod.PhysicsState) -> WorldState:
        """Write body world poses into their nodes' local transforms,
        decomposing against the parent's global transform
        (physics/mod.rs:1447-1475)."""
        bn = self.physics.body_node
        mask = bn >= 0
        if not mask.any():
            return scene
        nodes = bn[mask]
        bidx = np.nonzero(mask)[0]
        parents = self.template.parent[nodes]

        bpos = phys.position[:, bidx]
        brot = phys.rotation[:, bidx]

        has_parent = parents >= 0
        if has_parent.any():
            # local = parent_global⁻¹ ∘ body_global
            pg = scene.globals_[:, np.maximum(parents, 0)]
            inv_pg = tfm.invert_affine(pg)
            body_m = tfm.compose_trs(bpos, brot, jnp.ones_like(bpos))
            local_m = tfm.mat4_mul(inv_pg, body_m)
            lp, lr, _ = tfm.decompose_mat4(local_m)
            hp = jnp.asarray(has_parent)
            new_pos = jnp.where(hp[None, :, None], lp, bpos)
            new_rot = jnp.where(hp[None, :, None], lr, brot)
        else:
            new_pos, new_rot = bpos, brot

        # one-hot matmul write-back instead of .at[].set — XLA scatters
        # lower poorly on TPU (same rationale as physics/pallas_ops.py)
        if getattr(self, "_sync_onehot", None) is None:
            m = np.zeros((self.template.num_nodes, len(nodes)), np.float32)
            m[nodes, np.arange(len(nodes))] = 1.0
            # cache host constants only — jnp arrays created under a trace
            # must not leak across jit boundaries
            self._sync_onehot = (m, (m.sum(1) == 0.0).astype(np.float32))
        m, keep = (jnp.asarray(a) for a in self._sync_onehot)
        position = (scene.position * keep[None, :, None]
                    + jnp.einsum("nb,wbc->wnc", m, new_pos,
                                 precision="highest"))
        rotation = (scene.rotation * keep[None, :, None]
                    + jnp.einsum("nb,wbc->wnc", m, new_rot,
                                 precision="highest"))
        return scene._replace(position=position, rotation=rotation)

    # ------------------------------------------------------------------
    def rollout(self, state: EngineState, num_steps: int,
                machine_params=None) -> EngineState:
        """num_steps engine ticks under one lax.scan (single dispatch)."""
        def body(s, _):
            return self.step(s, machine_params=machine_params), None
        out, _ = jax.lax.scan(body, state, None, length=num_steps)
        return out


def world_health(state: EngineState):
    """Per-world validity mask [W]: True where every array in the state is
    finite. The batched analog of the reference's failure detection
    (physics panics are caught and logged, physics/mod.rs:1188;
    Graph::restore_integrity repairs bad state after load)."""
    leaves = [l for l in jax.tree_util.tree_leaves(state)
              if hasattr(l, "dtype") and jnp.issubdtype(l.dtype, jnp.floating)]
    w = leaves[0].shape[0]
    ok = jnp.ones((w,), bool)
    for l in leaves:
        if l.ndim == 0 or l.shape[0] != w:
            continue
        flat = l.reshape(w, -1)
        # NaN only: +inf is a legitimate sentinel (node lifetimes, empty
        # depth buffers); numerical divergence reaches NaN through the
        # first inf-inf or 0*inf it touches
        ok = ok & ~jnp.any(jnp.isnan(flat), axis=1)
    return ok


def restore_unhealthy(state: EngineState, fallback: EngineState):
    """Reset every non-finite world to `fallback` (keep healthy worlds
    untouched) — restore_integrity for the batched regime: one diverged
    world must not poison a 4096-world rollout."""
    ok = world_health(state)

    def fix(cur, fb):
        if not hasattr(cur, "dtype") or cur.ndim == 0 \
                or cur.shape[0] != ok.shape[0]:
            return cur
        m = ok.reshape((-1,) + (1,) * (cur.ndim - 1))
        return jnp.where(m, cur, fb)

    return jax.tree_util.tree_map(fix, state, fallback)

def debug_step(engine: Engine, **step_kwargs):
    """Checkify-instrumented step — the sanitizer build of the engine.

    The reference runs physics under catch_unwind and relies on
    debug-assert builds for NaN/index bugs (physics/mod.rs:1188); the
    XLA analog: jax.experimental.checkify instruments the WHOLE traced
    step with float (nan/inf-producing op) and index (out-of-bounds
    gather/scatter) checks that are recoverable at the host.

    Returns step_fn(state) -> (error, new_state); call error.throw() (or
    inspect error.get()) after the step. Jit-compatible:
    `jax.jit(debug_step(engine))`. Roughly 2x the cost of the plain step
    — a debug tool, not the production path.
    """
    from jax.experimental import checkify

    def step(state, **kw):
        return engine.step(state, **step_kwargs, **kw)
    return checkify.checkify(
        step, errors=checkify.float_checks | checkify.index_checks)
