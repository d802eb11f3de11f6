"""Particle systems, batched.

Equivalent of fyrox-impl/src/scene/particle_system/ (CPU-side particle
integration with seeded deterministic RNG, particle_system/mod.rs:68-82;
emitters base/sphere/cuboid/cylinder). Here every world's particle pool is
a fixed [W, P] slot array; dead slots are masked and re-used by emission.
Randomness is counter-based (threefry via jax.random.fold_in) so worlds and
steps are deterministic and independent — the batched equivalent of the
reference's seeded `ParticleSystemRng`.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["EmitterKind", "ParticleTemplate", "ParticleState",
           "init_particles", "step_particles"]


class EmitterKind:
    SPHERE, CUBOID, CYLINDER = 0, 1, 2


@dataclass
class ParticleTemplate:
    max_particles: int = 256
    emit_rate: float = 60.0          # particles/sec
    emitter_kind: int = EmitterKind.SPHERE
    emitter_size: tuple = (0.5, 0.5, 0.5)  # radius / half-extents / (r, h, -)
    initial_speed: tuple = (0.5, 2.0)      # min/max
    lifetime: tuple = (1.0, 3.0)
    size: tuple = (0.05, 0.15)
    acceleration: tuple = (0.0, -9.81, 0.0)
    seed: int = 0


class ParticleState(NamedTuple):
    position: jnp.ndarray   # [W,P,3] emitter-local
    velocity: jnp.ndarray   # [W,P,3]
    lifetime: jnp.ndarray   # [W,P] remaining seconds (<=0 dead)
    size: jnp.ndarray       # [W,P]
    alive: jnp.ndarray      # [W,P] bool
    spawn_debt: jnp.ndarray # [W] fractional emission accumulator
    step: jnp.ndarray       # [] int32 RNG counter


def init_particles(t: ParticleTemplate, num_worlds: int) -> ParticleState:
    w, p = num_worlds, t.max_particles
    return ParticleState(
        position=jnp.zeros((w, p, 3), jnp.float32),
        velocity=jnp.zeros((w, p, 3), jnp.float32),
        lifetime=jnp.zeros((w, p), jnp.float32),
        size=jnp.zeros((w, p), jnp.float32),
        alive=jnp.zeros((w, p), bool),
        spawn_debt=jnp.zeros((w,), jnp.float32),
        step=jnp.zeros((), jnp.int32),
    )


def _emit_positions(t: ParticleTemplate, key, shape):
    u = jax.random.uniform(key, shape + (3,), minval=-1.0, maxval=1.0)
    if t.emitter_kind == EmitterKind.SPHERE:
        d = u / jnp.maximum(jnp.linalg.norm(u, axis=-1, keepdims=True), 1e-6)
        r = jax.random.uniform(jax.random.fold_in(key, 1), shape) ** (1 / 3)
        return d * (r * t.emitter_size[0])[..., None]
    if t.emitter_kind == EmitterKind.CUBOID:
        return u * jnp.asarray(t.emitter_size)
    # cylinder: radius, height about Y
    ang = jax.random.uniform(jax.random.fold_in(key, 2), shape) * 2 * np.pi
    rad = jnp.sqrt(jax.random.uniform(jax.random.fold_in(key, 3), shape))
    r, h = t.emitter_size[0], t.emitter_size[1]
    return jnp.stack([jnp.cos(ang) * rad * r,
                      u[..., 1] * h,
                      jnp.sin(ang) * rad * r], -1)


def step_particles(state: ParticleState, t: ParticleTemplate, dt) -> ParticleState:
    """One tick: age + integrate + emit into dead slots."""
    w, p = state.lifetime.shape
    lifetime = state.lifetime - dt
    alive = state.alive & (lifetime > 0.0)
    vel = state.velocity + dt * jnp.asarray(t.acceleration)
    pos = state.position + dt * vel

    # --- emission: deterministic counter-based RNG ---
    debt = state.spawn_debt + t.emit_rate * dt
    n_spawn = jnp.floor(debt).astype(jnp.int32)          # [W]
    debt = debt - n_spawn

    key = jax.random.fold_in(jax.random.PRNGKey(t.seed), state.step)
    wkeys = jax.random.split(key, w)

    # rank dead slots: first `n_spawn` dead slots become newborns
    dead_rank = jnp.cumsum((~alive).astype(jnp.int32), axis=1)
    newborn = (~alive) & (dead_rank <= n_spawn[:, None])

    def per_world(k, nb):
        p0 = _emit_positions(t, jax.random.fold_in(k, 10), (p,))
        dirs = jax.random.normal(jax.random.fold_in(k, 11), (p, 3))
        dirs = dirs / jnp.maximum(jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-6)
        spd = jax.random.uniform(jax.random.fold_in(k, 12), (p,),
                                 minval=t.initial_speed[0], maxval=t.initial_speed[1])
        lt = jax.random.uniform(jax.random.fold_in(k, 13), (p,),
                                minval=t.lifetime[0], maxval=t.lifetime[1])
        sz = jax.random.uniform(jax.random.fold_in(k, 14), (p,),
                                minval=t.size[0], maxval=t.size[1])
        return p0, dirs * spd[:, None], lt, sz

    np_, nv, nl, ns = jax.vmap(per_world)(wkeys, newborn)
    pos = jnp.where(newborn[..., None], np_, pos)
    vel = jnp.where(newborn[..., None], nv, vel)
    lifetime = jnp.where(newborn, nl, lifetime)
    size = jnp.where(newborn, ns, state.size)
    alive = alive | newborn

    return ParticleState(position=pos, velocity=vel, lifetime=lifetime,
                         size=size, alive=alive, spawn_debt=debt,
                         step=state.step + 1)
