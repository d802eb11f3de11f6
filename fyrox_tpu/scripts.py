"""Stock scripts — the fyrox-scripts crate equivalent, batched.

The reference ships one stock script crate with a camera controller
(fyrox-scripts/src/camera.rs:47 `FlyingCameraController`: mouse-look
yaw/pitch with pitch limits + keyboard translation, writing the camera
node's local transform every tick). Here the same controllers are
world-BATCHED `Script`s: per-world yaw/pitch state arrays [W], per-world
input arrays, one vectorized jnp update writing the camera node's local
position/rotation planes in `ctx.state.scene`.

`OrbitCameraController` is the editor-style orbit variant (the editor's
scene-view camera): yaw/pitch/radius around a target point.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from fyrox_tpu.core import quat
from fyrox_tpu.script import Script, ScriptContext

__all__ = ["FlyingCameraController", "OrbitCameraController"]


def _yaw_pitch_quat(yaw, pitch):
    """World-yaw (local Y) then local-pitch (rotated X) — the exact
    composition of camera.rs:288-294."""
    half_y = yaw * 0.5
    qy = jnp.stack([jnp.zeros_like(yaw), jnp.sin(half_y),
                    jnp.zeros_like(yaw), jnp.cos(half_y)], -1)
    half_p = pitch * 0.5
    qp = jnp.stack([jnp.sin(half_p), jnp.zeros_like(pitch),
                    jnp.zeros_like(pitch), jnp.cos(half_p)], -1)
    return quat.mul(qy, qp)


class FlyingCameraController(Script):
    """Batched camera.rs:47 FlyingCameraController.

    node: camera node index; speed: translation m/s; sensitivity:
    radians per mouse unit; pitch_limit: (lo, hi) radians
    (camera.rs:146 default ±89.9°).

    Feed inputs each tick with `set_input(mouse_delta [W,2],
    move_axes [W,2])` (move_axes = (strafe, forward) in [-1,1], the
    WASD axes); on_update integrates yaw/pitch and writes the node's
    local rotation + position into ctx.state."""

    def __init__(self, node, num_worlds, speed=5.0, sensitivity=3e-3,
                 pitch_limit=(-np.deg2rad(89.9), np.deg2rad(89.9))):
        self.node = int(node)
        self.speed = float(speed)
        self.sensitivity = float(sensitivity)
        self.pitch_limit = (float(pitch_limit[0]), float(pitch_limit[1]))
        self.yaw = jnp.zeros(num_worlds)
        self.pitch = jnp.zeros(num_worlds)
        self._mouse = jnp.zeros((num_worlds, 2))
        self._move = jnp.zeros((num_worlds, 2))

    def set_input(self, mouse_delta=None, move_axes=None):
        if mouse_delta is not None:
            self._mouse = jnp.asarray(mouse_delta, jnp.float32)
        if move_axes is not None:
            self._move = jnp.asarray(move_axes, jnp.float32)

    def on_update(self, ctx: ScriptContext):
        sc = ctx.state.scene
        # camera.rs:228-231: yaw -= dx*s; pitch clamped
        self.yaw = self.yaw - self._mouse[:, 0] * self.sensitivity
        self.pitch = jnp.clip(self.pitch + self._mouse[:, 1]
                              * self.sensitivity,
                              self.pitch_limit[0], self.pitch_limit[1])
        q = _yaw_pitch_quat(self.yaw, self.pitch)           # [W,4]
        # translation in the camera's yaw frame (camera.rs on_update:
        # forward/side from the look vector, vertical component ignored)
        fwd = jnp.stack([jnp.sin(self.yaw), jnp.zeros_like(self.yaw),
                         jnp.cos(self.yaw)], -1)
        right = jnp.stack([jnp.cos(self.yaw), jnp.zeros_like(self.yaw),
                           -jnp.sin(self.yaw)], -1)
        vel = (right * self._move[:, :1] + fwd * self._move[:, 1:2]) \
            * (self.speed * ctx.dt)
        pos = sc.position.at[:, self.node].add(vel)
        rot = sc.rotation.at[:, self.node].set(q)
        ctx.state = ctx.state._replace(scene=sc._replace(position=pos,
                                                         rotation=rot))


class OrbitCameraController(Script):
    """Batched orbit camera (editor scene-view style): yaw/pitch/radius
    around a per-world target; mouse orbits, wheel zooms. Writes the
    camera node's local transform (position on the orbit sphere,
    rotation looking at the target)."""

    def __init__(self, node, num_worlds, target=(0.0, 0.0, 0.0),
                 radius=5.0, sensitivity=3e-3,
                 pitch_limit=(-np.deg2rad(89.0), np.deg2rad(89.0))):
        self.node = int(node)
        self.sensitivity = float(sensitivity)
        self.pitch_limit = (float(pitch_limit[0]), float(pitch_limit[1]))
        self.yaw = jnp.zeros(num_worlds)
        self.pitch = jnp.zeros(num_worlds)
        self.radius = jnp.full(num_worlds, float(radius))
        self.target = jnp.broadcast_to(
            jnp.asarray(target, jnp.float32), (num_worlds, 3))
        self._mouse = jnp.zeros((num_worlds, 2))
        self._zoom = jnp.zeros(num_worlds)

    def set_input(self, mouse_delta=None, zoom=None, target=None):
        if mouse_delta is not None:
            self._mouse = jnp.asarray(mouse_delta, jnp.float32)
        if zoom is not None:
            self._zoom = jnp.asarray(zoom, jnp.float32)
        if target is not None:
            self.target = jnp.asarray(target, jnp.float32)

    def on_update(self, ctx: ScriptContext):
        sc = ctx.state.scene
        self.yaw = self.yaw - self._mouse[:, 0] * self.sensitivity
        self.pitch = jnp.clip(self.pitch + self._mouse[:, 1]
                              * self.sensitivity,
                              self.pitch_limit[0], self.pitch_limit[1])
        self.radius = jnp.maximum(self.radius * (1.0 - self._zoom * 0.1),
                                  0.05)
        q = _yaw_pitch_quat(self.yaw, self.pitch)
        # camera at target - look_dir * radius; engine cameras look
        # along their +Z basis (scene/camera.py view_matrix,
        # camera.rs:454-460), so look = rotate(q, +Z)
        look = quat.rotate(q, jnp.broadcast_to(
            jnp.asarray([0.0, 0.0, 1.0]), (q.shape[0], 3)))
        pos_v = self.target - look * self.radius[:, None]
        pos = sc.position.at[:, self.node].set(pos_v)
        rot = sc.rotation.at[:, self.node].set(q)
        ctx.state = ctx.state._replace(scene=sc._replace(position=pos,
                                                         rotation=rot))
