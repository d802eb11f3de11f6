"""Script system + game loop executor.

Equivalent of the reference's `ScriptTrait` (fyrox-impl/src/script/
mod.rs:601: on_init/on_start/on_update/on_message), `ScriptProcessor`
(engine/mod.rs:612), and the `Executor` fixed-timestep loop
(engine/executor.rs:62, DEFAULT_UPDATE_RATE=60 :87, lag accumulator
:475-512).

Scripts here are *batched*: one script instance drives its logic for every
world at once — `on_update(ctx)` receives the full EngineState and returns
a (possibly modified) EngineState plus optional per-world messages. This is
the data-parallel recast of per-node scripts: game logic reads/writes the
SoA arrays directly and stays inside jit when pure.
"""
from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, List, Optional

__all__ = ["Script", "ScriptContext", "ScriptProcessor", "Executor",
           "DEFAULT_UPDATE_RATE"]

DEFAULT_UPDATE_RATE = 60.0  # executor.rs:87


@dataclass
class ScriptContext:
    """What a script sees each tick (script/mod.rs ScriptContext)."""
    dt: float
    engine: Any
    state: Any
    messages: List[Any] = field(default_factory=list)


class Script:
    """Subclass and override the lifecycle hooks (ScriptTrait)."""

    def on_init(self, ctx: ScriptContext):
        """Called once before the first update (script/mod.rs:611)."""

    def on_start(self, ctx: ScriptContext):
        """Called after every script's on_init ran."""

    def on_update(self, ctx: ScriptContext):
        """Called every tick; mutate ctx.state (reassign) to affect the
        world. Return value ignored — set ctx.state."""

    def on_message(self, ctx: ScriptContext, message):
        """Reacts to messages routed by the processor (script/mod.rs:686)."""


class ScriptProcessor:
    """Drains script lifecycles per tick (engine/mod.rs:612)."""

    def __init__(self):
        self._scripts: List[Script] = []
        self._initialized = False
        self._queue: List[Any] = []

    def add(self, script: Script) -> Script:
        self._scripts.append(script)
        return script

    def send_message(self, message):
        self._queue.append(message)

    def update(self, engine, state, dt):
        ctx = ScriptContext(dt=dt, engine=engine, state=state)
        if not self._initialized:
            for s in self._scripts:
                s.on_init(ctx)
            for s in self._scripts:
                s.on_start(ctx)
            self._initialized = True
        msgs, self._queue = self._queue, []
        for m in msgs:
            for s in self._scripts:
                s.on_message(ctx, m)
        for s in self._scripts:
            s.on_update(ctx)
        return ctx.state


class Executor:
    """Fixed-timestep game loop (executor.rs:62): accumulate real time,
    step the engine at exactly `update_rate` Hz with a spike throttle, and
    hand each rendered-frame opportunity to `on_frame`."""

    def __init__(self, engine, state, update_rate: float = DEFAULT_UPDATE_RATE,
                 max_lag_steps: int = 10):
        self.engine = engine
        self.state = state
        self.dt = 1.0 / update_rate
        self.max_lag_steps = max_lag_steps  # spike throttle (executor.rs:487)
        self.scripts = ScriptProcessor()
        self._step = None

    def run(self, duration_s: float,
            on_frame: Optional[Callable[[Any], None]] = None,
            realtime: bool = False):
        """Run the loop for `duration_s` of simulated time. With
        realtime=False (headless benchmarking / training) ticks run
        back-to-back like the reference's headless tests."""
        import jax
        if self._step is None:
            self._step = jax.jit(self.engine.step)
        total_steps = round(duration_s / self.dt)
        done = 0
        lag = 0.0
        last = time.perf_counter()
        while done < total_steps:
            if realtime:
                now = time.perf_counter()
                lag += now - last
                last = now
                lag = min(lag, self.max_lag_steps * self.dt)
            else:
                lag = self.dt
            while lag >= self.dt - 1e-12 and done < total_steps:
                self.state = self.scripts.update(self.engine, self.state, self.dt)
                self.state = self._step(self.state)
                lag -= self.dt
                done += 1
            if on_frame is not None:
                on_frame(self.state)
        return self.state
