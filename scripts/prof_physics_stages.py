"""Per-stage TPU timing of the slab-v2 physics step on the flagship pile.

Replicates step_slab2's internal sequence (fyrox_tpu/physics/slab2.py)
with each stage jitted separately over a SETTLED state, so the round-4
perf work aims at the measured hot spot instead of guesses. Stages:

  pose_aabb   collider pose planes + swept fat AABBs
  bp_rank     broadphase key pack + argsort + count_lt 9-range ranks
  bp_walk     stage-1 walk + slotA one-hot attribute gather
  bp_total    full slab_candidates
  narrow      _narrowphase_windows on frozen candidates
  compact     _compact
  solver      fused Pallas TGS kernel via _solve_tgs_planes
  full_step   whole step_physics for cross-checking the sum

Separate jits lose fusion across stage boundaries, so the stage sum
can exceed full_step — ratios are what matter.

Timing runs R iterations of the stage inside ONE jitted fori_loop with
a scalar carry perturbing the float inputs (factor 1e-37 — XLA cannot
hoist the body, values change negligibly) and syncs a single scalar:
host transfer and per-dispatch tunnel latency never enter the clock.

Prints one JSON dict. Env: FYROX_PROF_WORLDS (default 32),
FYROX_PROF_BODIES (default 1000), FYROX_SOLVER_GATHER_PREC passes
through to the solver kernel.
"""
import functools
import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))

import numpy as np
import jax
import jax.numpy as jnp

_REPS = int(os.environ.get("FYROX_PROF_REPS", 20))


def _time(fn, *args, reps=3):
    """min over `reps` timings of a jitted R-iteration loop of fn."""

    def _perturb(x, eps):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x + eps.astype(x.dtype)
        return x

    @jax.jit
    def loop(*a):
        def body(_, acc):
            eps = acc * 1e-37
            ai = jax.tree_util.tree_map(lambda x: _perturb(x, eps), a)
            out = fn(*ai)
            leaves = jax.tree_util.tree_leaves(out)
            s = sum(jnp.sum(jnp.abs(l.astype(jnp.float32)))
                    for l in leaves if hasattr(l, "dtype"))
            return jnp.tanh(s)        # bounded carry
        return jax.lax.fori_loop(0, _REPS, body, jnp.float32(0.0))

    float(loop(*args))                # compile + warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(loop(*args))            # scalar sync — no bulk transfer
        ts.append(time.perf_counter() - t0)
    return min(ts) / _REPS


def main():
    w = int(os.environ.get("FYROX_PROF_WORLDS", 32))
    n_bodies = int(os.environ.get("FYROX_PROF_BODIES", 1000))
    from fyrox_tpu.models import build_flagship
    from fyrox_tpu.physics import broadphase as bp_mod
    from fyrox_tpu.physics import slab2
    from fyrox_tpu.physics import world as wm
    from fyrox_tpu.physics.slab2 import (_aabb_planes, _collider_pose_planes,
                                         _compact, _ctx,
                                         _narrowphase_windows, _solve_tgs_planes,
                                         _stack, _unstack3, _unstack4)
    from fyrox_tpu.physics.planes import q_to_rot9, scale3

    engine, _ = build_flagship(n_bones=8, n_verts=256, n_bodies=n_bodies)
    t = engine.physics
    st = engine.init_state(num_worlds=w)

    @jax.jit
    def settle(s):
        def body(s, _):
            return engine.step(s), None
        return jax.lax.scan(body, s, None, length=120)[0]

    st = settle(st)
    ps = st.physics
    float(jnp.sum(ps.position))

    cx = _ctx(t)
    dt = 1.0 / 60.0
    sc = t.grid
    grav = jnp.asarray(t.gravity, ps.position.dtype)
    accel = jnp.broadcast_to(grav[None, None], ps.position.shape)
    inv_mass = jnp.asarray(t.inv_mass)[None]

    from fyrox_tpu.physics import pallas_solver as _ps
    res = {"worlds": w, "bodies": n_bodies,
           "gather_prec": _ps._GATHER_PREC,
           "gather_mode": _ps._GATHER_MODE}

    # ---- stage closures (everything per-stage-jitted) ----
    margin = t.allowed_linear_error + wm.SPECULATIVE_MARGIN

    @jax.jit
    def pose_aabb(ps):
        pos_b = _unstack3(ps.position)
        q_b = _unstack4(ps.rotation)
        lv_b = _unstack3(ps.linvel)
        cpos, cq, lv_c = _collider_pose_planes(cx, pos_b, q_b, lv_b)
        crot9 = q_to_rot9(cq)
        v_sweep = scale3(lv_c, dt)
        amin, amax = _aabb_planes(cx, t, cpos, crot9, v_sweep, margin)
        return cpos, cq, crot9, v_sweep, _stack(amin), _stack(amax)

    cpos, cq, crot9, v_sweep, amin, amax = pose_aabb(ps)
    res["pose_aabb_ms"] = round(_time(pose_aabb, ps) * 1e3, 3)

    @jax.jit
    def bp_total(amin, amax):
        return bp_mod.slab_candidates(sc, cx.col_body, cx.dyn_col,
                                      amin, amax)

    cands = bp_total(amin, amax)
    res["bp_total_ms"] = round(_time(bp_total, amin, amax) * 1e3, 3)

    # broadphase sub-stages (mirrors slab_candidates internals)
    from fyrox_tpu.physics.broadphase import _ZFINE, _pack_xyz
    from fyrox_tpu.physics.pallas_ops import count_lt, gather_rows
    inc = jnp.asarray(sc.inc_gc)
    cg = int(sc.grid_cols.size)

    @jax.jit
    def bp_rank(amin, amax):
        aabb6 = jnp.concatenate([amin, amax], axis=-1)
        gaabb = jnp.einsum("gc,wcd->wgd", inc, aabb6)
        gmin, gmax = gaabb[..., :3], gaabb[..., 3:]
        qx = jnp.floor(gmin[..., 0] / sc.cell).astype(jnp.int32)
        qy = jnp.floor(gmin[..., 1] / sc.cell).astype(jnp.int32)
        zfine = sc.cell / _ZFINE
        qz = jnp.floor(gmin[..., 2] / zfine).astype(jnp.int32)
        key = _pack_xyz(qx, qy, qz)
        order = jnp.argsort(key, axis=1)
        qz_lo = jnp.floor((gmin[..., 2] - sc.cell) / zfine).astype(jnp.int32)
        qz_hi = jnp.floor(gmax[..., 2] / zfine).astype(jnp.int32)
        q_lo, q_hi = [], []
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                q_lo.append(_pack_xyz(qx + dx, qy + dy, qz_lo))
                q_hi.append(_pack_xyz(qx + dx, qy + dy, qz_hi))
        lo9 = count_lt(key, jnp.concatenate(q_lo, 1)).reshape(w, 9, cg)
        hi9 = count_lt(key, jnp.concatenate(q_hi, 1), strict=False
                       ).reshape(w, 9, cg)
        return key, order, lo9, hi9, gaabb

    key, order, lo9, hi9, gaabb = bp_rank(amin, amax)
    res["bp_rank_ms"] = round(_time(bp_rank, amin, amax) * 1e3, 3)

    @jax.jit
    def bp_walk(order, lo9, hi9, gaabb, amin, amax):
        lo9m = jnp.moveaxis(lo9, 1, 2)
        hi9m = jnp.moveaxis(hi9, 1, 2)
        cnt9 = hi9m - lo9m
        pfx9 = jnp.cumsum(cnt9, axis=-1)
        pfx_ex = pfx9 - cnt9
        total = pfx9[..., -1]
        s_walk = sc.s_walk
        m = jnp.arange(s_walk, dtype=jnp.int32)
        in_r = ((m[None, None, :, None] >= pfx_ex[:, :, None, :])
                & (m[None, None, :, None] < pfx9[:, :, None, :]))
        pos = jnp.sum(jnp.where(
            in_r, lo9m[:, :, None, :] + (m[None, None, :, None]
                                         - pfx_ex[:, :, None, :]), 0),
            axis=-1)
        pos = jnp.clip(pos, 0, max(cg - 1, 0))
        col_body = np.asarray(cx.col_body)
        dyn_col = np.asarray(cx.dyn_col)
        attr_static = jnp.broadcast_to(jnp.asarray(
            np.stack([sc.grid_cols.astype(np.float32),
                      sc.kinds[sc.grid_cols].astype(np.float32),
                      col_body[sc.grid_cols].astype(np.float32),
                      dyn_col[sc.grid_cols].astype(np.float32)],
                     axis=1))[None], (w, cg, 4))
        attrs = jnp.concatenate([attr_static, gaabb], axis=-1)
        sortedA = gather_rows(attrs, order)
        slotA = gather_rows(sortedA, pos.reshape(w, -1)
                            ).reshape(w, cg, s_walk, attrs.shape[-1])
        return slotA, total

    slotA, _tot = bp_walk(order, lo9, hi9, gaabb, amin, amax)
    res["bp_walk_ms"] = round(
        _time(bp_walk, order, lo9, hi9, gaabb, amin, amax) * 1e3, 3)

    dtype = ps.position.dtype

    @jax.jit
    def narrow(cands, cpos, cq, crot9, v_sweep):
        return _narrowphase_windows(cx, t, cands, cpos, cq, crot9,
                                    v_sweep, margin, dtype)

    attrs_f, attrs_i = narrow(cands, cpos, cq, crot9, v_sweep)
    res["narrow_ms"] = round(
        _time(narrow, cands, cpos, cq, crot9, v_sweep) * 1e3, 3)

    @jax.jit
    def compact(attrs_f, attrs_i):
        return _compact(cx, attrs_f, attrs_i, dtype)

    con = compact(attrs_f, attrs_i)
    res["compact_ms"] = round(_time(compact, attrs_f, attrs_i) * 1e3, 3)

    @jax.jit
    def solver(con, ps):
        pos_b = _unstack3(ps.position)
        q_b = _unstack4(ps.rotation)
        lv_b = _unstack3(ps.linvel)
        av_b = _unstack3(ps.angvel)
        acc_b = _unstack3(accel)
        return _solve_tgs_planes(
            cx, t, con, pos_b, q_b, lv_b, av_b, acc_b, inv_mass, dt,
            warm=((ps.warm_n, ps.warm_t1, ps.warm_t2, ps.warm_pair)
                  if ps.warm_n is not None else None))

    _ = solver(con, ps)
    res["solver_ms"] = round(_time(solver, con, ps) * 1e3, 3)

    @jax.jit
    def full(ps):
        return wm.step_physics(ps, t, dt)

    _ = full(ps)
    res["full_step_ms"] = round(_time(full, ps) * 1e3, 3)
    res["per_world_us"] = round(res["full_step_ms"] / w * 1e3, 1)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
