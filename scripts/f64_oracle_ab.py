"""f64 device-path A/B vs the scalar oracle (round-4 VERDICT #4).

The oracle matrix pins the batched f32 path at ~2e-4/step — 20x looser
than BASELINE.md's 1e-5 rapier bar. This script separates ALGORITHMIC
divergence from f32 rounding: it runs the PRODUCTION batched step
(dense and slab-v2 broadphases) in float64 on CPU against the
independent scalar f64 oracle (physics/oracle.py) from identical cold
states sampled along a settling trajectory. If the two f64
implementations agree to ~1e-9/step, the entire 2e-4 gap is proven to
be f32 rounding, not semantic drift.

Prints one JSON line per (scene, broadphase) and a final summary line;
exits nonzero if any single-step deviation exceeds --tol.

Reference semantics: rapier TGS-soft parameter mapping,
/root/reference/fyrox-impl/src/scene/graph/physics/mod.rs:892-908.
"""
import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tol", type=float, default=1e-9)
    ap.add_argument("--vtol", type=float, default=None,
                    help="velocity tolerance (default 100x --tol)")
    ap.add_argument("--steps", type=int, default=60)
    args = ap.parse_args()
    vtol = args.vtol if args.vtol is not None else args.tol * 100.0

    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    from fyrox_tpu.physics import (BALL, CAPSULE, CUBOID, HALFSPACE,
                                   BodyType, PhysicsBuilder)
    from fyrox_tpu.physics import oracle as orc
    from fyrox_tpu.physics import world as wm

    def stack():
        pb = PhysicsBuilder()
        g = pb.add_body(body_type=BodyType.STATIC)
        pb.add_collider(g, HALFSPACE, [], friction=0.8)
        for k in range(3):
            b = pb.add_body(position=(0.02 * k, 0.55 + 1.08 * k, -0.01 * k))
            pb.add_collider(b, CUBOID, [0.5, 0.5, 0.5], friction=0.8)
        return pb

    def mixed():
        rng = np.random.default_rng(3)
        pb = PhysicsBuilder()
        g = pb.add_body(body_type=BodyType.STATIC)
        pb.add_collider(g, HALFSPACE, [], friction=0.5, restitution=0.2)
        shapes = [(BALL, [0.25]), (CUBOID, [0.2, 0.25, 0.2]),
                  (CAPSULE, [0.2, 0.15])]
        for i in range(9):
            kind, params = shapes[i % 3]
            p = (rng.uniform(-0.8, 0.8), 0.5 + 0.5 * (i // 3),
                 rng.uniform(-0.8, 0.8))
            b = pb.add_body(position=p)
            pb.add_collider(b, kind, params, friction=0.4, restitution=0.1)
        return pb

    def to_f64(s):
        return jax.tree_util.tree_map(
            lambda x: x.astype(jnp.float64)
            if jnp.issubdtype(x.dtype, jnp.floating) else x, s)

    ok = True
    results = []
    for scene_name, build in (("stack", stack), ("mixed", mixed)):
        for bpname in ("dense", "slab"):
            pb = build()
            t = pb.build(broadphase=bpname)
            s = to_f64(wm.init_physics_state(pb, t, 1))
            assert s.position.dtype == jnp.float64
            step = jax.jit(lambda st: wm.step_physics(st, t, 1 / 60))
            worst_p = worst_v = worst_w = 0.0
            samples = {0, args.steps // 3, 2 * args.steps // 3,
                       args.steps - 1}
            for i in range(args.steps):
                if i in samples:
                    cold = s._replace(
                        warm_n=jnp.zeros_like(s.warm_n),
                        warm_t1=jnp.zeros_like(s.warm_t1),
                        warm_t2=jnp.zeros_like(s.warm_t2))
                    dev = wm.step_physics(cold, t, 1 / 60)
                    assert dev.position.dtype == jnp.float64
                    ref = orc.oracle_step(orc.state_from_device(cold),
                                          t, 1 / 60)
                    worst_p = max(worst_p, float(np.abs(
                        np.asarray(dev.position[0]) - ref.position).max()))
                    worst_v = max(worst_v, float(np.abs(
                        np.asarray(dev.linvel[0]) - ref.linvel).max()))
                    worst_w = max(worst_w, float(np.abs(
                        np.asarray(dev.angvel[0]) - ref.angvel).max()))
                s = step(s)
            passed = worst_p < args.tol and worst_v < vtol
            ok = ok and passed
            row = {"scene": scene_name, "broadphase": bpname,
                   "worst_dp": worst_p, "worst_dv": worst_v,
                   "worst_dw": worst_w, "pass": passed}
            results.append(row)
            print(json.dumps(row), flush=True)

    print(json.dumps({"summary": "f64 device path vs f64 oracle, "
                                 "one cold step from sampled states",
                      "tol_p": args.tol, "tol_v": vtol,
                      "all_pass": ok}), flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
