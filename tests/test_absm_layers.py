"""Layered ABSM: bone masks + typed parameters (machine/layer.rs:590,
mask.rs:220, parameter.rs). The canonical scenario: lower body walks while
an upper-body layer waves, gated by a bone mask and a float layer weight.
"""
import numpy as np
import jax.numpy as jnp

from fyrox_tpu.animation import (AnimationSetBuilder, MachineBuilder,
                                 init_animation_state, machine, player,
                                 pose, track)

N_NODES = 6
UPPER = np.array([False, False, False, True, True, True])


def lin(t0, v0, t1, v1):
    return [dict(time=t0, value=v0), dict(time=t1, value=v1)]


def build_set():
    """walk: +x on every node; wave: +y on every node (the mask must keep
    it off the lower body); idle: zero pose."""
    b = AnimationSetBuilder()
    walk = b.add_clip("walk", length=1.0, looping=True)
    wave = b.add_clip("wave", length=1.0, looping=True)
    for n in range(N_NODES):
        b.add_position_track(walk, node=n,
                             keys_xyz=[lin(0, 1, 1, 1), lin(0, 0, 1, 0),
                                       lin(0, 0, 1, 0)])
        b.add_position_track(wave, node=n,
                             keys_xyz=[lin(0, 0, 1, 0), lin(0, 1, 1, 1),
                                       lin(0, 0, 1, 0)])
    return b.build(), walk, wave


def build_layered(walk, wave, weight_param=-1):
    mb0 = MachineBuilder()
    mb0.add_state("walk", clip=walk)
    lower = mb0.build()
    mb1 = MachineBuilder()
    mb1.add_state("wave", clip=wave)
    upper = mb1.build()
    return machine.LayeredMachine(layers=[
        machine.LayerSpec(machine=lower),
        machine.LayerSpec(machine=upper, mask=UPPER,
                          weight=1.0, weight_param=weight_param),
    ])


def _run(lm, aset, params, steps=3):
    anim = init_animation_state(aset, 2)
    states = machine.init_layered_state(lm, 2)
    p = jnp.zeros((2, N_NODES, 3))
    r = jnp.broadcast_to(jnp.asarray([0.0, 0, 0, 1]), (2, N_NODES, 4))
    s = jnp.ones((2, N_NODES, 3))
    for _ in range(steps):
        anim, states, p, r, s = player.step_absm_layered(
            aset, lm, anim, states, params, p, r, s, 1 / 60)
    return np.asarray(p)


class TestLayeredMachine:
    def test_mask_splits_upper_lower(self):
        aset, walk, wave = build_set()
        lm = build_layered(walk, wave)
        params = machine.make_parameters(2)
        p = _run(lm, aset, params)
        # lower body: pure walk (+x), no wave (+y)
        assert np.all(p[:, :3, 0] > 0.5)
        assert np.all(np.abs(p[:, :3, 1]) < 1e-5)
        # upper body: wave fully overwrites (+y), walk x gone (weight 1
        # overwrite on masked nodes)
        assert np.all(p[:, 3:, 1] > 0.0)

    def test_float_weight_parameter_blends(self):
        aset, walk, wave = build_set()
        lm = build_layered(walk, wave, weight_param=0)
        params = machine.make_parameters(2, floats=1)
        params = params._replace(
            floats=params.floats.at[:, 0].set(jnp.asarray([0.0, 0.5])))
        p = _run(lm, aset, params, steps=1)
        # world 0: weight 0 -> upper body keeps walk pose exactly
        np.testing.assert_allclose(p[0, 3:, 0], p[0, :3, 0], atol=1e-6)
        assert np.all(np.abs(p[0, 3:, 1]) < 1e-6)
        # world 1: weight 0.5 -> halfway between walk and wave
        np.testing.assert_allclose(p[1, 3:, 0], p[1, :3, 0] * 0.5, atol=1e-5)

    def test_layer_transitions_use_shared_bools(self):
        aset, walk, wave = build_set()
        mb = MachineBuilder()
        prun = mb.add_parameter("go")
        s0 = mb.add_state("walk", clip=walk)
        s1 = mb.add_state("wave", clip=wave)
        mb.add_transition(s0, s1, prun, duration=1e-6)
        lm = machine.LayeredMachine(layers=[
            machine.LayerSpec(machine=mb.build())])
        params = machine.make_parameters(1, bools=1)
        params = params._replace(bools=params.bools.at[:, 0].set(True))
        anim = init_animation_state(aset, 1)
        states = machine.init_layered_state(lm, 1)
        states = machine.update_layers(lm, states, params, 0.1)
        assert int(states[0].current[0]) == s1
