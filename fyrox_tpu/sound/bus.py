"""Audio bus graph + effects (fyrox-sound/src/bus.rs, effects/).

The reference routes every source into an `AudioBus`; buses form a tree
whose root ("Primary") reaches the output device, and each bus applies an
effect chain. Here: `BusGraph` is a host-built template (parents, gains,
effect chains), `BusState` carries filter/delay state across blocks, and
`process` folds per-bus stereo blocks through their effects and sums them
up the tree by depth (deepest first — a child's wet output feeds its
parent, matching bus.rs traversal).

Effects (effects/ parity):
  * Biquad filters — LowPass/HighPass/BandPass/AllPass via the RBJ
    cookbook coefficients (fyrox-sound/src/effects/filter.rs wraps the
    same biquad family). IIR recursion runs as a lax.scan over the block.
  * Reverb — a compact Schroeder unit (4 parallel feedback combs + serial
    allpass), the same topology effects/reverb.rs builds.
  * Gain/Attenuate — per-bus gain.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, NamedTuple, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["BusGraph", "BusState", "biquad_coeffs", "process"]

SAMPLE_RATE = 44100.0
_COMB_DELAYS = (1116, 1188, 1277, 1356)      # Freeverb-family primes
_ALLPASS_DELAY = 556
_MAX_DELAY = 1500


def biquad_coeffs(kind, freq, q=0.7071, sample_rate=SAMPLE_RATE):
    """RBJ cookbook biquad (b0,b1,b2,a1,a2), normalized by a0."""
    w0 = 2.0 * np.pi * freq / sample_rate
    cw, sw = np.cos(w0), np.sin(w0)
    alpha = sw / (2.0 * q)
    if kind == "lowpass":
        b0, b1, b2 = (1 - cw) / 2, 1 - cw, (1 - cw) / 2
    elif kind == "highpass":
        b0, b1, b2 = (1 + cw) / 2, -(1 + cw), (1 + cw) / 2
    elif kind == "bandpass":
        b0, b1, b2 = alpha, 0.0, -alpha
    elif kind == "allpass":
        b0, b1, b2 = 1 - alpha, -2 * cw, 1 + alpha
    else:
        raise ValueError(kind)
    a0, a1, a2 = 1 + alpha, -2 * cw, 1 - alpha
    return np.asarray([b0 / a0, b1 / a0, b2 / a0, a1 / a0, a2 / a0],
                      np.float32)


@dataclass
class BusGraph:
    """Host-side bus-tree template. Bus 0 is the Primary bus (bus.rs
    PRIMARY_BUS)."""
    parents: np.ndarray                    # [N] int32 (-1 for primary)
    gains: np.ndarray                      # [N] f32
    # per-bus effect chains: list of ("biquad", coeffs[5]) / ("reverb",
    # wet) entries
    effects: List[List[tuple]] = field(default_factory=list)

    @staticmethod
    def build(buses):
        """buses: list of dicts(parent=-1, gain=1.0, effects=[...])."""
        return BusGraph(
            parents=np.asarray([b.get("parent", -1) for b in buses], np.int32),
            gains=np.asarray([b.get("gain", 1.0) for b in buses], np.float32),
            effects=[list(b.get("effects", [])) for b in buses])

    @property
    def num_buses(self):
        return int(self.parents.shape[0])

    def depth_order(self):
        """Bus indices deepest-first (children before parents)."""
        depth = np.zeros(self.num_buses, np.int64)
        for i, p in enumerate(self.parents):
            d, j = 0, i
            while self.parents[j] >= 0:
                j = int(self.parents[j])
                d += 1
            depth[i] = d
        return list(np.argsort(-depth, kind="stable"))


class BusState(NamedTuple):
    """Carried across blocks: biquad histories + reverb delay lines."""
    bq_x: jnp.ndarray     # [N_biquads, 2, 2]  (x[n-1], x[n-2]) per channel
    bq_y: jnp.ndarray     # [N_biquads, 2, 2]
    rv_comb: jnp.ndarray  # [N_reverbs, 4, MAX_DELAY, 2]
    rv_ap: jnp.ndarray    # [N_reverbs, MAX_DELAY, 2]
    rv_pos: jnp.ndarray   # [N_reverbs] int32 write cursor


def init_state(graph: BusGraph) -> BusState:
    nb = sum(1 for ch in graph.effects for e in ch if e[0] == "biquad")
    nr = sum(1 for ch in graph.effects for e in ch if e[0] == "reverb")
    return BusState(
        bq_x=jnp.zeros((max(nb, 1), 2, 2)),
        bq_y=jnp.zeros((max(nb, 1), 2, 2)),
        rv_comb=jnp.zeros((max(nr, 1), 4, _MAX_DELAY, 2)),
        rv_ap=jnp.zeros((max(nr, 1), _MAX_DELAY, 2)),
        rv_pos=jnp.zeros(max(nr, 1), jnp.int32))


def _run_biquad(block, coeffs, x_hist, y_hist):
    """IIR over the block (scan); block [B,2]."""
    b0, b1, b2, a1, a2 = [jnp.asarray(c) for c in coeffs]

    def step(carry, x):
        x1, x2, y1, y2 = carry
        y = b0 * x + b1 * x1 + b2 * x2 - a1 * y1 - a2 * y2
        return (x, x1, y, y1), y

    carry0 = (x_hist[0], x_hist[1], y_hist[0], y_hist[1])
    (x1, x2, y1, y2), out = jax.lax.scan(step, carry0, block)
    return out, jnp.stack([x1, x2]), jnp.stack([y1, y2])


def _run_reverb(block, wet, comb, ap, pos):
    """Schroeder: 4 parallel feedback combs → 1 allpass; mixes wet in."""
    fb = 0.84
    ap_g = 0.5
    delays = jnp.asarray(_COMB_DELAYS)

    def step(carry, x):
        comb, ap, pos = carry
        rd = (pos - delays) % _MAX_DELAY                    # [4]
        comb_out = comb[jnp.arange(4), rd]                  # [4,2]
        new_vals = x[None, :] + comb_out * fb
        comb = comb.at[jnp.arange(4), pos % _MAX_DELAY].set(new_vals)
        summed = jnp.sum(comb_out, axis=0) * 0.25
        ra = (pos - _ALLPASS_DELAY) % _MAX_DELAY
        ap_out = ap[ra]
        ap_in = summed + ap_out * ap_g
        ap = ap.at[pos % _MAX_DELAY].set(ap_in)
        y = ap_out - ap_g * ap_in
        return (comb, ap, pos + 1), y

    (comb, ap, pos), wet_sig = jax.lax.scan(step, (comb, ap, pos), block)
    return block * (1.0 - wet) + wet_sig * wet, comb, ap, pos


def process(graph: BusGraph, bus_blocks, state: BusState):
    """Fold per-bus input blocks [N, B, 2] through effect chains and the
    tree; returns (primary stereo block [B,2], new state)."""
    n = graph.num_buses
    acc = [bus_blocks[i] for i in range(n)]
    bq_x, bq_y = state.bq_x, state.bq_y
    rv_comb, rv_ap, rv_pos = state.rv_comb, state.rv_ap, state.rv_pos
    bq_i = rv_i = 0
    out_primary = None
    for bus in graph.depth_order():
        block = acc[bus]
        for eff in graph.effects[bus]:
            if eff[0] == "biquad":
                block, nx, ny = _run_biquad(block, eff[1],
                                            bq_x[bq_i], bq_y[bq_i])
                bq_x = bq_x.at[bq_i].set(nx)
                bq_y = bq_y.at[bq_i].set(ny)
                bq_i += 1
            elif eff[0] == "reverb":
                block, c, a, p = _run_reverb(block, eff[1],
                                             rv_comb[rv_i], rv_ap[rv_i],
                                             rv_pos[rv_i])
                rv_comb = rv_comb.at[rv_i].set(c)
                rv_ap = rv_ap.at[rv_i].set(a)
                rv_pos = rv_pos.at[rv_i].set(p)
                rv_i += 1
        block = block * graph.gains[bus]
        parent = int(graph.parents[bus])
        if parent < 0:
            out_primary = block if out_primary is None else out_primary + block
        else:
            acc[parent] = acc[parent] + block
    return out_primary, BusState(bq_x, bq_y, rv_comb, rv_ap, rv_pos)
