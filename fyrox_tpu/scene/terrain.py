"""Terrain: chunked heightmap nodes + heightfield collision.

Equivalent of the reference's Terrain node (fyrox-impl/src/scene/terrain/:
chunked height map :126-135, per-chunk LOD quadtree, layered materials) and
rapier's heightfield collider. Round-1 scope: a single-chunk heightmap with
bilinear height sampling, mesh generation for rendering, and a
ball-vs-heightfield contact kernel that plugs into the physics solver as an
extra contact source.
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax.numpy as jnp

from fyrox_tpu.render.mesh import MeshData

__all__ = ["Terrain", "sample_height", "terrain_ball_contacts"]


@dataclass
class Terrain:
    """Heightmap terrain: heights [Hz, Hx] over a world-aligned rectangle
    (x: [0, size_x], z: [0, size_z]), like the reference's chunk layout."""
    heights: np.ndarray
    size_x: float = 32.0
    size_z: float = 32.0
    origin: tuple = (0.0, 0.0, 0.0)

    @property
    def resolution(self):
        return self.heights.shape[1], self.heights.shape[0]

    def to_mesh(self, albedo=(0.4, 0.5, 0.3)) -> MeshData:
        """Triangulated render mesh with smooth normals."""
        h = np.asarray(self.heights, np.float32)
        hz, hx = h.shape
        xs = np.linspace(0, self.size_x, hx, dtype=np.float32)
        zs = np.linspace(0, self.size_z, hz, dtype=np.float32)
        px, pz = np.meshgrid(xs, zs)
        pos = np.stack([px + self.origin[0], h + self.origin[1],
                        pz + self.origin[2]], -1).reshape(-1, 3)
        # central-difference normals
        dx = np.gradient(h, xs[1] - xs[0], axis=1)
        dz = np.gradient(h, zs[1] - zs[0], axis=0)
        n = np.stack([-dx, np.ones_like(h), -dz], -1)
        n /= np.linalg.norm(n, axis=-1, keepdims=True)
        nrm = n.reshape(-1, 3).astype(np.float32)
        uv = np.stack([px / self.size_x, pz / self.size_z], -1).reshape(-1, 2)
        tris = []
        for j in range(hz - 1):
            for i in range(hx - 1):
                a = j * hx + i
                b = a + 1
                c = a + hx
                d = c + 1
                tris += [(a, b, c), (b, d, c)]
        return MeshData(pos, nrm, uv.astype(np.float32),
                        np.asarray(tris, np.int32), albedo=albedo)


def sample_height(terrain: Terrain, x, z):
    """Bilinear height lookup at world (x, z); batched. Points outside the
    terrain clamp to the border."""
    h = jnp.asarray(terrain.heights, jnp.float32)
    hz, hx = h.shape
    u = (jnp.asarray(x) - terrain.origin[0]) / terrain.size_x * (hx - 1)
    v = (jnp.asarray(z) - terrain.origin[2]) / terrain.size_z * (hz - 1)
    u = jnp.clip(u, 0.0, hx - 1.0)
    v = jnp.clip(v, 0.0, hz - 1.0)
    i0 = jnp.clip(jnp.floor(u).astype(jnp.int32), 0, hx - 2)
    j0 = jnp.clip(jnp.floor(v).astype(jnp.int32), 0, hz - 2)
    fu = u - i0
    fv = v - j0
    h00 = h[j0, i0]
    h10 = h[j0, i0 + 1]
    h01 = h[j0 + 1, i0]
    h11 = h[j0 + 1, i0 + 1]
    return ((h00 * (1 - fu) + h10 * fu) * (1 - fv)
            + (h01 * (1 - fu) + h11 * fu) * fv) + terrain.origin[1]


def terrain_normal(terrain: Terrain, x, z, eps=0.05):
    hx0 = sample_height(terrain, x - eps, z)
    hx1 = sample_height(terrain, x + eps, z)
    hz0 = sample_height(terrain, x, z - eps)
    hz1 = sample_height(terrain, x, z + eps)
    n = jnp.stack([(hx0 - hx1) / (2 * eps),
                   jnp.ones_like(hx0),
                   (hz0 - hz1) / (2 * eps)], -1)
    return n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-8)


def terrain_ball_contacts(terrain: Terrain, centers, radii, pred=0.002):
    """Sphere-vs-heightfield contacts: centers [...,3], radii [...].

    Approximates the surface by its tangent plane under each sphere (exact
    for resting contact on smooth terrain). Returns (normal A→terrain,
    point, depth, active) in the narrowphase Manifold single-point layout.
    """
    x = centers[..., 0]
    z = centers[..., 2]
    ground_y = sample_height(terrain, x, z)
    n = terrain_normal(terrain, x, z)
    # signed distance from sphere center to the tangent plane at (x, gy, z)
    plane_pt = jnp.stack([x, ground_y, z], -1)
    dist = jnp.sum((centers - plane_pt) * n, -1)
    depth = radii - dist
    point = centers - n * dist[..., None]
    return -n, point, depth, depth > -pred


def add_chunked_terrain(sb, terrain: Terrain, chunks=(2, 2),
                        lod_split=0.25, decimate=4, parent=-1,
                        albedo=(0.4, 0.5, 0.3)):
    """Chunked terrain with per-chunk LOD (the reference's chunked height
    map + per-chunk QuadTree LOD, fyrox-impl/src/scene/terrain/:126-135 +
    quadtree.rs — re-expressed through the engine's LOD-group culling):

    the heightmap splits into `chunks` tiles; each tile gets a full-res
    mesh shown inside `lod_split` normalized camera distance and a
    `decimate`x coarser mesh beyond it. Returns [(hi_node, lo_node)].
    """
    import numpy as np
    h = np.asarray(terrain.heights, np.float32)
    hz, hx = h.shape
    cx, cz = chunks
    out = []
    for jz in range(cz):
        for jx in range(cx):
            x0 = jx * (hx - 1) // cx
            x1 = (jx + 1) * (hx - 1) // cx + 1
            z0 = jz * (hz - 1) // cz
            z1 = (jz + 1) * (hz - 1) // cz + 1
            sub = h[z0:z1, x0:x1]
            size_x = terrain.size_x * (x1 - 1 - x0) / (hx - 1)
            size_z = terrain.size_z * (z1 - 1 - z0) / (hz - 1)
            origin = (terrain.origin[0] + terrain.size_x * x0 / (hx - 1),
                      terrain.origin[1],
                      terrain.origin[2] + terrain.size_z * z0 / (hz - 1))
            hi = Terrain(sub, size_x, size_z, origin)
            lo = Terrain(sub[::decimate, ::decimate].copy()
                         if min(sub.shape) > decimate else sub,
                         size_x, size_z, origin)
            n_hi = sb.add_mesh(hi.to_mesh(albedo),
                               name=f"terrain_{jx}_{jz}_hi", parent=parent)
            n_lo = sb.add_mesh(lo.to_mesh(albedo),
                               name=f"terrain_{jx}_{jz}_lo", parent=parent)
            sb.add_lod_group([(0.0, lod_split, [n_hi]),
                              (lod_split, 1.0, [n_lo])])
            out.append((n_hi, n_lo))
    return out
