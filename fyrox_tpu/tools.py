"""Scene tooling CLI: inspect and diff .rgs scenes.

The editor-equivalent inspection surface for a headless workflow (the
reference ships FyroxEd; this engine's authoring path is builders +
.rgs/glTF/FBX import, so the tooling operates on those):

    python -m fyrox_tpu.tools inspect scene.rgs     # node tree + payloads
    python -m fyrox_tpu.tools diff a.rgs b.rgs      # changed nodes/fields

Works on any source `io/rgs_scene.load_scene` accepts (reference .rgs
binary FBAF / ASCII FTAX files included).
"""
from __future__ import annotations

import sys

import numpy as np

__all__ = ["inspect_scene", "diff_scenes", "main"]


def _fmt_vec(v):
    return "(" + ", ".join(f"{float(x):.3g}" for x in np.asarray(v)) + ")"


def inspect_scene(template, out=None):
    """Print the node hierarchy with types, transforms and payload info."""
    out = out or sys.stdout
    from fyrox_tpu.scene.template import NodeType
    n = template.num_nodes
    children = {}
    roots = []
    for i in range(n):
        p = int(template.parent[i])
        if p < 0:
            roots.append(i)
        else:
            children.setdefault(p, []).append(i)

    def walk(i, depth):
        t = NodeType(int(template.node_type[i])).name
        name = template.names[i] if i < len(template.names) else f"node{i}"
        pos = _fmt_vec(template.init_position[i])
        extra = ""
        if not template.init_visibility[i]:
            extra += " [hidden]"
        if not template.init_enabled[i]:
            extra += " [disabled]"
        out.write(f"{'  ' * depth}#{i} {name} <{t}> pos={pos}{extra}\n")
        for c in children.get(i, []):
            walk(c, depth + 1)

    out.write(f"scene: {n} nodes, {len(template.meshes or [])} meshes, "
              f"{len((template.lights or {}).get('node', []))} lights, "
              f"{len((template.cameras or {}).get('node', []))} cameras\n")
    for r in roots:
        walk(r, 0)


def diff_scenes(a, b, out=None):
    """Field-level diff of two SceneTemplates (by node index); returns the
    number of differences (useful as an exit code)."""
    out = out or sys.stdout
    from fyrox_tpu.io.inheritance import TRACKED_FIELDS
    n_diff = 0
    if a.num_nodes != b.num_nodes:
        out.write(f"node count: {a.num_nodes} -> {b.num_nodes}\n")
        n_diff += 1
    n = min(a.num_nodes, b.num_nodes)
    for i in range(n):
        name = a.names[i] if i < len(a.names) else f"node{i}"
        if int(a.node_type[i]) != int(b.node_type[i]):
            out.write(f"#{i} {name}: node_type {int(a.node_type[i])} -> "
                      f"{int(b.node_type[i])}\n")
            n_diff += 1
        if int(a.parent[i]) != int(b.parent[i]):
            out.write(f"#{i} {name}: parent {int(a.parent[i])} -> "
                      f"{int(b.parent[i])}\n")
            n_diff += 1
        for f in TRACKED_FIELDS:
            va = np.asarray(getattr(a, f)[i])
            vb = np.asarray(getattr(b, f)[i])
            if not np.allclose(va, vb, atol=1e-7):
                out.write(f"#{i} {name}: {f} {_fmt_vec(np.atleast_1d(va))} -> "
                          f"{_fmt_vec(np.atleast_1d(vb))}\n")
                n_diff += 1
    if n_diff == 0:
        out.write("scenes identical (tracked fields)\n")
    return n_diff


def _load(path):
    from fyrox_tpu.io.rgs_scene import load_scene
    return load_scene(path)


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] not in ("inspect", "diff"):
        sys.stderr.write(__doc__)
        return 2
    if argv[0] == "inspect":
        inspect_scene(_load(argv[1]))
        return 0
    n = diff_scenes(_load(argv[1]), _load(argv[2]))
    return 1 if n else 0


if __name__ == "__main__":
    raise SystemExit(main())
