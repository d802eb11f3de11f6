"""State checkpoint/resume.

Equivalent of the reference's save path (the Visitor serializing whole
scenes, SURVEY.md §5 checkpoint row; Scene::save scene/mod.rs:628). An
EngineState is a PyTree of arrays, so checkpointing is: gather shards to
host → one .npz blob with the tree structure recorded — plus an optional
Visitor-format (.rgs) export of the node poses so reference tooling can
inspect saved worlds.
"""
from __future__ import annotations

import io as _io
import json
from typing import Any

import numpy as np
import jax

from fyrox_tpu.io.visitor import VisitorNode, write_rgs

__all__ = ["save_state", "load_state", "state_to_visitor"]


def save_state(state: Any, path: str):
    """Serialize any PyTree-of-arrays state to an .npz file."""
    leaves, treedef = jax.tree.flatten(state)
    arrs = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    buf = _io.BytesIO()
    np.savez_compressed(buf, **arrs)
    with open(path, "wb") as f:
        f.write(buf.getvalue())


def load_state(template_state: Any, path: str):
    """Load arrays saved by save_state back into the structure of
    `template_state` (same PyTree shape)."""
    leaves, treedef = jax.tree.flatten(template_state)
    with np.load(path) as z:
        new_leaves = [z[f"leaf_{i}"] for i in range(len(leaves))]
    for old, new in zip(leaves, new_leaves):
        if hasattr(old, "shape") and tuple(old.shape) != tuple(new.shape):
            raise ValueError(f"checkpoint shape mismatch: {new.shape} vs "
                             f"{old.shape}")
    return jax.tree.unflatten(treedef, new_leaves)


def state_to_visitor(engine_state, scene_template, world: int = 0) -> bytes:
    """Export one world's node poses as a Visitor (.rgs-style) blob that
    reference-side tooling can parse: Scene/Graph/Pool/Records with
    NodeData name + transform per node."""
    scene = engine_state.scene
    pos = np.asarray(scene.position[world])
    rot = np.asarray(scene.rotation[world])
    scl = np.asarray(scene.scale[world])

    root = VisitorNode("__ROOT__")
    scene_n = VisitorNode("Scene")
    graph_n = VisitorNode("Graph")
    pool_n = VisitorNode("Pool")
    records = VisitorNode("Records")
    records.add("Length", "u32", scene_template.num_nodes)
    for i in range(scene_template.num_nodes):
        item = VisitorNode(f"Item{i}")
        item.add("Generation", "u32", 1)
        payload = VisitorNode("Payload")
        payload.add("IsSome", "u8", 1)
        data = VisitorNode("Data")
        nd = VisitorNode("NodeData")
        nd.add("Name", "string", scene_template.names[i])
        tf = VisitorNode("Transform")
        for fname, kind, val in [("LocalPosition", "vec3f32", pos[i]),
                                 ("LocalRotation", "quat", rot[i]),
                                 ("LocalScale", "vec3f32", scl[i])]:
            v = VisitorNode(fname)
            v.add("Value", kind, val)
            tf.children.append(v)
        nd.children.append(tf)
        parent = VisitorNode("Parent")
        pidx = int(scene_template.parent[i])
        parent.add("Index", "u32", max(pidx, 0))
        parent.add("Generation", "u32", 1 if pidx >= 0 else 0)
        nd.children.append(parent)
        data.children.append(nd)
        payload.children.append(data)
        item.children.append(payload)
        records.children.append(item)
    pool_n.children.append(records)
    graph_n.children.append(pool_n)
    scene_n.children.append(graph_n)
    root.children.append(scene_n)
    return write_rgs(root)
