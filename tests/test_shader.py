"""Shader definition resources (fyrox-material/src/shader/mod.rs:594):
RON parsing of .shader files, property groups, registry bindings."""
import glob

import numpy as np
import jax.numpy as jnp
import pytest

from fyrox_tpu.render.shader import (ShaderDefinition, parse_ron,
                                     register_shade_fn, get_shade_fn,
                                     standard_shader)

REF_SHADERS = sorted(glob.glob(
    "/root/reference/fyrox-material/src/shader/standard/*.shader"))


class TestRonParser:
    def test_scalars_and_structs(self):
        v = parse_ron('(name: "x", n: 3, f: 1.5, on: true, kind: White)')
        assert v == {"name": "x", "n": 3, "f": 1.5, "on": True,
                     "kind": "White"}

    def test_nested_variant_and_list(self):
        v = parse_ron('(kind: Texture(kind: Sampler2D, fallback: Normal), '
                      'xs: [(a: 1), (a: 2)])')
        assert v["kind"]["__variant__"] == "Texture"
        assert v["kind"]["fallback"] == "Normal"
        assert [x["a"] for x in v["xs"]] == [1, 2]

    def test_raw_string(self):
        v = parse_ron('(src: r#"line1\n"quoted""#)')
        assert '"quoted"' in v["src"]

    def test_comments_and_tuples(self):
        v = parse_ron('( // comment\n value: (1.0, 2.0) /* block */ )')
        assert v["value"] == (1.0, 2.0)


@pytest.mark.skipif(not REF_SHADERS, reason="reference not present")
class TestReferenceShaders:
    def test_parse_all_standard_shaders(self):
        """Every reference standard .shader file parses."""
        for path in REF_SHADERS:
            sd = ShaderDefinition.from_file(path)
            assert sd.name
            assert sd.passes or sd.resources

    def test_standard_shader_contract(self):
        sd = ShaderDefinition.from_file(
            "/root/reference/fyrox-material/src/shader/standard/standard.shader")
        assert sd.name == "StandardShader"
        assert sd.has_texture_resource("diffuseTexture")
        assert sd.has_property_group_resource("properties")
        pg = sd.find_property_group_resource("properties")
        names = [p.name for p in pg.properties]
        assert "texCoordScale" in names and "diffuseColor" in names
        groups = sd.default_properties()
        assert groups["properties"]["texCoordScale"].shape == (2,)


class TestDefinitionModel:
    def test_builtin_standard_matches_reference_contract(self):
        sd = standard_shader()
        assert sd.has_texture_resource("normalTexture")
        g = sd.default_properties()["properties"]
        np.testing.assert_allclose(np.asarray(g["diffuseColor"]),
                                   [1, 1, 1, 1])
        assert g["layerIndex"].dtype == jnp.int32

    def test_property_defaults_kinds(self):
        text = '''(
            name: "T", passes: [],
            resources: [(
                name: "p",
                kind: PropertyGroup([
                    (name: "m", kind: Matrix4()),
                    (name: "arr", kind: FloatArray(value: [1.0, 2.0], max_len: 4)),
                    (name: "flag", kind: Bool(value: true)),
                ]),
                binding: 0,
            )],
        )'''
        sd = ShaderDefinition.from_string(text)
        g = sd.default_properties()["p"]
        np.testing.assert_allclose(np.asarray(g["m"]), np.eye(4))
        assert g["arr"].shape == (4,) and float(g["arr"][1]) == 2.0
        assert bool(g["flag"]) is True

    def test_shade_fn_registry(self):
        @register_shade_fn("test_pass")
        def my_shade(x):
            return x * 2
        sd = standard_shader()
        sd.passes[0].shade_fn = "test_pass"
        fn = get_shade_fn(sd.passes[0].shade_fn)
        assert float(fn(jnp.asarray(2.0))) == 4.0

    def test_disabled_passes_roundtrip(self):
        sd = ShaderDefinition.from_string(
            '(name: "X", passes: [(name: "A", vertex_shader: "", '
            'fragment_shader: "")], resources: [], disabled_passes: ["A"])')
        assert sd.disabled_passes == ["A"]
        assert sd.passes[0].name == "A"
