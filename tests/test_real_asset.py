"""Real-asset flagship: imported skinned FBX character end-to-end
(import → skin clusters → animation curves → engine step → skinning →
render; round-2 verdict item 5, fyrox-impl/src/resource/fbx/ intent)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest


def _flagship():
    from fyrox_tpu.models import build_flagship
    from fyrox_tpu.models.assets import make_character_fbx
    data = make_character_fbx(n_bones=8, n_verts=320)
    return build_flagship(n_bodies=24, real_asset=data)


class TestRealAssetFlagship:
    def test_import_produces_real_bind_poses(self):
        engine, skin = _flagship()
        assert skin.num_bones == 8
        # bind matrices are the chain's real world translations — NOT
        # identity (the transposed-bind import bug hid behind identities)
        ib = np.asarray(skin.inv_bind)
        assert not np.allclose(ib[3], np.eye(4))
        assert abs(ib[3][0, 3] + 3 * 0.15) < 1e-5   # -x translation

    @pytest.mark.slow
    def test_step_skin_render_one_frame(self):
        from fyrox_tpu.animation import skinning
        from fyrox_tpu.render import (RenderConfig, build_render_template,
                                      render_frame)
        engine, skin = _flagship()
        state = engine.init_state(num_worlds=2)

        step = jax.jit(lambda s: engine.step(s))
        bm0 = skinning.bone_matrices(state.scene.globals_, skin)
        v0 = skinning.skin_positions_dense(bm0, skin)
        for _ in range(15):                      # 0.25 s of the FBX clip
            state = step(state)
        bm1 = skinning.bone_matrices(state.scene.globals_, skin)
        v1 = skinning.skin_positions_dense(bm1, skin)
        assert np.isfinite(np.asarray(v1)).all()
        # the imported rotation curves must actually deform the mesh
        moved = float(jnp.max(jnp.linalg.norm(v1 - v0, axis=-1)))
        assert moved > 0.01, moved
        # at t=0 the skin must reproduce the bind-pose mesh (real bind
        # matrices: global @ inv_bind == identity at bind)
        assert float(jnp.max(jnp.abs(
            v0[0] - jnp.asarray(skin.vertices)))) < 1e-3

        rt = build_render_template(engine.template)
        cfg = RenderConfig(width=64, height=64, shadows=False,
                           use_pallas=False)
        color = render_frame(state.scene, engine.template, rt, cfg)[0]
        img = np.asarray(color)
        assert np.isfinite(img).all()
        assert img.shape[-3:-1] == (64, 64)
