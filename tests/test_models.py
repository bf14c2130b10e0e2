"""Model tower tests: shapes, registry, ONNX ingestion round-trip."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from imageclust_tpu.config import EmbedConfig
from imageclust_tpu.models.registry import create_embedder, list_models


class TestResNet50:
    @pytest.fixture(scope="class")
    def small_resnet(self):
        # a 2-2-2-2 stage ResNet keeps CPU test time sane; same code path.
        from imageclust_tpu.models.resnet50 import ResNet50V1

        model = ResNet50V1(dtype=jnp.float32, stage_layers=(1, 1, 1, 1))
        rng = jax.random.PRNGKey(0)
        x = jnp.zeros((2, 3, 64, 64), jnp.float32)
        variables = model.init(rng, x)
        return model, variables

    def test_output_shapes(self, small_resnet):
        model, variables = small_resnet
        x = jnp.ones((2, 3, 64, 64), jnp.float32)
        logits, pooled = model.apply(variables, x, return_features=True)
        assert logits.shape == (2, 1000)
        assert pooled.shape == (2, 2048)

    def test_accepts_nhwc(self, small_resnet):
        model, variables = small_resnet
        x = jnp.ones((1, 64, 64, 3), jnp.float32)
        assert model.apply(variables, x).shape == (1, 1000)

    def test_full_param_tree_matches_gluon_names(self):
        """Every resnetv17_* initializer name must land on a real param —
        validates the converter name map against the Flax tree without the
        (stripped) checkpoint blob."""
        from imageclust_tpu.models.resnet50 import (
            ResNet50V1,
            _gluon_name_map,
        )

        model = ResNet50V1(dtype=jnp.float32)
        variables = jax.eval_shape(
            lambda: model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 3, 224, 224), jnp.float32))
        )
        name_map = _gluon_name_map()
        # 53 convs + dense w/b + 53 bns x 4 tensors
        assert len(name_map) == 53 + 2 + 53 * 4

        def count_leaves(t):
            return len(jax.tree.leaves(t))

        # every mapped target exists in the variables tree
        params = variables["params"]
        stats = variables["batch_stats"]
        for onnx_name, path in name_map.items():
            if path[0].startswith("stats_"):
                node = stats
                path = path[1:]
            elif path[0].startswith("params_"):
                node = params
                path = path[1:]
            else:
                node = params
            for p in path:
                assert p in node, f"{onnx_name} -> {path}: {p} missing"
                node = node[p]
        assert count_leaves(params) == 53 + 2 + 53 * 2  # kernels + dense b + bn scale/bias
        assert count_leaves(stats) == 53 * 2

    def test_onnx_roundtrip_ingestion(self, tmp_path):
        """Synthesize a random-weight checkpoint in real ONNX wire format with
        gluon names, ingest it, and verify tensors land transposed correctly."""
        from imageclust_tpu.models.onnx_io import (
            read_onnx_initializers,
            write_onnx_model,
        )
        from imageclust_tpu.models.resnet50 import (
            ResNet50V1,
            _gluon_name_map,
            load_onnx_params,
        )

        rng = np.random.default_rng(0)
        model = ResNet50V1(dtype=jnp.float32)
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 3, 224, 224), jnp.float32))

        # build initializers with the *ONNX-side* layouts
        inits = {}
        for onnx_name, path in _gluon_name_map().items():
            tree = variables["batch_stats"] if path[0].startswith("stats_") else variables["params"]
            sub_path = path[1:] if path[0].startswith(("stats_", "params_")) else path
            node = tree
            for p in sub_path:
                node = node[p]
            arr = rng.normal(size=node.shape).astype(np.float32)
            if sub_path[-1] == "kernel" and arr.ndim == 4:
                arr = np.transpose(arr, (3, 2, 0, 1))  # flax->onnx
            elif sub_path[-1] == "kernel" and arr.ndim == 2:
                arr = arr.T
            inits[onnx_name] = arr

        path = str(tmp_path / "fake_resnet.onnx")
        write_onnx_model(path, nodes=[], initializers=inits,
                         inputs={"data": (1, 3, 224, 224)},
                         outputs={"resnetv17_dense0_fwd": (1, 1000)})

        # wire-format round trip
        back = read_onnx_initializers(path)
        assert set(back) == set(inits)
        for k in inits:
            np.testing.assert_array_equal(back[k], inits[k])

        # full ingestion with shape validation
        loaded = load_onnx_params(path, dict(variables))
        k0 = np.asarray(loaded["params"]["conv0"]["kernel"])
        np.testing.assert_allclose(
            k0, np.transpose(inits["resnetv17_conv0_weight"], (2, 3, 1, 0))
        )
        d0 = np.asarray(loaded["params"]["dense0"]["kernel"])
        np.testing.assert_allclose(d0, inits["resnetv17_dense0_weight"].T)
        m0 = np.asarray(loaded["batch_stats"]["bn0"]["mean"])
        np.testing.assert_allclose(m0, inits["resnetv17_batchnorm0_running_mean"])

    def test_onnx_ingestion_rejects_bad_shapes(self, tmp_path):
        from imageclust_tpu.models.onnx_io import write_onnx_model
        from imageclust_tpu.models.resnet50 import ResNet50V1, load_onnx_params

        model = ResNet50V1(dtype=jnp.float32)
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 3, 224, 224), jnp.float32))
        path = str(tmp_path / "bad.onnx")
        write_onnx_model(path, nodes=[],
                         initializers={"resnetv17_conv0_weight":
                                       np.zeros((9, 9), np.float32)},
                         inputs={}, outputs={})
        with pytest.raises(ValueError, match="conversion failed"):
            load_onnx_params(path, dict(variables))


class TestViT:
    def test_tiny_vit_shapes(self):
        from imageclust_tpu.models.vit import ViTConfig, VisionTransformer

        cfg = ViTConfig(patch=8, width=64, depth=2, heads=4, proj_dim=32,
                        image_size=32)
        model = VisionTransformer(cfg, dtype=jnp.float32)
        x = jnp.ones((2, 3, 32, 32), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), x)
        emb, feat = model.apply(variables, x, return_features=True)
        assert emb.shape == (2, 32)
        assert feat.shape == (2, 64)

    def test_siglip_style_no_class_token(self):
        from imageclust_tpu.models.vit import ViTConfig, VisionTransformer

        cfg = ViTConfig(patch=8, width=64, depth=1, heads=4, proj_dim=64,
                        image_size=32, use_class_token=False, quick_gelu=False)
        model = VisionTransformer(cfg, dtype=jnp.float32)
        x = jnp.ones((1, 3, 32, 32), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), x)
        assert model.apply(variables, x).shape == (1, 64)
        assert "class_token" not in variables["params"]


class TestRegistry:
    def test_list_models(self):
        models = list_models()
        assert "resnet50" in models
        assert "vit_b32" in models
        assert "siglip_so400m" in models

    def test_unknown_model_raises(self):
        with pytest.raises(ValueError, match="unknown model"):
            create_embedder(EmbedConfig(model="nope"))


class TestClipTorchIngestion:
    def test_hf_state_dict_round_trip(self):
        """Synthesize an HF-CLIPVisionModel-shaped state dict from a tiny
        tower's params (inverse layout mapping), ingest it, and require the
        forward outputs to match — validates every name/transpose rule in
        load_clip_vision_torch without the (absent) real checkpoint."""
        import numpy as np

        from imageclust_tpu.models.vit import (
            ViTConfig,
            VisionTransformer,
            load_clip_vision_torch,
        )

        cfg = ViTConfig(patch=8, width=32, depth=2, heads=4, proj_dim=16,
                        image_size=16)
        model = VisionTransformer(cfg, dtype=jnp.float32)
        x = jnp.asarray(
            np.random.default_rng(0).random((2, 3, 16, 16)), jnp.float32
        )
        variables = model.init(jax.random.PRNGKey(1), x)
        p = variables["params"]

        sd = {
            "vision_model.embeddings.patch_embedding.weight":
                np.transpose(np.asarray(p["patch"]["kernel"]), (3, 2, 0, 1)),
            "vision_model.embeddings.class_embedding":
                np.asarray(p["class_token"]).reshape(-1),
            "vision_model.embeddings.position_embedding.weight":
                np.asarray(p["pos_embed"])[0],
            "vision_model.pre_layrnorm.weight": np.asarray(p["ln_pre"]["scale"]),
            "vision_model.pre_layrnorm.bias": np.asarray(p["ln_pre"]["bias"]),
            "vision_model.post_layernorm.weight": np.asarray(p["ln_post"]["scale"]),
            "vision_model.post_layernorm.bias": np.asarray(p["ln_post"]["bias"]),
            "visual_projection.weight": np.asarray(p["projection"]["kernel"]).T,
        }
        for i in range(cfg.depth):
            blk = p[f"block{i}"]
            hf = f"vision_model.encoder.layers.{i}"
            sd[f"{hf}.layer_norm1.weight"] = np.asarray(blk["ln1"]["scale"])
            sd[f"{hf}.layer_norm1.bias"] = np.asarray(blk["ln1"]["bias"])
            sd[f"{hf}.layer_norm2.weight"] = np.asarray(blk["ln2"]["scale"])
            sd[f"{hf}.layer_norm2.bias"] = np.asarray(blk["ln2"]["bias"])
            for ours, theirs in [("q", "self_attn.q_proj"),
                                 ("k", "self_attn.k_proj"),
                                 ("v", "self_attn.v_proj"),
                                 ("proj", "self_attn.out_proj"),
                                 ("mlp_up", "mlp.fc1"),
                                 ("mlp_down", "mlp.fc2")]:
                sd[f"{hf}.{theirs}.weight"] = np.asarray(blk[ours]["kernel"]).T
                sd[f"{hf}.{theirs}.bias"] = np.asarray(blk[ours]["bias"])

        loaded = load_clip_vision_torch(sd, cfg, dict(variables))
        out_orig = np.asarray(model.apply(variables, x))
        out_loaded = np.asarray(model.apply(loaded, x))
        np.testing.assert_allclose(out_loaded, out_orig, atol=1e-6)

    def test_rejects_shape_mismatch(self):
        import numpy as np

        from imageclust_tpu.models.vit import (
            ViTConfig,
            VisionTransformer,
            load_clip_vision_torch,
        )

        cfg = ViTConfig(patch=8, width=32, depth=1, heads=4, proj_dim=16,
                        image_size=16)
        model = VisionTransformer(cfg, dtype=jnp.float32)
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 3, 16, 16), jnp.float32))
        with pytest.raises((ValueError, KeyError)):
            load_clip_vision_torch(
                {"vision_model.embeddings.patch_embedding.weight":
                 np.zeros((9, 9), np.float32)}, cfg, dict(variables)
            )


class TestInferenceTransforms:
    """fold_bn_variables and the s2d_raw stem are exact-math rewrites of the
    standard model — same variables tree, same outputs (up to f32 reduction
    order)."""

    def _model_and_vars(self, **kw):
        import jax
        import jax.numpy as jnp

        from imageclust_tpu.models.resnet50 import ResNet50V1

        m = ResNet50V1(dtype=jnp.float32, **kw)
        v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 3, 224, 224)))
        return m, v

    def test_fold_bn_matches_unfolded(self):
        import jax
        import jax.numpy as jnp

        from imageclust_tpu.models.resnet50 import (
            ResNet50V1, fold_bn_variables)

        m, v = self._model_and_vars()
        # non-trivial running stats so the fold actually moves numbers
        v = jax.tree_util.tree_map(
            lambda a: a + 0.05 if a.ndim == 1 else a, v)
        mf = ResNet50V1(dtype=jnp.float32, fold_bn=True)
        vf = fold_bn_variables(v)
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 224, 224))
        a = m.apply(v, x)
        b = mf.apply(vf, x)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)

    def test_fold_bn_rejects_train(self):
        import jax.numpy as jnp
        import pytest as _pytest

        from imageclust_tpu.models.resnet50 import ResNet50V1

        m, v = self._model_and_vars()
        mf = ResNet50V1(dtype=jnp.float32, fold_bn=True)
        with _pytest.raises(ValueError, match="inference"):
            mf.apply(v, np.zeros((1, 3, 224, 224), np.float32), train=True)

    def test_s2d_stem_matches_standard(self):
        import jax
        import jax.numpy as jnp

        from imageclust_tpu.models.resnet50 import ResNet50V1

        m, v = self._model_and_vars()
        ms = ResNet50V1(dtype=jnp.float32, stem_mode="s2d_raw")
        # identical param tree: the s2d stem reuses params/conv0/kernel
        assert (jax.tree_util.tree_structure(ms.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3), jnp.uint8)))
            == jax.tree_util.tree_structure(v))
        rng = np.random.default_rng(0)
        u8 = rng.integers(0, 256, (2, 224, 224, 3), dtype=np.uint8)
        # standard path: reference preprocessing (BGR->RGB, 1/255)
        xf = u8[..., ::-1].astype(np.float32) / 255.0
        a = m.apply(v, jnp.asarray(xf))
        b = ms.apply(v, jnp.asarray(u8))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)

    def test_embedder_s2d_matches_plain(self):
        from imageclust_tpu.config import EmbedConfig
        from imageclust_tpu.models.registry import create_embedder

        rng = np.random.default_rng(1)
        u8 = rng.integers(0, 256, (3, 224, 224, 3), dtype=np.uint8)
        base = dict(model="resnet50", dtype="float32", norm_dtype="float32",
                    batch_size=4)
        e_fast = create_embedder(EmbedConfig(**base, s2d_stem=True))
        e_ref = create_embedder(EmbedConfig(**base, s2d_stem=False))
        np.testing.assert_allclose(e_fast.embed(u8), e_ref.embed(u8),
                                   rtol=1e-4, atol=1e-4)
