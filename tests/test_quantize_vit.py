"""int8 PTQ of the ViT towers (models/quantize_vit.py).

Same structural guard as the resnet50 path (tests/test_quantize.py): no
pretrained weights exist in this image, so the quantized encoder must track
the f32 flax tower closely on random-init weights, and the shared
calibration forward must itself match the flax model — a forward-mirror bug
(wrong residual, pooling, or norm) would break that equality, not just the
cosine."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from imageclust_tpu.config import EmbedConfig
from imageclust_tpu.models.quantize_vit import quantize_vit, vit_quant_apply
from imageclust_tpu.models.vit import ViTConfig, VisionTransformer

SMALL = ViTConfig(patch=8, width=64, depth=3, heads=2, proj_dim=16,
                  image_size=32)
SMALL_SIGLIP = ViTConfig(patch=8, width=64, depth=2, heads=2, proj_dim=16,
                         image_size=32, use_class_token=False,
                         quick_gelu=False,
                         mean=(0.5, 0.5, 0.5), std=(0.5, 0.5, 0.5))


@pytest.fixture(scope="module", params=[SMALL, SMALL_SIGLIP],
                ids=["clip", "siglip"])
def tower(request):
    cfg = request.param
    model = VisionTransformer(cfg, dtype=jnp.float32, norm_dtype=jnp.float32)
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 3, cfg.image_size, cfg.image_size), jnp.float32))
    rng = np.random.default_rng(0)
    s = cfg.image_size
    calib = rng.normal(size=(4, s, s, 3)).astype(np.float32)
    test = rng.normal(size=(6, s, s, 3)).astype(np.float32)
    return cfg, model, variables, calib, test


def _cosine(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    num = (a * b).sum(axis=1)
    den = np.linalg.norm(a, axis=1) * np.linalg.norm(b, axis=1)
    return num / np.maximum(den, 1e-12)


class TestQuantizeViT:
    def test_calibration_forward_matches_flax(self, tower):
        """quant=False path == the flax model: proves the hand-written
        forward mirrors VisionTransformer exactly (residuals, pooling,
        LayerNorm numerics) before quantization enters the picture."""
        from imageclust_tpu.models.quantize_vit import _calib_forward

        cfg, model, variables, calib, test = tower
        want = np.asarray(model.apply(variables, jnp.asarray(test)))
        got, stats = jax.jit(_calib_forward, static_argnames=("cfg",))(
            variables["params"], jnp.asarray(test), cfg)
        np.testing.assert_allclose(np.asarray(got), want,
                                   rtol=2e-4, atol=2e-5)
        assert len(stats) == 4 * cfg.depth  # attn_in/out, mlp_in/mid

    def test_qparams_structure(self, tower):
        cfg, _, variables, calib, _ = tower
        q = quantize_vit(variables, cfg, calib)
        blk = q["block0"]
        for name in ("q", "k", "v", "proj", "mlp_up", "mlp_down"):
            assert blk[name]["kernel_q"].dtype == jnp.int8
            assert blk[name]["w_scale"].shape == (
                blk[name]["kernel_q"].shape[1],)
        # q/k/v share the LayerNorm-output scale
        assert blk["q"]["act_scale"] == blk["k"]["act_scale"]
        assert ("class_token" in q) == cfg.use_class_token

    def test_matches_f32_tower(self, tower):
        cfg, model, variables, calib, test = tower
        q = quantize_vit(variables, cfg, calib)
        want = np.asarray(model.apply(variables, jnp.asarray(test)))
        got = np.asarray(jax.jit(
            vit_quant_apply, static_argnames=("cfg", "act_dtype"))(
                q, jnp.asarray(test), cfg, act_dtype=jnp.float32))
        cos = _cosine(got, want)
        assert cos.min() > 0.995, cos

    def test_quant_differs_from_f32(self, tower):
        """int8 must actually be engaged (a silent f32 fallback would pass
        the cosine gate)."""
        cfg, model, variables, calib, test = tower
        q = quantize_vit(variables, cfg, calib)
        want = np.asarray(model.apply(variables, jnp.asarray(test)))
        got = np.asarray(vit_quant_apply(
            q, jnp.asarray(test), cfg, act_dtype=jnp.float32))
        assert not np.allclose(got, want, rtol=1e-7, atol=1e-9)

    def test_p999_differs_from_absmax(self, tower):
        cfg, _, variables, calib, _ = tower
        qa = quantize_vit(variables, cfg, calib, calib_method="absmax")
        qp = quantize_vit(variables, cfg, calib, calib_method="p999")
        assert float(qp["block0"]["q"]["act_scale"]) < float(
            qa["block0"]["q"]["act_scale"])
        with pytest.raises(ValueError, match="calib_method"):
            quantize_vit(variables, cfg, calib, calib_method="minmax")

    def test_nchw_input_accepted(self, tower):
        cfg, _, variables, calib, test = tower
        q = quantize_vit(variables, cfg, calib)
        nhwc = np.asarray(vit_quant_apply(
            q, jnp.asarray(test), cfg, act_dtype=jnp.float32))
        nchw = np.asarray(vit_quant_apply(
            q, jnp.asarray(test.transpose(0, 3, 1, 2)), cfg,
            act_dtype=jnp.float32))
        np.testing.assert_allclose(nchw, nhwc, rtol=1e-5, atol=1e-6)


class TestRegistryIntegration:
    def test_create_embedder_vit_int8(self):
        from imageclust_tpu.models.registry import create_embedder

        emb = create_embedder(EmbedConfig(
            model="vit_b32", quantize="int8", batch_size=4, onnx_path=""))
        assert ":int8-absmax:" in emb.tag
        imgs = np.random.default_rng(1).integers(
            0, 255, (4, 224, 224, 3), np.uint8)
        out = emb.embed(imgs)
        assert out.shape == (4, 512)
        assert np.isfinite(out).all()

    def test_int8_embedder_on_dp_mesh(self, mesh8):
        """int8 qparams (int8 leaves in the variables pytree) must survive
        the DP-sharded embed executor — the one composition the single-
        device tests don't cover."""
        from imageclust_tpu.models.registry import create_embedder

        emb = create_embedder(
            EmbedConfig(model="vit_b32", quantize="int8", batch_size=8,
                        onnx_path=""),
            mesh=mesh8)
        imgs = np.random.default_rng(2).integers(
            0, 255, (8, 224, 224, 3), np.uint8)
        out = emb.embed(imgs)
        assert out.shape == (8, 512) and np.isfinite(out).all()
