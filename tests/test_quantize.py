"""int8 post-training quantization of the ResNet50 tower (models/quantize.py).

No pretrained weights exist in this environment (the reference mirror strips
resnet50-v1-7.onnx), so the quality guard is structural: the quantized tower
must track the f32 tower closely on random-init weights — per-channel int8
with calibrated activation scales should be within ~1% relative feature
error, far inside what would perturb Ward cluster assignments of distinct
images.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from imageclust_tpu.config import EmbedConfig
from imageclust_tpu.models.quantize import quant_apply, quantize_resnet50
from imageclust_tpu.models.resnet50 import ResNet50V1, fold_bn_variables


@pytest.fixture(scope="module")
def small_tower():
    """Random-init tower at a reduced input size (the architecture is fully
    convolutional; 64x64 keeps CPU tests fast)."""
    model = ResNet50V1(num_classes=32, dtype=jnp.float32,
                       norm_dtype=jnp.float32)
    rng = np.random.default_rng(0)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 3, 64, 64), jnp.float32))
    calib = rng.random((4, 64, 64, 3), np.float32)
    test = rng.random((6, 64, 64, 3), np.float32)
    return model, variables, calib, test


def _cosine(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    num = (a * b).sum(axis=1)
    den = np.linalg.norm(a, axis=1) * np.linalg.norm(b, axis=1)
    return num / np.maximum(den, 1e-12)


class TestQuantizeResNet50:
    def test_qparams_structure(self, small_tower):
        _, variables, calib, _ = small_tower
        q = quantize_resnet50(variables, calib)
        blk = q["stage1_block0"]["conv1"]
        assert blk["kernel_q"].dtype == jnp.int8
        assert blk["w_scale"].shape == (64,)
        assert blk["act_scale"].shape == ()
        # stem and head stay full precision
        assert q["conv0"]["kernel"].dtype == jnp.float32
        assert q["dense0"]["kernel"].dtype == jnp.float32

    def test_matches_f32_tower(self, small_tower):
        model, variables, calib, test = small_tower
        q = quantize_resnet50(variables, calib)
        logits_q, pooled_q = jax.jit(quant_apply)(q, jnp.asarray(test))
        logits_f, pooled_f = model.apply(variables, jnp.asarray(test),
                                         return_features=True)
        cos_p = _cosine(pooled_q, pooled_f)
        cos_l = _cosine(logits_q, logits_f)
        assert cos_p.min() > 0.995, cos_p
        assert cos_l.min() > 0.99, cos_l

    def test_p999_calibration(self, small_tower):
        model, variables, calib, test = small_tower
        q = quantize_resnet50(variables, calib, calib_method="p999")
        _, pooled_q = jax.jit(quant_apply)(q, jnp.asarray(test))
        _, pooled_f = model.apply(variables, jnp.asarray(test),
                                  return_features=True)
        assert _cosine(pooled_q, pooled_f).min() > 0.99
        # p999 scales are <= absmax scales (strictly, with any spread)
        qa = quantize_resnet50(variables, calib, calib_method="absmax")
        blk = "stage2_block0"
        assert float(q[blk]["conv1"]["act_scale"]) <= float(
            qa[blk]["conv1"]["act_scale"])
        with pytest.raises(ValueError, match="calib_method"):
            quantize_resnet50(variables, calib, calib_method="kl")

    def test_quant_differs_from_f32(self, small_tower):
        # the path genuinely quantizes (not silently full precision)
        model, variables, calib, test = small_tower
        q = quantize_resnet50(variables, calib)
        _, pooled_q = jax.jit(quant_apply)(q, jnp.asarray(test))
        _, pooled_f = model.apply(variables, jnp.asarray(test),
                                  return_features=True)
        assert not np.allclose(np.asarray(pooled_q), np.asarray(pooled_f))

    def test_folded_f32_calibration_path_is_exact(self, small_tower):
        # the calibration forward (quant=False) must equal the folded model
        from imageclust_tpu.models.quantize import _calib_forward

        model, variables, calib, test = small_tower
        folded = fold_bn_variables(variables)
        logits_c, pooled_c, stats = _calib_forward(
            folded["params"], jnp.asarray(test))
        fm = ResNet50V1(num_classes=32, dtype=jnp.float32,
                        norm_dtype=jnp.float32, fold_bn=True)
        logits_f, pooled_f = fm.apply(folded, jnp.asarray(test),
                                      return_features=True)
        np.testing.assert_allclose(np.asarray(pooled_c), np.asarray(pooled_f),
                                   rtol=1e-4, atol=1e-4)
        assert len(stats) == 16 * 3 + 4  # 16 blocks x 3 convs + 4 projections

    def test_s2d_raw_stem_matches_normalized_path(self, small_tower):
        # raw BGR uint8 through the fused s2d stem == normalized float path
        # (exact up to f32 reduction order)
        model, variables, calib, _ = small_tower
        q = quantize_resnet50(variables, calib)
        rng = np.random.default_rng(3)
        u8 = rng.integers(0, 256, (4, 64, 64, 3), np.uint8)
        normed = u8.astype(np.float32)[..., ::-1] / 255.0  # BGR->RGB
        _, p_raw = jax.jit(lambda q, x: quant_apply(q, x, act_dtype=jnp.float32))(
            q, jnp.asarray(u8))
        _, p_f = jax.jit(lambda q, x: quant_apply(q, x, act_dtype=jnp.float32))(
            q, jnp.asarray(normed))
        np.testing.assert_allclose(np.asarray(p_raw), np.asarray(p_f),
                                   rtol=2e-3, atol=2e-3)

    def test_nchw_input_accepted(self, small_tower):
        model, variables, calib, test = small_tower
        q = quantize_resnet50(variables, calib)
        _, p_nhwc = jax.jit(quant_apply)(q, jnp.asarray(test))
        _, p_nchw = jax.jit(quant_apply)(
            q, jnp.asarray(test.transpose(0, 3, 1, 2)))
        np.testing.assert_allclose(np.asarray(p_nhwc), np.asarray(p_nchw),
                                   rtol=1e-5, atol=1e-5)


class TestRegistryIntegration:
    def test_create_embedder_int8(self):
        from imageclust_tpu.models.registry import create_embedder

        emb = create_embedder(EmbedConfig(
            model="resnet50", quantize="int8", batch_size=4,
            output="pooled", onnx_path=""))
        assert ":int8-absmax:" in emb.tag  # mode AND calib statistic
        imgs = np.random.default_rng(1).integers(
            0, 255, (4, 224, 224, 3), np.uint8)
        out = emb.embed(imgs)
        assert out.shape == (4, 2048)
        assert np.isfinite(out).all()

    def test_unknown_mode_rejected(self):
        from imageclust_tpu.models.registry import create_embedder

        with pytest.raises(ValueError, match="quantize"):
            create_embedder(EmbedConfig(model="resnet50", quantize="fp4"))
