"""ONNX export + cross-runtime validation.

cv2.dnn is the exact runtime the reference drives through gocv
(embeddings.go:28-43), so running OUR weights through it and comparing
against the Flax forward pins every structural choice (conv stride placement,
padding, BN epsilon, pool semantics, gemm orientation) to the reference's.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from imageclust_tpu.models.onnx_export import export_resnet50_onnx
from imageclust_tpu.models.resnet50 import ResNet50V1, load_onnx_params


@pytest.fixture(scope="module")
def small_export(tmp_path_factory):
    model = ResNet50V1(dtype=jnp.float32, stage_layers=(1, 1, 1, 1),
                       num_classes=10)
    blob = jnp.asarray(
        np.random.default_rng(0).random((2, 3, 64, 64)).astype(np.float32)
    )
    variables = model.init(jax.random.PRNGKey(42), blob)
    path = str(tmp_path_factory.mktemp("onnx") / "rn_small.onnx")
    export_resnet50_onnx(variables, path, stage_layers=(1, 1, 1, 1),
                         input_size=64, num_classes=10)
    return model, variables, blob, path


class TestCrossRuntime:
    def test_matches_opencv_dnn(self, small_export):
        import cv2

        model, variables, blob, path = small_export
        net = cv2.dnn.readNetFromONNX(path)
        want = []
        for i in range(blob.shape[0]):
            net.setInput(np.asarray(blob[i:i + 1]))
            want.append(net.forward("resnetv17_dense0_fwd"))
        want = np.concatenate(want)
        got = np.asarray(model.apply(variables, blob))
        err = np.abs(got - want).max() / (np.abs(want).max() + 1e-9)
        assert err < 1e-4, f"flax vs cv2.dnn rel err {err}"

    def test_intermediate_layer_names(self, small_export):
        # the reference reads layer "resnetv17_dense0_fwd" by name
        # (embeddings.go:140); our export must expose the same graph names
        import cv2

        _, _, blob, path = small_export
        net = cv2.dnn.readNetFromONNX(path)
        names = net.getLayerNames()
        assert any("resnetv17_dense0" in n for n in names)
        assert any("resnetv17_stage1" in n for n in names)


class TestRoundTrip:
    def test_export_then_ingest_small(self, small_export, tmp_path):
        """Exported weights reload through the gluon-name converter with
        shape validation on the matching architecture."""
        model, variables, _, path = small_export
        loaded = load_onnx_params(path, dict(variables),
                                  stage_layers=(1, 1, 1, 1))
        k0 = np.asarray(loaded["params"]["conv0"]["kernel"])
        np.testing.assert_allclose(
            k0, np.asarray(variables["params"]["conv0"]["kernel"]), rtol=1e-6
        )
        out_orig = model.apply(variables, jnp.ones((1, 3, 64, 64)))
        out_loaded = model.apply(loaded, jnp.ones((1, 3, 64, 64)))
        np.testing.assert_allclose(np.asarray(out_orig),
                                   np.asarray(out_loaded), rtol=1e-6)

    def test_full_resnet50_name_cover(self, tmp_path):
        """Full 50-layer export produces exactly the initializer set the
        gluon converter expects — no missing, no extra."""
        from imageclust_tpu.models.onnx_io import read_onnx_initializers
        from imageclust_tpu.models.resnet50 import _gluon_name_map

        model = ResNet50V1(dtype=jnp.float32)
        variables = jax.eval_shape(
            lambda: model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 3, 224, 224), jnp.float32))
        )
        # materialize tiny: export needs concrete arrays
        variables = jax.tree.map(
            lambda s: jnp.zeros(s.shape, s.dtype), variables
        )
        path = str(tmp_path / "rn50.onnx")
        export_resnet50_onnx(variables, path)
        inits = set(read_onnx_initializers(path))
        assert inits == set(_gluon_name_map())


def test_varint_negative_terminates():
    """ADVICE r1: _varint(v<0) used to infinite-loop; protobuf negative int64
    is a 10-byte two's-complement varint."""
    from imageclust_tpu.models.onnx_io import _read_varint, _varint

    enc = _varint(-1)
    assert len(enc) == 10
    val, _ = _read_varint(enc, 0)
    assert val == (1 << 64) - 1  # two's complement of -1
