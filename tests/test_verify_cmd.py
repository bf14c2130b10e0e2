"""`imageclust verify` — the one-command weight-parity gate (VERDICT r2
item 7), exercised against the synthetic round-trip artifacts: a full
random-weight ResNet50 exported by our own ONNX writer stands in for the
real resnet50-v1-7.onnx (absent from this mirror)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(scope="module")
def rn50_onnx(tmp_path_factory):
    from imageclust_tpu.models.onnx_export import export_resnet50_onnx
    from imageclust_tpu.models.resnet50 import ResNet50V1

    model = ResNet50V1(dtype=jnp.float32, norm_dtype=jnp.float32)
    variables = model.init(
        jax.random.PRNGKey(7), jnp.zeros((1, 3, 224, 224), jnp.float32))
    path = str(tmp_path_factory.mktemp("verify") / "rn50.onnx")
    export_resnet50_onnx(variables, path)
    return path


class TestVerifyOnnx:
    def test_roundtrip_passes(self, rn50_onnx):
        from imageclust_tpu.verify import COSINE_GATE, verify_onnx

        report = verify_onnx(rn50_onnx, sample=6)
        assert report["ok"] is True
        assert report["checks"]["ingest"] == "ok"
        assert report["checks"]["cosine_min"] > COSINE_GATE
        assert report["checks"]["assignments_equal"] is True

    def test_real_images_fixture(self, rn50_onnx, tmp_path, rng):
        import cv2

        d = tmp_path / "imgs"
        d.mkdir()
        for i in range(4):
            img = rng.integers(0, 255, (64, 80, 3), np.uint8)
            cv2.imwrite(str(d / f"im{i}.png"), img)
        from imageclust_tpu.verify import verify_onnx

        report = verify_onnx(rn50_onnx, images_dir=str(d), sample=4)
        assert report["ok"] is True

    def test_int8_leg(self, rn50_onnx):
        """--quantize int8 extends the gate with the int8-vs-default
        cosine on the same ingested weights (the quality sign-off the
        int8 docs defer to weight holders)."""
        from imageclust_tpu.verify import INT8_GATE, verify_onnx

        report = verify_onnx(rn50_onnx, sample=4, quantize="int8")
        assert report["checks"]["int8_cosine_min"] > INT8_GATE
        assert report["checks"]["int8_ok"] is True
        assert report["ok"] is True

    def test_garbage_file_fails_structurally(self, tmp_path, capsys):
        from imageclust_tpu.cli import main

        bad = tmp_path / "bad.onnx"
        bad.write_bytes(b"not an onnx file")
        rc = main(["verify", "--onnx", str(bad)])
        assert rc == 2
        out = capsys.readouterr().out
        assert "FAIL (structural)" in out

    def test_cli_pass_verdict(self, rn50_onnx, capsys):
        from imageclust_tpu.cli import main

        rc = main(["verify", "--onnx", rn50_onnx, "--sample", "4"])
        out = capsys.readouterr().out
        assert rc == 0
        assert "VERDICT: PASS" in out

    def test_nothing_requested_is_an_error(self, capsys):
        from imageclust_tpu.cli import main

        rc = main(["verify"])
        assert rc == 2
        assert "nothing to verify" in capsys.readouterr().out


class TestVerifyClip:
    """The CLIP gate must never certify weights that were not ingested
    (review finding: a missing or unrecognized checkpoint used to PASS on
    random init because the builder skips loading silently)."""

    def test_missing_checkpoint_raises(self):
        from imageclust_tpu.verify import verify_clip

        with pytest.raises(ValueError, match="not found"):
            verify_clip("/nonexistent/clip.pt")

    def test_unloadable_extension_fails_gate(self, tmp_path):
        from imageclust_tpu.verify import verify_clip

        p = tmp_path / "clip.ckpt"  # exists, but not a loadable extension
        p.write_bytes(b"\x00" * 16)
        report = verify_clip(str(p))
        assert report["checks"]["ingested"] is False
        assert report["ok"] is False


class TestVerifyClipText:
    def _npz(self, tmp_path):
        """Synthesize an HF-layout CLIPTextModel npz from a toy tower (the
        same inverse-mapping trick as the loader round-trip in
        test_text.py)."""
        import numpy as np

        from imageclust_tpu.models.text import TextConfig, TextEncoder

        cfg = TextConfig(vocab=96, width=64, depth=2, heads=1, proj_dim=12,
                         context=10, eot_id=2)
        src = TextEncoder(cfg)
        params = src.variables["params"]
        sd = {}
        sd["text_model.embeddings.token_embedding.weight"] = np.asarray(
            params["token_embed"]["embedding"])
        sd["text_model.embeddings.position_embedding.weight"] = np.asarray(
            params["pos_embed"])[0]
        for i in range(cfg.depth):
            blk = params[f"block{i}"]
            hf = f"text_model.encoder.layers.{i}"
            for ours, theirs in (("ln1", "layer_norm1"),
                                 ("ln2", "layer_norm2")):
                sd[f"{hf}.{theirs}.weight"] = np.asarray(blk[ours]["scale"])
                sd[f"{hf}.{theirs}.bias"] = np.asarray(blk[ours]["bias"])
            for ours, theirs in (
                ("q", "self_attn.q_proj"), ("k", "self_attn.k_proj"),
                ("v", "self_attn.v_proj"), ("proj", "self_attn.out_proj"),
                ("mlp_up", "mlp.fc1"), ("mlp_down", "mlp.fc2"),
            ):
                sd[f"{hf}.{theirs}.weight"] = np.asarray(blk[ours]["kernel"]).T
                sd[f"{hf}.{theirs}.bias"] = np.asarray(blk[ours]["bias"])
        sd["text_model.final_layer_norm.weight"] = np.asarray(
            params["ln_final"]["scale"])
        sd["text_model.final_layer_norm.bias"] = np.asarray(
            params["ln_final"]["bias"])
        sd["text_projection.weight"] = np.asarray(
            params["projection"]["kernel"]).T
        path = str(tmp_path / "clip_text.npz")
        np.savez(path, **sd)
        return path

    def test_roundtrip_passes(self, tmp_path):
        from imageclust_tpu.verify import verify_clip_text

        report = verify_clip_text(self._npz(tmp_path))
        assert report["ok"], report
        assert report["checks"]["ingested"]
        assert report["checks"]["text_dim"] == 12
        assert report["checks"]["distinct"]

    def test_missing_checkpoint_raises(self):
        import pytest

        from imageclust_tpu.verify import verify_clip_text

        with pytest.raises(ValueError, match="not found"):
            verify_clip_text("/nonexistent/clip_text.pt")

    def test_cli_flag(self, tmp_path, capsys):
        from imageclust_tpu import cli

        rc = cli.main(["verify", "--clip-text", self._npz(tmp_path)])
        out = capsys.readouterr().out
        assert rc == 0 and "VERDICT: PASS" in out
