"""Fine-tuning driver tests (tiny model variant on CPU)."""

import os

import numpy as np
import pytest

from imageclust_tpu.models.finetune import finetune_resnet50, load_labeled_dir

from helpers import encode_png


@pytest.fixture()
def labeled_dir(rng, tmp_path):
    root = tmp_path / "data"
    for label, base in [("red", (0, 0, 220)), ("green", (0, 220, 0))]:
        d = root / label
        d.mkdir(parents=True)
        for i in range(6):
            img = np.full((40, 40, 3), base, np.uint8)
            img += rng.integers(0, 30, img.shape).astype(np.uint8)
            (d / f"{i}.png").write_bytes(encode_png(img))
    return str(root)


class TestLoadLabeledDir:
    def test_shapes_and_classes(self, labeled_dir):
        images, labels, classes = load_labeled_dir(labeled_dir, size=32)
        assert images.shape == (12, 32, 32, 3)
        assert classes == ["green", "red"]
        assert (labels == 0).sum() == 6 and (labels == 1).sum() == 6

    def test_empty_raises(self, tmp_path):
        with pytest.raises(ValueError, match="no class"):
            load_labeled_dir(str(tmp_path))


class TestFinetune:
    def test_end_to_end_and_reload(self, labeled_dir, tmp_path):
        from imageclust_tpu.config import EmbedConfig
        from imageclust_tpu.utils.checkpoint import restore_variables

        out = str(tmp_path / "ckpt")
        variables, classes, loss = finetune_resnet50(
            labeled_dir, out, epochs=2, batch_size=4, learning_rate=1e-2,
            stage_layers=(1, 1, 1, 1), input_size=32,
        )
        assert classes == ["green", "red"]
        assert np.isfinite(loss)
        assert os.path.isdir(out)

        # checkpoint restores into the same structure
        import jax

        template = jax.device_get(variables)
        back = restore_variables(out, template)
        np.testing.assert_allclose(
            np.asarray(back["params"]["conv0"]["kernel"]),
            np.asarray(variables["params"]["conv0"]["kernel"]),
        )

    def test_onnx_export_side_output(self, labeled_dir, tmp_path):
        import cv2

        onnx_out = str(tmp_path / "tuned.onnx")
        finetune_resnet50(
            labeled_dir, str(tmp_path / "ck"), epochs=1, batch_size=4,
            stage_layers=(1, 1, 1, 1), input_size=32, onnx_out=onnx_out,
        )
        net = cv2.dnn.readNetFromONNX(onnx_out)
        net.setInput(np.zeros((1, 3, 32, 32), np.float32))
        out = net.forward("resnetv17_dense0_fwd")
        assert out.shape == (1, 2)


class TestResume:
    def test_resumes_from_saved_epoch(self, labeled_dir, tmp_path, caplog):
        import logging

        out = str(tmp_path / "ck")
        # run 1 epoch, state saved with epoch=1
        finetune_resnet50(labeled_dir, out, epochs=1, batch_size=4,
                          stage_layers=(1, 1, 1, 1), input_size=32)
        assert os.path.isdir(out + "_state")
        # asking for 3 epochs resumes at 1 (runs 2 more, not 3)
        with caplog.at_level(logging.INFO):
            _, _, loss = finetune_resnet50(
                labeled_dir, out, epochs=3, batch_size=4,
                stage_layers=(1, 1, 1, 1), input_size=32,
            )
        assert "resuming fine-tune from epoch 1" in caplog.text
        assert np.isfinite(loss)

    def test_resume_disabled_starts_fresh(self, labeled_dir, tmp_path, caplog):
        import logging

        out = str(tmp_path / "ck2")
        finetune_resnet50(labeled_dir, out, epochs=1, batch_size=4,
                          stage_layers=(1, 1, 1, 1), input_size=32)
        with caplog.at_level(logging.INFO):
            finetune_resnet50(labeled_dir, out, epochs=1, batch_size=4,
                              stage_layers=(1, 1, 1, 1), input_size=32,
                              resume=False)
        assert "resuming" not in caplog.text
