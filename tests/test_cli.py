"""CLI surface tests (argument plumbing; the full run path is covered by
pipeline/service tests and the end-to-end verify flow)."""

import json

import numpy as np
import pytest

from imageclust_tpu.cli import main

from helpers import encode_png


class TestCli:
    def test_models_lists_registry(self, capsys):
        assert main(["models"]) == 0
        out = capsys.readouterr().out
        assert "resnet50" in out and "vit_b32" in out

    def test_run_requires_directory(self, capsys):
        assert main(["run", "--images", "/nonexistent"]) == 2
        assert "not a directory" in capsys.readouterr().err

    def test_run_empty_dir(self, tmp_path, capsys):
        assert main(["run", "--images", str(tmp_path)]) == 2
        assert "no images" in capsys.readouterr().err

    def test_bank_no_labels(self, tmp_path, capsys):
        # label bank on a dir without subdirectories errors cleanly; uses a
        # tiny vit to avoid a resnet init on CPU
        rc = main(["bank", "--images", str(tmp_path),
                   "--out", str(tmp_path / "b.npz"), "--model", "vit_b32"])
        assert rc == 2

    def test_config_overrides_plumbed(self, rng, tmp_path, capsys,
                                      monkeypatch):
        # run end-to-end with the mean-color-fast config knobs via env
        monkeypatch.setenv("IMAGECLUST_EMBED_MODEL", "resnet50")
        from imageclust_tpu import cli

        captured = {}

        def fake_run(self, uploads, work_dir, min_size=None, max_size=None,
                     profile_dir=None):
            captured["sizes"] = (min_size, max_size)
            captured["n"] = len(uploads)

            class R:
                html_path = work_dir + "/clusters.html"

                def to_dict(self):
                    return {"clusters": {}, "dropped": [], "metrics": {}}

            return R()

        class FakePipeline:
            def __init__(self, config):
                captured["model"] = config.embed.model
                captured["labeler"] = config.labels.backend

            run = fake_run

        monkeypatch.setattr("imageclust_tpu.pipeline.Pipeline", FakePipeline)
        d = tmp_path / "imgs"
        d.mkdir()
        for i in range(4):
            (d / f"i{i}.png").write_bytes(
                encode_png(rng.integers(0, 256, (8, 8, 3), dtype=np.uint8))
            )
        rc = main(["run", "--images", str(d), "--min", "2", "--max", "4",
                   "--labeler", "fake", "--out", str(tmp_path / "w")])
        assert rc == 0
        assert captured["sizes"] == (2, 4)
        assert captured["n"] == 4
        assert captured["labeler"] == "fake"
        out = capsys.readouterr().out
        assert json.loads(out)["clusters"] == {}


class TestSetOverrides:
    def test_set_flags_reach_config(self, rng, tmp_path, monkeypatch):
        from helpers import encode_png

        captured = {}

        class FakePipeline:
            def __init__(self, config):
                captured["reassign"] = config.cluster.reassign_dropped
                captured["bucket"] = config.cluster.bucket_size
                captured["weight"] = config.labels.fusion_weight

            def run(self, uploads, work_dir, min_size=None, max_size=None,
                    profile_dir=None, image_route="/api/image/"):
                class R:
                    html_path = work_dir + "/clusters.html"

                    def to_dict(self):
                        return {"clusters": {}, "dropped": [], "metrics": {}}

                return R()

        monkeypatch.setattr("imageclust_tpu.pipeline.Pipeline", FakePipeline)
        d = tmp_path / "im"
        d.mkdir()
        (d / "a.png").write_bytes(
            encode_png(rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)))
        rc = main(["run", "--images", str(d), "--labeler", "fake",
                   "--set", "cluster.reassign_dropped=true",
                   "--set", "cluster.bucket_size=128",
                   "--set", "labels.fusion_weight=2.5",
                   "--out", str(tmp_path / "w")])
        assert rc == 0
        assert captured == {"reassign": True, "bucket": 128, "weight": 2.5}

    def test_malformed_set_rejected(self):
        with pytest.raises(SystemExit):
            main(["models", "--help"])  # sanity that SystemExit pattern works

        with pytest.raises(SystemExit, match="SECTION.FIELD"):
            main(["run", "--images", "/tmp", "--set", "nonsense"])
