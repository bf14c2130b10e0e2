"""Config system tests — the live replacement for the reference's dead
internal/config (SURVEY.md §5 config/flag system)."""

import dataclasses

from imageclust_tpu.config import AppConfig, load_config


class TestDefaults:
    def test_reference_parity_defaults(self):
        cfg = AppConfig()
        assert (cfg.cluster.min_size, cfg.cluster.max_size) == (3, 6)
        assert cfg.service.port == 8080
        assert cfg.service.max_upload_bytes == 32 << 20
        assert cfg.labels.region == "us-east-1"
        assert cfg.naming.bedrock_region == "us-west-2"
        assert cfg.labels.max_labels == 10
        assert cfg.labels.min_confidence == 75.0
        assert cfg.naming.retries == 3
        # (preprocessing numerics are per-model EmbedderSpec values — see
        # tests/test_preprocess.py — not free config)
        assert cfg.preprocess.decode_workers >= 1


class TestOverrides:
    def test_yaml(self, tmp_path):
        p = tmp_path / "c.yaml"
        p.write_text(
            "cluster:\n  min_size: 2\n  max_size: 9\n"
            "embed:\n  model: vit_b32\n"
            "naming:\n  services: [fake, gpt-4]\n"
        )
        cfg = load_config(str(p), environ={})
        assert cfg.cluster.min_size == 2
        assert cfg.cluster.max_size == 9
        assert cfg.embed.model == "vit_b32"
        assert cfg.naming.services == ("fake", "gpt-4")
        # untouched sections keep defaults
        assert cfg.service.port == 8080

    def test_env_overrides_yaml(self, tmp_path):
        p = tmp_path / "c.yaml"
        p.write_text("service:\n  port: 9000\n")
        cfg = load_config(
            str(p),
            environ={
                "IMAGECLUST_SERVICE_PORT": "7777",
                "IMAGECLUST_CLUSTER_UPDATE_RULE": "lance_williams",
                "IMAGECLUST_LABELS_CACHE": "false",
                "IMAGECLUST_NAMING_SERVICES": "fake,claude_haiku",
            },
        )
        assert cfg.service.port == 7777
        assert cfg.cluster.update_rule == "lance_williams"
        assert cfg.labels.cache is False
        assert cfg.naming.services == ("fake", "claude_haiku")

    def test_explicit_overrides_win(self):
        cfg = load_config(
            None,
            overrides={"cluster": {"min_size": 4}},
            environ={"IMAGECLUST_CLUSTER_MIN_SIZE": "2"},
        )
        assert cfg.cluster.min_size == 4

    def test_replace_immutability(self):
        cfg = AppConfig()
        cfg2 = cfg.replace(
            cluster=dataclasses.replace(cfg.cluster, min_size=5)
        )
        assert cfg.cluster.min_size == 3
        assert cfg2.cluster.min_size == 5
