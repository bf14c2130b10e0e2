"""Labeling subsystem tests (SURVEY.md §4 items 4 and 7)."""

import numpy as np
import pytest

from imageclust_tpu.config import LabelConfig
from imageclust_tpu.labels.base import CachedLabeler, Label, create_labeler
from imageclust_tpu.labels.fake import FakeLabeler, NullLabeler
from imageclust_tpu.labels.onehot import (
    build_label_set,
    combine_embeddings,
    label_vector,
    one_hot_matrix,
)


class TestOneHot:
    def test_build_label_set_first_seen_order(self):
        labels = [
            [Label("Dog", 99), Label("Animal", 95)],
            [Label("Cat", 98), Label("Animal", 94)],
            [Label("Dog", 97)],
        ]
        ls = build_label_set(labels)
        assert ls == {"Dog": 0, "Animal": 1, "Cat": 2}

    def test_label_vector(self):
        ls = {"A": 0, "B": 1, "C": 2}
        v = label_vector(["B", "Unknown"], ls)
        np.testing.assert_array_equal(v, [0.0, 1.0, 0.0])

    def test_one_hot_matrix_matches_vectors(self):
        labels = [[Label("A", 90)], [Label("B", 90), Label("A", 80)], []]
        ls = build_label_set(labels)
        m = one_hot_matrix(labels, ls)
        for i, ll in enumerate(labels):
            np.testing.assert_array_equal(
                m[i], label_vector([l.name for l in ll], ls)
            )

    def test_combine_concat(self):
        emb = np.arange(6, dtype=np.float32).reshape(2, 3)
        lab = np.array([[1, 0], [0, 1]], np.float32)
        out = combine_embeddings(emb, lab)
        assert out.shape == (2, 5)
        np.testing.assert_array_equal(out[:, :3], emb)
        np.testing.assert_array_equal(out[:, 3:], lab)

    def test_combine_empty_labels(self):
        emb = np.ones((2, 3), np.float32)
        out = combine_embeddings(emb, np.zeros((2, 0), np.float32))
        assert out.shape == (2, 3)


class TestCache:
    def test_cache_hit_and_content_addressing(self, tmp_path):
        class Counting:
            calls = 0

            def detect_labels(self, b, m, c):
                Counting.calls += 1
                return [Label("X", 90.0)]

        cached = CachedLabeler(Counting(), str(tmp_path))
        img = b"fake-image-bytes"
        first = cached.detect_labels(img, 10, 75.0)
        # second call with DIFFERENT params still hits the cache — preserving
        # the reference quirk (rekognition.go:90-97)
        second = cached.detect_labels(img, 10, 80.0)
        assert first == second == [Label("X", 90.0)]
        assert Counting.calls == 1
        assert cached.hits == 1 and cached.misses == 1
        # different bytes -> different key (content-addressed, unlike the
        # reference's filename keys)
        cached.detect_labels(b"other-bytes", 10, 75.0)
        assert Counting.calls == 2

    def test_corrupt_cache_refetches(self, tmp_path):
        class Inner:
            def detect_labels(self, b, m, c):
                return [Label("Y", 80.0)]

        cached = CachedLabeler(Inner(), str(tmp_path))
        img = b"img"
        cached.detect_labels(img, 10, 75.0)
        path = cached._cache_path(img)
        with open(path, "w") as fh:
            fh.write("{not json")
        assert cached.detect_labels(img, 10, 75.0) == [Label("Y", 80.0)]


class TestBackends:
    def test_fake_deterministic_and_sorted(self):
        f = FakeLabeler()
        a = f.detect_labels(b"abc", 10, 50.0)
        b = f.detect_labels(b"abc", 10, 50.0)
        assert a == b and len(a) > 0
        confs = [l.confidence for l in a]
        assert confs == sorted(confs, reverse=True)

    def test_fake_respects_confidence_floor(self):
        f = FakeLabeler()
        for l in f.detect_labels(b"xyz", 10, 95.0):
            assert l.confidence >= 95.0

    def test_null(self):
        assert NullLabeler().detect_labels(b"x", 10, 0.0) == []

    def test_create_labeler_dispatch(self, tmp_path):
        assert isinstance(create_labeler(LabelConfig(backend="none")), NullLabeler)
        lab = create_labeler(LabelConfig(backend="fake"), str(tmp_path))
        assert isinstance(lab, CachedLabeler)
        with pytest.raises(ValueError):
            create_labeler(LabelConfig(backend="wat"))


class TestPayloadShrink:
    def test_small_passthrough(self):
        from imageclust_tpu.labels.rekognition import shrink_to_payload_limit

        data = b"tiny"
        assert shrink_to_payload_limit(data, 100) is data

    def test_downscale_large(self, rng):
        import cv2

        from imageclust_tpu.labels.rekognition import shrink_to_payload_limit

        # a noisy PNG compresses badly -> exceeds a small limit
        img = rng.integers(0, 256, size=(3000, 2500, 3), dtype=np.uint8)
        ok, enc = cv2.imencode(".png", img)
        assert ok
        raw = enc.tobytes()
        limit = len(raw) // 8
        out = shrink_to_payload_limit(raw, limit)
        assert len(out) < len(raw)
        # decoded result has max dimension <= 2048 (rekognition.go:201)
        dec = cv2.imdecode(np.frombuffer(out, np.uint8), cv2.IMREAD_COLOR)
        assert max(dec.shape[:2]) <= 2048


class TestSigV4:
    def test_known_signature_shape(self, monkeypatch):
        import datetime

        from imageclust_tpu.utils.aws import AwsCredentials, sign_request

        creds = AwsCredentials("AKIDEXAMPLE", "secret")
        now = datetime.datetime(2026, 1, 2, 3, 4, 5,
                                tzinfo=datetime.timezone.utc)
        signed = sign_request(
            "POST", "https://rekognition.us-east-1.amazonaws.com/",
            "us-east-1", "rekognition",
            {"Content-Type": "application/x-amz-json-1.1"},
            b"{}", creds, now=now,
        )
        auth = signed["Authorization"]
        assert auth.startswith("AWS4-HMAC-SHA256 Credential=AKIDEXAMPLE/"
                               "20260102/us-east-1/rekognition/aws4_request")
        assert "SignedHeaders=content-type;host;x-amz-date" in auth
        assert signed["X-Amz-Date"] == "20260102T030405Z"
        # deterministic: same inputs -> same signature
        again = sign_request(
            "POST", "https://rekognition.us-east-1.amazonaws.com/",
            "us-east-1", "rekognition",
            {"Content-Type": "application/x-amz-json-1.1"},
            b"{}", creds, now=now,
        )
        assert again["Authorization"] == auth

    def test_missing_creds_raises(self, monkeypatch):
        from imageclust_tpu.utils.aws import AwsCredentials, AwsError

        monkeypatch.delenv("AWS_ACCESS_KEY_ID", raising=False)
        monkeypatch.delenv("AWS_SECRET_ACCESS_KEY", raising=False)
        with pytest.raises(AwsError, match="credentials not found"):
            AwsCredentials.from_env()


class TestAwsTransport:
    def test_post_json_signs_and_parses(self, monkeypatch):
        import requests

        from imageclust_tpu.utils.aws import AwsCredentials, AwsError, aws_post_json

        seen = {}

        class Resp:
            status_code = 200
            text = "{}"

            def json(self):
                return {"Labels": [{"Name": "X", "Confidence": 91.0}]}

        def fake_post(url, data=None, headers=None, timeout=None):
            seen["url"] = url
            seen["headers"] = headers
            seen["data"] = data
            return Resp()

        monkeypatch.setattr(requests, "post", fake_post)
        out = aws_post_json(
            "https://rekognition.us-east-1.amazonaws.com/",
            region="us-east-1", service="rekognition",
            payload={"MaxLabels": 3},
            target="RekognitionService.DetectLabels",
            creds=AwsCredentials("AK", "SK"),
        )
        assert out["Labels"][0]["Name"] == "X"
        h = seen["headers"]
        assert h["X-Amz-Target"] == "RekognitionService.DetectLabels"
        assert h["Authorization"].startswith("AWS4-HMAC-SHA256 Credential=AK/")
        assert "x-amz-target" in h["Authorization"]  # signed header list
        assert b"MaxLabels" in seen["data"]

    def test_post_json_raises_on_http_error(self, monkeypatch):
        import requests

        from imageclust_tpu.utils.aws import AwsCredentials, AwsError, aws_post_json

        class Resp:
            status_code = 403
            text = "AccessDenied"

            def json(self):
                return {}

        monkeypatch.setattr(requests, "post",
                            lambda *a, **k: Resp())
        with pytest.raises(AwsError, match="403"):
            aws_post_json("https://bedrock-runtime.us-west-2.amazonaws.com/x",
                          region="us-west-2", service="bedrock",
                          payload={}, creds=AwsCredentials("AK", "SK"))

    def test_rekognition_labeler_parses(self, monkeypatch):
        import requests

        from imageclust_tpu.labels.rekognition import RekognitionLabeler
        from imageclust_tpu.utils.aws import AwsCredentials

        class Resp:
            status_code = 200
            text = ""

            def json(self):
                return {"Labels": [
                    {"Name": "Shoe", "Confidence": 97.2},
                    {"Name": "Apparel", "Confidence": 88.0},
                ]}

        monkeypatch.setattr(requests, "post", lambda *a, **k: Resp())
        lab = RekognitionLabeler(creds=AwsCredentials("AK", "SK"))
        out = lab.detect_labels(b"imgbytes", 10, 75.0)
        assert [(l.name, l.confidence) for l in out] == [
            ("Shoe", 97.2), ("Apparel", 88.0)
        ]
