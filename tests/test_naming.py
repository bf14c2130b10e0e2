"""Naming subsystem tests (SURVEY.md §4 item 6) with faked transports."""

import json

import pytest

from imageclust_tpu.config import NamingConfig
from imageclust_tpu.naming.base import (
    FALLBACK_PHRASE,
    FALLBACK_TITLE,
    extract_title_phrase,
    truncate_and_sanitize,
)
from imageclust_tpu.naming.fake import FakeNamer
from imageclust_tpu.naming.registry import NamingService, create_naming_service


class TestSanitize:
    def test_parity_rules(self):
        # claude-haiku.go:153-169
        # '&' -> 'and' with no surrounding spaces, exactly like Go ReplaceAll
        assert truncate_and_sanitize('a"b\\c\nd\te#f&g\'h') == "abc d efandgh"

    def test_truncation(self):
        assert len(truncate_and_sanitize("x" * 2000, 1000)) == 1000

    def test_strip(self):
        assert truncate_and_sanitize("  hi  ") == "hi"


class TestExtract:
    def test_plain_json(self):
        assert extract_title_phrase(
            '{"title": "T", "catchy_phrase": "P"}'
        ) == ("T", "P")

    def test_nova_array_tolerance(self):
        # amazon-nova-micro.go:122-134 accepts string-or-array fields
        assert extract_title_phrase(
            '{"title": ["T1", "T2"], "catchy_phrase": ["P"]}'
        ) == ("T1", "P")

    def test_markdown_fenced(self):
        text = "```json\n{\"title\": \"T\", \"catchy_phrase\": \"P\"}\n```"
        assert extract_title_phrase(text) == ("T", "P")

    def test_missing_field_is_none(self):
        assert extract_title_phrase('{"title": "T"}') is None

    def test_garbage_is_none(self):
        assert extract_title_phrase("not json at all") is None


class _FlakyNamer:
    """Succeeds on the Nth call — exercises the retry loop."""

    name = "Flaky"
    order = 7

    def __init__(self, succeed_on: int):
        self.succeed_on = succeed_on
        self.calls = 0

    def generate(self, text, retries):
        for _ in range(retries):
            self.calls += 1
            if self.calls >= self.succeed_on:
                return "OK", "okay phrase"
        return FALLBACK_TITLE, FALLBACK_PHRASE


class _RaisingNamer:
    name = "Boom"
    order = 1

    def generate(self, text, retries):
        raise RuntimeError("backend exploded")


class TestRegistry:
    def test_multi_service_order(self):
        svc = NamingService([_FlakyNamer(1), FakeNamer()], retries=3)
        outs = svc.generate_multi("Shoes, Sandals")
        # sorted by order: FakeNamer(0) before Flaky(7)
        assert [o.service_name for o in outs] == ["Offline Namer", "Flaky"]

    def test_retry_until_success(self):
        flaky = _FlakyNamer(succeed_on=3)
        svc = NamingService([flaky], retries=3)
        (out,) = svc.generate_multi("x")
        assert out.title == "OK"
        assert flaky.calls == 3

    def test_exhausted_retries_fall_back(self):
        flaky = _FlakyNamer(succeed_on=99)
        svc = NamingService([flaky], retries=2)
        (out,) = svc.generate_multi("x")
        assert out.title == FALLBACK_TITLE
        assert out.catchy_phrase == FALLBACK_PHRASE

    def test_raising_backend_degrades(self):
        svc = NamingService([_RaisingNamer(), FakeNamer()], retries=1)
        outs = svc.generate_multi("Bags")
        assert len(outs) == 2
        by_name = {o.service_name: o for o in outs}
        assert by_name["Boom"].title == FALLBACK_TITLE
        assert by_name["Offline Namer"].title != FALLBACK_TITLE

    def test_single_service_lookup(self):
        svc = NamingService([FakeNamer()], retries=1)
        out = svc.generate("Hats, Caps", "Offline Namer")
        assert out.title
        missing = svc.generate("x", "Nope")
        assert missing.title == FALLBACK_TITLE

    def test_create_from_config(self):
        svc = create_naming_service(NamingConfig(services=("fake",)))
        assert len(svc.namers) == 1
        with pytest.raises(ValueError):
            create_naming_service(NamingConfig(services=("martian",)))


class TestFakeNamer:
    def test_limits(self):
        t, p = FakeNamer().generate("Clothing, Shoes, Accessories, Bags, Hats",
                                    retries=1)
        assert 0 < len(t) <= 25
        assert 0 < len(p) <= 100

    def test_empty_input(self):
        t, p = FakeNamer().generate("", retries=1)
        assert t and p


class TestBedrockParsing:
    def test_claude_payload_shape(self):
        from imageclust_tpu.naming.bedrock import ClaudeBedrockNamer

        n = ClaudeBedrockNamer(variant="haiku")
        payload = n._request_payload("hello")
        assert payload["anthropic_version"] == "bedrock-2023-05-31"
        assert payload["max_tokens"] == 100
        assert payload["temperature"] == 0.7
        assert payload["messages"][0]["role"] == "user"
        assert n.model_id == "anthropic.claude-3-haiku-20240307-v1:0"
        assert n.name == "Claude Haiku v3.5"

    def test_claude_response_extraction(self):
        from imageclust_tpu.naming.bedrock import ClaudeBedrockNamer

        n = ClaudeBedrockNamer(variant="sonnet")
        assert n.model_id == "anthropic.claude-3-sonnet-20240229-v1:0"
        resp = {"content": [{"text": json.dumps(
            {"title": "T", "catchy_phrase": "P"})}]}
        assert n._response_text(resp) == '{"title": "T", "catchy_phrase": "P"}'
        assert n._response_text({"content": []}) is None

    def test_nova_shapes(self):
        from imageclust_tpu.naming.bedrock import NovaBedrockNamer

        n = NovaBedrockNamer()
        assert n._request_payload("p") == {"inputText": "p"}
        assert n._response_text({"Results": [{"outputText": "out"}]}) == "out"
        assert n._response_text({}) is None

    def test_bedrock_fallback_without_creds(self, monkeypatch):
        from imageclust_tpu.naming.bedrock import ClaudeBedrockNamer

        monkeypatch.delenv("AWS_ACCESS_KEY_ID", raising=False)
        monkeypatch.delenv("AWS_SECRET_ACCESS_KEY", raising=False)
        n = ClaudeBedrockNamer(variant="haiku", retry_delay_s=0.0)
        assert n.generate("text", retries=2) == (FALLBACK_TITLE, FALLBACK_PHRASE)


class TestOpenAI:
    def test_fallback_without_key(self, monkeypatch):
        from imageclust_tpu.naming.openai_backend import OpenAINamer

        monkeypatch.delenv("OPENAI_API_KEY", raising=False)
        n = OpenAINamer(retry_delay_s=0.0)
        assert n.generate("text", 2) == (FALLBACK_TITLE, FALLBACK_PHRASE)

    def test_mocked_success_and_429(self, monkeypatch):
        import requests

        from imageclust_tpu.naming.openai_backend import OpenAINamer

        monkeypatch.setenv("OPENAI_API_KEY", "sk-test")
        calls = {"n": 0}

        class Resp:
            def __init__(self, code, body=None):
                self.status_code = code
                self._body = body or {}

            def json(self):
                return self._body

        def fake_post(url, json=None, headers=None, timeout=None):
            calls["n"] += 1
            if calls["n"] == 1:
                return Resp(429)
            return Resp(200, {"choices": [{"message": {"content":
                '{"title": "T", "catchy_phrase": "P"}'}}]})

        monkeypatch.setattr(requests, "post", fake_post)
        n = OpenAINamer(retry_delay_s=0.0)
        assert n.generate("features", 3) == ("T", "P")
        assert calls["n"] == 2
