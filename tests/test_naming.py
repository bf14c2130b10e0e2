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


class _CountingNamer:
    """Sleeping namer that records call count and peak concurrency."""

    name = "Counting"
    order = 1

    def __init__(self, delay=0.002):
        import threading

        self.delay = delay
        self.calls = 0
        self.inflight = 0
        self.peak = 0
        self._lock = threading.Lock()

    def generate(self, text, retries):
        import time

        with self._lock:
            self.calls += 1
            self.inflight += 1
            self.peak = max(self.peak, self.inflight)
        time.sleep(self.delay)
        with self._lock:
            self.inflight -= 1
        return f"T:{text[:10]}", f"P:{text[:10]}"


class TestClusterFanOut:
    """VERDICT r2 item 3: the naming stage must scale to the engine's
    tier — bounded concurrency ACROSS clusters (default
    NamingConfig.cluster_concurrency=16), a shared rate limit, progress,
    and resumable per-cluster state."""

    def test_5k_clusters_bounded_wall_time(self):
        import time

        namer = _CountingNamer(delay=0.002)
        svc = NamingService([namer], cluster_concurrency=64)
        texts = {f"Cluster-{i}": f"labels {i}" for i in range(5000)}
        t0 = time.monotonic()
        outs = svc.name_clusters(texts)
        wall = time.monotonic() - t0
        assert set(outs) == set(texts)
        assert namer.calls == 5000
        assert namer.peak > 8  # genuinely concurrent across clusters
        # serial would be >= 10 s (5000 x 2 ms); the fan-out must stay well
        # under. Bound sized for a CONTENDED box (this suite shares a host
        # with benches): 8 s still rejects any serial regression while not
        # flaking when the scheduler starves the worker threads.
        assert wall < 8.0, f"naming 5k clusters took {wall:.1f}s"
        assert outs["Cluster-17"][0].title == "T:labels 17"

    def test_resume_skips_named_clusters(self, tmp_path):
        state = tmp_path / "naming_state.jsonl"
        texts = {f"Cluster-{i}": f"labels {i}" for i in range(10)}
        namer = _CountingNamer(delay=0.0)
        svc = NamingService([namer], cluster_concurrency=4)
        first = svc.name_clusters(texts, state_path=str(state))
        assert namer.calls == 10
        # second run: everything served from state, zero LLM calls
        namer2 = _CountingNamer(delay=0.0)
        svc2 = NamingService([namer2], cluster_concurrency=4)
        again = svc2.name_clusters(texts, state_path=str(state))
        assert namer2.calls == 0
        assert {k: [(o.service_name, o.title) for o in v]
                for k, v in again.items()} == {
                    k: [(o.service_name, o.title) for o in v]
                    for k, v in first.items()}

    def test_resume_partial_and_torn_line(self, tmp_path):
        from imageclust_tpu.naming.registry import _text_sha

        state = tmp_path / "naming_state.jsonl"
        state.write_text(
            json.dumps({"cluster": "Cluster-0",
                        "text_sha": _text_sha("labels 0"),
                        "outputs": [["Counting", "T0", "P0", 1]]})
            + "\n"
            + json.dumps({"cluster": "Cluster-ghost",
                          "text_sha": _text_sha("ghost"),
                          "outputs": [["Counting", "G", "G", 1]]})
            + "\n"
            + '{"cluster": "Cluster-1", "outp'  # torn crash write
        )
        texts = {f"Cluster-{i}": f"labels {i}" for i in range(3)}
        namer = _CountingNamer(delay=0.0)
        svc = NamingService([namer], cluster_concurrency=2)
        outs = svc.name_clusters(texts, state_path=str(state))
        # Cluster-0 restored, ghost ignored, torn line re-named
        assert namer.calls == 2
        assert outs["Cluster-0"][0].title == "T0"
        assert set(outs) == set(texts)
        # the torn line was replaced by a valid append; reload is complete
        namer3 = _CountingNamer(delay=0.0)
        svc3 = NamingService([namer3], cluster_concurrency=2)
        svc3.name_clusters(texts, state_path=str(state))
        assert namer3.calls == 0

    def test_state_keyed_by_text_not_just_cluster_id(self, tmp_path):
        """Reusing a work dir with a DIFFERENT corpus must not serve the
        previous corpus's titles: the generic Cluster-N ids match, but the
        per-record text sha doesn't (review finding)."""
        state = tmp_path / "naming_state.jsonl"
        texts_a = {"Cluster-0": "cats, whiskers", "Cluster-1": "dogs, bones"}
        namer_a = _CountingNamer(delay=0.0)
        NamingService([namer_a], cluster_concurrency=2).name_clusters(
            texts_a, state_path=str(state))
        assert namer_a.calls == 2

        texts_b = {"Cluster-0": "boats, sails", "Cluster-1": "dogs, bones"}
        namer_b = _CountingNamer(delay=0.0)
        outs = NamingService([namer_b], cluster_concurrency=2).name_clusters(
            texts_b, state_path=str(state))
        # Cluster-1's text is unchanged -> reused; Cluster-0 renamed
        assert namer_b.calls == 1
        assert set(outs) == set(texts_b)

    def test_fallback_outputs_not_persisted(self, tmp_path):
        """A transient all-backend failure must be retried on resume, not
        cached forever in the state file (review finding)."""
        from imageclust_tpu.naming.base import FALLBACK_TITLE, Namer

        class FlakyNamer(Namer):
            name = "Flaky"
            order = 1

            def __init__(self):
                self.calls = 0
                self.fail = True

            def generate(self, text, retries):
                self.calls += 1
                if self.fail:
                    raise RuntimeError("throttled")
                return f"T:{text}", f"P:{text}"

        state = tmp_path / "naming_state.jsonl"
        texts = {"Cluster-0": "labels 0"}
        flaky = FlakyNamer()
        svc = NamingService([flaky], cluster_concurrency=1)
        outs = svc.name_clusters(texts, state_path=str(state))
        assert outs["Cluster-0"][0].title == FALLBACK_TITLE
        assert flaky.calls == 1

        flaky.fail = False  # backend recovered; re-run must retry
        outs = svc.name_clusters(texts, state_path=str(state))
        assert outs["Cluster-0"][0].title == "T:labels 0"
        assert flaky.calls == 2
        # and the success IS persisted for the next resume
        outs = svc.name_clusters(texts, state_path=str(state))
        assert flaky.calls == 2

    def test_rate_limiter_mock_clock(self):
        from imageclust_tpu.naming.registry import RateLimiter

        now = [100.0]
        slept = []

        def clock():
            return now[0]

        def sleep(s):
            slept.append(s)
            now[0] += s

        rl = RateLimiter(10.0, clock=clock, sleep=sleep)
        for _ in range(5):
            rl.acquire()
        # 5 acquisitions at 10 rps: first free, rest spaced 0.1 s apart
        assert abs(sum(slept) - 0.4) < 1e-9

    def test_rate_limiter_disabled(self):
        from imageclust_tpu.naming.registry import RateLimiter

        rl = RateLimiter(0.0)
        for _ in range(100):
            rl.acquire()  # must not sleep or raise

    def test_progress_callback(self):
        seen = []
        svc = NamingService([_CountingNamer(delay=0.0)],
                            cluster_concurrency=2)
        texts = {f"c{i}": "x" for i in range(7)}
        svc.name_clusters(texts, progress=lambda d, t: seen.append((d, t)))
        assert len(seen) == 7
        assert seen[-1] == (7, 7)

    def test_config_plumbs_fanout_knobs(self):
        svc = create_naming_service(NamingConfig(
            services=("fake",), cluster_concurrency=5, rate_limit_rps=2.0))
        assert svc.cluster_concurrency == 5
        assert abs(svc.limiter.interval - 0.5) < 1e-9
