"""Multi-service naming fan-out with stable display ordering.

Parity with internal/ai/wrapper.go: a registry of services each with a
display ``order`` (wrapper.go:20-33), concurrent fan-out — one worker per
enabled service (wrapper.go:90-127), results sorted by order (:128-139), and
per-service graceful degradation to the fallback pair. The reference enables
only Claude Haiku (wrapper.go:36-69, others commented out); our default is
the offline fake so the system works with zero credentials, and any
combination can be enabled via NamingConfig.services.
"""

from __future__ import annotations

import logging
from concurrent.futures import ThreadPoolExecutor

from imageclust_tpu.config import NamingConfig
from imageclust_tpu.naming.base import (
    FALLBACK_PHRASE,
    FALLBACK_TITLE,
    ModelOutput,
    Namer,
)

log = logging.getLogger(__name__)

__all__ = ["NamingService", "create_naming_service", "build_namer"]


def build_namer(name: str, cfg: NamingConfig) -> Namer:
    if name == "fake":
        from imageclust_tpu.naming.fake import FakeNamer

        return FakeNamer()
    if name in ("claude_haiku", "claude_sonnet"):
        from imageclust_tpu.naming.bedrock import ClaudeBedrockNamer

        return ClaudeBedrockNamer(
            variant=name.split("_")[1],
            region=cfg.bedrock_region,
            retry_delay_s=cfg.retry_delay_s,
        )
    if name == "nova_micro":
        from imageclust_tpu.naming.bedrock import NovaBedrockNamer

        return NovaBedrockNamer(region=cfg.bedrock_region,
                                retry_delay_s=cfg.retry_delay_s)
    if name in ("gpt-3.5-turbo", "gpt-4", "gpt35", "gpt4"):
        from imageclust_tpu.naming.openai_backend import OpenAINamer

        model = {"gpt35": "gpt-3.5-turbo", "gpt4": "gpt-4"}.get(name, name)
        return OpenAINamer(model=model, retry_delay_s=cfg.retry_delay_s)
    raise ValueError(f"unknown naming service {name!r}")


class NamingService:
    def __init__(self, namers: list[Namer], retries: int = 3):
        self.namers = namers
        self.retries = retries

    def generate_multi(self, aggregated_text: str) -> list[ModelOutput]:
        """Fan out to every enabled service concurrently; return outputs
        sorted by display order (wrapper.go:90-139 semantics)."""
        if not self.namers:
            return []

        def run(namer: Namer) -> ModelOutput:
            try:
                title, phrase = namer.generate(aggregated_text, self.retries)
            except Exception as exc:  # a backend must never kill the job
                log.error("namer %s raised: %s", namer.name, exc)
                title, phrase = FALLBACK_TITLE, FALLBACK_PHRASE
            return ModelOutput(namer.name, title, phrase, namer.order)

        with ThreadPoolExecutor(max_workers=len(self.namers)) as pool:
            outputs = list(pool.map(run, self.namers))
        return sorted(outputs, key=lambda o: o.order)

    def generate(self, aggregated_text: str, service_name: str) -> ModelOutput:
        """Single-service path (wrapper.go:72-87)."""
        for namer in self.namers:
            if namer.name == service_name:
                title, phrase = namer.generate(aggregated_text, self.retries)
                return ModelOutput(namer.name, title, phrase, namer.order)
        return ModelOutput(service_name, FALLBACK_TITLE, FALLBACK_PHRASE, 0)


def create_naming_service(cfg: NamingConfig | None = None) -> NamingService:
    cfg = cfg or NamingConfig()
    namers = [build_namer(name, cfg) for name in cfg.services if name != "none"]
    return NamingService(namers, retries=cfg.retries)
