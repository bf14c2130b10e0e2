from imageclust_tpu.models.registry import EmbedderSpec, create_embedder, list_models

__all__ = ["EmbedderSpec", "create_embedder", "list_models"]
