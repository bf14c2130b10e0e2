"""imageclust_tpu — a TPU-native image clustering framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of the reference
``monahand1023/imageclust`` service (Go + OpenCV + AWS):

* batched, device-resident image preprocessing (reference:
  internal/embeddings/embeddings.go:46-116 did this per-image on CPU via cgo),
* batched ResNet50 / ViT image embedding on TPU (reference: serialized
  single-image OpenCV-DNN forward, embeddings.go:119-163),
* size-constrained Ward agglomerative clustering as a vectorized, masked,
  static-shape JAX program (reference: O(n^3) pointer-chasing Go loops,
  internal/clustering/clustering.go:198-284),
* pluggable semantic labelers and multi-service LLM cluster naming
  (reference: internal/rekognition + internal/ai),
* the same REST surface and HTML comparison report
  (reference: main.go, internal/handlers, internal/utils).

Everything under :mod:`imageclust_tpu` is new code designed TPU-first: SPMD
over ``jax.sharding.Mesh``, functional transforms, static shapes, Pallas
kernels for hot ops.
"""

from imageclust_tpu.version import __version__

__all__ = ["__version__", "AppConfig", "Pipeline", "UploadedImage",
           "load_config"]


def __getattr__(name):
    # lazy top-level API (importing the package stays light; jax loads on use)
    if name == "AppConfig" or name == "load_config":
        from imageclust_tpu import config

        return getattr(config, name)
    if name == "Pipeline":
        from imageclust_tpu.pipeline import Pipeline

        return Pipeline
    if name == "UploadedImage":
        from imageclust_tpu.types import UploadedImage

        return UploadedImage
    raise AttributeError(name)
