from imageclust_tpu.ops.preprocess import (
    preprocess_batch,
    resize_bilinear,
    resize_weights,
)

__all__ = [
    "preprocess_batch",
    "resize_bilinear",
    "resize_weights",
    "masked_argmin_pair",
    "normalize_chw",
]


def __getattr__(name):
    if name in ("masked_argmin_pair", "normalize_chw"):
        from imageclust_tpu.ops import pallas_kernels

        return getattr(pallas_kernels, name)
    raise AttributeError(name)
