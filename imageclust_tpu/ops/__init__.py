from imageclust_tpu.ops.preprocess import (
    preprocess_batch,
    resize_bilinear,
    resize_weights,
)

__all__ = [
    "preprocess_batch",
    "resize_bilinear",
    "resize_weights",
    "merge_update_argmin",
    "masked_argmin_pair_xla",
]


def __getattr__(name):
    if name in ("merge_update_argmin", "masked_argmin_pair_xla"):
        from imageclust_tpu.ops import pallas_kernels

        return getattr(pallas_kernels, name)
    raise AttributeError(name)
