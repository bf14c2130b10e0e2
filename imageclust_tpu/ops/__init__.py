from imageclust_tpu.ops.preprocess import (
    preprocess_batch,
    resize_bilinear,
    resize_weights,
)

__all__ = ["preprocess_batch", "resize_bilinear", "resize_weights"]
