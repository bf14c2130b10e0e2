"""Shared test fixtures: synthetic images + a fast fake embedder."""

import numpy as np


def encode_png(img_bgr: np.ndarray) -> bytes:
    import cv2

    ok, enc = cv2.imencode(".png", img_bgr)
    assert ok
    return enc.tobytes()


def color_group_images(rng, n_groups=3, per_group=4, size=64):
    """(filenames, png bytes) for n_groups visually distinct color groups."""
    names, blobs = [], []
    bases = [(220, 30, 30), (30, 220, 30), (30, 30, 220), (220, 220, 30),
             (30, 220, 220), (220, 30, 220)][:n_groups]
    for g, base in enumerate(bases):
        for i in range(per_group):
            img = np.full((size, size, 3), base, np.uint8)
            img = img + rng.integers(0, 20, img.shape).astype(np.uint8)
            names.append(f"g{g}_img{i}.png")
            blobs.append(encode_png(img))
    return names, blobs


class MeanColorEmbedder:
    """Drop-in Embedder substitute: embeds each image as channel statistics —
    deterministic, instant, and clusters color groups perfectly."""

    tag = "mean_color:test"

    class spec:
        name = "mean_color"
        input_size = 64
        dim = 6
        scale = 1.0 / 255.0
        mean = (0.0, 0.0, 0.0)
        std = (1.0, 1.0, 1.0)
        bgr_input = True

    batch_size = 8

    def embed(self, images: np.ndarray) -> np.ndarray:
        images = np.asarray(images, np.float32) / 255.0
        means = images.mean(axis=(1, 2))
        stds = images.std(axis=(1, 2))
        return np.concatenate([means * 10.0, stds], axis=1).astype(np.float32)

    def embed_device(self, images):
        import jax.numpy as jnp

        return jnp.asarray(self.embed(images))

    def embed_stream(self, chunks):
        import jax.numpy as jnp

        outs = [self.embed(c) for c in chunks]
        if not outs:
            return jnp.zeros((0, self.spec.dim), jnp.float32)
        return jnp.asarray(np.concatenate(outs))

    def embed_stream_quantized(self, chunks, out_dtype=None,
                               margin: float = 1.25):
        # mirrors Embedder.embed_stream_quantized: first-chunk int8 scale
        import jax.numpy as jnp

        outs = []
        scale = 1.0
        for c in chunks:
            e = self.embed(c)
            if out_dtype == jnp.int8:
                if not outs:
                    scale = max(float(np.abs(e).max()) * margin / 127.0,
                                1e-30)
                e = np.clip(np.round(e / scale), -127, 127).astype(np.int8)
            elif out_dtype == jnp.bfloat16:
                e = jnp.asarray(e).astype(jnp.bfloat16)
            outs.append(np.asarray(e))
        if not outs:
            return jnp.zeros((0, self.spec.dim),
                             out_dtype or jnp.float32), scale
        return jnp.asarray(np.concatenate(outs)), scale
