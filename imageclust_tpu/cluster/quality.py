"""Quality scoreboard scenarios for the NON-parity modes (VERDICT r3 #3).

BASELINE.md quantifies what the precision-caveated modes BUY (HBM capacity,
throughput); this module quantifies what they COST: partition agreement
against the f32 parity path (clustering.go:198-284's semantics) on
*overlapping* synthetic mixtures — the hard regime where near-tied Ward
distances actually flip under rounding. Separated blobs (what the existing
guard tests use) would score a trivial 1.0.

Scenarios:

* :func:`residency_scoreboard` — ``cluster.feature_dtype=bfloat16|int8``
  vs f32 on the same device-resident features.
* :func:`fusion_scoreboard` — ``labels.fusion=text`` (dense text-tower
  label block) vs the parity ``onehot`` block over the same images+labels.
* tower PTQ (``embed.quantize=int8``) lives in ``bench.py --quality``'s
  tower stage: it needs real towers on hardware; the engine-side scenarios
  here run anywhere (the suite pins floors on the forced-CPU mesh conftest).

``bench.py --quality`` emits the scoreboard; tests/test_agreement.py pins
metric floors per mode.
"""

from __future__ import annotations

import numpy as np

from imageclust_tpu.cluster.agreement import agreement

__all__ = [
    "synth_mixture",
    "synth_mixture_labels",
    "residency_scoreboard",
    "fusion_scoreboard",
    "ptq_scoreboard",
]


def synth_mixture(n: int, d: int, *, k: int | None = None,
                  sep: float = 1.0, seed: int = 0,
                  balanced: bool = False):
    """Overlapping Gaussian mixture ON DEVICE: (features f32, true component
    ids np.int64).

    ``k`` defaults to ``n // 5`` — components the size of the engine's
    target clusters, so the true structure sits exactly at the min/max-size
    granularity the engine emits. Component centers are drawn N(0, sep^2 I)
    and items N(center, I): per-coordinate, neighbouring components overlap
    whenever ``sep`` is within a few units, which produces the near-tied
    merge distances this scoreboard exists to stress. ``sep=1`` is heavy
    overlap; ``sep>=8`` approaches the separated-blob regime of the guard
    tests.

    ``balanced=True`` assigns exactly ``n // k`` items per component
    (round-robin) instead of multinomial sizes — with ``n/k`` inside the
    [min_size, max_size] window and large ``sep`` this is the tie-free
    anchor regime where every engine mode must agree outright (random
    sizes always leave some component above max_size, forcing splits whose
    merge order IS tie-sensitive).
    """
    import jax
    import jax.numpy as jnp

    if k is None:
        k = max(2, n // 5)
    kc, kz, kx = jax.random.split(jax.random.PRNGKey(seed), 3)
    centers = jax.random.normal(kc, (k, d), jnp.float32) * sep
    if balanced:
        z = jax.random.permutation(kz, jnp.arange(n) % k)
    else:
        z = jax.random.randint(kz, (n,), 0, k)
    feats = centers[z] + jax.random.normal(kx, (n, d), jnp.float32)
    return feats, np.asarray(z, np.int64)


def _bucketed(feats, feature_dtype: str, *, bucket_size: int = 256,
              seed: int = 0, mesh=None) -> np.ndarray:
    from imageclust_tpu.cluster.sharded import constrained_ward_bucketed

    res = constrained_ward_bucketed(
        feats, min_size=3, max_size=6, bucket_size=bucket_size,
        update_rule="lance_williams", feature_dtype=feature_dtype,
        seed=seed, mesh=mesh,
    )
    return res.assignments()


def residency_scoreboard(n: int, d: int, *, sep: float = 1.0,
                         k: int | None = None, bucket_size: int = 256,
                         seed: int = 0, mesh=None, balanced: bool = False,
                         modes=("bfloat16", "int8")) -> dict:
    """Agreement of each residency dtype's partition vs the f32 engine on
    one shared overlapping mixture. Returns
    ``{mode: agreement-dict + ari_vs_truth}`` with an extra ``"f32"`` row
    carrying the parity run's own ari_vs_truth for context."""
    feats, truth = synth_mixture(n, d, k=k, sep=sep, seed=seed,
                                 balanced=balanced)
    base = _bucketed(feats, "float32", bucket_size=bucket_size, seed=seed,
                     mesh=mesh)
    out = {"f32": {"ari_vs_truth": agreement(base, truth)["ari"]}}
    # Yardstick: the f32 engine against ITSELF under a different kmeans
    # seed. Any dtype whose agreement beats this row diverges LESS than the
    # engine's own bucketing randomness — the honest unit for reading the
    # mode rows (measured: dtype rows beat it at every tier tried).
    alt = _bucketed(feats, "float32", bucket_size=bucket_size, seed=seed + 1,
                    mesh=mesh)
    out["f32_seed_yardstick"] = agreement(base, alt)
    for mode in modes:
        got = _bucketed(feats, mode, bucket_size=bucket_size, seed=seed,
                        mesh=mesh)
        row = agreement(base, got)
        row["ari_vs_truth"] = agreement(got, truth)["ari"]
        out[mode] = row
    return out


def synth_mixture_labels(truth: np.ndarray, *, n_vocab: int = 0,
                         noise: float = 0.3, seed: int = 0):
    """Synthetic per-image label lists correlated with the true components:
    each image carries its component's label (confidence ~90) plus, with
    probability ``noise``, one shared distractor label — enough vocabulary
    collision to make the fusion block matter without determining the
    partition outright. Returns (per_image_labels, label_set)."""
    from imageclust_tpu.labels.base import Label

    rng = np.random.default_rng(seed)
    k = int(truth.max()) + 1
    n_vocab = n_vocab or max(4, k // 3)
    # several components share each vocabulary word (synonym collisions —
    # the regime where text fusion and one-hot genuinely differ)
    vocab_of = rng.integers(0, n_vocab, k)
    per_image = []
    for z in truth:
        labels = [Label(f"word{vocab_of[z]}", 80.0 + float(rng.random()) * 15)]
        if rng.random() < noise:
            labels.append(Label(f"word{rng.integers(0, n_vocab)}",
                                55.0 + float(rng.random()) * 20))
        per_image.append(labels)
    label_set = {}
    for labels in per_image:
        for lab in labels:
            label_set.setdefault(lab.name, len(label_set))
    return per_image, label_set


def fusion_scoreboard(n: int, d: int, *, sep: float = 1.0,
                      fusion_weight: float = 1.0, seed: int = 0) -> dict:
    """``labels.fusion=text`` vs the parity ``onehot`` block: same images
    (mixture features standing in for tower embeddings), same labels, same
    engine — only the label-block construction differs (pipeline.py:327-340's
    two branches, exercised directly)."""
    import jax.numpy as jnp

    from imageclust_tpu.labels.onehot import one_hot_matrix
    from imageclust_tpu.labels.text_fusion import text_label_matrix
    from imageclust_tpu.models.text import TextEncoder

    feats, truth = synth_mixture(n, d, sep=sep, seed=seed)
    per_image, label_set = synth_mixture_labels(truth, seed=seed)

    onehot = one_hot_matrix(per_image, label_set) * np.float32(fusion_weight)
    text = text_label_matrix(per_image, label_set, TextEncoder()) \
        * np.float32(fusion_weight)

    base = _bucketed(jnp.concatenate(
        [feats, jnp.asarray(onehot)], axis=1), "float32", seed=seed)
    got = _bucketed(jnp.concatenate(
        [feats, jnp.asarray(text)], axis=1), "float32", seed=seed)
    row = agreement(base, got)
    row["ari_vs_truth_onehot"] = agreement(base, truth)["ari"]
    row["ari_vs_truth_text"] = agreement(got, truth)["ari"]
    return row


def ptq_scoreboard(model: str, n: int, *, n_base: int = 64,
                   batch_size: int = 0, seed: int = 0,
                   bucket_size: int = 256) -> dict:
    """``embed.quantize=int8`` end to end: the SAME synthetic images through
    the f32 tower and its PTQ int8 twin, both embedding sets clustered by
    the f32 parity engine, partitions compared. Images are ``n_base`` noisy
    base patterns + per-item uniform noise — overlapping enough that tower
    rounding can flip near-tied merges. Includes the f32 kmeans-seed
    yardstick row under ``"seed_yardstick"``."""
    import jax
    import jax.numpy as jnp

    from imageclust_tpu.config import EmbedConfig
    from imageclust_tpu.models.registry import create_embedder

    def embed_all(quantize: str):
        emb = create_embedder(EmbedConfig(
            model=model, batch_size=batch_size, quantize=quantize))
        bs, s = emb.batch_size, emb.spec.input_size
        fwd = emb._embed_fn(resize=False)
        kb = jax.random.PRNGKey(seed)
        # base is PASSED IN, not closed over: a closure array becomes a
        # literal in the jitted program — tens of MB shipped through the
        # tunnel to the remote compiler per variant
        base = jax.random.randint(kb, (n_base, s, s, 3), 0, 200, jnp.int32)

        @jax.jit
        def synth(base, i):
            kz, kn = jax.random.split(jax.random.fold_in(kb, i))
            z = jax.random.randint(kz, (bs,), 0, n_base)
            noise = jax.random.randint(kn, (bs, s, s, 3), 0, 56, jnp.int32)
            return (base[z] + noise).astype(jnp.uint8)

        chunks = [fwd(emb.variables, synth(base, i))
                  for i in range(-(-n // bs))]
        return jnp.concatenate(chunks)[:n]

    f32 = embed_all("")
    q8 = embed_all("int8")
    base_part = _bucketed(f32, "float32", bucket_size=bucket_size, seed=seed)
    q8_part = _bucketed(q8, "float32", bucket_size=bucket_size, seed=seed)
    row = agreement(base_part, q8_part)
    alt = _bucketed(f32, "float32", bucket_size=bucket_size, seed=seed + 1)
    row["seed_yardstick"] = agreement(base_part, alt)
    # truth-recovery context: both variants embed the SAME images (same
    # synth keys), whose base-pattern id is replayable without the tower —
    # whether int8 LOSES structure is a different question from whether it
    # agrees pair-for-pair with the f32 partition (at random init the
    # f32-int8 margin is all noise; vs-truth is the quality-loss signal)
    from imageclust_tpu.config import EmbedConfig as _EC
    from imageclust_tpu.models.registry import create_embedder as _ce

    bs = _ce(_EC(model=model, batch_size=batch_size)).batch_size
    kb = jax.random.PRNGKey(seed)
    truth = np.concatenate([
        np.asarray(jax.random.randint(
            jax.random.split(jax.random.fold_in(kb, i))[0],
            (bs,), 0, n_base))
        for i in range(-(-n // bs))])[:n].astype(np.int64)
    row["ari_vs_truth_f32"] = agreement(base_part, truth)["ari"]
    row["ari_vs_truth_int8"] = agreement(q8_part, truth)["ari"]
    return row
