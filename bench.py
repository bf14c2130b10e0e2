"""Benchmark harness — the BASELINE.json north star.

Measures the full compute core end-to-end on the attached TPU chip:
**embed N images through ResNet50 (device-side preprocess included) + size-
constrained Ward clustering of the resulting feature vectors**, the two hot
loops the reference runs serialized on CPU (SURVEY.md §6). Default N=100k,
target < 60 s on one v5e chip (BASELINE.json:5).

Prints ONE JSON line:
  {"metric": ..., "value": seconds, "unit": "s", "vs_baseline": 60/value}
plus a stage breakdown on stderr. vs_baseline > 1.0 beats the north star.

Synthetic uint8 image batches are generated ON DEVICE (the host never
produces 15 GB of pixels); every batch is distinct so the clustering stage
sees realistic feature spread. Host decode is a separate pipeline stage with
its own benchmark (bench --decode).
"""

from __future__ import annotations

import argparse
import os
import json
import sys
import time

import numpy as np


def _log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def _enable_compile_cache() -> None:
    from imageclust_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache(os.path.join(os.path.dirname(__file__), ".jax_cache"))


def bench_e2e(n_images: int, batch_size: int, bucket_size: int,
              quantize: str = "") -> dict:
    import jax
    import jax.numpy as jnp

    from imageclust_tpu.config import EmbedConfig
    from imageclust_tpu.cluster.sharded import constrained_ward_bucketed
    from imageclust_tpu.models.registry import create_embedder

    _enable_compile_cache()
    _log(f"devices: {jax.devices()}")
    embedder = create_embedder(
        EmbedConfig(model="resnet50", batch_size=batch_size, output="logits",
                    quantize=quantize)
    )
    fwd = embedder._embed_fn(resize=False)
    variables = embedder.variables

    # one RNG pass up front; per-batch variants are a cheap elementwise add
    # (a fresh 308M-element randint per batch would tax the embed timing)
    base = jax.random.randint(
        jax.random.PRNGKey(0), (batch_size, 224, 224, 3), 0, 256,
        dtype=jnp.int32,
    ).astype(jnp.uint8)

    @jax.jit
    def synth_batch(seed):
        return base + jnp.uint8(seed * 37 % 251)

    # Warm up compiles OUTSIDE the timed region, forcing a real host sync
    # (block_until_ready can be a no-op on async tunnel transports).
    t0 = time.perf_counter()
    np.asarray(fwd(variables, synth_batch(0))[:1, :1])
    _log(f"warmup/compile embed: {time.perf_counter() - t0:.1f}s")

    n_batches = (n_images + batch_size - 1) // batch_size

    def embed_all():
        # Features STAY ON DEVICE — the clustering stage consumes them in
        # HBM; only a scalar checksum crosses the wire to force completion.
        # The in-flight bound is LAGGED one group: syncing on the group just
        # dispatched parks the device for a full tunnel RTT (~50 ms) per
        # sync while the scalar crosses; syncing on the PREVIOUS group's
        # tail (already long done) keeps the dispatch queue full the whole
        # run while still bounding un-synced work to <= 16 batches.
        chunks = []
        fence = None
        for i in range(0, n_batches, 8):
            chunks += [fwd(variables, synth_batch(j))
                       for j in range(i, min(i + 8, n_batches))]
            if fence is not None:
                float(fence[0, 0])
            fence = chunks[-1]
        feats = jnp.concatenate(chunks)[:n_images]
        float(feats[0, 0])
        return feats

    def cluster_all(feats):
        return constrained_ward_bucketed(
            feats, min_size=3, max_size=6, bucket_size=bucket_size,
            update_rule="lance_williams",
        )

    # One untimed dry pass warms the kmeans + bucket-merge compiles for these
    # exact shapes (persistently cached for future processes).
    t0 = time.perf_counter()
    cluster_all(embed_all())
    _log(f"warmup/compile cluster: {time.perf_counter() - t0:.1f}s")

    t0 = time.perf_counter()
    feats = embed_all()
    t_embed = time.perf_counter() - t0
    _log(f"embed: {n_images} imgs in {t_embed:.2f}s "
         f"({n_images / t_embed:.0f} img/s/chip)")

    t0 = time.perf_counter()
    res = cluster_all(feats)
    t_cluster = time.perf_counter() - t0
    _log(f"cluster: {res.n_clusters} clusters in {t_cluster:.2f}s "
         f"({len(res.dropped)} dropped)")

    total = t_embed + t_cluster
    return {
        "metric": f"e2e_embed+ward_{n_images // 1000}k_images",
        "value": round(total, 3),
        "unit": "s",
        # north star is 100k < 60 s (BASELINE.json:5); scale the time budget
        # linearly with n in BOTH directions so 1M runs aren't judged
        # against the 100k absolute budget
        "vs_baseline": round((60.0 * n_images / 100_000) / total, 3),
        "detail": {
            "embed_s": round(t_embed, 3),
            "cluster_s": round(t_cluster, 3),
            "images_per_sec_chip": round(n_images / t_embed, 1),
            "n_clusters": res.n_clusters,
        },
    }


def bench_e2e_stream(n_images: int, model: str, batch_size: int,
                     bucket_size: int, feature_dtype: str,
                     work_dir: str, n_base: int = 2048) -> dict:
    """ONE real pipeline job at the flagship tier (VERDICT r4 item 1): the
    reference's whole contract (workflow.go:66-108 -> utils.go:23-214) as a
    single ``Pipeline.run_stream`` run — on-device synthetic ingest ->
    streamed embed into the preallocated residency buffer -> bucketed
    cluster -> budgeted fake naming -> the two-level sectioned report
    ACTUALLY WRITTEN for every cluster. Walls come from the pipeline's own
    stage metrics; the report dir's page/section counts are verified
    against the cluster count.

    Ingest images are ``n_base`` noisy base patterns + fresh per-item
    uniform noise (the ptq_scoreboard generator, cluster/quality.py:196) —
    structured enough that clustering sees realistic group geometry, drawn
    on device so pixels never cross the ~20 MB/s host link."""
    import glob

    import jax
    import jax.numpy as jnp

    from imageclust_tpu.config import (
        AppConfig,
        ClusterConfig,
        EmbedConfig,
        LabelConfig,
        NamingConfig,
    )
    from imageclust_tpu.pipeline import Pipeline

    _enable_compile_cache()
    _log(f"devices: {jax.devices()}")
    cfg = AppConfig(
        embed=EmbedConfig(model=model, batch_size=batch_size),
        labels=LabelConfig(backend="none"),
        naming=NamingConfig(services=("fake",), retries=1),
        cluster=ClusterConfig(bucket_size=bucket_size,
                              feature_dtype=feature_dtype),
    )
    pipeline = Pipeline(cfg)
    bs = pipeline.embedder.batch_size
    s = pipeline.embedder.spec.input_size
    kb = jax.random.PRNGKey(0)
    # base patterns live on device and are PASSED IN (a closure constant
    # would be baked into the jitted program as a literal — 300 MB shipped
    # to the remote compiler through the tunnel). uint8 end to end: max
    # base 199 + max noise 55 = 254, no overflow.
    base = jax.random.randint(kb, (n_base, s, s, 3), 0, 200, jnp.uint8)

    @jax.jit
    def synth(base, i):
        kz, kn = jax.random.split(jax.random.fold_in(kb, i))
        z = jax.random.randint(kz, (bs,), 0, n_base)
        noise = jax.random.bits(kn, (bs, s, s, 3), jnp.uint8)
        return base[z] + (noise & 55)

    def chunk_iter():
        n_chunks = -(-n_images // bs)
        for i in range(n_chunks):
            c = min(bs, n_images - i * bs)
            out = synth(base, i)
            yield out if c == bs else out[:c]

    # warm the synth + embed compiles outside the job walls (cluster/naming
    # compiles are shape-keyed and persistently cached from prior runs)
    t0 = time.perf_counter()
    np.asarray(pipeline.embedder._embed_fn(resize=False)(
        pipeline.embedder.variables, synth(base, 0))[:1, :1])
    _log(f"warmup/compile embed+synth: {time.perf_counter() - t0:.1f}s")

    t0 = time.perf_counter()
    res = pipeline.run_stream(chunk_iter(), n_images, work_dir,
                              min_size=3, max_size=6)
    total = time.perf_counter() - t0

    md = res.metrics.to_dict()
    stages = {k: round(v, 2) for k, v in md["stages_s"].items()}
    counters = md["counters"]
    n_clusters = counters["clusters"]
    pages = len(glob.glob(os.path.join(work_dir, "clusters_p*.html")))
    sections = len(glob.glob(os.path.join(work_dir, "clusters_ix*.html")))
    page_size = cfg.service.report_page_size
    expect_pages = -(-n_clusters // page_size)
    _log(f"e2e-stream n={n_images}: {total:.1f}s total, stages {stages}, "
         f"{n_clusters} clusters, {counters.get('dropped', 0)} dropped, "
         f"naming_skipped={counters.get('naming_skipped', 0)}, "
         f"report: {pages} pages / {sections} sections "
         f"(expect {expect_pages} pages)")
    assert pages == expect_pages or n_clusters <= page_size, (
        pages, expect_pages)
    return {
        "metric": f"e2e_stream_{n_images // 1000}k_images[{model} "
                  f"{feature_dtype}]",
        "value": round(total, 3),
        "unit": "s",
        # same linear budget rule as bench_e2e (north star 100k < 60 s),
        # though the tail (naming/report) is host-bound at this tier
        "vs_baseline": round((60.0 * n_images / 100_000) / total, 3),
        "detail": {
            "stages_s": stages,
            "n_clusters": n_clusters,
            "dropped": counters.get("dropped", 0),
            "naming_skipped": counters.get("naming_skipped", 0),
            "report_pages": pages,
            "report_sections": sections,
            "model": model,
            "feature_dtype": feature_dtype,
        },
    }


def _ensure_real_jpegs(n: int, root: str) -> list:
    """Materialize n distinct small JPEGs on disk (cached across runs)."""
    import cv2

    d = os.path.join(root, f"real_{n}")
    marker = os.path.join(d, ".complete")
    if os.path.exists(marker):
        return [os.path.join(d, f"{i:07d}.jpg") for i in range(n)]
    os.makedirs(d, exist_ok=True)
    rng = np.random.default_rng(0)
    # structured (not pure-noise) images: cheap to encode, realistic-ish
    # cluster structure (8 color families + texture), ~8-15 KB each
    base = rng.integers(0, 256, (16, 240, 320, 3), dtype=np.uint8)
    t0 = time.perf_counter()
    for i in range(n):
        img = base[i % 16].copy()
        img[:, :, i % 3] = (img[:, :, i % 3] // 4) + (i * 29) % 192
        ok, enc = cv2.imencode(".jpg", img, [cv2.IMWRITE_JPEG_QUALITY, 80])
        assert ok
        with open(os.path.join(d, f"{i:07d}.jpg"), "wb") as fh:
            fh.write(enc.tobytes())
        if i % 20000 == 19999:
            _log(f"  generated {i + 1}/{n} jpegs "
                 f"({time.perf_counter() - t0:.0f}s)")
    open(marker, "w").close()
    return [os.path.join(d, f"{i:07d}.jpg") for i in range(n)]


def _max_rss_gb() -> float:
    import resource

    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6


def bench_e2e_real(n_images: int, batch_size: int, bucket_size: int,
                   workers: int, data_dir: str) -> dict:
    """The REAL ingest tier: n JPEGs on disk -> streamed read+decode ->
    device embed -> constrained Ward, with bounded host memory (VERDICT r1
    item 2 — the old path materialized one (N,224,224,3) host array, 15 GB
    at 100k). Reports peak RSS alongside wall time.

    Caveat for THIS box: the axon tunnel moves host->device bytes at
    ~20 MB/s, so the 150 KB/image transfer dominates wall time here; on a
    real TPU VM (PCIe ~10 GB/s) the same code is decode- or compute-bound.
    """
    import jax

    from imageclust_tpu.cluster.sharded import constrained_ward_bucketed
    from imageclust_tpu.config import EmbedConfig
    from imageclust_tpu.data.loader import stream_decode
    from imageclust_tpu.models.registry import create_embedder

    _enable_compile_cache()
    _log(f"devices: {jax.devices()}")
    paths = _ensure_real_jpegs(n_images, data_dir)
    rss_after_gen = _max_rss_gb()

    embedder = create_embedder(
        EmbedConfig(model="resnet50", batch_size=batch_size, output="logits")
    )
    # warm the compile outside the timed region
    warm = np.zeros((batch_size, 224, 224, 3), np.uint8)
    t0 = time.perf_counter()
    np.asarray(embedder.embed_stream([warm])[:1, :1])
    _log(f"warmup/compile embed: {time.perf_counter() - t0:.1f}s")

    t0 = time.perf_counter()
    feats = embedder.embed_stream(
        imgs for _s, _b, imgs in stream_decode(
            paths, size=224, batch=batch_size, workers=workers)
    )
    float(feats[0, 0])  # force completion through the async transport
    t_embed = time.perf_counter() - t0
    _log(f"stream ingest+embed: {n_images} jpegs in {t_embed:.2f}s "
         f"({n_images / t_embed:.0f} img/s), peak RSS {_max_rss_gb():.2f} GB")

    t0 = time.perf_counter()
    res = constrained_ward_bucketed(
        feats, min_size=3, max_size=6, bucket_size=bucket_size,
        update_rule="lance_williams",
    )
    t_cluster = time.perf_counter() - t0
    _log(f"cluster: {res.n_clusters} clusters in {t_cluster:.2f}s "
         f"({len(res.dropped)} dropped)")

    total = t_embed + t_cluster
    return {
        "metric": f"e2e_real_jpeg_{n_images // 1000}k_images",
        "value": round(total, 3),
        "unit": "s",
        "vs_baseline": round((60.0 * n_images / 100_000) / total, 3),
        "detail": {
            "ingest_embed_s": round(t_embed, 3),
            "cluster_s": round(t_cluster, 3),
            "images_per_sec": round(n_images / t_embed, 1),
            "peak_rss_gb": round(_max_rss_gb(), 2),
            "rss_after_datagen_gb": round(rss_after_gen, 2),
            "n_clusters": res.n_clusters,
            "dropped": len(res.dropped),
        },
    }


def bench_decode(n_images: int, workers: int) -> dict:
    """Host ingest stage: decode+resize JPEG bytes -> uint8 device batch."""
    import cv2

    from imageclust_tpu.data.loader import decode_images

    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (480, 640, 3), dtype=np.uint8)
    ok, enc = cv2.imencode(".jpg", img)
    assert ok
    blobs = [enc.tobytes()] * n_images
    decode_images(blobs[:16], size=224, workers=workers)  # warm pools
    t0 = time.perf_counter()
    batch = decode_images(blobs, size=224, workers=workers)
    dt = time.perf_counter() - t0
    assert batch.shape == (n_images, 224, 224, 3)
    _log(f"decode: {n_images} jpegs in {dt:.2f}s ({n_images / dt:.0f} img/s, "
         f"{workers} workers)")
    return {
        "metric": f"host_decode_{n_images}_jpegs",
        "value": round(dt, 3),
        "unit": "s",
        "vs_baseline": round(n_images / dt, 1),
        "detail": {"images_per_sec": round(n_images / dt, 1)},
    }


def _synth_features(n: int, d: int, dt, *, one_shot_elems: int = 1 << 30,
                    block_elems: int = 512 << 20) -> "jax.Array":
    """Gaussian (n, d) features on device with bounded transient memory.

    ``jax.random.normal`` over the whole array materializes the raw random
    bits next to the output (~2x the feature bytes, and 32-bit bits for f32):
    at 10M x 512 that transient alone overflows the chip. Above
    ``one_shot_elems``, fill a donated buffer block-by-block instead — peak
    extra memory is one block, and every row is still i.i.d. normal (the
    clamped tail block merely overwrites some rows with fresh draws).

    Blocks are deliberately LARGE (512M elements): each dispatch carries a
    multi-second fixed cost on the tunneled backend (measured 10M x 512:
    77 fills of 64M elems = 450 s, 10 fills of 512M = 9.2 s), and a
    single-program fori_loop variant was even slower — dispatch count, not
    bytes, is what this knob controls."""
    import functools

    import jax
    import jax.numpy as jnp

    def draw(key, shape):
        if dt == jnp.int8:
            # gaussian on the int8 grid (sigma ~36 = absmax/3.5 scaling),
            # matching what _feat_int8 produces from gaussian features
            g = jax.random.normal(key, shape, jnp.float32) * (127.0 / 3.5)
            return jnp.clip(jnp.round(g), -127, 127).astype(jnp.int8)
        return jax.random.normal(key, shape, dt)

    if n * d <= one_shot_elems:  # one-shot transients are fine to ~8 GB
        return draw(jax.random.PRNGKey(0), (n, d))

    block = min(n, max(1, block_elems // max(d, 1)))

    @functools.partial(jax.jit, donate_argnums=0)
    def fill(buf, key, start):
        rows = draw(key, (block, d))
        return jax.lax.dynamic_update_slice(buf, rows, (start, 0))

    buf = jnp.zeros((n, d), dt)
    key = jax.random.PRNGKey(0)
    for i in range(-(-n // block)):
        key, sub = jax.random.split(key)
        # dynamic_update_slice clamps the start index, so the final block
        # rewrites the tail's overlap with new (equally gaussian) draws
        buf = fill(buf, sub, min(i * block, n - block))
    return buf


def bench_embed_only(model: str, batch_size: int, n_images: int,
                     quantize: str = "") -> dict:
    """Warm steady-state embed throughput of ONE tower (any registry model,
    optionally int8) — the per-tower img/s ladder in BASELINE.md, as one
    command. Synthetic uint8 batches at the tower's input size; device sync
    via np.asarray (block_until_ready is unreliable on this transport)."""
    import jax
    import jax.numpy as jnp

    from imageclust_tpu.config import EmbedConfig
    from imageclust_tpu.models.registry import create_embedder

    _enable_compile_cache()
    _log(f"devices: {jax.devices()}")
    embedder = create_embedder(
        EmbedConfig(model=model, batch_size=batch_size, quantize=quantize))
    bs = embedder.batch_size
    s = embedder.spec.input_size
    fwd = embedder._embed_fn(resize=False)
    batch = jax.random.randint(
        jax.random.PRNGKey(0), (bs, s, s, 3), 0, 256, jnp.uint8)
    np.asarray(fwd(embedder.variables, batch))  # compile + warm
    # XLA-counted FLOPs of the exact production program (the BASELINE.md
    # recalibration methodology: cost_analysis counts mul-add as 2)
    gflops_img = None
    try:
        fl = fwd.lower(embedder.variables, batch).compile().cost_analysis()
        gflops_img = float(fl["flops"]) / bs / 1e9
    except Exception:
        pass
    n_batches = max(1, n_images // bs)
    t0 = time.perf_counter()
    out = None
    for _ in range(n_batches):
        out = fwd(embedder.variables, batch)
    np.asarray(out)
    dt = time.perf_counter() - t0
    ips = n_batches * bs / dt
    q = f"+{quantize}" if quantize else ""
    detail = {"model": model, "batch": bs, "quantize": quantize,
              "batches": n_batches, "wall_s": round(dt, 3)}
    if gflops_img is not None:
        tfs = ips * gflops_img / 1e3
        detail.update({
            "xla_gflops_per_img": round(gflops_img, 2),
            "tf_per_s": round(tfs, 1),
            # 109 TF/s: largest clean bf16 matmul measured on this box
            # (BASELINE.md calibration) — the practical ceiling here
            "pct_practical_peak": round(100.0 * tfs / 109.0, 1),
        })
    return {
        "metric": f"embed_img_per_s[{model}{q} b{bs}]",
        "value": round(ips, 1),
        "unit": "img/s/chip",
        "vs_baseline": round(ips / 1.0, 1),  # reference: serialized CPU
        "detail": detail,
    }


def bench_cluster_only(n: int, d: int, bucket_size: int,
                       engine: str = "auto",
                       feature_dtype: str = "float32") -> dict:
    """Constrained-Ward alone over synthetic features (the SURVEY §6 scaling
    ladder: Ward time at 1k/10k/100k/1M). ``engine``: "auto" (exact engine
    under exact_limit, bucketed above), "bucketed", or "chain" (NN-chain:
    exact greedy semantics in O(n*d) memory)."""
    import jax
    import jax.numpy as jnp

    from imageclust_tpu.cluster.chain import constrained_ward_chain
    from imageclust_tpu.cluster.sharded import constrained_ward_bucketed
    from imageclust_tpu.cluster.ward import constrained_ward

    _enable_compile_cache()
    # generate directly in the residency dtype: keeping an f32 original
    # alive next to the bf16 working copy would waste n*d*4 bytes of HBM
    gen_dt = {"float32": jnp.float32, "bfloat16": jnp.bfloat16,
              "int8": jnp.int8}[feature_dtype]
    feats = _synth_features(n, d, gen_dt)

    def run():
        if engine == "chain":
            return constrained_ward_chain(feats, min_size=3, max_size=6)
        if engine == "auto" and n <= 4096:
            return constrained_ward(np.asarray(feats), min_size=3, max_size=6,
                                    update_rule="lance_williams")
        return constrained_ward_bucketed(
            feats, min_size=3, max_size=6, bucket_size=bucket_size,
            update_rule="lance_williams", feature_dtype=feature_dtype,
        )

    t0 = time.perf_counter()
    run()
    _log(f"warmup/compile cluster: {time.perf_counter() - t0:.1f}s")
    t0 = time.perf_counter()
    res = run()
    dt = time.perf_counter() - t0
    _log(f"cluster-only n={n} d={d}: {dt:.2f}s, {res.n_clusters} "
         f"clusters, {len(res.dropped)} dropped")
    return {
        "metric": f"ward_cluster_{n}_items",
        "value": round(dt, 3),
        "unit": "s",
        "vs_baseline": round(60.0 / dt, 3),
        "detail": {"n_clusters": res.n_clusters, "d": d,
                   "engine": engine, "dropped": len(res.dropped),
                   "feature_dtype": feature_dtype},
    }


def bench_quality(n: int, d: int, sep: float, towers: str,
                  batch_size: int) -> dict:
    """The non-parity QUALITY scoreboard (VERDICT r3 #3): partition
    agreement of every precision-caveated mode vs the f32 parity engine on
    overlapping synthetic mixtures — BASELINE.md measures what the modes
    buy; this measures what they cost. The `f32_seed_yardstick` row is the
    reading unit: the f32 engine vs ITSELF under a different kmeans seed.

    vs_baseline = (min mode ARI) / (yardstick ARI): > 1.0 means every
    non-parity mode diverges LESS from the parity run than the engine's
    own bucketing randomness does."""
    from imageclust_tpu.cluster.quality import (
        fusion_scoreboard,
        ptq_scoreboard,
        residency_scoreboard,
    )

    _enable_compile_cache()
    rows = {}
    t0 = time.perf_counter()
    sb = residency_scoreboard(n, d, sep=sep)
    _log(f"residency scoreboard n={n} d={d} sep={sep} "
         f"({time.perf_counter() - t0:.1f}s):")
    for mode, row in sb.items():
        _log(f"  {mode}: {json.dumps(row)}")
        if mode not in ("f32", "f32_seed_yardstick"):
            rows[f"residency_{mode}"] = row
    yard = sb["f32_seed_yardstick"]["ari"]

    # 20k (was 5k, VERDICT r4 item 5): the one-hot block is host-built
    # numpy — n=20k keeps its tunnel transfer ~seconds while quadrupling
    # the vocabulary-collision surface the fusion row measures
    n_fuse = min(n, 20_000)
    t0 = time.perf_counter()
    fuse = fusion_scoreboard(n_fuse, d, sep=sep)
    _log(f"fusion text-vs-onehot n={n_fuse} "
         f"({time.perf_counter() - t0:.1f}s): {json.dumps(fuse)}")
    rows["fusion_text"] = fuse

    for tower in [t for t in towers.split(",") if t]:
        n_t = min(n, 10_000)
        t0 = time.perf_counter()
        row = ptq_scoreboard(tower, n_t, batch_size=batch_size)
        _log(f"ptq int8 tower={tower} n={n_t} "
             f"({time.perf_counter() - t0:.1f}s): {json.dumps(row)}")
        rows[f"ptq_{tower}"] = row

    mode_aris = {k: v["ari"] for k, v in rows.items()}
    worst = min(mode_aris, key=mode_aris.get)
    return {
        "metric": f"quality_nonparity_min_ari[n{n} d{d} sep{sep}]",
        "value": mode_aris[worst],
        "unit": "ari_vs_f32_parity",
        "vs_baseline": round(mode_aris[worst] / max(yard, 1e-9), 3),
        "detail": {"worst_mode": worst, "seed_yardstick_ari": yard,
                   "modes": rows},
    }


def main() -> int:
    if os.environ.get("IMAGECLUST_CLUSTER_PROFILE"):
        import logging

        # surface the engine's per-phase INFO lines on stderr
        logging.basicConfig(level=logging.INFO, stream=sys.stderr)
    parser = argparse.ArgumentParser()
    parser.add_argument("--n", type=int, default=100_000)
    parser.add_argument("--batch", type=int, default=0,
                        help="0 = per-mode default: 512 for the e2e "
                             "resnet50 benches, the tower's measured-best "
                             "DEFAULT_BATCH for --embed-only")
    parser.add_argument("--bucket", type=int, default=256)
    parser.add_argument("--decode", action="store_true",
                        help="benchmark the host decode stage instead")
    parser.add_argument("--e2e-real", action="store_true",
                        help="end-to-end over real JPEG files on disk via "
                             "the streamed bounded-memory ingest")
    parser.add_argument("--e2e-stream", action="store_true",
                        help="ONE real Pipeline.run_stream job at tier "
                             "scale: on-device synthetic ingest -> streamed "
                             "embed -> bucketed cluster -> budgeted naming "
                             "-> full sectioned report (uses --model, "
                             "--feature-dtype, --bucket, --work-dir)")
    parser.add_argument("--work-dir", default=".bench_e2e_stream",
                        help="job work dir for --e2e-stream (the report "
                             "tree is written here)")
    parser.add_argument("--data-dir", default=".bench_data",
                        help="cache dir for generated benchmark JPEGs")
    parser.add_argument("--cluster-only", action="store_true",
                        help="benchmark constrained Ward alone")
    parser.add_argument("--embed-only", action="store_true",
                        help="benchmark one tower's warm embed throughput")
    parser.add_argument("--model", default="resnet50",
                        help="tower for --embed-only (any registry model)")
    parser.add_argument("--d", type=int, default=64,
                        help="feature dim for --cluster-only")
    parser.add_argument("--quantize", default="", choices=["", "int8"],
                        help="quantized embed tower for the e2e bench "
                             "(int8: +15-17%% embed throughput, non-parity "
                             "embeddings)")
    parser.add_argument("--feature-dtype", default="float32",
                        choices=["float32", "bfloat16", "int8"],
                        help="bucketed-engine feature residency dtype for "
                             "--cluster-only (bfloat16 doubles the "
                             "single-chip capacity envelope, int8 doubles "
                             "it again; non-parity)")
    parser.add_argument("--engine", default="auto",
                        choices=["auto", "bucketed", "chain"],
                        help="cluster engine for --cluster-only")
    parser.add_argument("--workers", type=int, default=8)
    parser.add_argument("--quality", action="store_true",
                        help="non-parity quality scoreboard: partition "
                             "agreement of bf16/int8 residency, text "
                             "fusion, and (--towers) int8 PTQ towers vs "
                             "the f32 parity engine on overlapping "
                             "mixtures")
    parser.add_argument("--sep", type=float, default=1.0,
                        help="mixture separation for --quality (1.0 = "
                             "heavy overlap, >=8 = separated blobs)")
    parser.add_argument("--towers", default="",
                        help="comma-separated towers for the --quality "
                             "int8 PTQ stage (e.g. resnet50,vit_b32)")
    args = parser.parse_args()

    if args.quality:
        result = bench_quality(args.n, args.d, args.sep, args.towers,
                               args.batch)
    elif args.decode:
        result = bench_decode(min(args.n, 10_000), args.workers)
    elif args.e2e_real:
        result = bench_e2e_real(args.n, args.batch or 512, args.bucket,
                                args.workers, args.data_dir)
    elif args.e2e_stream:
        result = bench_e2e_stream(args.n, args.model, args.batch,
                                  args.bucket, args.feature_dtype,
                                  args.work_dir)
    elif args.cluster_only:
        result = bench_cluster_only(args.n, args.d, args.bucket, args.engine,
                                    args.feature_dtype)
    elif args.embed_only:
        result = bench_embed_only(args.model, args.batch, args.n,
                                  args.quantize)
    else:
        result = bench_e2e(args.n, args.batch or 512, args.bucket, args.quantize)
    detail = result.pop("detail")
    _log(f"detail: {json.dumps(detail)}")
    print(json.dumps(result), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
