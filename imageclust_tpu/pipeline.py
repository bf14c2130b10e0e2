"""The clustering pipeline: ingest -> label -> embed -> cluster -> name -> report.

Counterpart of the reference orchestrator (internal/workflow/workflow.go) with
the architecture inverted for TPU:

* the model loads ONCE per process, not per request (the reference reloads
  the ONNX net inside every POST handler, workflow.go:49-55 via
  handlers.go:111),
* embedding is one batched device program over the whole upload instead of a
  goroutine-per-image fan-in serialized behind a mutex (workflow.go:149-185,
  embeddings.go:133-134),
* labels are fetched once per image and reused for both the per-image record
  and the global label set — the reference calls the labeler twice with
  different thresholds (75 then 80) and silently gets the first call's cached
  answer anyway (workflow.go:129, embeddings.go:208, rekognition.go:127-131),
* clustering dispatches to the exact engine or the bucketed/sharded engine by
  job size (config.ClusterConfig.exact_limit),
* per-cluster label aggregation keeps first-seen order (the reference
  iterates a Go map — nondeterministic order, workflow.go:239-245).

Output shape parity: {"Cluster-<i>": ClusterDetails} (workflow.go:192) and a
clusters.html report in the work dir.
"""

from __future__ import annotations

import logging
import os
from dataclasses import dataclass, field

import numpy as np

from imageclust_tpu.cluster import (
    constrained_ward,
    constrained_ward_bucketed,
    constrained_ward_chain,
)
from imageclust_tpu.config import AppConfig
from imageclust_tpu.data.loader import (
    _read_file,
    decode_images,
    dedup_name,
    sanitize_filename,
)
from imageclust_tpu.labels import (
    build_label_set,
    combine_embeddings,
    create_labeler,
    one_hot_matrix,
)
from imageclust_tpu.naming import create_naming_service
from imageclust_tpu.report import write_report
from imageclust_tpu.types import ClusterDetails, UploadedImage
from imageclust_tpu.utils.metrics import RunMetrics, StageTimer

log = logging.getLogger(__name__)

__all__ = ["Pipeline", "PipelineResult"]


@dataclass
class PipelineResult:
    clusters: dict[str, ClusterDetails]
    html_path: str
    metrics: RunMetrics
    dropped: list[str] = field(default_factory=list)

    def to_dict(self) -> dict:
        return {
            "clusters": {k: v.to_dict() for k, v in self.clusters.items()},
            "dropped": list(self.dropped),
            "metrics": self.metrics.to_dict(),
            "htmlPath": self.html_path,
        }


class Pipeline:
    """Long-lived pipeline: construct once, run per job."""

    def __init__(self, config: AppConfig | None = None, mesh=None,
                 embedder=None):
        from imageclust_tpu.models import create_embedder

        self.config = config or AppConfig()
        self.mesh = mesh
        self.embedder = embedder or create_embedder(self.config.embed, mesh)
        self.naming = create_naming_service(self.config.naming)
        self._text_encoder = None  # lazy: only labels.fusion="text" pays
        self._naming_skipped = 0  # set per run by _prepare_cluster_details

    def _get_text_encoder(self):
        """Text tower for dense label fusion (labels.fusion="text"), built
        once per process like the image tower — label-name embeddings are
        corpus-independent, so the jit cache and weights carry across jobs."""
        if self._text_encoder is None:
            from imageclust_tpu.models.text import TextEncoder

            ckpt = self.config.labels.text_checkpoint_path
            self._text_encoder = (
                TextEncoder.from_checkpoint(ckpt) if ckpt else TextEncoder())
        return self._text_encoder

    # ------------------------------------------------------------------

    def run(
        self,
        uploads: list[UploadedImage],
        work_dir: str,
        min_size: int | None = None,
        max_size: int | None = None,
        profile_dir: str | None = None,
        image_route: str = "/api/image/",
        report_routes: tuple[str, str] | None = None,
    ) -> PipelineResult:
        cfg = self.config
        min_size = cfg.cluster.min_size if min_size is None else min_size
        max_size = cfg.cluster.max_size if max_size is None else max_size
        if not uploads:
            raise ValueError("no images uploaded")
        if min_size < 1 or max_size < min_size:
            raise ValueError(
                f"invalid cluster size bounds [{min_size}, {max_size}]"
            )

        metrics = RunMetrics()
        timer = StageTimer(metrics, profile_dir)
        metrics.counters["images"] = len(uploads)

        image_dir = os.path.join(work_dir, "images")
        cache_dir = os.path.join(work_dir, "cache")
        os.makedirs(image_dir, exist_ok=True)  # workflow.go:110-118
        os.makedirs(cache_dir, exist_ok=True)

        with timer.profiled():
            with timer.stage("ingest"):
                names, blobs = self._save_uploads(uploads, image_dir)
                item_ids = [f"img_{i}" for i in range(len(names))]  # workflow.go:140
            return self._run_core(
                names, blobs, item_ids, work_dir, cache_dir,
                min_size, max_size, metrics, timer, image_route,
                report_routes,
            )

    def run_paths(
        self,
        paths: list[str],
        work_dir: str,
        min_size: int | None = None,
        max_size: int | None = None,
        profile_dir: str | None = None,
        image_route: str = "/api/image/",
        report_routes: tuple[str, str] | None = None,
    ) -> PipelineResult:
        """Run over images already on disk WITHOUT loading them all into
        memory: file reads, decode, and the device forward are streamed in
        bounded chunks (big jobs), so a 100k-image directory never
        materializes a 15 GB pixel array the way the upload path's
        save-then-batch flow would. Images are not copied into the work dir;
        report entries use the (sanitized, deduplicated) basenames."""
        cfg = self.config
        min_size = cfg.cluster.min_size if min_size is None else min_size
        max_size = cfg.cluster.max_size if max_size is None else max_size
        if not paths:
            raise ValueError("no images supplied")
        if min_size < 1 or max_size < min_size:
            raise ValueError(
                f"invalid cluster size bounds [{min_size}, {max_size}]"
            )

        metrics = RunMetrics()
        timer = StageTimer(metrics, profile_dir)
        metrics.counters["images"] = len(paths)
        cache_dir = os.path.join(work_dir, "cache")
        os.makedirs(cache_dir, exist_ok=True)

        names: list[str] = []
        seen: set[str] = set()
        for p in paths:
            name = dedup_name(
                sanitize_filename(os.path.basename(p)) or "image", seen)
            seen.add(name)
            names.append(name)
        item_ids = [f"img_{i}" for i in range(len(names))]

        with timer.profiled():
            return self._run_core(
                names, list(paths), item_ids, work_dir, cache_dir,
                min_size, max_size, metrics, timer, image_route,
                report_routes,
            )

    def run_stream(
        self,
        chunks,
        n_images: int,
        work_dir: str,
        name_fn=None,
        min_size: int | None = None,
        max_size: int | None = None,
        profile_dir: str | None = None,
        image_route: str = "/api/image/",
        report_routes: tuple[str, str] | None = None,
    ) -> PipelineResult:
        """Tier-scale pipeline entry: images arrive as an iterator of uint8
        (b, S, S, 3) chunks — HOST or DEVICE arrays (device chunks feed the
        forward pass with no transfer: the on-device ingest that makes the
        10M tier reachable through a ~20 MB/s host link). Embeddings
        accumulate straight into ONE preallocated residency-dtype buffer
        (``Embedder.embed_stream_quantized(total=...)``), cluster with the
        scale engine in COLUMNAR form (no per-item Python id strings), then
        run the same naming/report tail as :meth:`run`/:meth:`run_paths` —
        the reference's whole contract (workflow.go:66-108 ->
        utils.go:23-214) at four orders of magnitude its scale.

        ``name_fn(i) -> str`` supplies display names per item index
        (default ``img_{i:07d}.jpg``). Labeling backends: ``none`` (skip)
        or ``zero_shot`` (batched from the embeddings — no image bytes
        needed); blob-based backends need :meth:`run_paths`.
        """
        cfg = self.config
        min_size = cfg.cluster.min_size if min_size is None else min_size
        max_size = cfg.cluster.max_size if max_size is None else max_size
        if n_images < 1:
            raise ValueError("no images supplied")
        if min_size < 1 or max_size < min_size:
            raise ValueError(
                f"invalid cluster size bounds [{min_size}, {max_size}]")
        if cfg.labels.backend not in ("none", "", "zero_shot"):
            raise ValueError(
                f"run_stream supports labels.backend 'none' or 'zero_shot' "
                f"(got {cfg.labels.backend!r}); blob-based labelers need "
                "run_paths")
        name_fn = name_fn or (lambda i: f"img_{i:07d}.jpg")

        metrics = RunMetrics()
        timer = StageTimer(metrics, profile_dir)
        metrics.counters["images"] = n_images
        os.makedirs(work_dir, exist_ok=True)

        with timer.profiled():
            with timer.stage("embed"):
                import jax.numpy as jnp

                emb_scale = 1.0
                res_dt = None
                if cfg.cluster.scale_engine == "bucketed":
                    res_dt = {"bfloat16": jnp.bfloat16,
                              "int8": jnp.int8}.get(cfg.cluster.feature_dtype)
                image_emb, emb_scale = self.embedder.embed_stream_quantized(
                    chunks, out_dtype=res_dt, total=n_images)

            per_image_labels = None
            label_mat = np.zeros((n_images, 0), np.float32)
            if cfg.labels.backend == "zero_shot":
                with timer.stage("label"):
                    zs = create_labeler(cfg.labels, None,
                                        embedder=self.embedder)
                    per_image_labels = zs.labels_from_embeddings(
                        image_emb, cfg.labels.max_labels,
                        cfg.labels.min_confidence)
                    label_set = self._label_set(per_image_labels, cfg.labels)
                    metrics.counters["unique_labels"] = len(label_set)
                with timer.stage("fuse"):
                    if cfg.labels.fusion == "text":
                        from imageclust_tpu.labels.text_fusion import (
                            text_label_matrix,
                        )

                        label_mat = text_label_matrix(
                            per_image_labels, label_set,
                            self._get_text_encoder())
                    else:
                        label_mat = one_hot_matrix(per_image_labels,
                                                   label_set)
                    if cfg.labels.fusion_weight != 1.0:
                        label_mat = label_mat * np.float32(
                            cfg.labels.fusion_weight)
            features = self._fuse_big(image_emb, label_mat, emb_scale)

            with timer.stage("cluster"):
                result = self._cluster_big(
                    features, None, min_size, max_size)
                metrics.counters["clusters"] = result.n_clusters
                n_dropped = (len(result._dropped_idx)
                             if result._dropped_idx is not None
                             else len(result.dropped))
                metrics.counters["dropped"] = n_dropped

            with timer.stage("name"):
                details = self._prepare_details_columnar(
                    result, name_fn, per_image_labels, work_dir=work_dir)
                if self._naming_skipped:
                    metrics.counters["naming_skipped"] = self._naming_skipped

            with timer.stage("report"):
                routes = tuple(report_routes or ())
                page_route = routes[0] if routes else "clusters_p{page}.html"
                index_route = routes[1] if len(routes) > 1 else "clusters.html"
                section_route = (routes[2] if len(routes) > 2
                                 else "clusters_ix{sec}.html")
                html_path = write_report(
                    details, work_dir, image_route,
                    page_size=cfg.service.report_page_size,
                    page_route=page_route, index_route=index_route,
                    section_route=section_route)

        if result._dropped_idx is not None:
            dropped_names = [name_fn(int(i)) for i in result._dropped_idx]
        else:  # eager fallback result: ids are the default "img_<idx>"
            dropped_names = [name_fn(int(s.rsplit("_", 1)[-1]))
                             for s in result.dropped]
        log.info("pipeline done: %d clusters, %d dropped, stages %s",
                 len(details), len(dropped_names), metrics.stages)
        return PipelineResult(details, html_path, metrics, dropped_names)

    def _run_core(
        self,
        names: list[str],
        sources: list,  # bytes (uploads) or str paths (run_paths)
        item_ids: list[str],
        work_dir: str,
        cache_dir: str,
        min_size: int,
        max_size: int,
        metrics: RunMetrics,
        timer: StageTimer,
        image_route: str,
        report_routes: tuple[str, str] | None = None,
    ) -> PipelineResult:
        cfg = self.config
        # zero-shot labels come FROM the batch embeddings (computed
        # below) instead of a per-image forward pass per label query
        zero_shot_batched = cfg.labels.backend == "zero_shot"
        # Above exact_limit, embeddings stay in HBM all the way through
        # clustering (no per-image cache — host round trips dominate at
        # that scale); small jobs use the content-addressed cache.
        big_job = len(sources) > cfg.cluster.exact_limit

        if big_job:
            # Streamed ingest: read -> (label) -> decode -> device forward in
            # bounded chunks; the producer thread decodes chunk k+1 while the
            # device runs chunk k. RSS stays O(chunk), not O(job) — the
            # all-at-once path would hold 15 GB of pixels at 100k images.
            from imageclust_tpu.data.loader import stream_decode

            labeling = None
            labeler = None
            if not zero_shot_batched:
                labeler = create_labeler(
                    cfg.labels, cache_dir if cfg.labels.cache else None,
                    embedder=self.embedder,
                )
                labeling = self._labeling_service(
                    labeler, cfg.labels, total=len(sources))
            per_image_labels: list = []

            def chunk_iter():
                for _start, chunk_blobs, imgs in stream_decode(
                    sources,
                    size=self.embedder.spec.input_size,
                    batch=self.embedder.batch_size,
                    workers=cfg.preprocess.decode_workers,
                ):
                    if labeling is not None:
                        # one service spans the whole stream: rate limiter,
                        # retry budget, and progress are job-global
                        per_image_labels.extend(
                            labeling.detect_all(chunk_blobs))
                    yield imgs

            with timer.stage("embed"):
                # stream straight into the cluster residency dtype: the
                # f32 matrix never materializes, so the bf16/int8 capacity
                # tiers work through the real pipeline (chain keeps f32 —
                # its internal state is f32 centroids anyway)
                emb_scale = 1.0
                res_dt = None
                if cfg.cluster.scale_engine == "bucketed":
                    import jax.numpy as jnp

                    res_dt = {"bfloat16": jnp.bfloat16,
                              "int8": jnp.int8}.get(
                                  cfg.cluster.feature_dtype)
                if res_dt is not None:
                    image_emb, emb_scale = (
                        self.embedder.embed_stream_quantized(
                            chunk_iter(), out_dtype=res_dt))
                else:
                    image_emb = self.embedder.embed_stream(chunk_iter())
            if not zero_shot_batched:
                label_set = self._label_set(per_image_labels, cfg.labels)
                metrics.counters["unique_labels"] = len(label_set)
                if hasattr(labeler, "hits"):
                    metrics.counters["label_cache_hits"] = labeler.hits
        else:
            blobs = [
                s if isinstance(s, (bytes, bytearray)) else _read_file(s)
                for s in sources
            ]
            if not zero_shot_batched:
                with timer.stage("label"):
                    labeler = create_labeler(
                        cfg.labels, cache_dir if cfg.labels.cache else None,
                        embedder=self.embedder,
                    )
                    labeling = self._labeling_service(
                        labeler, cfg.labels, total=len(blobs))
                    per_image_labels = labeling.detect_all(blobs)
                    label_set = self._label_set(per_image_labels, cfg.labels)
                    metrics.counters["unique_labels"] = len(label_set)
                    if hasattr(labeler, "hits"):
                        metrics.counters["label_cache_hits"] = labeler.hits

            with timer.stage("decode"):
                batch = decode_images(
                    blobs,
                    size=self.embedder.spec.input_size,
                    workers=cfg.preprocess.decode_workers,
                )

            with timer.stage("embed"):
                if cfg.embed.cache:
                    from imageclust_tpu.utils.checkpoint import EmbeddingCache

                    emb_cache = EmbeddingCache(
                        os.path.join(cache_dir, "embeddings"),
                        self.embedder.tag,
                    )
                    image_emb = emb_cache.embed_with_cache(
                        self.embedder, blobs, batch
                    )
                    metrics.counters["embed_cache_hits"] = emb_cache.hits
                else:
                    image_emb = self.embedder.embed(batch)

        if zero_shot_batched:
            with timer.stage("label"):
                # construction stays with create_labeler (one place for
                # bank/config plumbing); the per-image file cache doesn't
                # apply to the batched flow — the embedding cache already
                # covers the expensive half
                zs = create_labeler(cfg.labels, None,
                                    embedder=self.embedder)
                per_image_labels = zs.labels_from_embeddings(
                    image_emb,  # device array stays on device
                    cfg.labels.max_labels,
                    cfg.labels.min_confidence,
                )
                label_set = self._label_set(per_image_labels, cfg.labels)
                metrics.counters["unique_labels"] = len(label_set)

        with timer.stage("fuse"):
            if cfg.labels.fusion == "text":
                from imageclust_tpu.labels.text_fusion import text_label_matrix

                label_mat = text_label_matrix(
                    per_image_labels, label_set, self._get_text_encoder())
            elif cfg.labels.fusion == "onehot":
                label_mat = one_hot_matrix(per_image_labels, label_set)
            else:  # fail loud: a typo must not silently change geometry
                raise ValueError(
                    f"unknown labels.fusion {cfg.labels.fusion!r} "
                    "(expected 'onehot' or 'text')")
            if cfg.labels.fusion_weight != 1.0:
                label_mat = label_mat * np.float32(cfg.labels.fusion_weight)
            if big_job:
                features = self._fuse_big(image_emb, label_mat, emb_scale)
            else:
                features = combine_embeddings(image_emb, label_mat)

        with timer.stage("cluster"):
            if not big_job:
                result = constrained_ward(
                    features, item_ids,
                    min_size=min_size, max_size=max_size,
                    update_rule=cfg.cluster.update_rule,
                    reassign_dropped=cfg.cluster.reassign_dropped,
                )
            else:
                result = self._cluster_big(
                    features, item_ids, min_size, max_size)
            metrics.counters["clusters"] = result.n_clusters
            metrics.counters["dropped"] = len(result.dropped)

        with timer.stage("name"):
            details = self._prepare_cluster_details(
                result.cluster_map, item_ids, names, per_image_labels,
                work_dir=work_dir,
            )
            if self._naming_skipped:
                metrics.counters["naming_skipped"] = self._naming_skipped

        with timer.stage("report"):
            # report_routes = (page_route, index_route[, section_route]) for
            # job-scoped pagination links; file-relative defaults otherwise
            routes = tuple(report_routes or ())
            page_route = routes[0] if routes else "clusters_p{page}.html"
            index_route = routes[1] if len(routes) > 1 else "clusters.html"
            section_route = (routes[2] if len(routes) > 2
                             else "clusters_ix{sec}.html")
            html_path = write_report(
                details, work_dir, image_route,
                page_size=cfg.service.report_page_size,
                page_route=page_route, index_route=index_route,
                section_route=section_route)

        id_to_name = dict(zip(item_ids, names))
        dropped_names = [id_to_name[i] for i in result.dropped]
        log.info("pipeline done: %d clusters, %d dropped, stages %s",
                 len(details), len(dropped_names), metrics.stages)
        return PipelineResult(details, html_path, metrics, dropped_names)

    # ------------------------------------------------------------------

    def _fuse_big(self, image_emb, label_mat, emb_scale: float):
        """Fuse the label block onto DEVICE-RESIDENT embeddings (the big-job
        path: features never visit the host). Handles the int8 residency
        grid and multi-process global arrays."""
        import jax
        import jax.numpy as jnp

        if not label_mat.shape[1]:
            return image_emb
        if image_emb.dtype == jnp.int8:
            # same grid as the streamed image block: divide by its scale so
            # relative geometry matches the f32 pipeline (the engine itself
            # is scale-invariant)
            had_labels = bool(label_mat.any())
            label_mat = np.clip(
                np.round(label_mat / np.float32(emb_scale)),
                -127, 127).astype(np.int8)
            if had_labels and not label_mat.any():
                # faithful to f32 semantics (values this far below the
                # image block's magnitude barely moved Ward distances
                # either) — but say it
                log.warning(
                    "int8 residency rounded the label block to all zeros "
                    "(values below the grid step %.3g) — labels will not "
                    "influence clustering; raise labels.fusion_weight to "
                    "give them weight", emb_scale)
        lm = jnp.asarray(label_mat).astype(image_emb.dtype)
        if (isinstance(image_emb, jax.Array)
                and not image_emb.is_fully_addressable):
            # multi-process mesh: the label block must be a GLOBAL array
            # before it can concatenate with the sharded embeddings
            # (replicated — it is small)
            from jax.sharding import NamedSharding
            from jax.sharding import PartitionSpec as P

            host = np.asarray(lm)
            lm = jax.make_array_from_callback(
                host.shape, NamedSharding(self.mesh, P()),
                lambda idx: host[idx])
        return jnp.concatenate([image_emb, lm], axis=1)

    def _cluster_big(self, features, item_ids, min_size: int, max_size: int):
        """Scale-engine dispatch (above cluster.exact_limit): NN-chain for
        exact greedy semantics, bucketed for capacity. ``item_ids`` may be
        None — the bucketed engine then returns its columnar form with
        integer item indices (the 10M tier: materializing 10M id strings
        is pure host overhead)."""
        cfg = self.config
        if cfg.cluster.scale_engine == "chain":
            return constrained_ward_chain(
                features, item_ids,
                min_size=min_size, max_size=max_size,
                reassign_dropped=cfg.cluster.scale_reassign_dropped,
                mesh=self.mesh,
            )
        if cfg.cluster.scale_engine != "bucketed":
            # fail loud: a typo must not silently run the bucketed
            # approximation in place of the exact-semantics chain engine
            raise ValueError(
                f"unknown cluster.scale_engine "
                f"{cfg.cluster.scale_engine!r}; know 'bucketed', 'chain'"
            )
        return constrained_ward_bucketed(
            features, item_ids,
            min_size=min_size, max_size=max_size,
            bucket_size=cfg.cluster.bucket_size,
            kmeans_iters=cfg.cluster.kmeans_iters,
            update_rule=cfg.cluster.scale_update_rule,
            mesh=self.mesh,
            reassign_dropped=cfg.cluster.scale_reassign_dropped,
            feature_dtype=cfg.cluster.feature_dtype,
        )

    @staticmethod
    def _labeling_service(labeler, label_cfg, total: int):
        """Per-image labels at scale (labels/service.py): bounded
        configurable concurrency, shared rate limiter, retries, progress,
        cache-backed resume — the reference labels strictly serially with
        none of that (workflow.go:120-147). The "none" backend skips the
        thread pool entirely (its answers are free)."""
        from imageclust_tpu.labels.service import create_labeling_service

        svc = create_labeling_service(labeler, label_cfg, total=total)
        if label_cfg.backend in ("none", ""):
            svc.concurrency = 1
        return svc

    @staticmethod
    def _label_set(per_image_labels, label_cfg):
        """Label-set threshold: 0 = observed reference behavior (the cache
        reuses the first query's labels); >0 filters like the reference's
        intended BuildLabelSet call (embeddings.go:208)."""
        floor = label_cfg.label_set_min_confidence
        if floor > 0:
            source = [
                [l for l in labels if l.confidence >= floor]
                for labels in per_image_labels
            ]
        else:
            source = per_image_labels
        return build_label_set(source)

    def _save_uploads(
        self, uploads: list[UploadedImage], image_dir: str
    ) -> tuple[list[str], list[bytes]]:
        """Persist sanitized uploads (handlers.go:86-104 + workflow.go:120-127)
        and return (filenames, raw bytes)."""
        names: list[str] = []
        blobs: list[bytes] = []
        seen: set[str] = set()
        for up in uploads:
            name = dedup_name(sanitize_filename(up.filename) or "image", seen)
            seen.add(name)
            with open(os.path.join(image_dir, name), "wb") as fh:
                fh.write(up.data)
            names.append(name)
            blobs.append(up.data)
        return names, blobs

    def _prepare_cluster_details(
        self,
        cluster_map: dict[int, list[str]],
        item_ids: list[str],
        names: list[str],
        per_image_labels,
        work_dir: str | None = None,
    ) -> dict[str, ClusterDetails]:
        """workflow.go:187-229 with deterministic label order, a working
        primary-title assignment, and the naming stage scaled to the
        engine's tier: clusters are named through
        :meth:`NamingService.name_clusters` (bounded concurrency across
        clusters, shared rate limit, resumable JSONL state under the job's
        work dir — re-running a crashed job skips already-named clusters)."""
        id_to_idx = {iid: i for i, iid in enumerate(item_ids)}
        details: dict[str, ClusterDetails] = {}
        texts: dict[str, str] = {}
        for cluster_id, members in cluster_map.items():
            d = ClusterDetails()
            seen_labels: list[str] = []
            for iid in members:
                idx = id_to_idx[iid]
                for label in per_image_labels[idx]:
                    if label.name not in seen_labels:
                        seen_labels.append(label.name)
                d.images.append(names[idx])
            d.labels = ", ".join(seen_labels)
            key = f"Cluster-{cluster_id}"  # workflow.go:192
            details[key] = d
            texts[key] = d.labels

        self._apply_naming(details, texts, work_dir)
        return details

    def _prepare_details_columnar(
        self,
        result,
        name_fn,
        per_image_labels=None,
        work_dir: str | None = None,
    ) -> dict[str, ClusterDetails]:
        """workflow.go:187-229 over the engine's COLUMNAR result: cluster
        member indices drive ``name_fn``/label lookups directly, so the 10M
        tier never materializes per-item id strings or an id->index dict
        (measured ~85 s of pure host time at 2M+ clusters). Same naming
        budget/resume semantics as :meth:`_prepare_cluster_details`."""
        details: dict[str, ClusterDetails] = {}
        texts: dict[str, str] = {}

        def cluster_iter():
            if result._members is not None:
                mem, off = result._members, result._offsets
                for c in range(len(off) - 1):
                    yield c, mem[off[c]:off[c + 1]]
            else:  # eager engine result (tiny jobs: the 1-bucket fallback)
                for c, idxs in result._index_map.items():
                    yield c, idxs

        for cid, idxs in cluster_iter():
            d = ClusterDetails()
            if per_image_labels is None:
                d.images = [name_fn(int(i)) for i in idxs]
            else:
                seen_labels: list[str] = []
                for i in idxs:
                    i = int(i)
                    for label in per_image_labels[i]:
                        if label.name not in seen_labels:
                            seen_labels.append(label.name)
                    d.images.append(name_fn(i))
                d.labels = ", ".join(seen_labels)
            key = f"Cluster-{cid}"  # workflow.go:192
            details[key] = d
            texts[key] = d.labels

        self._apply_naming(details, texts, work_dir)
        return details

    def _apply_naming(
        self,
        details: dict[str, ClusterDetails],
        texts: dict[str, str],
        work_dir: str | None,
    ) -> None:
        """Budget + name + assign titles, shared by the dict-map and
        columnar detail preps.

        Naming budget (naming.max_clusters): at the engine's 10M tier
        there are ~2.28M clusters — name only the N largest (ties by
        cluster id: deterministic), skip the rest explicitly. Skipped
        clusters keep their label text and render under their cluster id."""
        budget = self.config.naming.max_clusters
        self._naming_skipped = 0
        if budget and len(texts) > budget:
            # top-N by (size desc, id asc) via one numpy lexsort — the
            # Python sorted()+lambda equivalent costs ~2.4 s at the 2.2M
            # cluster tier vs ~0.1 s here (order-identical, incl. ties)
            keys = list(texts)
            sizes = np.fromiter((len(details[k].images) for k in keys),
                                np.int64, len(keys))
            ids = np.fromiter((int(k.rsplit("-", 1)[-1]) for k in keys),
                              np.int64, len(keys))
            keep = [keys[i] for i in np.lexsort((ids, -sizes))[:budget]]
            self._naming_skipped = len(texts) - budget
            log.info(
                "naming budget: naming the %d largest of %d clusters "
                "(%d skipped; raise naming.max_clusters to name more)",
                budget, len(texts), self._naming_skipped)
            texts = {k: texts[k] for k in keep}

        state_path = os.path.join(work_dir, "naming_state.jsonl") \
            if work_dir else None
        outputs = self.naming.name_clusters(texts, state_path=state_path)
        for key, outs in outputs.items():
            d = details[key]
            for out in outs:
                d.set_output(out)
            if d.service_outputs:  # primary = first in display order
                d.title = d.service_outputs[0].title
                d.catchy_phrase = d.service_outputs[0].catchy_phrase
