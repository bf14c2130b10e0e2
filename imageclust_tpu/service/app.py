"""HTTP service: the reference's REST surface on aiohttp.

Route and response-shape parity with main.go:15-22 + internal/handlers:

* ``POST /api/cluster`` — multipart ``images`` files; success
  ``{"status": "success", "filePath": ...}`` (handlers.go:123-127, extended
  with jobId/clusters/dropped), errors ``{"success": false, "error": ...}``
  (handlers.go:177-182). Honors the ``minClusterSize``/``maxClusterSize``
  form fields the frontend already sends — the reference ignored them and
  hardcoded (3,6) (handlers.go:111, SURVEY.md §2 quirk #1).
* ``GET /api/view`` — the clusters.html report (handlers.go:131-139); takes
  an optional ``?job=`` id, defaulting to the latest finished job.
* ``GET /api/image/{name}`` — cluster images with the extension->MIME table
  (handlers.go:161-171) and sanitized names (path-traversal defense,
  utils.go:240-250).
* CORS middleware (handlers.go:49-62) and SPA static fallback with /view
  passthrough (handlers.go:199-214).

Added beyond the reference: ``GET /api/jobs`` + per-job isolation (fixes the
global-temp-dir clobbering), ``GET /healthz``, and a ``GET /api/result``
JSON view of the cluster map. The heavy pipeline runs in a worker thread so
the event loop stays responsive; per-process the TPU pipeline itself is
serialized (one model, one device queue).
"""

from __future__ import annotations

import asyncio
import json
import logging
import os

from aiohttp import web

from imageclust_tpu.config import AppConfig
from imageclust_tpu.data.loader import sanitize_filename
from imageclust_tpu.service.jobs import JobStore
from imageclust_tpu.types import UploadedImage

log = logging.getLogger(__name__)

__all__ = ["create_app", "run_server"]

_MIME = {  # handlers.go:161-171 table (default image/jpeg)
    ".png": "image/png",
    ".gif": "image/gif",
    ".webp": "image/webp",
}


@web.middleware
async def cors_middleware(request: web.Request, handler):
    if request.method == "OPTIONS":
        resp = web.Response(status=200)
    else:
        try:
            resp = await handler(request)
        except web.HTTPException as exc:
            resp = exc
    resp.headers["Access-Control-Allow-Origin"] = "*"
    resp.headers["Access-Control-Allow-Methods"] = "POST, GET, OPTIONS, PUT, DELETE"
    resp.headers["Access-Control-Allow-Headers"] = "Content-Type"
    if isinstance(resp, web.HTTPException):
        raise resp
    return resp


def _error(status: int, message: str) -> web.Response:
    return web.json_response({"success": False, "error": message}, status=status)


def create_app(
    config: AppConfig | None = None,
    pipeline=None,
    job_store: JobStore | None = None,
) -> web.Application:
    config = config or AppConfig()
    if pipeline is None:
        from imageclust_tpu.pipeline import Pipeline

        pipeline = Pipeline(config)
    jobs = job_store or JobStore(config.service.work_dir or None)
    run_lock = asyncio.Lock()  # one TPU pipeline run at a time

    from imageclust_tpu.utils.metrics import ServiceMetrics

    svc_metrics = ServiceMetrics()

    def _record_run(result, ok: bool) -> None:
        svc_metrics.inc("imageclust_jobs_total")
        if ok:
            svc_metrics.observe_run(result.metrics)
        else:
            svc_metrics.inc("imageclust_jobs_failed_total")

    app = web.Application(
        middlewares=[cors_middleware],
        client_max_size=config.service.max_upload_bytes,  # handlers.go:71
    )

    def _write_result(job, result) -> None:
        # atomic: a concurrent GET /api/result must never read a partial file
        path = os.path.join(job.work_dir, "result.json")
        tmp = path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(result.to_dict(), fh)
        os.replace(tmp, path)

    # strong refs: the event loop holds tasks weakly — an unreferenced
    # background job could be garbage-collected mid-run
    background_tasks: set = set()

    def _spawn(coro) -> None:
        task = asyncio.create_task(coro)
        background_tasks.add(task)
        task.add_done_callback(background_tasks.discard)

    async def _run_job_background(job, uploads, min_size, max_size) -> None:
        try:
            async with run_lock:
                result = await asyncio.to_thread(
                    pipeline.run, uploads, job.work_dir, min_size, max_size,
                    image_route=f"/api/image/{{name}}?job={job.job_id}",
                    report_routes=(
                        f"/api/view?job={job.job_id}&page={{page}}",
                        f"/api/view?job={job.job_id}",
                        f"/api/view?job={job.job_id}&sec={{sec}}",
                    ),
                )
            _write_result(job, result)
            jobs.set_status(job, "done")
            _record_run(result, True)
        except Exception as exc:
            log.exception("async job %s failed", job.job_id)
            jobs.set_status(job, "failed", str(exc))
            _record_run(None, False)
        finally:
            await asyncio.to_thread(
                jobs.prune, config.service.max_jobs,
                config.service.max_job_age_s,
            )

    async def cluster_handler(request: web.Request) -> web.Response:
        try:
            reader = await request.multipart()
        except (AssertionError, ValueError):
            return _error(400, "Failed to parse form data")  # handlers.go:73
        uploads: list[UploadedImage] = []
        min_size = config.cluster.min_size
        max_size = config.cluster.max_size
        total_bytes = 0
        async for part in reader:
            if part.name == "images" and part.filename:
                # enforce the 32MB-style bound ourselves, mid-stream:
                # client_max_size is not applied to streamed multipart reads
                # (handlers.go:71), and buffering a whole part before
                # checking would let one oversized part exhaust memory
                chunks = []
                while True:
                    chunk = await part.read_chunk(64 * 1024)
                    if not chunk:
                        break
                    total_bytes += len(chunk)
                    if total_bytes > config.service.max_upload_bytes:
                        return _error(
                            413,
                            f"upload exceeds "
                            f"{config.service.max_upload_bytes} bytes",
                        )
                    chunks.append(chunk)
                # raw bytes, matching the previous read(decode=False)
                data = b"".join(chunks)
                if data:
                    uploads.append(
                        UploadedImage(sanitize_filename(part.filename), data)
                    )
            elif part.name == "minClusterSize":
                try:
                    min_size = int((await part.text()).strip())
                except ValueError:
                    return _error(400, "invalid minClusterSize")
            elif part.name == "maxClusterSize":
                try:
                    max_size = int((await part.text()).strip())
                except ValueError:
                    return _error(400, "invalid maxClusterSize")
        if not uploads:
            return _error(400, "No valid images uploaded")  # handlers.go:107
        if min_size < 1 or max_size < min_size:
            return _error(400,
                          f"invalid cluster sizes [{min_size}, {max_size}]")

        job = jobs.create()
        jobs.set_status(job, "running")

        # ?async=1 — enqueue and return immediately; poll GET /api/result.
        # (The reference blocks the request for the whole pipeline.)
        if request.query.get("async") in ("1", "true"):
            _spawn(_run_job_background(job, uploads, min_size, max_size))
            return web.json_response(
                {"status": "accepted", "jobId": job.job_id,
                 "resultUrl": f"/api/result?job={job.job_id}"},
                status=202,
            )

        try:
            async with run_lock:
                result = await asyncio.to_thread(
                    pipeline.run, uploads, job.work_dir, min_size, max_size,
                    image_route=f"/api/image/{{name}}?job={job.job_id}",
                    report_routes=(
                        f"/api/view?job={job.job_id}&page={{page}}",
                        f"/api/view?job={job.job_id}",
                        f"/api/view?job={job.job_id}&sec={{sec}}",
                    ),
                )
        except Exception as exc:
            log.exception("job %s failed", job.job_id)
            jobs.set_status(job, "failed", str(exc))
            _record_run(None, False)
            return _error(500, str(exc))
        finally:
            # retention applies on failures too, and off the event loop
            # (bulk rmtree would stall concurrent requests)
            _spawn(
                asyncio.to_thread(
                    jobs.prune,
                    config.service.max_jobs,
                    config.service.max_job_age_s,
                )
            )
        _write_result(job, result)  # before 'done': pollers of /api/result
        jobs.set_status(job, "done")  # must never see done-without-result
        _record_run(result, True)
        return web.json_response(
            {
                "status": "success",  # handlers.go:123-127 contract
                "filePath": result.html_path,
                "jobId": job.job_id,
                "viewUrl": f"/api/view?job={job.job_id}",
                "clusters": {k: v.to_dict() for k, v in result.clusters.items()},
                "dropped": result.dropped,
                "metrics": result.metrics.to_dict(),
            }
        )

    async def view_handler(request: web.Request) -> web.StreamResponse:
        job = jobs.get(request.query.get("job"))
        if job is None or not os.path.exists(job.html_path):
            return _error(404, "No HTML file available")  # handlers.go:134
        # page=N -> card page; sec=N -> section index (two-level reports)
        for param, stem in (("page", "clusters_p"), ("sec", "clusters_ix")):
            value = request.query.get(param)
            if value is None:
                continue
            if not value.isdigit():  # int-only: no path material in the name
                return _error(400, f"invalid {param}")
            ppath = os.path.join(os.path.dirname(job.html_path),
                                 f"{stem}{int(value)}.html")
            if not os.path.exists(ppath):
                return _error(404, "no such report page")
            return web.FileResponse(ppath)
        return web.FileResponse(job.html_path)

    async def image_handler(request: web.Request) -> web.StreamResponse:
        name = sanitize_filename(request.match_info["name"])
        job = jobs.get(request.query.get("job"))
        if job is None:
            return _error(404, "No images available")  # handlers.go:148
        path = os.path.join(job.image_dir, name)
        if not os.path.isfile(path):
            return _error(404, "Image not found")  # handlers.go:157
        ext = os.path.splitext(name)[1].lower()
        return web.FileResponse(
            path, headers={"Content-Type": _MIME.get(ext, "image/jpeg")}
        )

    async def result_handler(request: web.Request) -> web.Response:
        job = jobs.get(request.query.get("job"))
        if job is None:
            return _error(404, "no such job")
        path = os.path.join(job.work_dir, "result.json")
        if not os.path.exists(path):
            return web.json_response(job.meta_dict())
        try:
            with open(path) as fh:
                return web.json_response(json.load(fh))
        except (OSError, json.JSONDecodeError):
            # pruned or mid-write: report the job meta instead of a 500
            return web.json_response(job.meta_dict())

    async def jobs_handler(request: web.Request) -> web.Response:
        return web.json_response({"jobs": jobs.list_jobs()})

    async def metrics_handler(request: web.Request) -> web.Response:
        return web.Response(text=svc_metrics.render(),
                            content_type="text/plain")

    async def health_handler(request: web.Request) -> web.Response:
        import jax

        return web.json_response({
            "ok": True,
            "backend": jax.default_backend(),
            "devices": [str(d) for d in jax.devices()],
            "model": pipeline.embedder.spec.name,
        })

    static_dir = config.service.static_dir
    if static_dir and not os.path.isabs(static_dir) and not os.path.isdir(static_dir):
        # resolve the default "frontend/build" relative to the repo root so
        # `imageclust serve` works from any cwd
        repo_root = os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        candidate = os.path.join(repo_root, static_dir)
        if os.path.isdir(candidate):
            static_dir = candidate

    async def spa_handler(request: web.Request) -> web.StreamResponse:
        # handlers.go:199-214: /view alias, then static file, then index.html
        if request.path == "/view":
            return await view_handler(request)
        rel = request.path.lstrip("/")
        if rel and static_dir:
            candidate = os.path.realpath(os.path.join(static_dir, rel))
            if (candidate.startswith(os.path.realpath(static_dir) + os.sep)
                    and os.path.isfile(candidate)):
                return web.FileResponse(candidate)
        index = os.path.join(static_dir, "index.html") if static_dir else ""
        if index and os.path.isfile(index):
            return web.FileResponse(index)
        return _error(404, "not found")

    app.router.add_post("/api/cluster", cluster_handler)  # main.go:16
    app.router.add_get("/api/view", view_handler)  # main.go:18
    app.router.add_get(r"/api/image/{name:.*}", image_handler)  # main.go:17
    app.router.add_get("/api/result", result_handler)
    app.router.add_get("/api/jobs", jobs_handler)
    app.router.add_get("/metrics", metrics_handler)
    app.router.add_get("/healthz", health_handler)
    app.router.add_get(r"/{tail:.*}", spa_handler)  # main.go:21-22
    return app


def run_server(config: AppConfig | None = None) -> None:
    config = config or AppConfig()
    app = create_app(config)
    log.info("Server starting on %s:%d", config.service.host, config.service.port)
    web.run_app(app, host=config.service.host, port=config.service.port,
                print=None)
