"""REST API contract tests (SURVEY.md §4 item 5) against the real aiohttp app
with the fast fake embedder."""

import asyncio
import io
import json

import numpy as np
import pytest
from aiohttp import FormData
from aiohttp.test_utils import TestClient, TestServer

from imageclust_tpu.config import AppConfig, LabelConfig, NamingConfig, ServiceConfig
from imageclust_tpu.pipeline import Pipeline
from imageclust_tpu.service.app import create_app
from imageclust_tpu.service.jobs import JobStore

from helpers import MeanColorEmbedder, color_group_images


def _run(coro):
    return asyncio.run(coro)


@pytest.fixture()
def app_factory(tmp_path):
    def factory(static_dir=""):
        cfg = AppConfig(
            labels=LabelConfig(backend="fake"),
            naming=NamingConfig(services=("fake",), retries=1),
            service=ServiceConfig(work_dir=str(tmp_path / "jobs"),
                                  static_dir=static_dir),
        )
        pipeline = Pipeline(cfg, embedder=MeanColorEmbedder())
        return create_app(cfg, pipeline, JobStore(str(tmp_path / "jobs")))

    return factory


async def _with_client(app, fn):
    client = TestClient(TestServer(app))
    await client.start_server()
    try:
        return await fn(client)
    finally:
        await client.close()


def _upload_form(names, blobs, min_size=None, max_size=None):
    form = FormData()
    for n, b in zip(names, blobs):
        form.add_field("images", io.BytesIO(b), filename=n,
                       content_type="image/png")
    if min_size is not None:
        form.add_field("minClusterSize", str(min_size))
    if max_size is not None:
        form.add_field("maxClusterSize", str(max_size))
    return form


class TestClusterEndpoint:
    def test_success_contract(self, app_factory, rng):
        names, blobs = color_group_images(rng, n_groups=3, per_group=4)

        async def scenario(client):
            resp = await client.post(
                "/api/cluster", data=_upload_form(names, blobs, 3, 6)
            )
            assert resp.status == 200
            data = await resp.json()
            # reference contract fields (handlers.go:123-127)
            assert data["status"] == "success"
            assert data["filePath"].endswith("clusters.html")
            # extensions
            assert len(data["clusters"]) == 3
            for v in data["clusters"].values():
                assert 3 <= len(v["images"]) <= 6
                assert v["serviceOutputs"][0]["serviceName"] == "Offline Namer"

            # /api/view serves the report for the latest job (handlers.go:131)
            view = await client.get("/api/view")
            assert view.status == 200
            html = await view.text()
            assert "comparison-table" in html

            # /api/image serves an uploaded image with the right MIME
            img = await client.get(f"/api/image/{names[0]}")
            assert img.status == 200
            assert img.headers["Content-Type"] == "image/png"

            # and the per-job addressing works too
            job = data["jobId"]
            view2 = await client.get(f"/api/view?job={job}")
            assert view2.status == 200
            return data

        _run(_with_client(app_factory(), scenario))

    def test_honors_size_params(self, app_factory, rng):
        # the reference ignored these fields (handlers.go:111); we honor them
        names, blobs = color_group_images(rng, n_groups=2, per_group=4)

        async def scenario(client):
            resp = await client.post(
                "/api/cluster", data=_upload_form(names, blobs, 2, 4)
            )
            data = await resp.json()
            assert resp.status == 200
            for v in data["clusters"].values():
                assert 2 <= len(v["images"]) <= 4

        _run(_with_client(app_factory(), scenario))

    def test_no_images_error_shape(self, app_factory):
        async def scenario(client):
            form = FormData()
            form.add_field("minClusterSize", "3")
            # force multipart encoding even with no file fields
            form._is_multipart = True
            resp = await client.post("/api/cluster", data=form)
            assert resp.status == 400
            data = await resp.json()
            assert data == {"success": False,
                            "error": "No valid images uploaded"}

            # non-multipart body -> the reference's parse error shape
            resp2 = await client.post("/api/cluster", data=b"junk")
            assert resp2.status == 400
            data2 = await resp2.json()
            assert data2 == {"success": False,
                             "error": "Failed to parse form data"}

        _run(_with_client(app_factory(), scenario))

    def test_invalid_sizes_rejected(self, app_factory, rng):
        names, blobs = color_group_images(rng, n_groups=1, per_group=3)

        async def scenario(client):
            resp = await client.post(
                "/api/cluster", data=_upload_form(names, blobs, 6, 2)
            )
            assert resp.status == 400
            data = await resp.json()
            assert data["success"] is False

            resp2 = await client.post(
                "/api/cluster",
                data=_upload_form(names, blobs, "abc", 6),
            )
            assert resp2.status == 400

        _run(_with_client(app_factory(), scenario))

    def test_pipeline_failure_is_500_with_error_shape(self, app_factory, rng):
        # 2 images with min_size 3 -> ConstraintError inside the pipeline
        names, blobs = color_group_images(rng, n_groups=1, per_group=2)

        async def scenario(client):
            resp = await client.post(
                "/api/cluster", data=_upload_form(names, blobs, 3, 6)
            )
            assert resp.status == 500
            data = await resp.json()
            assert data["success"] is False and "error" in data

            # failed job visible in the job list
            jobs = await (await client.get("/api/jobs")).json()
            assert jobs["jobs"][0]["status"] == "failed"

        _run(_with_client(app_factory(), scenario))


class TestImageEndpoint:
    def test_not_found_and_traversal(self, app_factory, rng):
        names, blobs = color_group_images(rng, n_groups=1, per_group=3)

        async def scenario(client):
            await client.post("/api/cluster",
                              data=_upload_form(names, blobs, 3, 6))
            resp = await client.get("/api/image/nope.png")
            assert resp.status == 404
            # path traversal is neutralized by sanitization (utils.go:240-250)
            resp2 = await client.get("/api/image/..%2F..%2Fjob.json")
            assert resp2.status == 404

        _run(_with_client(app_factory(), scenario))

    def test_no_job_yet(self, app_factory):
        async def scenario(client):
            resp = await client.get("/api/image/x.png")
            assert resp.status == 404
            view = await client.get("/api/view")
            assert view.status == 404

        _run(_with_client(app_factory(), scenario))


class TestMiscRoutes:
    def test_cors_headers(self, app_factory):
        async def scenario(client):
            resp = await client.options("/api/cluster")
            assert resp.status == 200
            assert resp.headers["Access-Control-Allow-Origin"] == "*"
            assert "POST" in resp.headers["Access-Control-Allow-Methods"]

        _run(_with_client(app_factory(), scenario))

    def test_health(self, app_factory):
        async def scenario(client):
            data = await (await client.get("/healthz")).json()
            assert data["ok"] is True
            assert data["model"] == "mean_color"

        _run(_with_client(app_factory(), scenario))

    def test_spa_fallback(self, app_factory, tmp_path):
        static = tmp_path / "static"
        static.mkdir()
        (static / "index.html").write_text("<html>SPA</html>")
        (static / "app.js").write_text("console.log(1)")

        async def scenario(client):
            # real file served
            r1 = await client.get("/app.js")
            assert r1.status == 200 and "console" in await r1.text()
            # unknown route falls back to index.html (handlers.go:208-211)
            r2 = await client.get("/some/client/route")
            assert r2.status == 200 and "SPA" in await r2.text()
            # static dir escape blocked
            r3 = await client.get("/../job.json")
            assert r3.status in (200, 404)  # never the file itself
            if r3.status == 200:
                assert "SPA" in await r3.text()

        _run(_with_client(app_factory(static_dir=str(static)), scenario))

    def test_job_isolation(self, app_factory, rng):
        """Two jobs coexist — the reference's global temp dir meant job 2
        clobbered job 1 (handlers.go:26-46)."""
        n1, b1 = color_group_images(rng, n_groups=1, per_group=3, size=32)
        rng2 = np.random.default_rng(99)
        n2, b2 = color_group_images(rng2, n_groups=1, per_group=3, size=48)
        n2 = [f"second_{x}" for x in n2]

        async def scenario(client):
            d1 = await (await client.post(
                "/api/cluster", data=_upload_form(n1, b1, 3, 6))).json()
            d2 = await (await client.post(
                "/api/cluster", data=_upload_form(n2, b2, 3, 6))).json()
            # job 1's images still retrievable by job id
            r = await client.get(f"/api/image/{n1[0]}?job={d1['jobId']}")
            assert r.status == 200
            # default (latest) now serves job 2
            r2 = await client.get(f"/api/image/{n2[0]}")
            assert r2.status == 200
            # result endpoint per job
            res1 = await (await client.get(
                f"/api/result?job={d1['jobId']}")).json()
            assert set(res1["clusters"]) == set(d1["clusters"])

        _run(_with_client(app_factory(), scenario))


class TestConcurrency:
    def test_parallel_posts_isolated(self, app_factory, rng):
        """Two concurrent POSTs must both succeed with correct, separate
        results — the scenario that corrupts the reference's global temp dir
        (handlers.go:26-46)."""
        import asyncio as aio

        n1, b1 = color_group_images(rng, n_groups=1, per_group=3, size=32)
        rng2 = np.random.default_rng(7)
        n2, b2 = color_group_images(rng2, n_groups=2, per_group=3, size=48)
        n2 = [f"b_{x}" for x in n2]

        async def scenario(client):
            r1, r2 = await aio.gather(
                client.post("/api/cluster", data=_upload_form(n1, b1, 3, 6)),
                client.post("/api/cluster", data=_upload_form(n2, b2, 3, 6)),
            )
            d1, d2 = await r1.json(), await r2.json()
            assert r1.status == 200 and r2.status == 200
            assert d1["jobId"] != d2["jobId"]
            imgs1 = {m for v in d1["clusters"].values() for m in v["images"]}
            imgs2 = {m for v in d2["clusters"].values() for m in v["images"]}
            assert imgs1 == set(n1)
            assert imgs2 == set(n2)
            # both jobs' artifacts remain independently addressable
            v1 = await client.get(f"/api/view?job={d1['jobId']}")
            v2 = await client.get(f"/api/view?job={d2['jobId']}")
            assert v1.status == 200 and v2.status == 200

        _run(_with_client(app_factory(), scenario))


class TestJobPruning:
    def test_restart_marks_running_jobs_failed(self, tmp_path):
        # failure injection (SURVEY §5 failure detection): a process crash
        # mid-job leaves status "running" on disk; the next store over the
        # same root must surface it as failed, not running forever
        from imageclust_tpu.service.jobs import JobStore

        store = JobStore(root=str(tmp_path))
        job = store.create()
        store.set_status(job, "running")
        done = store.create()
        store.set_status(done, "done")

        recovered = JobStore(root=str(tmp_path))  # simulated restart
        j = recovered.get(job.job_id)
        assert j.status == "failed"
        assert "interrupted by restart" in j.error
        # finished jobs recover intact, and latest-done pointer survives
        assert recovered.get(done.job_id).status == "done"
        assert recovered.get(None).job_id == done.job_id

    def test_restart_skips_corrupt_job_metadata(self, tmp_path):
        import os

        from imageclust_tpu.service.jobs import JobStore

        store = JobStore(root=str(tmp_path))
        ok = store.create()
        store.set_status(ok, "done")
        bad = store.create()
        with open(os.path.join(bad.work_dir, "job.json"), "w") as fh:
            fh.write("{truncated")  # torn write during a crash

        recovered = JobStore(root=str(tmp_path))
        assert recovered.get(ok.job_id).status == "done"
        assert recovered.get(bad.job_id) is None  # skipped, not fatal

    def test_prune_keeps_latest_and_recent(self, tmp_path):
        import time as _time

        store = JobStore(str(tmp_path / "p"))
        jobs = [store.create() for _ in range(5)]
        for j in jobs:
            store.set_status(j, "done")
            j.finished_at = _time.time() - 3600  # clear the grace window
        # age out the first two
        for j in jobs[:2]:
            j.created_at = _time.time() - 10 * 24 * 3600
        removed = store.prune(max_jobs=50, max_age_s=7 * 24 * 3600)
        assert removed == 2
        alive = {j["jobId"] for j in store.list_jobs()}
        assert jobs[4].job_id in alive  # latest kept
        assert jobs[0].job_id not in alive

    def test_prune_caps_count(self, tmp_path):
        import time as _time

        store = JobStore(str(tmp_path / "q"))
        jobs = [store.create() for _ in range(6)]
        for j in jobs:
            store.set_status(j, "done")
            j.finished_at = _time.time() - 3600
        removed = store.prune(max_jobs=2, max_age_s=1e12)
        # latest excluded from the cap pool: 5 candidates, keep 2 -> remove 3
        assert removed == 3
        assert len(store.list_jobs()) == 3

    def test_grace_period_protects_fresh_jobs(self, tmp_path):
        store = JobStore(str(tmp_path / "r"))
        jobs = [store.create() for _ in range(4)]
        for j in jobs:
            store.set_status(j, "done")  # finished_at = now
        assert store.prune(max_jobs=0, max_age_s=0.0) == 0


class TestAsyncMode:
    def test_async_submit_and_poll(self, app_factory, rng):
        import asyncio as aio

        names, blobs = color_group_images(rng, n_groups=1, per_group=3)

        async def scenario(client):
            resp = await client.post(
                "/api/cluster?async=1", data=_upload_form(names, blobs, 3, 6)
            )
            assert resp.status == 202
            d = await resp.json()
            assert d["status"] == "accepted"
            job = d["jobId"]
            for _ in range(100):
                r = await client.get(f"/api/result?job={job}")
                body = await r.json()
                if "clusters" in body:
                    assert len(body["clusters"]) == 1
                    return
                assert body["status"] in ("queued", "running", "done")
                await aio.sleep(0.1)
            raise AssertionError("async job never finished")

        _run(_with_client(app_factory(), scenario))


class TestMetricsEndpoint:
    def test_counters_accumulate(self, app_factory, rng):
        names, blobs = color_group_images(rng, n_groups=1, per_group=3)

        async def scenario(client):
            await client.post("/api/cluster",
                              data=_upload_form(names, blobs, 3, 6))
            text = await (await client.get("/metrics")).text()
            assert "imageclust_jobs_total 1" in text
            assert "imageclust_images_total 3" in text
            assert 'imageclust_stage_seconds_total{stage="embed"}' in text
            # a failed job increments the failure counter
            n2, b2 = color_group_images(rng, n_groups=1, per_group=2)
            await client.post("/api/cluster", data=_upload_form(n2, b2, 3, 6))
            text2 = await (await client.get("/metrics")).text()
            assert "imageclust_jobs_failed_total 1" in text2

        _run(_with_client(app_factory(), scenario))


class TestUploadLimit:
    def test_oversized_upload_rejected(self, tmp_path, rng):
        """client_max_size mirrors the reference's 32MB multipart bound
        (handlers.go:71); oversized bodies are rejected, not processed."""
        cfg = AppConfig(
            labels=LabelConfig(backend="fake"),
            naming=NamingConfig(services=(), retries=1),
            service=ServiceConfig(work_dir=str(tmp_path / "jobs"),
                                  max_upload_bytes=64 * 1024),
        )
        pipeline = Pipeline(cfg, embedder=MeanColorEmbedder())
        app = create_app(cfg, pipeline, JobStore(str(tmp_path / "jobs")))

        async def scenario(client):
            big = rng.integers(0, 256, (300, 300, 3), dtype=np.uint8)
            from helpers import encode_png

            blob = encode_png(big)
            assert len(blob) > 64 * 1024
            resp = await client.post(
                "/api/cluster", data=_upload_form(["big.png"], [blob], 3, 6)
            )
            assert resp.status in (400, 413)

        _run(_with_client(app, scenario))


class TestJobScopedReportImages:
    def test_old_job_report_references_its_own_images(self, app_factory, rng):
        """A job's report must load ITS images even after newer jobs finish —
        the reference's global dir made old reports show new images."""
        n1, b1 = color_group_images(rng, n_groups=1, per_group=3, size=32)
        rng2 = np.random.default_rng(5)
        n2, b2 = color_group_images(rng2, n_groups=1, per_group=3, size=48)
        n2 = [f"new_{x}" for x in n2]

        async def scenario(client):
            d1 = await (await client.post(
                "/api/cluster", data=_upload_form(n1, b1, 3, 6))).json()
            await client.post("/api/cluster", data=_upload_form(n2, b2, 3, 6))
            html = await (await client.get(
                f"/api/view?job={d1['jobId']}")).text()
            assert f"?job={d1['jobId']}" in html
            # and that URL actually serves the right file
            import re

            m = re.search(r'src="([^"]+)"', html)
            assert m
            r = await client.get(m.group(1).replace("&amp;", "&"))
            assert r.status == 200

        _run(_with_client(app_factory(), scenario))


class TestPaginatedView:
    """Job-scoped report pagination: /api/view?job=X&page=N serves the
    clusters_p{N}.html shard written by write_report above page_size."""

    def test_view_page_route(self, tmp_path, rng):
        cfg = AppConfig(
            labels=LabelConfig(backend="fake"),
            naming=NamingConfig(services=("fake",), retries=1),
            service=ServiceConfig(work_dir=str(tmp_path / "jobs"),
                                  report_page_size=1),
        )
        pipeline = Pipeline(cfg, embedder=MeanColorEmbedder())
        app = create_app(cfg, pipeline, JobStore(str(tmp_path / "jobs")))
        names, blobs = color_group_images(rng, n_groups=3, per_group=4)

        async def scenario(client):
            resp = await client.post(
                "/api/cluster", data=_upload_form(names, blobs, 3, 6))
            assert resp.status == 200
            data = await resp.json()
            job = data["jobId"]
            idx = await client.get(f"/api/view?job={job}")
            assert idx.status == 200
            text = await idx.text()
            # the index links its pages with job-scoped routes
            assert f"job={job}&amp;page=1" in text
            assert '<table class="comparison-table">' not in text
            p1 = await client.get(f"/api/view?job={job}&page=1")
            assert p1.status == 200
            t1 = await p1.text()
            assert '<table class="comparison-table">' in t1
            missing = await client.get(f"/api/view?job={job}&page=99")
            assert missing.status == 404
            bad = await client.get(f"/api/view?job={job}&page=..x")
            assert bad.status == 400

        _run(_with_client(app, scenario))

    def test_view_section_route(self, tmp_path, rng):
        """Two-level index (million-cluster tail): with the fanout forced
        to 2, 12 one-cluster pages produce 6 section files served via
        /api/view?job=X&sec=N."""
        import imageclust_tpu.report as report_mod

        cfg = AppConfig(
            labels=LabelConfig(backend="fake"),
            naming=NamingConfig(services=("fake",), retries=1),
            service=ServiceConfig(work_dir=str(tmp_path / "jobs"),
                                  report_page_size=1),
        )
        pipeline = Pipeline(cfg, embedder=MeanColorEmbedder())
        app = create_app(cfg, pipeline, JobStore(str(tmp_path / "jobs")))
        names, blobs = color_group_images(rng, n_groups=12, per_group=3)

        async def scenario(client):
            resp = await client.post(
                "/api/cluster", data=_upload_form(names, blobs, 3, 3))
            assert resp.status == 200
            job = (await resp.json())["jobId"]
            idx = await client.get(f"/api/view?job={job}")
            text = await idx.text()
            # top index links sections, not pages
            assert f"job={job}&amp;sec=1" in text
            assert f"job={job}&amp;page=" not in text
            sec = await client.get(f"/api/view?job={job}&sec=1")
            assert sec.status == 200
            stext = await sec.text()
            assert f"job={job}&amp;page=1" in stext
            missing = await client.get(f"/api/view?job={job}&sec=99")
            assert missing.status == 404
            bad = await client.get(f"/api/view?job={job}&sec=x1")
            assert bad.status == 400

        orig = report_mod._INDEX_FANOUT
        report_mod._INDEX_FANOUT = 2
        try:
            _run(_with_client(app, scenario))
        finally:
            report_mod._INDEX_FANOUT = orig
