"""SPA end-to-end contract tests (VERDICT r1 item 7).

No browser runtime exists in this image (no chromium/node/playwright), so
the suite drives the SPA the strongest available way: every endpoint, form
field, status code, and threshold the page's JavaScript uses is PARSED OUT
OF frontend/build/index.html and then executed against the real aiohttp app
— if the page and the server drift apart, these tests break. Reference
counterpart: frontend/src/components/ImageUploadForm.jsx:42-91.
"""

import asyncio
import io
import os
import re

import pytest
from aiohttp import FormData
from aiohttp.test_utils import TestClient, TestServer

from imageclust_tpu.config import AppConfig, LabelConfig, NamingConfig, ServiceConfig
from imageclust_tpu.pipeline import Pipeline
from imageclust_tpu.service.app import create_app
from imageclust_tpu.service.jobs import JobStore

from helpers import MeanColorEmbedder, color_group_images

SPA_PATH = os.path.join(os.path.dirname(__file__), os.pardir,
                        "frontend", "build", "index.html")


@pytest.fixture(scope="module")
def spa():
    with open(SPA_PATH) as fh:
        return fh.read()


@pytest.fixture()
def client_factory(tmp_path):
    def factory():
        cfg = AppConfig(
            labels=LabelConfig(backend="fake"),
            naming=NamingConfig(services=("fake",), retries=1),
            service=ServiceConfig(
                work_dir=str(tmp_path / "jobs"),
                static_dir=os.path.dirname(SPA_PATH),
            ),
        )
        pipeline = Pipeline(cfg, embedder=MeanColorEmbedder())
        return create_app(cfg, pipeline, JobStore(str(tmp_path / "jobs")))

    return factory


def _run(coro):
    return asyncio.run(coro)


async def _with_client(app, fn):
    client = TestClient(TestServer(app))
    await client.start_server()
    try:
        return await fn(client)
    finally:
        await client.close()


class TestSpaMarkup:
    def test_served_at_root_with_wired_elements(self, client_factory, spa):
        async def flow(client):
            r = await client.get("/")
            assert r.status == 200
            html = await r.text()
            assert html == spa
            # every element id the script wires must exist in the markup
            for el_id in re.findall(r"getElementById\('([^']+)'\)", html):
                assert f'id="{el_id}"' in html, el_id
            return True

        assert _run(_with_client(client_factory(), flow))

    def test_defaults_match_reference(self, spa):
        # min/max default 3/6 (ImageUploadForm.jsx:7-8, handlers.go:111)
        assert re.search(r'id="min" value="3"', spa)
        assert re.search(r'id="max" value="6"', spa)
        # image MIME filter (ImageUploadForm.jsx:23-36)
        assert "startsWith('image/')" in spa


class _SpaFlow:
    """The submit algorithm from the page's <script>, with every constant
    extracted from the page source rather than duplicated here."""

    def __init__(self, spa_html: str):
        self.cluster_ep = re.search(r"'(/api/cluster)'", spa_html).group(1)
        self.async_qs = re.search(r"\? '(\?async=1)'", spa_html).group(1)
        self.result_ep = re.search(
            r"fetch\(`(/api/result\?job=)\$\{jobId\}`\)", spa_html).group(1)
        self.view_tpl = re.search(
            r"`(/api/view\?job=)\$\{data.jobId\}`", spa_html).group(1)
        self.threshold = int(re.search(
            r"ASYNC_THRESHOLD = (\d+)", spa_html).group(1))
        self.min_field = re.search(
            r"form.append\('(minClusterSize)'", spa_html).group(1)
        self.max_field = re.search(
            r"form.append\('(maxClusterSize)'", spa_html).group(1)
        self.images_field = re.search(
            r"form.append\('(images)', f\)", spa_html).group(1)

    async def submit(self, client, names, blobs, min_size, max_size):
        form = FormData()
        for n, b in zip(names, blobs):
            form.add_field(self.images_field, io.BytesIO(b), filename=n,
                           content_type="image/png")
        form.add_field(self.min_field, str(min_size))
        form.add_field(self.max_field, str(max_size))
        use_async = len(names) > self.threshold
        url = self.cluster_ep + (self.async_qs if use_async else "")
        resp = await client.post(url, data=form)
        data = await resp.json()
        if resp.status == 202 and data.get("jobId"):
            result = await self._poll(client, data["jobId"])
            data = {
                "status": "success",
                "clusters": result["clusters"],
                "viewUrl": f"{self.view_tpl}{data['jobId']}",
            }
        return data

    async def _poll(self, client, job_id):
        for _ in range(200):
            await asyncio.sleep(0.05)
            r = await client.get(f"{self.result_ep}{job_id}")
            body = await r.json()
            assert r.status == 200, body
            if body.get("clusters"):
                return body
            assert body.get("status") != "failed", body
        raise AssertionError("poll timed out")


class TestSpaFlow:
    def test_sync_submit_to_rendered_report(self, client_factory, spa, rng):
        flow = _SpaFlow(spa)
        names, blobs = color_group_images(rng, n_groups=3, per_group=4)
        assert len(names) <= flow.threshold  # the page would submit sync

        async def run(client):
            data = await flow.submit(client, names, blobs, 3, 6)
            assert data["status"] == "success"
            n = len(data["clusters"])
            assert n == 3
            # "Open report" link target renders with the uploaded images
            view = data.get("viewUrl") or "/api/view"
            r = await client.get(view)
            assert r.status == 200
            html = await r.text()
            for name in names:
                assert name in html
            # and the report's image URLs serve actual bytes
            img = re.search(r'src="(/api/image/[^"]+)"', html).group(1)
            ri = await client.get(img)
            assert ri.status == 200
            assert (await ri.read())[:8] == b"\x89PNG\r\n\x1a\n"
            return True

        assert _run(_with_client(client_factory(), run))

    def test_async_submit_polls_to_report(self, client_factory, spa, rng):
        flow = _SpaFlow(spa)
        # enough files to cross the page's async threshold
        per = flow.threshold // 3 + 2
        names, blobs = color_group_images(rng, n_groups=3, per_group=per)
        assert len(names) > flow.threshold

        async def run(client):
            data = await flow.submit(client, names, blobs, 3, 6)
            assert data["status"] == "success"
            assert data["clusters"]
            r = await client.get(data["viewUrl"])
            assert r.status == 200
            html = await r.text()
            assert names[0] in html
            return True

        assert _run(_with_client(client_factory(), run))

    def test_error_shape_reaches_banner_path(self, client_factory, spa, rng):
        """The page's error branch reads data.error — the server must emit
        that exact shape (handlers.go:177-182 parity)."""
        flow = _SpaFlow(spa)
        names, blobs = color_group_images(rng, n_groups=1, per_group=2)

        async def run(client):
            # 2 images with min=3 is infeasible
            data = await flow.submit(client, names, blobs, 3, 6)
            assert data.get("status") != "success"
            assert data.get("success") is False
            assert "error" in data and data["error"]
            return True

        assert _run(_with_client(client_factory(), run))
