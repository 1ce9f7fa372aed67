"""Shipped publisher implementations driven end-to-end through publish_csv
(S7/tocarto parity: the upload step itself, not just the injected seam)."""

import http.server
import json
import os
import sys
import threading

sys.path.insert(0, ".")
from geopetl_spark.sources.publish import file_publisher, http_publisher, publish_csv  # noqa: E402


def _df(spark):
    return spark.createDataFrame(
        [("d1", [1, 2, 3], 3), ("d2", [4], 1)],
        "doc_id string, tokens array<int>, n_tok int",
    )


def test_file_publisher_end_to_end(spark, tmp_path):
    out = str(tmp_path / "stage")
    upload = str(tmp_path / "upload_zone")
    manifest = publish_csv(_df(spark), out, "docs", publisher=file_publisher(upload))
    assert manifest["published"] is True
    # delivered file is byte-identical to the staged CSV
    dest = manifest["publish_result"]["delivered_to"]
    assert os.path.exists(dest)
    assert manifest["publish_result"]["sha256"] == manifest["sha256"]
    # receipt written next to the delivery, referencing the source manifest
    receipt = json.load(open(os.path.join(upload, "docs.receipt.json")))
    assert receipt["sha256"] == manifest["sha256"]
    assert receipt["source_manifest"]["name"] == "docs"


def test_http_publisher_posts_csv_to_live_server(spark, tmp_path):
    received = {}

    class Handler(http.server.BaseHTTPRequestHandler):
        def do_POST(self):
            n = int(self.headers["Content-Length"])
            received["body"] = self.rfile.read(n)
            received["name"] = self.headers["X-Publish-Name"]
            received["sha256"] = self.headers["X-Publish-Sha256"]
            self.send_response(200)
            self.end_headers()
            self.wfile.write(b"imported")

        def log_message(self, *a):
            pass

    srv = http.server.HTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        url = f"http://127.0.0.1:{srv.server_port}/import"
        manifest = publish_csv(
            _df(spark), str(tmp_path / "stage"), "docs", publisher=http_publisher(url)
        )
        assert manifest["published"] is True
        assert manifest["publish_result"]["status"] == 200
        assert manifest["publish_result"]["response"] == "imported"
        # the server got the exact staged bytes plus the manifest headers
        assert received["body"] == open(manifest["path"], "rb").read()
        assert received["name"] == "docs"
        assert received["sha256"] == manifest["sha256"]
    finally:
        srv.shutdown()
        srv.server_close()


def test_http_publisher_fails_loudly_on_error_status(spark, tmp_path):
    class Handler(http.server.BaseHTTPRequestHandler):
        def do_POST(self):
            self.rfile.read(int(self.headers["Content-Length"]))
            self.send_response(503)
            self.end_headers()

        def log_message(self, *a):
            pass

    srv = http.server.HTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        url = f"http://127.0.0.1:{srv.server_port}/import"
        import pytest
        import urllib.error

        with pytest.raises(urllib.error.HTTPError):
            publish_csv(_df(spark), str(tmp_path / "stage"), "docs", publisher=http_publisher(url))
    finally:
        srv.shutdown()
        srv.server_close()
