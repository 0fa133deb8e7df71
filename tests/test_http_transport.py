"""HttpTransport against a real local socket server (stdlib
http.server) — no network needed, but every byte travels through an
actual TCP connection, so this is the live-transport attestation the
LocalTransport mock can't give.

Covers the reference's network path re-expressed behind the Transport
protocol: label export GET (get_annotations.py:8-9), per-row frames GET
(get_videoframe_annotations.py:29), and the upload POST the reference
funnels through driver collect (uploader.py:93) — here posted from
executor tasks via foreachPartition.
"""

from __future__ import annotations

import json
import pickle
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from labelspark_spark.http_transport import HttpTransport, TransportError


class _Platform(BaseHTTPRequestHandler):
    """In-memory mock platform with failure injection."""

    state: dict  # set per-server: {"posts": [], "fail_next": 0, "status": 503, ...}

    def log_message(self, *a):  # silence
        pass

    def _maybe_fail(self) -> bool:
        st = self.state
        st["hits"] = st.get("hits", 0) + 1
        if st.get("fail_next", 0) > 0:
            st["fail_next"] -= 1
            code = st.get("status", 503)
            self.send_response(code)
            if st.get("retry_after") is not None:
                self.send_header("Retry-After", str(st["retry_after"]))
            self.end_headers()
            return True
        return False

    def do_GET(self):
        if self._maybe_fail():
            return
        body = None
        if self.path.endswith("/labels"):
            body = json.dumps(self.state.get("labels", []))
        elif self.path.endswith("/metadata"):
            body = json.dumps(self.state.get("metadata", []))
        elif self.path.endswith("/ontology"):
            body = json.dumps(self.state.get("ontology", []))
        elif self.path.startswith("/frames/"):
            body = self.state.get("frames", {}).get(self.path, "")
        if body is None:
            self.send_response(404)
            self.end_headers()
            return
        data = body.encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def do_POST(self):
        if self._maybe_fail():
            return
        n = int(self.headers.get("Content-Length", 0))
        payload = json.loads(self.rfile.read(n).decode())
        with self.state["lock"]:
            self.state["posts"].append((self.path, payload))
        self.send_response(200)
        self.send_header("Content-Length", "2")
        self.end_headers()
        self.wfile.write(b"{}")


@pytest.fixture()
def platform():
    state = {"posts": [], "lock": threading.Lock(), "hits": 0}
    handler = type("H", (_Platform,), {"state": state})
    srv = ThreadingHTTPServer(("127.0.0.1", 0), handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    yield base, state
    srv.shutdown()
    srv.server_close()


def _transport(base: str, **kw) -> HttpTransport:
    kw.setdefault("max_retries", 3)
    kw.setdefault("backoff_base", 0.01)
    return HttpTransport(base, api_key="sekrit", **kw)


def test_export_labels_roundtrip(platform):
    base, state = platform
    state["labels"] = [{"ID": "a", "Labeled Data": "u1"}]
    got = json.loads(_transport(base).export_labels("proj1"))
    assert got == state["labels"]


def test_post_data_rows_lands_payload(platform):
    base, state = platform
    rows = [{"data_row": {"global_key": "k1"}}, {"data_row": {"global_key": "k2"}}]
    _transport(base).post_data_rows("ds9", rows)
    assert state["posts"] == [("/datasets/ds9/data_rows", rows)]


def test_fetch_frames_verbatim_url(platform):
    base, state = platform
    state["frames"] = {"/frames/row1": '{"frameNumber": 1}\n{"frameNumber": 2}'}
    out = _transport(base).fetch_frames(f"{base}/frames/row1")
    assert out.count("frameNumber") == 2


def test_retries_then_succeeds_on_503(platform):
    base, state = platform
    state["labels"] = [{"ID": "x"}]
    state["fail_next"] = 2  # two 503s, then 200
    tr = _transport(base)
    got = json.loads(tr.export_labels("p"))
    assert got == [{"ID": "x"}]
    assert state["hits"] == 3


def test_retry_after_header_is_honored(platform):
    base, state = platform
    state["labels"] = []
    state["fail_next"] = 1
    state["status"] = 429
    state["retry_after"] = 0  # parseable, overrides backoff
    assert json.loads(_transport(base).export_labels("p")) == []
    assert state["hits"] == 2


def test_4xx_fails_fast_without_retry(platform):
    base, state = platform
    state["fail_next"] = 99
    state["status"] = 400
    with pytest.raises(TransportError) as ei:
        _transport(base).export_labels("p")
    assert ei.value.status == 400
    assert state["hits"] == 1  # no retries on a bad request


def test_retries_exhausted_raises(platform):
    base, state = platform
    state["fail_next"] = 99
    state["status"] = 503
    with pytest.raises(TransportError) as ei:
        _transport(base, max_retries=2).export_labels("p")
    assert ei.value.status == 503
    assert state["hits"] == 3  # 1 try + 2 retries


def test_connection_refused_is_terminal_after_retries():
    tr = HttpTransport(
        "http://127.0.0.1:9", max_retries=1, backoff_base=0.01, timeout=0.5
    )
    with pytest.raises(TransportError):
        tr.export_labels("p")


def test_transport_is_picklable():
    tr = HttpTransport("http://example.invalid", api_key="k", max_retries=7)
    tr2 = pickle.loads(pickle.dumps(tr))
    assert tr2.base_url == "http://example.invalid"
    assert tr2.api_key == "k"
    assert tr2.max_retries == 7


def test_create_metadata_field_posts_field(platform):
    base, state = platform
    _transport(base).create_metadata_field("p1", {"name": "split", "kind": "enum"})
    assert state["posts"] == [
        ("/projects/p1/metadata_fields", {"name": "split", "kind": "enum"})
    ]


def test_executor_side_upload_through_live_socket(platform, spark):
    """End-to-end drop-in: Client + HttpTransport, rows leave from
    foreachPartition tasks over real TCP — the distributed rewrite of
    the reference's driver-collect upload loop (uploader.py:93)."""
    from labelspark_spark.client import Client

    base, state = platform
    client = Client(_transport(base), spark=spark)
    df = spark.createDataFrame(
        [(f"url-{i}", f"key-{i}") for i in range(20)], "row_data string, gk string"
    ).repartition(4)
    out = client.create_data_rows_from_table(
        df, "dsE2E", global_key_col="gk", batch_size=7
    )
    assert out["dataset_id"] == "dsE2E"
    posted = [
        r["data_row"]["global_key"]
        for _, payload in state["posts"]
        for r in payload
    ]
    assert sorted(posted) == sorted(f"key-{i}" for i in range(20))
    # partition-parallel: more than one POST batch arrived
    assert len(state["posts"]) >= 4


def test_client_from_api_key_end_to_end(platform, spark):
    """Client.from_api_key — the reference-signature constructor — must
    wire a working live transport: labels seeded on the mock platform
    arrive through export_to_table over real TCP."""
    from labelspark_spark.client import Client

    base, state = platform
    state["labels"] = [
        {"ID": "dr1", "Labeled Data": "https://x/1", "Skipped": "false"},
        {"ID": "dr2", "Labeled Data": "https://x/2", "Skipped": "true"},
    ]
    client = Client.from_api_key("sekrit", base, spark=spark, max_retries=2)
    assert client.transport.api_key == "sekrit"
    df = client.export_to_table("projX")
    rows = {r["ID"] for r in df.collect()}
    assert rows == {"dr1", "dr2"}
