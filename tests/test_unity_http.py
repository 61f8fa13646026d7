"""Unit tests for the Unity export HTTP client (sources/unity_http.py)
against a fake transport — the request/poll/download protocol of
reference Unity_to_BigQuery.py:56-75 (request), :78-86 + :166-171
(poll), :105-150 (download/gunzip), and the :163 None-job-id failure
mode. No network, no Spark session needed.
"""

from __future__ import annotations

import gzip
import json
import os

import pytest

from unity_to_bigquery_spark.plans.ops_support import ErrorNotifier, webhook_sink
from unity_to_bigquery_spark.sources.unity_http import (
    ExportRequestError,
    ExportTimeoutError,
    FakeResponse,
    UnityExportClient,
)

PROJECT = "proj-123"
BASE = "https://analytics.cloud.unity3d.com/api/v2/projects/"


class FakeTransport:
    """Canned-response transport that records every call."""

    def __init__(self):
        self.posts: list[tuple[str, dict, tuple]] = []
        self.gets: list[tuple[str, tuple | None]] = []
        self.post_responses: list[FakeResponse] = []
        self.get_responses: dict[str, list[FakeResponse]] = {}

    def post(self, url, body, auth):
        self.posts.append((url, body, auth))
        return self.post_responses.pop(0)

    def get(self, url, auth=None):
        self.gets.append((url, auth))
        return self.get_responses[url].pop(0)


def make_client(transport, **kw):
    kw.setdefault("sleep", lambda s: None)
    return UnityExportClient(
        api_keys={PROJECT: "key-abc"}, transport=transport, **kw
    )


def test_request_export_first_run_sends_start_date():
    t = FakeTransport()
    t.post_responses = [FakeResponse(200, {"id": "job-1"})]
    client = make_client(t)
    job = client.request_export(PROJECT, "2026-07-01", "2026-08-01", "json", "custom")
    assert job == "job-1"
    url, body, auth = t.posts[0]
    assert url == f"{BASE}{PROJECT}/rawdataexports"
    # startDate present, continueFrom absent (reference :63-66)
    assert body == {
        "endDate": "2026-08-01",
        "format": "json",
        "dataset": "custom",
        "startDate": "2026-07-01",
    }
    assert auth == (PROJECT, "key-abc")  # basic auth pair (:69)


def test_request_export_continuation_replaces_start_date():
    t = FakeTransport()
    t.post_responses = [FakeResponse(200, {"id": "job-2"})]
    client = make_client(t)
    client.request_export(
        PROJECT, "2026-07-01", "2026-08-01", "json", "appStart", continue_from="job-1"
    )
    _, body, _ = t.posts[0]
    assert body["continueFrom"] == "job-1"
    assert "startDate" not in body  # XOR semantics (:63-66)


def test_request_export_non_200_returns_none_and_collect_raises():
    t = FakeTransport()
    t.post_responses = [FakeResponse(403, text="forbidden")]
    client = make_client(t)
    assert client.request_export(PROJECT, "a", "b") is None
    # the reference crashes with TypeError at :163; collect() makes the
    # failure explicit instead
    t.post_responses = [FakeResponse(403, text="forbidden")]
    with pytest.raises(ExportRequestError):
        client.collect(PROJECT, "custom", "/tmp/nowhere", "a", "b")


def test_poll_until_ready_accumulates_wait(tmp_path):
    t = FakeTransport()
    job_uri = f"{BASE}{PROJECT}/rawdataexports/job-3"
    t.get_responses[job_uri] = [
        FakeResponse(200, {"status": "running"}),
        FakeResponse(500),  # transient server error reads as not-ready (:86)
        FakeResponse(200, {"status": "completed"}),
    ]
    sleeps: list[float] = []
    client = make_client(t, sleep=sleeps.append, poll_interval=5.0)
    waited = client.poll_until_ready(PROJECT, "job-3")
    assert sleeps == [5.0, 5.0]  # the reference's fixed 5 s cadence (:168)
    assert waited == 10.0  # accumulated total (:169)


def test_poll_until_ready_times_out():
    t = FakeTransport()
    job_uri = f"{BASE}{PROJECT}/rawdataexports/job-4"
    t.get_responses[job_uri] = [FakeResponse(200, {"status": "running"})] * 100
    client = make_client(t, poll_interval=5.0, max_wait=20.0)
    with pytest.raises(ExportTimeoutError):
        client.poll_until_ready(PROJECT, "job-4")


def gz(payload: list[dict]) -> bytes:
    return gzip.compress(
        "\n".join(json.dumps(p) for p in payload).encode() + b"\n"
    )


def test_download_job_gunzips_into_reference_layout(tmp_path):
    t = FakeTransport()
    job_uri = f"{BASE}{PROJECT}/rawdataexports/job-5"
    rows_a = [{"ts": 1, "name": "level_up"}, {"ts": 2, "name": "purchase"}]
    rows_b = [{"ts": 3, "name": "app_start"}]
    t.get_responses[job_uri] = [
        FakeResponse(
            200,
            {
                "status": "completed",
                "result": {
                    "fileList": [
                        {"name": "part-0.gz", "url": "https://cdn/f0"},
                        {"name": "part-1.gz", "url": "https://cdn/f1"},
                        {"name": "broken.gz", "url": "https://cdn/f2"},
                    ]
                },
            },
        )
    ]
    t.get_responses["https://cdn/f0"] = [FakeResponse(200, content=gz(rows_a))]
    t.get_responses["https://cdn/f1"] = [FakeResponse(200, content=gz(rows_b))]
    t.get_responses["https://cdn/f2"] = [FakeResponse(404)]  # skipped (:135)
    client = make_client(t)
    written = client.download_job(
        PROJECT, "job-5", "custom", str(tmp_path), batch_date="2026-08-12"
    )
    # reference layout dest/<project>/<job_type>/<date>_<job>/<name>.json (:106,131-132)
    expect_dir = tmp_path / PROJECT / "custom" / "2026-08-12_job-5"
    assert sorted(os.path.basename(p) for p in written) == [
        "part-0.json",
        "part-1.json",
    ]
    got = [
        json.loads(line)
        for line in (expect_dir / "part-0.json").read_text().splitlines()
    ]
    assert got == rows_a  # gunzipped content is the decompressed NDJSON (:136-141)


def test_download_job_empty_filelist_returns_no_paths(tmp_path):
    t = FakeTransport()
    job_uri = f"{BASE}{PROJECT}/rawdataexports/job-6"
    t.get_responses[job_uri] = [
        FakeResponse(200, {"status": "completed", "result": {}})
    ]
    client = make_client(t)
    # [] is the is_files=False signal (:124-127): caller must not checkpoint
    assert client.download_job(PROJECT, "job-6", "custom", str(tmp_path)) == []
    assert not (tmp_path / PROJECT).exists()  # no empty daily dir litter


def test_download_job_not_completed_raises(tmp_path):
    t = FakeTransport()
    job_uri = f"{BASE}{PROJECT}/rawdataexports/job-7"
    t.get_responses[job_uri] = [FakeResponse(200, {"status": "running"})]
    client = make_client(t)
    with pytest.raises(ExportRequestError):
        client.download_job(PROJECT, "job-7", "custom", str(tmp_path))


def test_collect_end_to_end_then_spark_reads_landing(spark, tmp_path):
    """The full request→poll→download path lands NDJSON that the
    declarative landing scan (sources/landing.py) reads — HTTP client
    and data plane meet at the filesystem, exactly like the reference
    (:139-141 writes, BigQuery loads the files after)."""
    from unity_to_bigquery_spark.sources.landing import read_ndjson

    t = FakeTransport()
    t.post_responses = [FakeResponse(200, {"id": "job-8"})]
    job_uri = f"{BASE}{PROJECT}/rawdataexports/job-8"
    rows = [{"event_id": i, "name": f"e{i}"} for i in range(10)]
    t.get_responses[job_uri] = [
        FakeResponse(200, {"status": "running"}),
        FakeResponse(200, {"status": "completed"}),  # poll sees completion…
        FakeResponse(  # …then download re-GETs the job for the fileList
            200,
            {
                "status": "completed",
                "result": {"fileList": [{"name": "d.gz", "url": "https://cdn/d"}]},
            },
        ),
    ]
    t.get_responses["https://cdn/d"] = [FakeResponse(200, content=gz(rows))]
    client = make_client(t)
    job_id, written = client.collect(
        PROJECT, "custom", str(tmp_path), "2026-07-14", "2026-08-13",
        batch_date="2026-08-13",
    )
    assert job_id == "job-8" and len(written) == 1
    df = read_ndjson(spark, written[0])
    assert df.count() == 10
    assert {r.event_id for r in df.select("event_id").collect()} == set(range(10))


def test_webhook_sink_posts_reference_payload_shape():
    calls = []

    def fake_post(url, **kw):
        calls.append((url, kw))

    notifier = ErrorNotifier(
        sink=webhook_sink("https://hooks.example/T00/B00/xyz", post=fake_post)
    )
    # a message with quotes — would break/inject the reference's
    # os.system curl line (slack_notifier.py:11); JSON encoding is safe
    msg = "Unity Analytics autoupload ERROR: can't parse \"config\""
    notifier.notify(msg)
    (url, kw), = calls
    assert url == "https://hooks.example/T00/B00/xyz"
    assert kw["json"] == {"text": msg}  # the reference's payload shape (:10)
    assert kw["headers"]["Content-type"] == "application/json"


# ---- real-transport integration (VERDICT r2 next-round #7) ------------
#
# The fakes above prove the client logic; these prove the DEFAULT
# RequestsTransport (sources/unity_http.py:64-90) actually speaks HTTP:
# a stdlib http.server stands in for the Unity API on localhost, so the
# requests adapter (basic auth header, JSON body encode, bytes
# download) executes for real with zero external network. The live-API
# smoke at the bottom is env-flag-gated and skips cleanly here.


def _start_fake_unity_server(rows):
    import base64
    import threading
    from http.server import BaseHTTPRequestHandler, HTTPServer

    state = {"polls": 0, "auth_seen": [], "bodies": []}
    payload = gz(rows)

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # keep pytest output clean
            pass

        def _send(self, code, body: bytes, ctype="application/json"):
            self.send_response(code)
            self.send_header("content-type", ctype)
            self.send_header("content-length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_POST(self):
            state["auth_seen"].append(self.headers.get("authorization", ""))
            n = int(self.headers.get("content-length", 0))
            state["bodies"].append(json.loads(self.rfile.read(n)))
            self._send(200, json.dumps({"id": "job-http"}).encode())

        def do_GET(self):
            if self.path.endswith("/files/part-0.gz"):
                self._send(200, payload, ctype="application/gzip")
                return
            state["polls"] += 1
            if state["polls"] == 1:
                body = {"status": "running"}
            else:
                port = self.server.server_address[1]
                body = {
                    "status": "completed",
                    "result": {
                        "fileList": [
                            {
                                "name": "part-0.gz",
                                "url": f"http://127.0.0.1:{port}/files/part-0.gz",
                            }
                        ]
                    },
                }
            self._send(200, json.dumps(body).encode())

    srv = HTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv, state, base64


def test_requests_transport_end_to_end_against_local_server(tmp_path):
    pytest.importorskip("requests")
    from unity_to_bigquery_spark.sources.unity_http import (
        RequestsTransport,
        UnityExportClient,
    )

    rows = [{"ts": 1, "name": "level_up"}, {"ts": 2, "name": "purchase"}]
    srv, state, base64 = _start_fake_unity_server(rows)
    try:
        port = srv.server_address[1]
        client = UnityExportClient(
            api_keys={PROJECT: "sekret"},
            base_uri=f"http://127.0.0.1:{port}/api/v2/projects/",
            transport=RequestsTransport(timeout=10.0),
            sleep=lambda s: None,
        )
        job_id, written = client.collect(
            PROJECT, "custom", str(tmp_path), "2026-08-01", "2026-08-02",
            batch_date="2026-08-02",
        )
        assert job_id == "job-http"
        assert len(written) == 1 and written[0].endswith("part-0.json")
        got = [
            json.loads(line) for line in open(written[0]).read().splitlines()
        ]
        assert got == rows  # gunzip of real HTTP bytes round-trips
        # requests really sent basic auth (project_id:api_key) + JSON body
        expect = base64.b64encode(f"{PROJECT}:sekret".encode()).decode()
        assert state["auth_seen"][0] == f"Basic {expect}"
        assert state["bodies"][0]["startDate"] == "2026-08-01"
        assert state["polls"] >= 2  # poll loop really re-GETs until completed
    finally:
        srv.shutdown()


@pytest.mark.skipif(
    not os.environ.get("UNITY_EXPORT_LIVE_PROJECT"),
    reason="live Unity API smoke needs UNITY_EXPORT_LIVE_PROJECT / "
    "UNITY_EXPORT_LIVE_KEY and outbound network",
)
def test_requests_transport_live_unity_api_smoke(tmp_path):
    """Opt-in real-endpoint smoke (set UNITY_EXPORT_LIVE_PROJECT and
    UNITY_EXPORT_LIVE_KEY): requests one day of custom events and
    downloads whatever the account returns. Never runs in the sandbox."""
    pytest.importorskip("requests")
    from unity_to_bigquery_spark.sources.unity_http import UnityExportClient

    project = os.environ["UNITY_EXPORT_LIVE_PROJECT"]
    client = UnityExportClient(
        api_keys={project: os.environ["UNITY_EXPORT_LIVE_KEY"]}
    )
    job_id, written = client.collect(
        project, "custom", str(tmp_path), "2026-08-12", "2026-08-13",
        batch_date="2026-08-13",
    )
    assert job_id
    for p in written:
        assert os.path.getsize(p) >= 0
