"""Unity Raw Data Export HTTP client — the reference's ingestion
protocol (request → poll → download/gunzip) as real, testable client
code with an injectable transport.

Reference trace:
- request_raw_analytics_dump (Unity_to_BigQuery.py:56-75): POST to
  ``{base}/{project}/rawdataexports`` with ``continueFrom`` XOR
  ``startDate`` in the body (:63-66), HTTP basic auth of
  (project_id, api_key) (:69), job id from ``r.json()['id']`` on 200,
  else None (:71-75).
- is_raw_analytics_dump_ready (:78-86): GET the job resource, ready
  iff 200 AND status == 'completed'; any non-200 reads as not-ready.
- the poll loop (:166-171): fixed 5 s sleep, total wait accumulated.
- save_raw_analytics_dump (:105-150): GET job, bail on non-200 (:113)
  or status != completed (:120); ``'fileList' not in result`` means a
  legitimately empty export (:124-127, the ``is_files`` flag — the
  caller must NOT checkpoint it, :182-184); per file: GET, gunzip,
  write ``<name-without-ext>.json`` under
  ``dest/<project>/<job_type>/<date>_<job_id>/`` (:106,129-141).
- the None-job-id crash (:163): ``'started jobId: ' + jobId`` raises
  TypeError when the request failed. Here that failure mode is an
  explicit ExportRequestError.

Design: the transport (two methods, ``post``/``get``) is injected so
unit tests run against a fake with canned/gzip payloads; the default
is a thin ``requests`` adapter. The client only LANDS files — the data
plane (NDJSON scan of the landing dir) stays declarative Spark
(sources/landing.py), so the engine's scan/pushdown behavior is
untouched by how bytes arrive.
"""

from __future__ import annotations

import gzip
import io
import os
from dataclasses import dataclass, field
from typing import Any, Callable


class ExportRequestError(RuntimeError):
    """The export POST did not yield a job id (reference :163's
    TypeError-on-None made explicit)."""


class ExportTimeoutError(RuntimeError):
    """Polling exceeded the configured budget (the reference loops
    forever, :166-171 — unacceptable for an unattended pipeline)."""


@dataclass
class FakeResponse:
    """Minimal response shape the client consumes (mirrors the
    requests.Response subset used by the reference)."""

    status_code: int
    payload: Any = None
    content: bytes = b""
    text: str = ""

    def json(self):
        return self.payload


class RequestsTransport:
    """Default transport: real HTTP via requests, basic auth."""

    def __init__(self, timeout: float = 30.0):
        self.timeout = timeout

    def post(self, url: str, body: dict, auth: tuple[str, str]):
        import requests
        from requests.auth import HTTPBasicAuth

        return requests.post(
            url,
            headers={"content-type": "application/json"},
            json=body,
            auth=HTTPBasicAuth(*auth),
            timeout=self.timeout,
        )

    def get(self, url: str, auth: tuple[str, str] | None = None):
        import requests
        from requests.auth import HTTPBasicAuth

        return requests.get(
            url,
            auth=HTTPBasicAuth(*auth) if auth else None,
            timeout=self.timeout,
        )


@dataclass
class UnityExportClient:
    """Driver-side ingestion client. ``api_keys`` maps project_id →
    api key (the reference's ``CONFIG['{project_id}']`` lookup,
    :69,167)."""

    api_keys: dict[str, str]
    base_uri: str = "https://analytics.cloud.unity3d.com/api/v2/projects/"
    transport: Any = field(default_factory=RequestsTransport)
    sleep: Callable[[float], None] = __import__("time").sleep
    poll_interval: float = 5.0  # the reference's fixed cadence (:168)
    poll_backoff: float = 1.0  # 1.0 = reference behavior; >1 = exponential
    max_wait: float = 3600.0

    def _auth(self, project_id: str) -> tuple[str, str]:
        return (project_id, self.api_keys[project_id])

    def _job_uri(self, project_id: str, job_id: str) -> str:
        return f"{self.base_uri}{project_id}/rawdataexports/{job_id}"

    def request_export(
        self,
        project_id: str,
        start_date: str,
        end_date: str,
        dump_format: str = "json",
        data_set: str = "custom",
        continue_from: str | None = None,
    ) -> str | None:
        """POST an export job; job id on 200, None otherwise.
        ``continue_from`` replaces ``startDate`` exactly as the
        reference does (:63-66) — the server resumes from the prior
        job's end."""
        body: dict[str, Any] = {
            "endDate": end_date,
            "format": dump_format,
            "dataset": data_set,
        }
        if continue_from is not None:
            body["continueFrom"] = continue_from
        else:
            body["startDate"] = start_date
        r = self.transport.post(
            f"{self.base_uri}{project_id}/rawdataexports", body, self._auth(project_id)
        )
        if r.status_code == 200:
            return r.json()["id"]
        return None

    def is_ready(self, project_id: str, job_id: str) -> bool:
        r = self.transport.get(self._job_uri(project_id, job_id), self._auth(project_id))
        if r.status_code == 200:
            return r.json()["status"] == "completed"
        return False  # transient non-200 reads as not-ready (:86)

    def poll_until_ready(self, project_id: str, job_id: str) -> float:
        """Block until the job completes; returns total wait seconds
        (the reference's accumulated wait_time, :169). Raises
        ExportTimeoutError past ``max_wait``."""
        waited = 0.0
        interval = self.poll_interval
        while not self.is_ready(project_id, job_id):
            if waited >= self.max_wait:
                raise ExportTimeoutError(
                    f"job {job_id} not completed after {waited:.0f}s"
                )
            self.sleep(interval)
            waited += interval
            interval *= self.poll_backoff
        return waited

    def download_job(
        self,
        project_id: str,
        job_id: str,
        job_type: str,
        destination_directory: str,
        batch_date: str = "",
    ) -> list[str]:
        """Download + gunzip every file of a completed job into the
        reference's directory layout (:106): one ``.json`` per export
        file under ``dest/<project>/<job_type>/<date>_<job_id>/``.
        Returns written paths; [] means the no-fileList case (:124-127)
        — callers must not checkpoint an empty export. Raises on
        non-200 / not-completed (the reference printed and silently
        returned, :113-122, which upstream misread as success)."""
        r = self.transport.get(self._job_uri(project_id, job_id), self._auth(project_id))
        if r.status_code != 200:
            raise ExportRequestError(
                f"unable to retrieve result due to HTTP error: {r.status_code}"
            )
        job = r.json()
        if job["status"] != "completed":
            raise ExportRequestError(f"job {job_id} not completed; cannot dump results")
        if "fileList" not in job.get("result", {}):
            return []
        daily_dir = os.path.join(
            destination_directory, project_id, job_type, f"{batch_date}_{job_id}"
        )
        os.makedirs(daily_dir, exist_ok=True)
        written: list[str] = []
        for entry in job["result"]["fileList"]:
            fr = self.transport.get(entry["url"])
            if fr.status_code != 200:
                continue  # the reference skips failed file GETs (:135)
            name = os.path.splitext(entry["name"])[0] + ".json"
            out_path = os.path.join(daily_dir, name)
            with gzip.GzipFile(fileobj=io.BytesIO(fr.content)) as gz, open(
                out_path, "w+b"
            ) as out:
                out.write(gz.read())
            written.append(out_path)
        return written

    def collect(
        self,
        project_id: str,
        job_type: str,
        destination_directory: str,
        start_date: str,
        end_date: str,
        continue_from: str | None = None,
        batch_date: str = "",
    ) -> tuple[str, list[str]]:
        """The reference's main() per (project, report) iteration
        (:152-186): request (continuing from the prior job when known),
        poll, download. Returns (job_id, written_paths); the caller
        checkpoints job_id ONLY when paths is non-empty (the is_files
        guard) — see plans/pipeline.CheckpointTable."""
        job_id = self.request_export(
            project_id, start_date, end_date, "json", job_type, continue_from
        )
        if job_id is None:
            raise ExportRequestError(
                f"export request rejected for ({project_id}, {job_type})"
            )
        self.poll_until_ready(project_id, job_id)
        return job_id, self.download_job(
            project_id, job_id, job_type, destination_directory, batch_date
        )
