"""Concrete urllib-based :class:`Transport` — the live-network twin of
``LocalTransport``.

The reference couples its network path to the Labelbox SDK + labelbase
(`labelspark/client.py:5-7`) and fetches label exports with a bare
``urllib.request.urlopen`` and zero retry handling
(`labelspark/get_annotations.py:8-9`; per-row ``requests.get`` in
`get_videoframe_annotations.py:29`). This module keeps that public
stdlib transport choice but hardens it the way an executor-resident
client must be:

- **Picklable by construction** — the instance holds only plain config
  (base URL, token, retry policy). ``post_data_rows`` and
  ``fetch_frames`` run inside ``foreachPartition`` / ``mapInPandas`` on
  executors, so the object crosses the pickle boundary on every task.
- **Bounded retry with exponential backoff** on connection errors,
  HTTP 429, and HTTP 5xx; a ``Retry-After`` header is honored (capped).
  4xx other than 429 fail fast — retrying a bad request is a bug.
- **No driver funnel** — like every other transport, batches leave from
  the executor that holds the partition; the driver never sees rows.

REST mapping (one resource per protocol verb):

========================  =====================================================
``export_labels``          GET  ``{base}/projects/{project_id}/labels``
``export_metadata``        GET  ``{base}/projects/{project_id}/metadata``
``export_ontology``        GET  ``{base}/projects/{project_id}/ontology``
``create_metadata_field``  POST ``{base}/projects/{project_id}/metadata_fields``
``post_data_rows``         POST ``{base}/datasets/{dataset_id}/data_rows``
``fetch_frames``           GET  ``{frames_url}`` verbatim (the payload's own
                           pre-signed URL, exactly as the reference does)
========================  =====================================================

``spool_path`` returns ``None``: a live platform holds posted rows
remotely; read-back goes through the export verbs, not a local spool.
"""

from __future__ import annotations

import json
import time
import urllib.error
import urllib.request

__all__ = ["HttpTransport", "TransportError"]

_RETRYABLE_STATUS = frozenset({429, 500, 502, 503, 504})


class TransportError(RuntimeError):
    """Terminal transport failure (retries exhausted or non-retryable)."""

    def __init__(self, msg: str, status: int | None = None) -> None:
        super().__init__(msg)
        self.status = status


class HttpTransport:
    """Live :class:`~labelspark_spark.client.Transport` over stdlib urllib.

    Parameters
    ----------
    base_url:
        Root of the platform REST API, e.g. ``https://api.example.com/v1``.
    api_key:
        Optional bearer token, sent as ``Authorization: Bearer <key>``.
    max_retries:
        Retry attempts AFTER the first try for retryable failures.
    backoff_base:
        First retry sleeps ``backoff_base`` seconds, doubling per retry
        (deterministic — executor tasks retrying in lockstep is bounded
        by ``max_retries``; a platform-provided ``Retry-After`` wins).
    timeout:
        Per-request socket timeout in seconds.
    """

    def __init__(
        self,
        base_url: str,
        api_key: str | None = None,
        *,
        max_retries: int = 4,
        backoff_base: float = 0.25,
        max_backoff: float = 30.0,
        timeout: float = 30.0,
    ) -> None:
        self.base_url = base_url.rstrip("/")
        self.api_key = api_key
        self.max_retries = int(max_retries)
        self.backoff_base = float(backoff_base)
        self.max_backoff = float(max_backoff)
        self.timeout = float(timeout)

    # -- core request loop ----------------------------------------------
    def _headers(self, *, body: bool) -> dict[str, str]:
        h = {"Accept": "application/json", "User-Agent": "labelspark-spark/0.1"}
        if body:
            h["Content-Type"] = "application/json"
        if self.api_key:
            h["Authorization"] = f"Bearer {self.api_key}"
        return h

    def _request(self, method: str, url: str, payload: bytes | None = None) -> str:
        """One verb with bounded retry; returns the decoded body."""
        attempt = 0
        while True:
            req = urllib.request.Request(
                url, data=payload, method=method,
                headers=self._headers(body=payload is not None),
            )
            try:
                with urllib.request.urlopen(req, timeout=self.timeout) as resp:
                    return resp.read().decode("utf-8")
            except urllib.error.HTTPError as e:
                status = e.code
                if status not in _RETRYABLE_STATUS:
                    raise TransportError(
                        f"{method} {url} -> HTTP {status} (not retryable)",
                        status=status,
                    ) from e
                retry_after = e.headers.get("Retry-After") if e.headers else None
            except urllib.error.URLError as e:
                status, retry_after = None, None
                if attempt >= self.max_retries:
                    raise TransportError(
                        f"{method} {url} failed after {attempt + 1} attempts: "
                        f"{e.reason}",
                    ) from e
            if attempt >= self.max_retries:
                raise TransportError(
                    f"{method} {url} -> HTTP {status}; retries exhausted "
                    f"({self.max_retries})",
                    status=status,
                )
            delay = min(self.backoff_base * (2 ** attempt), self.max_backoff)
            if retry_after:
                try:
                    delay = min(float(retry_after), self.max_backoff)
                except ValueError:
                    pass
            time.sleep(delay)
            attempt += 1

    # -- driver-side export verbs ----------------------------------------
    def export_labels(self, project_id: str) -> str:
        return self._request("GET", f"{self.base_url}/projects/{project_id}/labels")

    def export_metadata(self, project_id: str) -> str:
        return self._request("GET", f"{self.base_url}/projects/{project_id}/metadata")

    def export_ontology(self, project_id: str) -> str:
        return self._request("GET", f"{self.base_url}/projects/{project_id}/ontology")

    def create_metadata_field(self, project_id: str, field: dict) -> None:
        self._request(
            "POST",
            f"{self.base_url}/projects/{project_id}/metadata_fields",
            json.dumps(field, default=str).encode("utf-8"),
        )

    # -- executor-side verbs ----------------------------------------------
    def post_data_rows(self, dataset_id: str, rows: list[dict]) -> None:
        self._request(
            "POST",
            f"{self.base_url}/datasets/{dataset_id}/data_rows",
            json.dumps(rows, default=str).encode("utf-8"),
        )

    def fetch_frames(self, frames_url: str) -> str:
        # the frames URL arrives pre-signed inside the export payload —
        # fetched verbatim, exactly like the reference's per-row GET
        # (get_videoframe_annotations.py:29)
        return self._request("GET", frames_url)

    # -- spool ------------------------------------------------------------
    def spool_path(self, dataset_id: str) -> str | None:
        """Remote platform holds posted rows; no local spool to re-scan."""
        return None
