"""Payload sources for bronze ingestion.

A ``PayloadSource`` yields one raw JSON-able dict per (dataset, day) —
the unit the upstream Energy-Charts API serves. Two implementations:

- ``LocalJsonSource`` — hermetic fixtures (dict-backed or a directory
  of ``{dataset}/{date}.json`` files). Default everywhere; tests and
  CI never touch the network.
- ``RestSource`` — the reference's REST semantics
  (/root/reference/src/utils/api_client.py:19-73): GET with params and
  timeout, ``raise_for_status``, market upper-cased for the price
  endpoint. Import of ``requests`` is deferred so hermetic
  environments never need it.

At 100 TB these driver-side loops are the wrong shape — the scale path
is documented in DESIGN.md: distribute (dataset, day) fetch
tasks over executors via ``spark.range(...).repartition(...)`` +
``mapInPandas`` fetch, or a DataSource V2 reader.
"""

from __future__ import annotations

import json
import os
from typing import Any, Protocol

from ..pipeline.config import DatasetSpec, PipelineConfig


class PayloadSource(Protocol):
    def fetch(self, dataset: DatasetSpec, day: str) -> dict[str, Any] | None:
        """Return the payload dict for one day, or None if unavailable."""
        ...


class LocalJsonSource:
    """Fixture-backed source: payloads[dataset_name][day] -> dict."""

    def __init__(
        self,
        payloads: dict[str, dict[str, dict]] | None = None,
        root_dir: str | None = None,
    ):
        self._payloads = payloads or {}
        self._root = root_dir

    def fetch(self, dataset: DatasetSpec, day: str) -> dict[str, Any] | None:
        if dataset.name in self._payloads:
            return self._payloads[dataset.name].get(day)
        if self._root:
            path = os.path.join(self._root, dataset.name, f"{day}.json")
            if os.path.exists(path):
                with open(path) as f:
                    return json.load(f)
        return None


class RestSource:
    """Per-day REST GET against the upstream API.

    ``retries``/``backoff_s`` extend the reference's client (which
    fails a whole backfill on one transient 5xx —
    ``api_client.py:19-33`` has timeout + raise_for_status only):
    transient failures (connection errors, 5xx, 429) are retried with
    linear backoff; 4xx client errors other than 429 stay fatal
    immediately — retrying a 404 day just hammers the API. Defaults
    keep reference behavior (``retries=0``).
    """

    def __init__(
        self,
        config: PipelineConfig,
        retries: int = 0,
        backoff_s: float = 1.0,
        _sleep=None,
    ):
        self._base = config.api_base_url.rstrip("/")
        self._timeout = config.request_timeout_s
        self._retries = int(retries)
        self._backoff = float(backoff_s)
        # injectable for tests; deferred import keeps hermetic envs
        # requests-free
        self._sleep = _sleep

    def fetch(self, dataset: DatasetSpec, day: str) -> dict[str, Any] | None:
        import time

        import requests

        params = dict(dataset.params)
        key = dataset.key_value
        if dataset.key_column == "market":
            # Reference quirk: bidding-zone codes are upper-cased
            # before the request (api_client.py:69).
            params["bzn"] = key.upper()
        else:
            params[dataset.key_column] = key
        params["start"] = day
        params["end"] = day

        sleep = self._sleep or time.sleep
        last_err: Exception | None = None
        for attempt in range(self._retries + 1):
            if attempt:
                sleep(self._backoff * attempt)
            try:
                resp = requests.get(
                    f"{self._base}/{dataset.endpoint}",
                    params=params,
                    timeout=self._timeout,
                )
                resp.raise_for_status()
                return resp.json()
            except requests.exceptions.HTTPError as e:
                status = getattr(e.response, "status_code", None)
                if status is not None and 400 <= status < 500 and status != 429:
                    raise  # real client error — retrying can't help
                last_err = e
            except requests.exceptions.RequestException as e:
                last_err = e  # connection/timeout: transient
        assert last_err is not None
        raise last_err
