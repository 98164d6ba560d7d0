"""Cached Confluent schema-registry client (reference A28 semantics,
`kafkaavro/cached_schema_registry.go:26-114`).

Driver-side only — schemas are plan-time metadata in Spark, so the
executors never talk to the registry (the reference hits it once per
producer too). HTTP is injectable for tests / air-gapped runs.
"""

from __future__ import annotations

import json
import threading
from typing import Callable, Optional

_CONTENT_TYPE = "application/vnd.schemaregistry.v1+json"


class SchemaRegistryClient:
    """GET-schema-by-id / register-schema with rw-locked caches.

    ``http_post`` / ``http_get`` default to ``requests`` and can be
    replaced with any callables returning (status_code, json_dict).
    """

    def __init__(
        self,
        base_url: str,
        http_get: Optional[Callable] = None,
        http_post: Optional[Callable] = None,
    ):
        self.base_url = base_url.rstrip("/")
        self._lock = threading.Lock()
        self._id_to_schema: dict[int, str] = {}
        self._subject_to_id: dict[tuple[str, str], int] = {}
        if http_get is None or http_post is None:
            import requests

            def http_get(url):  # pragma: no cover - network path
                r = requests.get(url, headers={"Accept": _CONTENT_TYPE}, timeout=30)
                return r.status_code, r.json()

            def http_post(url, payload):  # pragma: no cover - network path
                r = requests.post(
                    url, data=json.dumps(payload),
                    headers={"Content-Type": _CONTENT_TYPE}, timeout=30)
                return r.status_code, r.json()

        self._get, self._post = http_get, http_post

    def get_schema(self, schema_id: int) -> str:
        with self._lock:
            if schema_id in self._id_to_schema:
                return self._id_to_schema[schema_id]
        status, body = self._get(f"{self.base_url}/schemas/ids/{schema_id}")
        if status != 200:
            raise LookupError(f"schema id {schema_id}: HTTP {status} {body}")
        schema = body["schema"]
        with self._lock:
            self._id_to_schema[schema_id] = schema
        return schema

    def register(self, subject: str, schema_json: str) -> int:
        key = (subject, schema_json)
        with self._lock:
            if key in self._subject_to_id:
                return self._subject_to_id[key]
        status, body = self._post(
            f"{self.base_url}/subjects/{subject}/versions",
            {"schema": schema_json})
        if status != 200:
            raise LookupError(f"register {subject}: HTTP {status} {body}")
        schema_id = int(body["id"])
        with self._lock:
            self._subject_to_id[key] = schema_id
            self._id_to_schema.setdefault(schema_id, schema_json)
        return schema_id

    def register_topic(self, topic: str, value_schema: str,
                       key_schema: str = '"string"') -> tuple[int, int]:
        """Register ``<topic>-key`` and ``<topic>-value`` like the
        reference producer (`kafkaavro/producer.go:116-126`)."""
        key_id = self.register(f"{topic}-key", key_schema)
        value_id = self.register(f"{topic}-value", value_schema)
        return key_id, value_id
