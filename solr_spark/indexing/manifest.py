"""Per-stage checkpoint manifests with lineage + per-partition metrics.

Analog of the reference's transaction-log/replay + topic checkpoints
(solr/core/src/java/org/apache/solr/update/UpdateLog.java:105-108;
solrj-streaming/.../io/stream/TopicStream.java:75-77): every build stage writes a
manifest recording its input lineage (an input token: content fingerprint or source
file listing), the engine config hash, and per-partition metrics. A stage whose
manifest matches (same stage name, config hash, input token, status=complete) is
skipped on resume, so a killed build resumes idempotently and produces byte-identical
output (tested in tests/test_resume.py).
"""

from __future__ import annotations

import json
import os
import time
from typing import Any


def _manifest_path(index_dir: str, stage: str) -> str:
    return os.path.join(index_dir, "_manifests", f"{stage}.json")


def stage_complete(index_dir: str, stage: str, config_hash: str, input_token: str) -> bool:
    path = _manifest_path(index_dir, stage)
    if not os.path.exists(path):
        return False
    try:
        with open(path) as f:
            m = json.load(f)
    except (json.JSONDecodeError, OSError):
        return False
    return (
        m.get("status") == "complete"
        and m.get("config_hash") == config_hash
        and m.get("input_token") == input_token
    )


def write_manifest(
    index_dir: str,
    stage: str,
    config_hash: str,
    input_token: str,
    metrics: dict[str, Any] | None = None,
    partitions: list[dict[str, Any]] | None = None,
) -> None:
    path = _manifest_path(index_dir, stage)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(
            {
                "stage": stage,
                "status": "complete",
                "config_hash": config_hash,
                "input_token": input_token,
                "written_at": time.time(),
                "metrics": metrics or {},
                "partitions": partitions or [],
            },
            f,
            indent=2,
            default=str,
        )
    os.replace(tmp, path)  # atomic: a killed write never yields status=complete


def read_manifest(index_dir: str, stage: str) -> dict[str, Any] | None:
    path = _manifest_path(index_dir, stage)
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def source_input_token(paths: list[str]) -> str:
    """Lineage token for file-based inputs: name+size+mtime of every data file."""
    import hashlib

    h = hashlib.sha256()
    for p in sorted(paths):
        if os.path.isdir(p):
            for root, _, files in sorted(os.walk(p)):
                for fn in sorted(files):
                    if fn.startswith(("_", ".")):
                        continue
                    fp = os.path.join(root, fn)
                    st = os.stat(fp)
                    h.update(f"{fp}|{st.st_size}|{st.st_mtime_ns}".encode())
        elif os.path.exists(p):
            st = os.stat(p)
            h.update(f"{p}|{st.st_size}|{st.st_mtime_ns}".encode())
    return h.hexdigest()[:16]
