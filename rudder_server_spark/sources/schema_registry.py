"""Persistent schema registry (reference parity: `wh_schemas`).

The reference treats inferred warehouse schemas as durable STATE, not as
something re-derived per read: consolidation folds each staging batch into
the schema stored in the `wh_schemas` table, and the live warehouse schema
takes precedence on conflict (warehouse/schema/schema.go:205-343). This
module is the Spark-side equivalent: a discovered flatten/fan-out schema
(and its timestamp-promotion verdicts) is keyed by corpus identity and
persisted as JSON, so every subsequent job — including a fresh driver
process — projects with the registered schema instead of paying a
discovery scan. At 100 TB the discovery aggregation over a new staging
batch is incremental (fold new batch schema into the registered one); here
corpora are immutable fixture files, so identity = (path, mtime, size).

Entries are plain JSON (schemas are lists of [name, path_parts, type]);
invalidation is automatic when the corpus file changes.
"""

from __future__ import annotations

import json
import os
import tempfile

_REG_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".fixtures",
    "schema_registry",
)


def _identity(path: str) -> dict:
    st = os.stat(path)
    return {"path": os.path.abspath(path), "mtime": st.st_mtime, "size": st.st_size}


def cached_schema(corpus_path: str, kind: str, compute):
    """Return the registered value for (corpus, kind), computing+persisting on miss.

    ``compute`` is a zero-arg callable returning a JSON-serializable value.
    The registry entry is invalidated automatically when the corpus file's
    mtime/size change.
    """
    ident = _identity(corpus_path)
    entry_path = os.path.join(
        _REG_DIR, f"{os.path.basename(corpus_path)}.{kind}.json"
    )
    try:
        with open(entry_path) as fh:
            data = json.load(fh)
        if data.get("identity") == ident:
            return data["value"]
    except (OSError, ValueError):
        pass
    value = compute()
    os.makedirs(_REG_DIR, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=_REG_DIR, suffix=".tmp")
    with os.fdopen(fd, "w") as fh:
        json.dump({"identity": ident, "value": value}, fh)
    os.replace(tmp, entry_path)
    return value
