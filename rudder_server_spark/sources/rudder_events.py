"""Deterministic `rudder_events` fixture generator (FIXTURES.md §2).

The driver has not (yet) materialized rudder_events.parquet under
/root/testdata, so the engine synthesizes it per the FIXTURES.md spec —
seed 42, fully deterministic — under the repo's .fixtures/ cache. Both the
Spark queries and the DuckDB oracle SQL read the same generated file, so
the correctness comparison is self-consistent. If the driver later ships
its own rudder_events.parquet, point `rudder_events_path` at it instead.

N = 10 × (rows of events.parquet at the same scale). Envelope per
gateway/handle.go:301-553; payload shapes per the reference's fuzz corpus
(embedded/warehouse/transformer_fuzz_test.go:40-80).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

FIXTURE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), ".fixtures")

_EVENT_NAMES = ["Order Completed", "Product Viewed", "Cart Cleared"]
_BASE_TS = np.datetime64("2024-02-01T00:00:00", "us")


def rudder_events_path(sf_dir: str) -> str:
    """Generate (once) and return the rudder_events parquet path for sf_dir."""
    sf_name = os.path.basename(os.path.normpath(sf_dir))
    out = os.path.join(FIXTURE_DIR, f"rudder_events_{sf_name}.parquet")
    if os.path.exists(out):
        return out
    events_path = os.path.join(sf_dir, "events.parquet")
    n_events = pq.read_metadata(events_path).num_rows
    os.makedirs(FIXTURE_DIR, exist_ok=True)
    tmp = out + ".tmp"
    _generate(tmp, n=10 * n_events)
    os.replace(tmp, out)
    return out


def _payload(i: int, user_id: int, etype: str, event_name: str | None, anon: str) -> str:
    msg = f"msg-{i:06d}"
    ctx = {
        "ip": f"10.0.{i % 256}.1",
        "traits": {"email": f"u{user_id}@example.com", "logins": i % 20},
        "library": {"name": "js", "version": "2.0.0"},
    }
    if etype == "track":
        body = {
            "type": "track",
            "messageId": msg,
            "userId": str(user_id),
            "event": event_name,
            "properties": {
                "price": round((i % 50000) / 100.0, 2),
                "quantity": 1 + i % 5,
                "currency": "USD",
                "shipped": i % 2 == 0,
                "coupon": None,
            },
            "userProperties": {"rating": i % 6},
            "context": ctx,
        }
    elif etype == "identify":
        body = {
            "type": "identify",
            "messageId": msg,
            "userId": str(user_id),
            "traits": {
                "email": f"u{user_id}@example.com",
                "name": f"User {user_id}",
                "plan": "pro" if i % 3 == 0 else None,
                "age": 20 + i % 50,
                "created_at": f"2023-{1 + i % 12:02d}-15T10:00:00.000Z",
            },
            "context": ctx,
        }
    elif etype == "page":
        body = {
            "type": "page",
            "messageId": msg,
            "userId": str(user_id),
            "name": "Home",
            "properties": {"url": f"https://example.com/{i}", "title": f"Page {i % 7}"},
            "context": ctx,
        }
    elif etype == "alias":
        body = {
            "type": "alias",
            "messageId": msg,
            "previousId": f"anon-{i % 500:04d}",
            "userId": str(user_id),
        }
    elif etype == "extract":
        # retl/warehouse-as-source record (gateway/handle_http_retl.go):
        # recordId rides the metadata sidecar (envelope record_id column);
        # `event` names the target table; properties reuse the track keys so
        # the corpus-wide discovered schema (q1 oracle) stays unchanged
        body = {
            "type": "extract",
            "event": event_name,
            "recordId": f"rec-{(i * 13) % 997:06d}",
            "properties": {
                "price": round((i % 50000) / 100.0, 2),
                "quantity": 1 + i % 5,
                "currency": "USD",
                "shipped": i % 2 == 0,
                "coupon": None,
            },
            "context": ctx,
        }
    else:  # merge
        body = {
            "type": "merge",
            "mergeProperties": [
                {"type": "email", "value": f"u{user_id}@example.com"},
                {"type": "anonymousId", "value": f"anon-{(i * 7) % 500:04d}"},
            ],
        }
    return json.dumps(body, separators=(",", ":"))


_TYPE_BY_MOD = ["track"] * 5 + ["identify"] * 2 + ["page", "alias", "merge"]


def _generate(out_path: str, n: int) -> None:
    # n base rows (i = 0..n-1, unchanged layout) + 5% appended extract rows
    # (retl record stream, i = n..): appended AFTER the base corpus so every
    # pre-extract query's input multiset is identical to the original spec.
    # recordId stride 13 mod 997 repeats ids → recordId-keyed dedup (W2) is
    # exercised with real duplicates.
    n_extract = n // 20
    total = n + n_extract
    rs = np.random.RandomState(42)
    user_ids = np.concatenate([rs.randint(0, 150, n), rs.randint(0, 150, n_extract)])
    idx = np.arange(total)

    message_id = [f"msg-{i:06d}" for i in idx]
    anonymous_id = ["" if i % 20 == 13 else f"anon-{i % 500:04d}" for i in idx]
    event_type = [_TYPE_BY_MOD[i % 10] for i in idx[:n]] + ["extract"] * n_extract
    event_name = [_EVENT_NAMES[i % 3] if i % 10 < 5 else None for i in idx[:n]] + [
        ("Product Export" if i % 2 == 0 else "user_snapshot") for i in range(n, total)
    ]
    record_id = [None] * n + [f"rec-{(i * 13) % 997:06d}" for i in range(n, total)]
    received_at = _BASE_TS + idx.astype("timedelta64[s]").astype("timedelta64[us]")
    sent_at = received_at - np.timedelta64(2_000_000, "us")
    original_timestamp = received_at - np.timedelta64(5_000_000, "us")
    payload = [
        _payload(int(i), int(user_ids[i]), event_type[i], event_name[i], anonymous_id[i])
        for i in idx
    ]

    # Cluster rows by event_type (stable, so content per FIXTURES.md is the
    # same multiset) and cap row-group size: per-type queries (q8 identify,
    # q9 merge) then prune whole row groups via parquet min/max stats instead
    # of decoding every payload. Same layout choice you'd make at 100 TB —
    # sort/partition the table by its dominant filter key.
    order = np.argsort(np.array(event_type), kind="stable")

    def take(vals):
        return [vals[j] for j in order]

    table = pa.table(
        {
            "message_id": pa.array(take(message_id), pa.string()),
            "user_id": pa.array(user_ids[order], pa.int64()),
            "anonymous_id": pa.array(take(anonymous_id), pa.string()),
            "event_type": pa.array(take(event_type), pa.string()),
            "event_name": pa.array(take(event_name), pa.string()),
            "record_id": pa.array(take(record_id), pa.string()),
            "received_at": pa.array(received_at[order], pa.timestamp("us")),
            "sent_at": pa.array(sent_at[order], pa.timestamp("us")),
            "original_timestamp": pa.array(original_timestamp[order], pa.timestamp("us")),
            "payload": pa.array(take(payload), pa.string()),
        }
    )
    # 16k-row groups (was 64k through r9): the SAME clustered order keeps
    # per-type min/max pruning (more, smaller groups per type), while the
    # sf0.1 file gains ≥64 natural scan tasks — fan_out()'s row-group gate
    # then skips the corpus repartition shuffle on every payload-heavy
    # plan (q91/q96/q97/q92/q1/q8/q9). At 100 TB the analogous knob is
    # parquet.block.size / file count per partition: size row groups so
    # scan parallelism ≥ cluster cores without losing stats pruning.
    pq.write_table(table, out_path, row_group_size=16 * 1024)
