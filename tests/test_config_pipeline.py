"""Workspace-config loader + batch pipeline orchestration.

Mirrors the reference's config-driven routing behavior: disabled
sources/destinations never enter the connection graph, a missing
supportedMessageTypes means allow-all, and the §3.1 stage chain keeps
`filtered` jobs with status rather than dropping them
(backend-config/types.go, processor/eventfilter/eventfilter.go).
"""

import pyspark.sql.functions as F

from rudder_server_spark.pipeline_batch import run_batch_pipeline
from rudder_server_spark.sources.config import load_workspace_config

CFG = {
    "workspaceId": "ws-t",
    "sources": [
        {
            "id": "s-on", "name": "on", "writeKey": "wk1", "enabled": True,
            "transient": True,
            "geoEnrichment": {"enabled": True},
            "sourceDefinition": {"category": "warehouse", "type": "warehouse"},
            "destinations": [
                {
                    "id": "d-types", "name": "typed", "enabled": True,
                    "destinationDefinition": {
                        "name": "WEBHOOK",
                        "config": {"supportedMessageTypes": ["track"]},
                    },
                    # reference GCM shape: a LIST of provider configs
                    # (processor/consent.go getGenericConsentManagementData)
                    "config": {
                        "consentManagement": [
                            {
                                "provider": "oneTrust",
                                "resolutionStrategy": "or",
                                "consents": [{"consent": "ads"}],
                            }
                        ]
                    },
                },
                {
                    "id": "d-all", "name": "allkinds", "enabled": True,
                    "destinationDefinition": {"name": "S3", "config": {}},
                    "config": {},
                },
                {
                    "id": "d-off", "name": "disabled", "enabled": False,
                    "destinationDefinition": {"name": "GA", "config": {}},
                    "config": {},
                },
            ],
        },
        {
            "id": "s-off", "name": "off", "writeKey": "wk2", "enabled": False,
            "destinations": [
                {
                    "id": "d-all", "name": "allkinds", "enabled": True,
                    "destinationDefinition": {"name": "S3", "config": {}},
                    "config": {},
                }
            ],
        },
    ],
}


def test_loader_dimensions(spark):
    cfg = load_workspace_config(spark, CFG)
    srcs = {r["source_id"]: r for r in cfg["sources"].collect()}
    assert set(srcs) == {"s-on", "s-off"}
    assert srcs["s-on"]["transient"] and srcs["s-on"]["geo_enabled"]
    assert srcs["s-on"]["category"] == "warehouse"
    assert not srcs["s-off"]["enabled"]
    dests = {r["destination_id"]: r for r in cfg["destinations"].collect()}
    assert set(dests) == {"d-types", "d-all", "d-off"}
    assert dests["d-types"]["supported_message_types"] == ["track"]
    assert dests["d-types"]["consent_category_ids"] == ["ads"]
    assert dests["d-all"]["supported_message_types"] is None  # allow-all
    # connection graph: only enabled x enabled pairs
    conns = {(r["source_id"], r["destination_id"]) for r in cfg["connections"].collect()}
    assert conns == {("s-on", "d-types"), ("s-on", "d-all")}


def test_batch_pipeline_stages(spark):
    cfg = load_workspace_config(spark, CFG)
    events = spark.createDataFrame(
        [
            # duplicate message_id -> F1 keeps first received
            ("m1", "r0", None, "track", "s-on", 1, ["ads"]),
            ("m1", "r0", None, "track", "s-on", 2, ["ads"]),
            # retl pair: same record_id under fresh message ids -> one survives
            ("m2", "rA", 7, "extract", "s-on", 3, []),
            ("m3", "rA", 7, "extract", "s-on", 4, []),
            # suppressed user
            ("m4", None, 99, "identify", "s-on", 5, []),
            # disabled source -> gated out
            ("m5", None, 7, "track", "s-off", 6, []),
        ],
        "message_id string, record_id string, user_id int, event_type string, "
        "source_id string, received_at int, denied_consent_ids array<string>",
    )
    supp = spark.createDataFrame([(99,)], "user_id int")
    out = run_batch_pipeline(
        events, cfg, suppression=supp, denied_col="denied_consent_ids"
    )
    counts = {r["stage"]: r["n"] for r in out["stage_counts"].collect()}
    assert counts["1_input"] == 6
    assert counts["2_deduped"] == 4  # m1-dup and m3 (same record) dropped
    assert counts["3_suppressed"] == 3  # m4's user suppressed
    jobs = {
        (r["message_id"], r["destination_id"]): r["status"]
        for r in out["jobs"].collect()
    }
    # m1 (track, denied ads) is consent-dropped at d-types but lands at
    # d-all; m2 (extract) is filtered at d-types (track-only), ok at d-all
    assert ("m1", "d-types") not in jobs
    assert jobs[("m1", "d-all")] == "ok"
    assert jobs[("m2", "d-types")] == "filtered"
    assert jobs[("m2", "d-all")] == "ok"
    # disabled source m5 reached no destination
    assert not any(m == "m5" for m, _ in jobs)
    assert out["delivered"].count() == 2  # m1@d-all, m2@d-all (m2@d-types is filtered)


def test_config_edge_semantics(spark):
    """Reference edge cases (ADVICE r2): an explicitly EMPTY
    supportedMessageTypes list supports NOTHING (eventfilter.go returns
    ([], true), not allow-all); a missing key delivers even unknown
    custom types; legacy oneTrustCookieCategories is the consent
    fallback only when GCM config is absent."""
    cfg_dict = {
        "workspaceId": "ws-e",
        "sources": [
            {
                "id": "s1", "name": "s", "writeKey": "wk", "enabled": True,
                "destinations": [
                    {
                        "id": "d-none", "name": "nothing", "enabled": True,
                        "destinationDefinition": {
                            "name": "X",
                            "config": {"supportedMessageTypes": []},
                        },
                        "config": {},
                    },
                    {
                        "id": "d-legacy", "name": "legacy", "enabled": True,
                        "destinationDefinition": {"name": "Y", "config": {}},
                        "config": {
                            "oneTrustCookieCategories": [
                                {"oneTrustCookieCategory": "marketing"}
                            ]
                        },
                    },
                ],
            }
        ],
    }
    cfg = load_workspace_config(spark, cfg_dict)
    dests = {r["destination_id"]: r for r in cfg["destinations"].collect()}
    # explicit [] survives as [] (NOT coerced to NULL/allow-all)
    assert dests["d-none"]["supported_message_types"] == []
    assert dests["d-legacy"]["supported_message_types"] is None
    assert dests["d-legacy"]["consent_category_ids"] == ["marketing"]

    events = spark.createDataFrame(
        [("m1", None, 1, "record", "s1", 1, [])],  # custom type outside the 8
        "message_id string, record_id string, user_id int, event_type string, "
        "source_id string, received_at int, denied_consent_ids array<string>",
    )
    out = run_batch_pipeline(events, cfg)
    jobs = {
        (r["message_id"], r["destination_id"]): r["status"]
        for r in out["jobs"].collect()
    }
    # empty list filters EVERYTHING; missing key delivers even 'record'
    assert jobs[("m1", "d-none")] == "filtered"
    assert jobs[("m1", "d-legacy")] == "ok"
