"""Control-plane workspace-config loader.

The reference subscribes to the control plane's workspace config and fans
it out to every subsystem (backend-config/backend-config.go; shapes in
backend-config/types.go: ConfigT → Sources[] → Destinations[]). This
module is the batch analogue: parse one workspace-config document (the
``/workspaceConfig`` JSON export, or an equivalent dict) into the three
bounded dimension DataFrames the operators consume:

  sources       (workspace_id, source_id, name, write_key, enabled,
                 transient, geo_enabled, category, source_type)
  destinations  (workspace_id, destination_id, name, dest_type, enabled,
                 processor_enabled, supported_message_types,
                 consent_category_ids)
  connections   (source_id, destination_id) — enabled pairs only, the
                 J10 fan-out dimension

Config is control-plane METADATA — KBs per workspace, bounded by human
configuration — so parsing happens driver-side and the frames are
broadcast dimensions everywhere they join (F2/F3/F5-F8, J10). The event
corpus never flows through here.

supported_message_types comes from the destination definition's config
(processor/eventfilter/eventfilter.go reads supportedMessageTypes from
the definition; an empty list means "all types supported" and is stored
as NULL so F7 callers can treat it as allow-all). consent_category_ids
follows processor/consent.go's resolved category list.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession

from rudder_server_spark.functions.localframe import local_frame

_SOURCES_SCHEMA = (
    "workspace_id string, source_id string, name string, write_key string, "
    "enabled boolean, transient boolean, geo_enabled boolean, "
    "category string, source_type string"
)
_DESTS_SCHEMA = (
    "workspace_id string, destination_id string, name string, dest_type string, "
    "enabled boolean, processor_enabled boolean, "
    "supported_message_types array<string>, consent_category_ids array<string>"
)
_CONN_SCHEMA = "source_id string, destination_id string"


def load_workspace_config(
    spark: SparkSession, config: dict | str
) -> dict[str, DataFrame]:
    """Parse a workspace-config document into dimension DataFrames.

    ``config`` is the parsed dict or a path to the JSON file. Returns
    {"sources": df, "destinations": df, "connections": df}. Disabled
    sources/destinations are kept in their dimension frames (flagged) but
    excluded from ``connections`` — matching the reference, which skips
    disabled entries when building the routing graph.
    """
    if isinstance(config, str):
        with open(config) as fh:
            config = json.load(fh)
    ws = config.get("workspaceId", "")
    src_rows, dest_rows, conn_rows = [], [], {}
    for s in config.get("sources", []):
        sdef = s.get("sourceDefinition", {}) or {}
        src_rows.append(
            (
                ws,
                s.get("id"),
                s.get("name"),
                s.get("writeKey"),
                bool(s.get("enabled", False)),
                bool(s.get("transient", False)),
                bool((s.get("geoEnrichment") or {}).get("enabled", False)),
                sdef.get("category") or "event-stream",
                sdef.get("type"),
            )
        )
        for d in s.get("destinations", []) or []:
            ddef = d.get("destinationDefinition", {}) or {}
            dcfg = d.get("config", {}) or {}
            # GetSupportedMessageTypes (eventfilter.go:24-44) returns
            # (nil, false) only when the KEY is absent — an explicitly
            # empty configured list means NO types are supported, so []
            # must survive as [] (NULL = allow-all only for missing key)
            ddef_cfg = ddef.get("config") or {}
            if "supportedMessageTypes" in ddef_cfg:
                smt = ddef_cfg["supportedMessageTypes"]
            elif "supportedMessageTypes" in dcfg:
                smt = dcfg["supportedMessageTypes"]
            else:
                smt = None
            # GCM consent config (consent.go getGenericConsentManagementData)
            # is a LIST of provider configs {provider, resolutionStrategy,
            # consents: [{consent}]}; flatten every provider's consent ids.
            # Legacy oneTrustCookieCategories ([{oneTrustCookieCategory}]
            # or plain strings) is the fallback when GCM is absent.
            cm = dcfg.get("consentManagement")
            if isinstance(cm, list):
                consent = [
                    c.get("consent") if isinstance(c, dict) else c
                    for p in cm
                    for c in (p.get("consents") or [])
                ]
            elif isinstance(cm, dict):
                consent = [
                    c.get("consent") if isinstance(c, dict) else c
                    for c in (cm.get("consents") or [])
                ]
            else:
                consent = []
            consent = [c for c in consent if c]
            if not consent:
                legacy = dcfg.get("oneTrustCookieCategories") or []
                consent = [
                    c.get("oneTrustCookieCategory", c) if isinstance(c, dict) else c
                    for c in legacy
                ]
                consent = [c for c in consent if c]
            did = d.get("id")
            dest_rows.append(
                (
                    ws,
                    did,
                    d.get("name"),
                    ddef.get("name"),
                    bool(d.get("enabled", False)),
                    bool(d.get("isProcessorEnabled", d.get("enabled", False))),
                    list(smt) if smt is not None else None,
                    list(consent) if consent else [],
                )
            )
            if s.get("enabled") and d.get("enabled"):
                conn_rows[(s.get("id"), did)] = True
    # a destination can appear under several sources — one dimension row
    # per destination id (last wins, matching the config-refresh overwrite)
    seen: dict = {}
    for row in dest_rows:
        seen[row[1]] = row
    return {
        "sources": local_frame(spark, src_rows, _SOURCES_SCHEMA),
        "destinations": local_frame(spark, list(seen.values()), _DESTS_SCHEMA),
        "connections": local_frame(spark, sorted(conn_rows), _CONN_SCHEMA),
    }
