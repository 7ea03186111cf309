"""Pure-pandas single-threaded oracle for the parse→enrich→route pipeline.

Independent implementation of the same semantics (SURVEY.md §5.1): used by tests
to gate routed-row equality and per-sink count parity against the Spark engine.
"""

from __future__ import annotations

import re

import pandas as pd

from hatchery_spark.datagen import service_catalog_rows
from hatchery_spark.parse import AUDIT_PATTERN_NAMED

_RE = re.compile(AUDIT_PATTERN_NAMED)


def parse_oracle(df: pd.DataFrame) -> pd.DataFrame:
    ext = df["text"].str.extract(_RE)
    out = df.copy()
    for c in ("actor", "action", "resource", "severity"):
        out[c] = ext[c]
    return out


def enrich_oracle(parsed: pd.DataFrame) -> pd.DataFrame:
    cat = pd.DataFrame(
        service_catalog_rows(),
        columns=["tool", "role", "service", "category", "default_severity"],
    )
    m = parsed.merge(cat, on=["tool", "role"], how="left")
    m["service"] = m["service"].fillna("unknown")
    m["category"] = m["category"].fillna("unknown")
    m["severity"] = m["severity"].fillna(m["default_severity"]).fillna("unknown")
    return m.drop(columns=["default_severity"])


def route_oracle(enriched: pd.DataFrame, route_predicates: dict) -> pd.DataFrame:
    """route_predicates: route_id -> python callable(df) -> boolean mask."""
    parts = []
    for rid, pred in route_predicates.items():
        sel = enriched[pred(enriched)].copy()
        sel["route_id"] = rid
        parts.append(sel)
    return pd.concat(parts, ignore_index=True)


def pipeline_oracle(df: pd.DataFrame, route_predicates: dict) -> pd.DataFrame:
    return route_oracle(enrich_oracle(parse_oracle(df)), route_predicates)
