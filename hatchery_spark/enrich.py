"""Broadcast-join enrichment against the service catalog.

Semantics rebuilt from the reference's metadata-enrichment step — each payload is
tagged with routing metadata before the sink (/root/reference/pkg/metadata/data.go:58-98
and the per-source call sites, e.g. /root/reference/source/slack/slack.go:174-179) —
generalized to a relational lookup: (tool, role) → (service, category,
default_severity).

The catalog is tiny (≤ a few hundred rows) so we FORCE a broadcast hash join:
no shuffle of the 10^12-row fact side, the dimension ships to every executor once.
Left join keeps catalog-miss rows (unknown tools) flowing, with 'unknown'
fallbacks — the reference's unknown-schema-hint behavior
(/root/reference/source/falcon_data_replicator/client.go:195-198).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ENRICH_KEYS = ("tool", "role")


def enrich_turns(parsed: DataFrame, catalog: DataFrame) -> DataFrame:
    """Left broadcast-join parsed turns with the service catalog.

    Adds: service, category (both 'unknown' on miss) and resolves severity as
    coalesce(parsed severity, catalog default_severity, 'unknown').
    """
    joined = parsed.join(F.broadcast(catalog), on=list(ENRICH_KEYS), how="left")
    return joined.withColumns(
        {
            "service": F.coalesce(F.col("service"), F.lit("unknown")),
            "category": F.coalesce(F.col("category"), F.lit("unknown")),
            "severity": F.coalesce(
                F.col("severity"), F.col("default_severity"), F.lit("unknown")
            ),
        }
    ).drop("default_severity")
