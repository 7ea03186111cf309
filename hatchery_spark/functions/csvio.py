"""RFC 4180 CSV render + parse: the render side is pure codegen (quote only
when a field contains comma/quote/CR/LF; double embedded quotes; CRLF
record separator; header row), the parse side is a real state-machine walk
(stdlib ``csv`` with the strict RFC dialect) over file blobs in one Arrow
pass — because embedded newlines make CSV records NOT line-splittable, the
one thing naive split-on-newline parsers get wrong.

Why bother when Spark reads CSV natively: at 10^12 rows the engine also has
to WRITE interchange CSV deterministically (per-partition render is a
codegen projection + one bounded group per file), and the self-roundtrip
with adversarial field content (commas, quotes, CRLF inside fields) pins
both directions against the spec rather than against each other's bugs —
the oracle replays the ORIGINAL field expression, not the CSV.

Scale shape: render = zero-shuffle codegen; file assembly = one groupBy on
the file key with bounded groups; parse = zero-shuffle mapInPandas.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["csv_field", "csv_render_files", "csv_parse_files", "csv_roundtrip"]


def csv_field(col: Column) -> Column:
    """RFC 4180 field encoding as a codegen expression: double embedded
    quotes, then wrap in quotes only when the raw value contains one of
    [",\\r\\n]."""
    needs = col.rlike('[",\r\n]')
    doubled = F.replace(col, F.lit('"'), F.lit('""'))
    return F.when(needs, F.concat(F.lit('"'), doubled, F.lit('"'))).otherwise(col)


def csv_render_files(
    df: DataFrame,
    cols: list[str],
    file_key: Column,
    order_col: str,
) -> DataFrame:
    """Render ``cols`` (string columns) into CRLF-terminated CSV file blobs,
    one row per file: (file_id, blob). Line order inside a file is pinned
    by ``order_col`` via an array_sort of (order, line) structs — no window,
    ONE exchange on the file key."""
    line = F.concat_ws(",", *[csv_field(F.col(c)) for c in cols])
    header = ",".join(cols)
    return (
        df.select(
            file_key.alias("file_id"), F.col(order_col).alias("ord"),
            line.alias("line"),
        )
        .groupBy("file_id")
        .agg(
            F.concat(
                F.lit(header + "\r\n"),
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct(F.col("ord"), F.col("line")))
                        ),
                        lambda x: x["line"],
                    ),
                    "\r\n",
                ),
                F.lit("\r\n"),
            ).alias("blob")
        )
    )


def csv_parse_files(files: DataFrame, n_cols: int) -> DataFrame:
    """Parse CSV blobs back to rows with the strict RFC 4180 state machine
    (stdlib csv, doublequote dialect). Returns (file_id, row_idx, fields
    array<string>) — row_idx is the 0-based DATA row index (header
    skipped). A record with the wrong arity raises (strict, no padding)."""
    import csv as _csv
    import io

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            fids, idxs, fields = [], [], []
            for fid, blob in zip(b["file_id"], b["blob"]):
                rdr = _csv.reader(
                    io.StringIO(blob), strict=True, doublequote=True
                )
                for i, rec in enumerate(rdr):
                    if i == 0:
                        continue
                    if len(rec) != n_cols:
                        raise ValueError(
                            f"csv: record arity {len(rec)} != {n_cols}"
                        )
                    fids.append(fid)
                    idxs.append(i - 1)
                    fields.append(rec)
            yield pd.DataFrame(
                {"file_id": fids, "row_idx": idxs, "fields": fields}
            )

    return files.mapInPandas(
        _parse, "file_id long, row_idx int, fields array<string>"
    )


def csv_roundtrip(
    df: DataFrame,
    cols: list[str],
    file_key: Column,
    order_col: str,
    files: int | None = None,
) -> DataFrame:
    """Render → parse → re-typed rows: returns one row per input row with
    the parsed string fields exploded back into named columns
    (``<col>_out``) plus (file_id, row_idx)."""
    blobs = csv_render_files(df, cols, file_key, order_col)
    parsed = csv_parse_files(blobs, len(cols))
    out = parsed.select(
        "file_id",
        "row_idx",
        *[F.col("fields")[i].alias(f"{c}_out") for i, c in enumerate(cols)],
    )
    return out
