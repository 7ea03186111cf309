"""License detection for code/document corpora.

A training-data pipeline over scraped code must classify each file's
license before the file may enter the corpus (permissive vs copyleft vs
unknown). This implements the standard fingerprint form of SPDX-style
matching: normalize text (case/punctuation/whitespace fold, per the SPDX
matching guidelines), shingle into word n-grams, and score each candidate
license by the fraction of its shingles found in the document HEAD (license
headers live at the top of a file).

Scale shape: license texts are a tiny static dimension — their shingle
table is built once and broadcast; the corpus side is one explode of the
capped document head (``head_words`` bounds per-doc work regardless of
document size) plus one (doc_id, license)-keyed aggregate. Scoring and the
argmax are integer-only (matched·10^6 div total), so results are
cross-engine exact and threshold ties are impossible to round differently.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

# Canonical snippets of four ubiquitous licenses (public license texts,
# trimmed to their distinctive operative sentences; apostrophe-free on
# purpose so they embed verbatim in SQL oracles).
LICENSE_SNIPPETS: list[tuple[str, str]] = [
    (
        "mit",
        "Permission is hereby granted, free of charge, to any person "
        "obtaining a copy of this software and associated documentation "
        "files, to deal in the Software without restriction, including "
        "without limitation the rights to use, copy, modify, merge, "
        "publish, distribute, sublicense, and/or sell copies of the "
        "Software.",
    ),
    (
        "apache-2.0",
        "Licensed under the Apache License, Version 2.0 (the License); "
        "you may not use this file except in compliance with the License. "
        "Unless required by applicable law or agreed to in writing, "
        "software distributed under the License is distributed on an AS IS "
        "BASIS, WITHOUT WARRANTIES OR CONDITIONS OF ANY KIND, either "
        "express or implied.",
    ),
    (
        "bsd-3-clause",
        "Redistribution and use in source and binary forms, with or "
        "without modification, are permitted provided that the following "
        "conditions are met: Redistributions of source code must retain "
        "the above copyright notice, this list of conditions and the "
        "following disclaimer. Redistributions in binary form must "
        "reproduce the above copyright notice, this list of conditions "
        "and the following disclaimer in the documentation and/or other "
        "materials provided with the distribution.",
    ),
    (
        "gpl-3.0",
        "This program is free software: you can redistribute it and/or "
        "modify it under the terms of the GNU General Public License as "
        "published by the Free Software Foundation, either version 3 of "
        "the License, or (at your option) any later version. This program "
        "is distributed in the hope that it will be useful, but WITHOUT "
        "ANY WARRANTY; without even the implied warranty of "
        "MERCHANTABILITY or FITNESS FOR A PARTICULAR PURPOSE.",
    ),
]


def _norm_words(col: Column) -> Column:
    """SPDX-style fold: lowercase, every non-alphanumeric run becomes one
    space, split, drop empties. The identical fold runs in the DuckDB
    oracle (regexp_replace with the 'g' flag)."""
    norm = F.regexp_replace(F.lower(col), "[^a-z0-9]+", " ")
    return F.filter(F.split(norm, " ", -1), lambda x: x != F.lit(""))


def _shingles(words: Column, n: int) -> Column:
    """Distinct word n-grams. Guarded: Spark's sequence(1, 0) is a
    DESCENDING [1, 0], so short texts must short-circuit to []."""
    grams = F.transform(
        F.sequence(F.lit(1), F.size(words) - (n - 1)),
        lambda i: F.array_join(F.slice(words, i, n), " "),
    )
    return F.array_distinct(
        F.when(F.size(words) >= n, grams).otherwise(
            F.array().cast("array<string>")
        )
    )


def detect_license(
    docs: DataFrame,
    snippets: list[tuple[str, str]] | None = None,
    head_words: int = 120,
    ngram: int = 5,
    min_pct: int = 80,
) -> DataFrame:
    """Detect the best-matching license in each document head.

    Emits one row per document whose best license covers >= ``min_pct`` %
    of that license's shingles: ``(doc_id, license, matched_shingles int,
    license_shingles int)``. Ranking and threshold are integer arithmetic.
    """
    spark = SparkSession.getActiveSession()
    lic = spark.createDataFrame(
        snippets or LICENSE_SNIPPETS, "license string, ltext string"
    )
    lic_sh = lic.select(
        "license", F.explode(_shingles(_norm_words(F.col("ltext")), ngram)).alias("sh")
    )
    lic_tot = lic_sh.groupBy("license").agg(F.count(F.lit(1)).alias("total"))

    # materialize the normalized head-word array in its OWN projection:
    # inside a higher-order lambda Spark re-evaluates a complex child
    # expression per element (no CSE across lambda bodies), so an inline
    # norm+split chain would run once per shingle instead of once per doc
    # (measured 12x on the corpus side). CollapseProject keeps the split
    # because the alias is referenced more than once by the transform.
    doc_w = docs.select(
        "doc_id",
        F.slice(_norm_words(F.col("text")), 1, head_words).alias("_w"),
    )
    doc_sh = doc_w.select(
        "doc_id", F.explode(_shingles(F.col("_w"), ngram)).alias("sh")
    )
    matched = (
        doc_sh.join(F.broadcast(lic_sh), "sh")
        .groupBy("doc_id", "license")
        .agg(F.count(F.lit(1)).alias("matched"))
    )
    scored = (
        matched.join(F.broadcast(lic_tot), "license")
        .where(F.col("matched") * 100 >= F.col("total") * min_pct)
        .withColumn("score", F.expr("matched * 1000000 div total"))
    )
    best = scored.withColumn(
        "rn",
        F.row_number().over(
            W.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("license"))
        ),
    )
    return best.where(F.col("rn") == 1).select(
        "doc_id",
        "license",
        F.col("matched").cast("int").alias("matched_shingles"),
        F.col("total").cast("int").alias("license_shingles"),
    )
