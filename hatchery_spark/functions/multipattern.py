"""Aho–Corasick multi-pattern substring scan (Aho & Corasick, CACM 1975).

The substring complement to the token-level ``blocklist_filter``: policy
/ PII / brand-safety term lists are phrases, not whole tokens, and at
thousands of patterns a per-pattern ``instr``/regex chain is O(patterns)
passes over 100 TB. Aho–Corasick is the classic fix — ONE pass over the
text whatever the pattern count.

Semantics: every occurrence counts, overlapping included (``aaa`` in
``aaaaa`` → 3), via the standard fail-link construction with output
counts accumulated through the suffix chain — so nested patterns
("can" inside "scan") are found even when the scan never leaves the
longer pattern's path.  The oracle replays exactly this with a
position-lateral substring compare, which counts overlaps — unlike
``regexp_extract_all``, which is non-overlapping and would undercount.

Scale shape: the automaton is built once per Arrow batch from the
broadcast pattern list (vocabulary-sized, corpus-independent) and the
scan is a single mapInPandas pass — no explode, no join, no shuffle;
output rows ∝ matches, not text.
"""

from __future__ import annotations

from collections import deque
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame


def build_ac(patterns: list[str]):
    """Build the automaton: (goto: list[dict[str,int]], fail: list[int],
    ends: list[list[int]]) with ends pre-flattened through fail links."""
    goto: list[dict[str, int]] = [{}]
    own: list[list[int]] = [[]]
    for pid, pat in enumerate(patterns):
        if not pat:
            raise ValueError("empty pattern")
        s = 0
        for ch in pat:
            nxt = goto[s].get(ch)
            if nxt is None:
                goto.append({})
                own.append([])
                nxt = len(goto) - 1
                goto[s][ch] = nxt
            s = nxt
        own[s].append(pid)
    fail = [0] * len(goto)
    ends: list[list[int]] = [list(o) for o in own]
    q = deque(goto[0].values())
    while q:
        s = q.popleft()
        for ch, t in goto[s].items():
            q.append(t)
            f = fail[s]
            while f and ch not in goto[f]:
                f = fail[f]
            fail[t] = goto[f].get(ch, 0) if goto[f].get(ch, 0) != t else 0
            ends[t] = own[t] + ends[fail[t]]  # flatten the suffix chain
    return goto, fail, ends


def ac_count(text: str, goto, fail, ends, n_patterns: int) -> list[int]:
    """Per-pattern overlapping match counts in one pass."""
    counts = [0] * n_patterns
    s = 0
    for ch in text:
        while s and ch not in goto[s]:
            s = fail[s]
        s = goto[s].get(ch, 0)
        for pid in ends[s]:
            counts[pid] += 1
    return counts


def multi_pattern_counts(
    df: DataFrame,
    patterns: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, pattern, n_matches) for every pattern that occurs — one
    automaton pass per row, built once per batch."""
    pats = list(patterns)

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        goto, fail, ends = build_ac(pats)
        for pdf in batches:
            out_id, out_pat, out_n = [], [], []
            for rid, text in zip(pdf[id_col], pdf[text_col]):
                for pid, c in enumerate(
                    ac_count(text or "", goto, fail, ends, len(pats))
                ):
                    if c:
                        out_id.append(rid)
                        out_pat.append(pats[pid])
                        out_n.append(c)
            yield pd.DataFrame(
                {id_col: out_id, "pattern": out_pat, "n_matches": out_n}
            )

    return df.select(id_col, text_col).mapInPandas(
        scan, f"{id_col} long, pattern string, n_matches long"
    )


def multi_pattern_oracle_sql(patterns: list[str], table: str = "documents") -> str:
    """DuckDB replay: position-lateral substring compare — counts
    OVERLAPPING occurrences, same semantics as the automaton."""
    vals = ", ".join(f"('{p}', {len(p)})" for p in patterns)
    return f"""
        WITH pats AS (SELECT * FROM (VALUES {vals}) p(pattern, ln)),
        pos AS (SELECT doc_id, text,
                       unnest(range(1, length(text) + 1)) AS i
                FROM {table}),
        hits AS (
          SELECT pos.doc_id, pats.pattern, count(*) AS n_matches
          FROM pos JOIN pats ON substr(pos.text, cast(pos.i AS int),
                                       pats.ln) = pats.pattern
          GROUP BY 1, 2)
        SELECT doc_id, pattern, n_matches FROM hits"""
