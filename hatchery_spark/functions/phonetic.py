"""American Soundex (the census/entity-resolution phonetic key).

Fuzzy name blocking for entity resolution: names that sound alike get
the same 4-char key (Robert/Rupert → R163), so candidate pairs come
from a groupBy on the key instead of an all-pairs scan — the phonetic
complement of the deletion-neighborhood (`doc_fuzzy_pairs`) blocking.

The algorithm is expressed as ONE engine-agnostic chain of
translate/regexp steps (lowercase → h/w transparency → digit classes
with '.' as the vowel separator → per-digit run collapse → separator
removal → head-code absorption → pad), built from a single Python
step table that renders BOTH the Spark Column expression and the
DuckDB SQL — the markdown-extract drift-proofing pattern.  RE2
compatibility is designed in: no backreferences (runs collapse via six
literal '<d>{2,}' replaces), no lookbehind (the head letter is split
off with substr instead).

Scale shape: pure codegen projection — zero UDF, zero shuffle; the
blocking groupBy is the only exchange and is vocabulary-sized after
the distinct.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: letter → digit class (h/w handled before this map; vowels+y → '.')
_SRC = "bfpvcgjkqsxzdtlmnraeiouy"
_DST = "111122222222334556......"


def soundex_col(name: Column) -> Column:
    """4-char Soundex key ('' for inputs with no ASCII letter)."""
    w = F.lower(F.regexp_replace(name, "[^A-Za-z]", ""))
    head = F.substring(w, 1, 1)
    tail = F.substring(w, 2, F.length(w))
    tail = F.regexp_replace(tail, "[hw]", "")  # transparency rule
    mapped = F.translate(tail, _SRC, _DST)
    code = F.concat(F.translate(head, _SRC, _DST), mapped)
    for d in "123456":  # RE2-safe run collapse (no backrefs)
        code = F.regexp_replace(code, d + "{2,}", d)
    digits = F.regexp_replace(F.substring(code, 2, F.length(code)), r"\.", "")
    key = F.concat(F.upper(head), F.substring(F.concat(digits, F.lit("000")), 1, 3))
    return F.when(F.length(w) == 0, F.lit("")).otherwise(key)


def soundex_sql(expr: str) -> str:
    """The same chain rendered for DuckDB."""
    w = f"lower(regexp_replace({expr}, '[^A-Za-z]', '', 'g'))"
    head = f"substr({w}, 1, 1)"
    tail = f"regexp_replace(substr({w}, 2), '[hw]', '', 'g')"
    code = (
        f"concat(translate({head}, '{_SRC}', '{_DST}'),"
        f" translate({tail}, '{_SRC}', '{_DST}'))"
    )
    for d in "123456":
        code = f"regexp_replace({code}, '{d}{{2,}}', '{d}', 'g')"
    digits = f"regexp_replace(substr({code}, 2), '\\.', '', 'g')"
    return (
        f"CASE WHEN length({w}) = 0 THEN '' ELSE "
        f"concat(upper({head}), substr(concat({digits}, '000'), 1, 3)) END"
    )


#: classic published test vectors (Knuth TAOCP vol. 3 / census rules)
KNOWN_VECTORS = [
    ("Robert", "R163"),
    ("Rupert", "R163"),
    ("Ashcraft", "A261"),
    ("Ashcroft", "A261"),
    ("Tymczak", "T522"),
    ("Pfister", "P236"),
    ("Honeyman", "H555"),
    ("Jackson", "J250"),
    ("Washington", "W252"),
    ("Lee", "L000"),
    ("Gutierrez", "G362"),
    ("VanDeusen", "V532"),
]
