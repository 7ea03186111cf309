"""HTML → text extraction — the WARC→WET step of a web-crawl corpus
(C4/CCNet pipelines consume exactly this output before any quality gate).

A REAL parser (stdlib html.parser.HTMLParser, which handles entity/charref
decoding, script/style CDATA modes, comments, and malformed tag soup):
script/style/noscript/template subtrees are dropped, block-level tags
break lines, inline markup vanishes, whitespace collapses per line, empty
lines drop. Runs as mapInPandas — zero shuffle, one pass, fixed-width
output; the extraction is CPU-bounded per document like every codec here.

Reference parity note: hatchery routes opaque bytes (README.md:3); text
extraction belongs to the training-data surface this rebuild adds.
"""

from __future__ import annotations

from html.parser import HTMLParser
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

_SKIP = {"script", "style", "noscript", "template"}
_BLOCK = {
    "p", "div", "br", "li", "ul", "ol", "tr", "table", "h1", "h2", "h3",
    "h4", "h5", "h6", "title", "section", "article", "header", "footer",
    "blockquote", "pre", "hr",
}


class _TextExtractor(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.parts: list[str] = []
        self._skip = 0

    def handle_starttag(self, tag, attrs):
        if tag in _SKIP:
            self._skip += 1
        elif tag in _BLOCK:
            self.parts.append("\n")

    def handle_endtag(self, tag):
        if tag in _SKIP:
            self._skip = max(0, self._skip - 1)
        elif tag in _BLOCK:
            self.parts.append("\n")

    def handle_data(self, data):
        if not self._skip:
            self.parts.append(data)


def html_to_text(html: str) -> str:
    """Extract visible text: entities decoded, script/style dropped, block
    boundaries → newlines, whitespace collapsed, empty lines removed."""
    p = _TextExtractor()
    p.feed(html or "")
    p.close()
    lines = "".join(p.parts).split("\n")
    out = [" ".join(ln.split()) for ln in lines]
    return "\n".join(ln for ln in out if ln)


def extract_html_text(
    df: DataFrame, html_col: str = "html", id_col: str = "doc_id"
) -> DataFrame:
    """(id, html) → (id, extracted text), one mapInPandas pass."""

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            yield pd.DataFrame(
                {
                    id_col: b[id_col],
                    "extracted": [html_to_text(h) for h in b[html_col]],
                }
            )

    return df.select(id_col, html_col).mapInPandas(
        _run, f"{id_col} long, extracted string"
    )


class _LinkExtractor(HTMLParser):
    """Collect <a href> targets in document order (anchors inside dropped
    subtrees are still links — crawlers follow them — so no skip state)."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.hrefs: list[str] = []

    def handle_starttag(self, tag, attrs):
        if tag == "a":
            for k, v in attrs:
                if k == "href" and v:
                    self.hrefs.append(v.strip())
                    break


def extract_links(html: str) -> list[str]:
    """<a href> targets in document order (entities decoded by the parser;
    empty/missing hrefs dropped)."""
    p = _LinkExtractor()
    p.feed(html or "")
    p.close()
    return p.hrefs


def extract_html_links(
    df: DataFrame, html_col: str = "html", id_col: str = "doc_id"
) -> DataFrame:
    """(id, html) → one row per (id, link_idx, href) — the outlink harvest
    that feeds the crawl frontier and the host link graph. One mapInPandas
    pass, zero shuffle; fan-out is data-proportional (links per page)."""

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ids, idxs, hrefs = [], [], []
            for i, h in zip(b[id_col], b[html_col]):
                for j, link in enumerate(extract_links(h)):
                    ids.append(i)
                    idxs.append(j)
                    hrefs.append(link)
            yield pd.DataFrame({id_col: ids, "link_idx": idxs, "href": hrefs})

    return df.select(id_col, html_col).mapInPandas(
        _run, f"{id_col} long, link_idx int, href string"
    )
