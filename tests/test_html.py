"""HTML → text extraction (WARC→WET step)."""

from hatchery_spark.functions.html import html_to_text


def test_template_extraction():
    h = (
        "<html><head><title>T</title><script>var x = 1 < 2; </script></head>"
        "<body><h1>Doc 5</h1><!-- comment --><p>hello   world</p>"
        "<p>&amp; more &#33;</p><style>.a{color:red}</style>"
        "<div>tail<br>next</div></body></html>"
    )
    assert html_to_text(h) == "T\nDoc 5\nhello world\n& more !\ntail\nnext"


def test_skip_subtrees_and_entities():
    assert html_to_text("<script><p>never</p></script><p>kept</p>") == "kept"
    assert html_to_text("<noscript>no</noscript>yes") == "yes"
    assert html_to_text("a&lt;b&gt;c &#x41;") == "a<b>c A"


def test_inline_vs_block():
    assert html_to_text("<p>a <b>bold</b> word</p>") == "a bold word"
    assert html_to_text("<li>one</li><li>two</li>") == "one\ntwo"


def test_malformed_soup_never_crashes():
    cases = [
        "<p>a<b>b</p>c",
        "<unclosed",
        "</only-end>",
        "<p attr='>'>x</p>",
        "&bogus; &amp",
        "",
        None,
    ]
    for c in cases:
        html_to_text(c)  # must not raise


def test_whitespace_collapse():
    assert html_to_text("<p>  a \t b  </p>\n\n<p> </p><p>c</p>") == "a b\nc"


def test_extract_links_order_entities_and_hrefless():
    from hatchery_spark.functions.html import extract_links

    h = (
        '<html><body><a name="top">skip</a>'
        '<a href="/p?id=5&amp;ref=h">f</a>'
        '<script><a href="/never">x</a></script>'
        '<a href=" https://ex.org/1 ">L</a><a>none</a></body></html>'
    )
    # entity decoded inside the attribute, hrefless anchors dropped,
    # script CDATA content never parsed as tags, hrefs stripped
    assert extract_links(h) == ["/p?id=5&ref=h", "https://ex.org/1"]
    assert extract_links(None) == []
    assert extract_links("<a href=''>empty</a>") == []


def test_extract_html_links_dataframe(spark):
    from hatchery_spark.functions.html import extract_html_links

    df = spark.createDataFrame(
        [
            (1, '<a href="/a">x</a><p><a href="/b">y</a></p>'),
            (2, "<p>no links</p>"),
        ],
        "doc_id long, html string",
    )
    rows = {
        (r.doc_id, r.link_idx): r.href
        for r in extract_html_links(df).collect()
    }
    assert rows == {(1, 0): "/a", (1, 1): "/b"}
