"""WARC/1.0 record framing: byte-exact splitter over adversarial payloads."""

import hashlib

import pytest

from hatchery_spark.functions.warc import (
    build_warc_files,
    encode_warc_record,
    parse_warc,
    split_warc_records,
)


def test_split_adversarial_payloads():
    payloads = [
        b"",  # zero-length record
        b"plain ascii body",
        "unicode é中文 body".encode("utf-8"),  # bytes != chars
        b"embedded WARC/1.0\r\n\r\nfake header inside payload",  # desync bait
        b"\r\n\r\n\r\n\r\n",  # separator soup
    ]
    blob = b"".join(encode_warc_record(i, p) for i, p in enumerate(payloads))
    recs = split_warc_records(blob)
    assert [r[0] for r in recs] == [0, 1, 2, 3, 4]
    assert [r[4] for r in recs] == [len(p) for p in payloads]
    assert [r[5] for r in recs] == payloads
    # offsets are cumulative record byte lengths
    sizes = [len(encode_warc_record(i, p)) for i, p in enumerate(payloads)]
    assert [r[1] for r in recs] == [sum(sizes[:i]) for i in range(len(sizes))]


def test_split_rejects_corruption():
    good = encode_warc_record(0, b"abc")
    with pytest.raises(ValueError, match="bad WARC version"):
        split_warc_records(b"HTTP/1.1 200\r\n\r\n")
    with pytest.raises(ValueError, match="truncated"):
        split_warc_records(good[:-5])
    with pytest.raises(ValueError, match="separator"):
        split_warc_records(good[:-4] + b"XXXX")


def test_distributed_roundtrip(spark):
    docs = spark.createDataFrame(
        [(i, f"doc body {i} " * (i % 5 + 1)) for i in range(60)],
        "doc_id long, text string",
    )
    out = parse_warc(build_warc_files(docs, files=7)).collect()
    assert len(out) == 60
    originals = {r.doc_id: r.text for r in docs.collect()}
    for r in out:
        doc_id = int(r.target_uri.rsplit("/", 1)[1])
        assert r.file_id == doc_id % 7
        assert r.warc_type == "response"
        assert r.payload_md5 == hashlib.md5(
            originals[doc_id].encode("utf-8")
        ).hexdigest()
    # rec_idx is dense 0..n-1 per file in doc_id order
    per_file = {}
    for r in sorted(out, key=lambda r: (r.file_id, r.rec_idx)):
        per_file.setdefault(r.file_id, []).append(r)
    for rows in per_file.values():
        assert [r.rec_idx for r in rows] == list(range(len(rows)))
        uris = [int(r.target_uri.rsplit("/", 1)[1]) for r in rows]
        assert uris == sorted(uris)


def test_gzip_member_split_and_corruption():
    from hatchery_spark.functions.warc import gzip_member, split_gzip_members

    payloads = [b"", b"alpha" * 1000, "é中文".encode("utf-8"), b"\x1f\x8b fake magic inside"]
    members = [gzip_member(p) for p in payloads]
    blob = b"".join(members)
    recs = split_gzip_members(blob)
    assert [r[0] for r in recs] == [0, 1, 2, 3]
    assert [r[3] for r in recs] == payloads
    # compressed offsets/lengths tile the file exactly
    assert [r[1] for r in recs] == [
        sum(len(m) for m in members[:i]) for i in range(len(members))
    ]
    assert sum(r[2] for r in recs) == len(blob)
    with pytest.raises(ValueError, match="bad gzip magic"):
        split_gzip_members(b"XX" + blob)
    with pytest.raises(ValueError, match="truncated gzip member"):
        split_gzip_members(blob[:-3])


def test_gzip_member_deterministic():
    from hatchery_spark.functions.warc import gzip_member

    assert gzip_member(b"same input") == gzip_member(b"same input")


def test_warc_gz_distributed_roundtrip(spark):
    from hatchery_spark.functions.warc import (
        build_warc_gz_files,
        encode_warc_record,
        parse_warc_gz,
    )

    docs = spark.createDataFrame(
        [(i, f"gz body {i} " * (i % 4 + 1)) for i in range(40)],
        "doc_id long, text string",
    )
    out = parse_warc_gz(build_warc_gz_files(docs, files=5)).collect()
    assert len(out) == 40
    originals = {r.doc_id: r.text for r in docs.collect()}
    for r in out:
        doc_id = int(r.target_uri.rsplit("/", 1)[1])
        assert r.file_id == doc_id % 5
        payload = originals[doc_id].encode("utf-8")
        assert r.payload_md5 == hashlib.md5(payload).hexdigest()
        # record_md5 hashes the whole decompressed member = the WARC record
        assert r.record_md5 == hashlib.md5(
            encode_warc_record(doc_id, payload)
        ).hexdigest()
        assert r.content_length == len(payload)


# ---------------------------------------------------------------------------
# CDX capture index
# ---------------------------------------------------------------------------


def test_cdx_random_access_by_offset(spark):
    """The CDX contract: (filename, rec_offset, rec_len) must slice the
    original WARC file into exactly one parseable record whose payload
    digest matches the index row."""
    import hashlib

    from hatchery_spark.functions.warc import cdx_index, split_warc_records

    docs = spark.createDataFrame(
        [(i, f"payload number {i} " * (i + 1)) for i in range(12)],
        "doc_id long, text string",
    )
    files = build_warc_files(docs, files=3).collect()
    blobs = {f"crawl-{r.file_id}.warc": bytes(r.content) for r in files}
    idx = cdx_index(build_warc_files(docs, files=3)).collect()
    assert len(idx) == 12
    for r in idx:
        sl = blobs[r.filename][r.rec_offset : r.rec_offset + r.rec_len]
        recs = split_warc_records(sl)
        assert len(recs) == 1
        assert hashlib.md5(recs[0][5]).hexdigest() == r.digest
        assert recs[0][3] == r.target_uri


def test_cdx_surt_urlkey_and_timestamp(spark):
    from hatchery_spark.functions.warc import cdx_index

    docs = spark.createDataFrame([(4, "x")], "doc_id long, text string")
    r = cdx_index(build_warc_files(docs, files=1)).collect()[0]
    assert r.urlkey == "com,example)/doc/4"
    assert r.timestamp == "20250101000000"
    assert r.mime == "text/plain"


def test_cdx_multilabel_host_reversal(spark):
    """SURT reverses every host label, not just the TLD pair."""
    from hatchery_spark.functions.warc import cdx_index
    from hatchery_spark.functions.warc import encode_warc_record

    rec = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: https://a.b.Example.ORG/Path/X?q=1\r\n"
        b"WARC-Date: 2031-12-05T09:08:07Z\r\n"
        b"Content-Length: 2\r\n\r\nhi\r\n\r\n"
    )
    df = spark.createDataFrame([(0, bytearray(rec))], "file_id long, content binary")
    r = cdx_index(df).collect()[0]
    assert r.urlkey == "org,example,b,a)/path/x?q=1"
    assert r.timestamp == "20311205090807"
    assert r.rec_len == len(rec)
