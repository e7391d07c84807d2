"""WARC source/sink: byte-exact framing, Content-Length-driven parse."""

from __future__ import annotations

import os

import pytest

from seqtables_spark.sources.warc import read_warc, write_warc


DOCS = [
    (1, "plain ascii text", "en"),
    (2, "unicode: café — 中文 \U0001f600", "und"),
    (3, "", "en"),  # empty payload
    # adversarial: payload that LOOKS like a record boundary + version
    # line — only Content-Length framing parses this correctly
    (4, "before\r\n\r\nWARC/1.0\r\nWARC-Type: fake\r\n\r\nafter", "en"),
    (5, "trailing newlines\n\n\n", "de"),
]


def _docs_df(spark):
    rows = ", ".join(
        "({}, '{}', '{}')".format(i, t.replace("'", "''"), l) for i, t, l in DOCS
    )
    return spark.sql(f"SELECT * FROM VALUES {rows} AS t(doc_id, text, lang)")


def test_roundtrip(spark, tmp_path):
    path = str(tmp_path / "rt")
    df = _docs_df(spark).repartition(2)
    manifest = write_warc(
        df,
        path,
        payload_col="text",
        uri_col=None,
        record_id_col="doc_id",
        header_cols={"X-Doc-Id": "doc_id", "X-Lang": "lang"},
    )
    m = manifest.collect()
    assert sum(r["n_records"] for r in m) == len(DOCS)
    assert all(os.path.exists(r["path"]) for r in m)

    back = read_warc(spark, os.path.join(path, "part-*.warc"))
    rows = {
        int(r["headers"]["X-Doc-Id"]): r for r in back.collect()
    }
    assert set(rows) == {i for i, _, _ in DOCS}
    for i, t, l in DOCS:
        r = rows[i]
        assert r["payload"] == t, i
        assert r["headers"]["X-Lang"] == l
        assert r["warc_type"] == "response"
        assert r["record_id"] == f"<{i}>"
        assert r["content_length"] == len(t.encode("utf-8"))


def test_reader_tolerates_extra_separators(spark, tmp_path):
    p = tmp_path / "pad.warc"
    rec = (
        b"WARC/1.0\r\nWARC-Type: response\r\nContent-Length: 5\r\n\r\n"
        b"hello\r\n\r\n"
    )
    p.write_bytes(b"\r\n\n" + rec + b"\n\n\r\n" + rec)
    out = read_warc(spark, str(p)).collect()
    assert [r["payload"] for r in out] == ["hello", "hello"]


def test_reader_rejects_truncation(spark, tmp_path):
    p = tmp_path / "trunc.warc"
    p.write_bytes(b"WARC/1.0\r\nContent-Length: 100\r\n\r\nshort")
    with pytest.raises(Exception, match="truncated"):
        read_warc(spark, str(p)).collect()


def test_reader_rejects_garbage(spark, tmp_path):
    p = tmp_path / "bad.warc"
    p.write_bytes(b"not a warc file\r\n")
    with pytest.raises(Exception, match="version line"):
        read_warc(spark, str(p)).collect()


def test_small_batches_stream(spark, tmp_path):
    path = str(tmp_path / "batched")
    write_warc(
        _docs_df(spark).coalesce(1), path, payload_col="text",
        record_id_col="doc_id",
    )
    back = read_warc(spark, os.path.join(path, "*.warc"), batch_rows=2)
    assert back.count() == len(DOCS)


def test_one_task_per_file(spark, tmp_path):
    path = str(tmp_path / "many")
    write_warc(
        _docs_df(spark).repartition(3), path, payload_col="text",
        record_id_col="doc_id",
    )
    files = sorted(os.listdir(path))
    back = read_warc(spark, os.path.join(path, "*.warc"))
    assert back.rdd.getNumPartitions() == len(files)


def test_property_roundtrip_random_payloads(spark, tmp_path):
    """Property: ANY unicode payload (including CRLF runs, WARC-like
    version lines, blank lines, empty strings) survives the
    write->parse roundtrip byte-exactly, because framing is
    Content-Length-driven."""
    import random

    rng = random.Random(99)
    pieces = [
        "WARC/1.0", "\r\n", "\n\n", "Content-Length: 7", ": ", "",
        "plain", "café", "中文", "\t", "a" * 200, "--boundary--",
    ]
    docs = [
        (i, "".join(rng.choice(pieces) for _ in range(rng.randint(0, 8))))
        for i in range(40)
    ]
    import pandas as pd

    df = spark.createDataFrame(
        pd.DataFrame(docs, columns=["doc_id", "text"])
    ).repartition(4)
    path = str(tmp_path / "prop")
    write_warc(df, path, payload_col="text", record_id_col="doc_id")
    back = read_warc(spark, os.path.join(path, "*.warc"), batch_rows=7)
    got = {
        int(r["record_id"].strip("<>")): r["payload"] for r in back.collect()
    }
    assert got == dict(docs)


def test_header_injection_sanitized(spark, tmp_path):
    """CR/LF in metadata columns must not break record framing."""
    df = spark.createDataFrame(
        [(1, "payload one", "evil\r\nX-Injected: yes"), (2, "payload two", "ok")],
        "doc_id long, text string, lang string",
    ).coalesce(1)
    path = str(tmp_path / "inj")
    write_warc(
        df, path, payload_col="text", record_id_col="doc_id",
        header_cols={"X-Lang": "lang"},
    )
    back = read_warc(spark, os.path.join(path, "*.warc")).collect()
    rows = {int(r["record_id"].strip("<>")): r for r in back}
    assert len(rows) == 2
    assert rows[1]["headers"]["X-Lang"] == "evil  X-Injected: yes"
    assert "X-Injected" not in rows[1]["headers"]
    assert rows[1]["payload"] == "payload one"


def test_gzip_roundtrip_per_record_members(spark, tmp_path):
    """Common Crawl convention: .warc.gz = one gzip member per
    record; the reader streams the member concatenation."""
    import gzip

    path = str(tmp_path / "gz")
    df = _docs_df(spark).repartition(2)
    manifest = write_warc(
        df, path, payload_col="text", record_id_col="doc_id",
        header_cols={"X-Lang": "lang"}, compress=True,
    )
    man = manifest.collect()
    files = [r["path"] for r in man]
    assert all(f.endswith(".warc.gz") for f in files)
    # byte-level: the file is a concatenation of gzip members — one
    # member header at offset 0 of each record's compressed stream.
    # (Counting magic bytes can only over-count — compressed content
    # may contain the magic by chance — so assert >= records.)
    for r in man:
        raw = open(r["path"], "rb").read()
        assert raw.startswith(b"\x1f\x8b\x08")
        assert raw.count(b"\x1f\x8b\x08") >= r["n_records"]
        with gzip.open(r["path"], "rb") as fh:
            fh.read()  # member concatenation inflates cleanly
    back = read_warc(spark, os.path.join(path, "*.warc.gz"))
    rows = {int(r["headers"]["X-Doc-Id"]) if "X-Doc-Id" in r["headers"]
            else int(r["record_id"].strip("<>")): r["payload"]
            for r in back.collect()}
    assert rows == {i: t for i, t, _ in DOCS}


def test_mixed_plain_and_gz_glob(spark, tmp_path):
    path = str(tmp_path / "mixed")
    df = _docs_df(spark).coalesce(1)
    write_warc(df, path, payload_col="text", record_id_col="doc_id")
    # second shard compressed, different partition id via repartition
    os.rename(
        os.path.join(path, "part-00000.warc"),
        os.path.join(path, "a-part.warc"),
    )
    write_warc(df, path, payload_col="text", record_id_col="doc_id",
               compress=True)
    back = read_warc(spark, os.path.join(path, "*.warc*"))
    assert back.count() == 2 * len(DOCS)


def test_folded_header_lines(spark, tmp_path):
    """WARC 1.1 permits RFC-style folded headers: a line starting with
    SP/HT continues the previous header's value. Round-7 fix — these
    must parse as ONE header, not raise or split into two."""
    p = tmp_path / "folded.warc"
    rec = (
        b"WARC/1.0\r\n"
        b"WARC-Type: response\r\n"
        b"WARC-Target-URI: http://example.com/a\r\n"
        b"X-Long: first part\r\n"
        b"  continued part\r\n"
        b"\tand a tab-folded: tail\r\n"
        b"Content-Length: 5\r\n"
        b"\r\n"
        b"hello\r\n\r\n"
    )
    p.write_bytes(rec)
    rows = read_warc(spark, str(p)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["payload"] == "hello"
    # folded continuations joined with single spaces, ':' inside a
    # continuation NOT treated as a new header
    assert r["headers"]["X-Long"] == "first part continued part and a tab-folded: tail"
    assert r["target_uri"] == "http://example.com/a"


def test_binary_payload_lossless(spark, tmp_path):
    """payload_bytes carries arbitrary bytes (invalid utf-8, gzip
    magic, NULs) through write->read byte-exactly; the string view is
    the lossy derived column."""
    path = str(tmp_path / "bin")
    blobs = [
        (1, bytes([0x1F, 0x8B, 0x08, 0x00, 0xFF, 0xFE, 0x00, 0x80])),
        (2, b"\x00" * 16),
        (3, "text is fine too".encode("utf-8")),
        (4, bytes(range(256))),
    ]
    df = spark.createDataFrame(blobs, "doc_id long, body binary")
    write_warc(
        df.coalesce(1), path, payload_col="body", record_id_col="doc_id",
        content_type="application/octet-stream",
    )
    back = read_warc(spark, os.path.join(path, "*.warc"))
    got = {int(r["record_id"].strip("<>")): bytes(r["payload_bytes"])
           for r in back.collect()}
    assert got == dict(blobs)
    # string view exists but is replace-decoded (lossy) — documented
    text = {int(r["record_id"].strip("<>")): r["payload"]
            for r in back.select("record_id", "payload").collect()}
    assert text[3] == "text is fine too"


def test_exactly_one_file_per_partition(spark, tmp_path):
    """Round-7: the file list is range-partitioned on a monotone file
    index, so EVERY partition holds exactly one file (hash-on-path
    could collide two files into one task)."""
    path = str(tmp_path / "onefile")
    write_warc(
        _docs_df(spark).repartition(5), path, payload_col="text",
        record_id_col="doc_id",
    )
    files = sorted(os.listdir(path))
    assert len(files) >= 2
    back = read_warc(spark, os.path.join(path, "*.warc"))
    per_part = back.rdd.mapPartitions(
        lambda it: [len({r["warc_file"] for r in it})]
    ).collect()
    assert len(per_part) == len(files)
    assert all(n == 1 for n in per_part)


def test_whitespace_only_fold_line_does_not_end_headers(spark, tmp_path):
    """Round-7 review fix: a fold line containing ONLY SP/HT (legal
    obs-fold whitespace) is a continuation contributing nothing — it
    must NOT terminate the header block (which used to shift every
    later header into the payload and fail the file)."""
    p = tmp_path / "wsfold.warc"
    rec = (
        b"WARC/1.0\r\n"
        b"WARC-Type: response\r\n"
        b"X-A: one\r\n"
        b" \r\n"                      # whitespace-only fold
        b"X-B: two\r\n"
        b"Content-Length: 5\r\n"
        b"\r\n"
        b"hello\r\n\r\n"
    )
    p.write_bytes(rec)
    rows = read_warc(spark, str(p)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["payload"] == "hello"
    assert r["headers"]["X-A"] == "one"   # fold added nothing
    assert r["headers"]["X-B"] == "two"   # parsed as a header, not payload
