"""Web-corpus ingestion: HTML extraction (functions/web.py) and the WARC
source/sink (sources/warc.py)."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from pr2_transformation_spark.functions import web
from pr2_transformation_spark.sources import warc


# ---------------------------------------------------------------- HTML ----


def test_html_escape_round_trip_specials(spark):
    nasty = "a & b < c > d \"quoted\" 'apos' &amp; pre-escaped"
    df = spark.createDataFrame([Row(t=nasty)])
    out = df.select(
        web.html_unescape(web.html_escape(F.col("t"))).alias("rt")
    ).first()
    assert out["rt"] == nasty


def test_html_to_text_strips_boilerplate(spark):
    html = (
        "<html><head><title>T&amp;T</title>"
        "<style>body { color: red; }</style>"
        "<script>if (1 < 2) { track(); }</script></head>"
        "<body><noscript>enable js</noscript>"
        "<h1>Head</h1><p>one</p><p>two &lt;tags&gt;</p>"
        "<!-- secret comment --></body></html>"
    )
    row = (
        spark.createDataFrame([Row(h=html)])
        .select(
            web.html_to_text(F.col("h")).alias("text"),
            web.html_title(F.col("h")).alias("title"),
        )
        .first()
    )
    assert row["text"] == "T&T Head one two <tags>"
    assert row["title"] == "T&T"
    assert "track" not in row["text"]
    assert "secret" not in row["text"]


def test_html_to_text_malformed_degrades_to_whitespace(spark):
    # Unclosed tags and stray brackets must never error — the scan-side
    # extractor's contract is degrade-to-whitespace.
    html = "<p>start <b>bold <div>deep</p> tail"
    row = (
        spark.createDataFrame([Row(h=html)])
        .select(web.html_to_text(F.col("h")).alias("t"))
        .first()
    )
    assert row["t"] == "start bold deep tail"


def test_url_parsing_branches(spark):
    rows = (
        spark.createDataFrame(
            [
                Row(u="https://user:pw@Sub.Host.Example.COM:8443/a/b/c?x=1&y=2#f"),
                Row(u="http://example.net/"),
                Row(u="https://example.org"),
            ]
        )
        .select(
            web.url_host(F.col("u")).alias("host"),
            web.registered_domain(web.url_host(F.col("u"))).alias("dom"),
            web.url_path(F.col("u")).alias("path"),
            web.url_query(F.col("u")).alias("q"),
            web.url_depth(F.col("u")).alias("d"),
        )
        .collect()
    )
    assert [r["host"] for r in rows] == [
        "sub.host.example.com",
        "example.net",
        "example.org",
    ]
    assert [r["dom"] for r in rows] == ["example.com", "example.net", "example.org"]
    assert [r["path"] for r in rows] == ["/a/b/c", "/", ""]
    assert [r["q"] for r in rows] == ["x=1&y=2", "", ""]
    assert [r["d"] for r in rows] == [3, 0, 0]


# ---------------------------------------------------------------- WARC ----


def test_warc_build_parse_round_trip_bytes():
    recs = [
        ("response", "https://a.example/1", "urn:doc:1", "héllo wörld".encode()),
        ("response", "", "urn:doc:2", b""),
        ("metadata", "https://a.example/3", "urn:doc:3", b"\x00\x01binary\r\n\r\nbody"),
    ]
    blob = warc.build_warc(recs)
    parsed = warc.parse_warc(blob)
    assert [(r["rec_type"], r["target_uri"], r["record_id"], r["content"]) for r in parsed] == [
        (t, u, i.strip("<>"), p) for t, u, i, p in recs
    ]


def test_warc_parse_rejects_corruption():
    blob = warc.build_warc([("response", "u", "urn:doc:1", b"abc")])
    with pytest.raises(ValueError):
        warc.parse_warc(blob[: len(blob) - 3])  # truncated trailer
    with pytest.raises(ValueError):
        warc.parse_warc(b"HTTP/1.1 200 OK\r\n\r\n")  # wrong magic
    # Content-Length lies short -> payload not followed by CRLF CRLF
    bad = blob.replace(b"Content-Length: 3", b"Content-Length: 2")
    with pytest.raises(ValueError):
        warc.parse_warc(bad)


def test_warc_frame_round_trip_and_determinism(spark):
    docs = spark.createDataFrame(
        [
            Row(g="0", uri=f"https://x.example/{i}", doc_id=i, text=f"doc {i} é")
            for i in range(7)
        ]
        + [Row(g="1", uri="https://y.example/9", doc_id=9, text="solo")]
    )
    blobs = warc.encode_warc_frame(docs, "g", "uri", "doc_id", "text")
    got = {r["warc_id"]: (r["n_records"], bytes(r["warc"])) for r in blobs.collect()}
    assert got["0"][0] == 7 and got["1"][0] == 1
    # shuffling input row order must produce byte-identical blobs
    blobs2 = warc.encode_warc_frame(
        docs.orderBy(F.col("doc_id").desc()), "g", "uri", "doc_id", "text"
    )
    got2 = {r["warc_id"]: bytes(r["warc"]) for r in blobs2.collect()}
    assert {k: v[1] for k, v in got.items()} == got2

    back = warc.parse_warc_records(blobs).orderBy("record_id").collect()
    assert len(back) == 8
    assert back[0]["content"] == "doc 0 é".encode()
    assert back[0]["target_uri"] == "https://x.example/0"


def test_warc_python_datasource(spark, tmp_path):
    """Spark 4 Python DataSource: format('warc') reads a directory with
    one partition per file."""
    if warc.WarcDataSource is None:
        pytest.skip("pyspark.sql.datasource unavailable")
    for f in range(2):
        blob = warc.build_warc(
            [
                ("response", f"https://d{f}.example/{i}", f"urn:doc:{f}-{i}", f"f{f}r{i}".encode())
                for i in range(4)
            ]
        )
        (tmp_path / f"seg-{f}.warc").write_bytes(blob)
    spark.dataSource.register(warc.WarcDataSource)
    df = spark.read.format("warc").load(str(tmp_path))
    assert df.rdd.getNumPartitions() == 2
    rows = df.orderBy("record_id").collect()
    assert len(rows) == 8
    assert rows[0]["content"] == b"f0r0"
    assert rows[0]["target_uri"] == "https://d0.example/0"


def test_warc_streaming_source_picks_up_new_files(spark, tmp_path):
    """Streaming half of the Python DataSource: files present at start
    arrive in the first batch, a file dropped mid-stream arrives in a
    later one, every record exactly once."""
    if warc.WarcDataSource is None:
        pytest.skip("pyspark.sql.datasource unavailable")
    src = tmp_path / "drop"
    src.mkdir()
    ckpt = tmp_path / "ckpt"

    def drop(name, tag, n):
        blob = warc.build_warc(
            [
                ("response", f"https://{tag}.example/{i}", f"urn:{tag}:{i}", f"{tag}-{i}".encode())
                for i in range(n)
            ]
        )
        (src / name).write_bytes(blob)

    drop("a.warc", "a", 3)
    spark.dataSource.register(warc.WarcDataSource)
    stream = spark.readStream.format("warc").load(str(src))
    q = (
        stream.writeStream.format("memory")
        .queryName("warc_stream")
        .option("checkpointLocation", str(ckpt))
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        q.processAllAvailable()
        got1 = {r["record_id"] for r in spark.sql("select * from warc_stream").collect()}
        assert got1 == {"urn:a:0", "urn:a:1", "urn:a:2"}
        drop("b.warc", "b", 2)
        q.processAllAvailable()
        rows = spark.sql("select record_id, content from warc_stream").collect()
        ids = sorted(r["record_id"] for r in rows)
        assert ids == ["urn:a:0", "urn:a:1", "urn:a:2", "urn:b:0", "urn:b:1"]
        assert {bytes(r["content"]) for r in rows} >= {b"b-0", b"b-1"}
    finally:
        q.stop()


def test_streaming_crawl_pipeline_end_to_end(spark, tmp_path):
    """The whole crawl-ingestion story in one stream: WARC drop zone ->
    streaming parse -> HTML->text extraction -> quality gate ->
    Catalog.merge_upsert snapshot, replaying a file is idempotent."""
    from pyspark.sql import functions as F

    from pr2_transformation_spark.functions import web
    from pr2_transformation_spark.sources.catalog import Catalog

    if warc.WarcDataSource is None:
        pytest.skip("pyspark.sql.datasource unavailable")
    src = tmp_path / "drop"
    src.mkdir()
    ckpt = tmp_path / "ckpt"
    cat = Catalog(spark, root=str(tmp_path / "lake"))

    def page(i, body):
        return (
            f"<html><head><title>p{i}</title><script>x()</script></head>"
            f"<body><p>{body}</p></body></html>"
        ).encode()

    bodies = {0: "good content here", 1: "ok", 2: "another good body text"}
    blob = warc.build_warc(
        [
            ("response", f"https://site.example/{i}", f"urn:p:{i}", page(i, b))
            for i, b in bodies.items()
        ]
    )
    (src / "seg-0.warc").write_bytes(blob)

    spark.dataSource.register(warc.WarcDataSource)
    stream = spark.readStream.format("warc").load(str(src))
    cleaned = (
        stream.select(
            "record_id",
            "target_uri",
            web.html_to_text(F.decode("content", "utf-8")).alias("text"),
        )
        .withColumn("n_tokens", F.size(F.split("text", r"\s+")))
        .filter(F.col("n_tokens") >= 3)  # quality gate: drop the 'ok' page
    )
    q = (
        cleaned.writeStream.foreachBatch(
            lambda batch, _bid: cat.merge_upsert(
                "crawl.clean.pages", batch, ["record_id"], "record_id",
                num_buckets=4,
            )
        )
        .option("checkpointLocation", str(ckpt))
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        q.processAllAvailable()
        snap = spark.read.parquet(cat.path_for("crawl.clean.pages"))
        rows = {r["record_id"]: r["text"] for r in snap.collect()}
        # extracted text includes the title token (visible text)
        assert rows == {
            "urn:p:0": "p0 good content here",
            "urn:p:2": "p2 another good body text",
        }
        # replaying the same file (fresh checkpoint) must not duplicate
        q.stop()
        q2 = (
            cleaned.writeStream.foreachBatch(
                lambda batch, _bid: cat.merge_upsert(
                    "crawl.clean.pages", batch, ["record_id"], "record_id",
                    num_buckets=4,
                )
            )
            .option("checkpointLocation", str(tmp_path / "ckpt2"))
            .trigger(availableNow=True)
            .start()
        )
        q2.awaitTermination(120)
        snap2 = spark.read.parquet(cat.path_for("crawl.clean.pages"))
        assert snap2.count() == 2
    finally:
        for active in spark.streams.active:
            active.stop()


def test_read_warc_dir(spark, tmp_path):
    blob = warc.build_warc(
        [("response", f"https://z.example/{i}", f"urn:doc:{i}", f"t{i}".encode()) for i in range(3)]
    )
    (tmp_path / "part-0.warc").write_bytes(blob)
    (tmp_path / "ignore.txt").write_bytes(b"not a warc")
    out = warc.read_warc_dir(spark, str(tmp_path)).orderBy("record_id").collect()
    assert [r["content"] for r in out] == [b"t0", b"t1", b"t2"]
    assert all(r["warc_id"].endswith("part-0.warc") for r in out)


def test_robots_decisions_rfc9309_semantics(spark):
    """Longest-match wins; allow beats disallow on exact length ties;
    unmatched paths default to allowed; $ anchors; empty patterns are
    ignored."""
    from pr2_transformation_spark.functions import web

    rules = [
        ("disallow", "/a"),
        ("allow", "/a/b"),
        ("disallow", "/a/b/c"),
        ("allow", "/t/ke*"),      # length 6 tie:
        ("disallow", "/t/k*e"),   # allow must win on /t/keep
        ("disallow", "/end$"),
        ("allow", ""),            # ignored
    ]
    urls = spark.createDataFrame(
        [(1, "/a/x"), (2, "/a/b/x"), (3, "/a/b/c/x"), (4, "/t/keep"),
         (5, "/end"), (6, "/endless"), (7, "/other")],
        "id long, path string",
    )
    got = {r["id"]: (r["allowed"], r["match_len"])
           for r in web.robots_decisions(urls, rules, path_col="path").collect()}
    assert got[1] == (False, 2)   # /a disallow
    assert got[2] == (True, 4)    # /a/b allow overrides
    assert got[3] == (False, 6)   # deeper disallow overrides again
    assert got[4] == (True, 6)    # exact-length tie -> allow
    assert got[5] == (False, 5)   # $ anchored match
    assert got[6] == (True, 0)    # anchor prevents match -> default allow
    assert got[7] == (True, 0)    # no rule


def test_warc_gz_members_and_random_access():
    """Per-record gzip members: lossless member index, true random
    access, whole-file parse, and plain-gzip compatibility."""
    import gzip

    from pr2_transformation_spark.sources import warc

    recs = [("response", f"https://x/{i}", f"id-{i}",
             b"payload %d " % i * (i + 1)) for i in range(25)]
    gz = warc.build_warc_gz(recs)
    members = warc.scan_warc_gz_members(gz)
    assert len(members) == 25
    assert members[0][0] == 0 and members[-1][1] == len(gz)
    assert all(a[1] == b[0] for a, b in zip(members, members[1:]))
    r = warc.read_warc_gz_member(gz, *members[17])
    assert r["record_id"] == "id-17"
    assert r["content"] == b"payload 17 " * 18
    assert [x["record_id"] for x in warc.parse_warc_gz(gz)] == [
        f"id-{i}" for i in range(25)]
    # a standard gzip reader sees the concatenation of all records
    assert gzip.decompress(gz) == warc.build_warc(recs)
    # truncation is loud, not a short read
    import pytest as _pytest
    with _pytest.raises(ValueError, match="truncated"):
        warc.scan_warc_gz_members(gz[:-3])
