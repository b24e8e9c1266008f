"""Round-4b operators: salted skew join, Bloom pre-join pruning,
reciprocal-rank fusion, WET ingest."""

import gzip
import io

import pytest
from pyspark.sql import functions as F

from document_convert_to__markdown_spark.operators.joins import (
    bloom_filter_words,
    bloom_might_contain,
    bloom_prune_join,
    salted_join,
)
from document_convert_to__markdown_spark.operators.retrieval import rrf_fuse
from document_convert_to__markdown_spark.sources.warc import (
    read_wet_pages,
    texts_from_wet,
    write_wet,
)


@pytest.fixture()
def facts_dims(spark):
    # Skewed facts: key 0 holds half the rows.
    facts = spark.range(0, 4000).select(
        F.when(F.col("id") % 2 == 0, 0)
        .otherwise(F.col("id") % 37).alias("k"),
        F.col("id").alias("payload"))
    dims = spark.range(0, 37, 3).select(
        F.col("id").alias("k"),
        F.concat(F.lit("dim"), F.col("id")).alias("name"))
    return facts, dims


class TestSaltedJoin:
    def test_row_identical_to_plain_join(self, spark, facts_dims):
        facts, dims = facts_dims
        for how in ("inner", "left", "left_semi", "left_anti"):
            plain = sorted(facts.join(dims, "k", how).collect())
            salted = sorted(salted_join(facts, dims, "k",
                                        n_salt=8, how=how).collect())
            assert salted == plain, how

    def test_hot_key_spreads_over_salts(self, spark, facts_dims):
        facts, _ = facts_dims
        n_salts = (facts
                   .filter("k = 0")
                   .select(F.pmod(F.xxhash64("k", "payload"), F.lit(8))
                           .alias("s"))
                   .distinct().count())
        assert n_salts == 8  # the hot key occupies every salt bucket

    def test_plan_joins_on_salt(self, spark, facts_dims):
        facts, dims = facts_dims
        plan = salted_join(facts, dims, "k", n_salt=8) \
            ._jdf.queryExecution().executedPlan().toString()
        assert "__doc2md_salt" in plan

    def test_refuses_right_and_full(self, spark, facts_dims):
        facts, dims = facts_dims
        for how in ("right", "full", "outer"):
            with pytest.raises(ValueError):
                salted_join(facts, dims, "k", how=how)


class TestBloomPruneJoin:
    def test_equals_plain_join(self, spark, facts_dims):
        facts, dims = facts_dims
        for how in ("inner", "left_semi"):
            plain = sorted(facts.join(dims, "k", how).collect())
            got = sorted(bloom_prune_join(facts, dims, "k",
                                          how=how).collect())
            assert got == plain, how

    def test_no_false_negatives_and_prunes(self, spark):
        # 10 sparse dim keys vs 100k facts: every dim key must survive
        # the probe; the prune must kill (almost) everything else.
        dims = spark.range(0, 10).select((F.col("id") * 991).alias("k"))
        facts = spark.range(0, 100_000).select(F.col("id").alias("k"))
        words = bloom_filter_words(dims, "k")
        kept = facts.filter(
            bloom_might_contain(F.col("k"), words, 1 << 16, 5))
        n_kept = kept.count()
        assert n_kept >= 10                      # no false negatives
        assert n_kept < 1000                     # >=99% pruned
        hits = {r["k"] for r in kept.collect()}
        assert {i * 991 for i in range(10)} <= hits

    def test_prune_is_scan_side(self, spark, facts_dims):
        # The bloom probe must sit below the join in the physical plan
        # (a Filter with getbit), so pruned rows never reach the
        # exchange.
        facts, dims = facts_dims
        plan = bloom_prune_join(facts, dims, "k") \
            ._jdf.queryExecution().executedPlan().toString()
        assert "getbit" in plan

    def test_word_packing_matches_python_model(self, spark):
        # Independent pure-Python replay of the bit packing.
        import struct

        def xxh(spark_df):  # get spark's xxhash64 for the model
            return {r["k"]: [int(r[f"h{i}"]) for i in range(5)]
                    for r in spark_df.select(
                        "k", *[F.pmod(F.xxhash64("k", F.lit(i)),
                                      F.lit(1 << 16)).alias(f"h{i}")
                               for i in range(5)]).collect()}

        dims = spark.range(0, 50).select(F.col("id").alias("k"))
        words = bloom_filter_words(dims, "k", m_bits=1 << 16, n_hashes=5)
        model = [0] * (1 << 10)
        for positions in xxh(dims).values():
            for p in positions:
                w, b = p >> 6, p & 63
                model[w] = _or_signed64(model[w], 1 << b)
        assert words == model

    def test_refuses_row_preserving_joins(self, spark, facts_dims):
        facts, dims = facts_dims
        for how in ("left", "full", "left_anti"):
            with pytest.raises(ValueError):
                bloom_prune_join(facts, dims, "k", how=how)


def _or_signed64(a: int, bit: int) -> int:
    v = (a & 0xFFFFFFFFFFFFFFFF) | (bit & 0xFFFFFFFFFFFFFFFF)
    return v - (1 << 64) if v >= (1 << 63) else v


class TestRrfFuse:
    def test_closed_form(self, spark):
        a = spark.createDataFrame([(1, 9.0), (2, 8.0), (3, 7.0)],
                                  "doc_id long, score double")
        b = spark.createDataFrame([(3, 0.99), (4, 0.98), (1, 0.97)],
                                  "doc_id long, score double")
        got = {r["doc_id"]: (r["rrf_score"], r["n_lists"])
               for r in rrf_fuse([a, b], k=10).collect()}
        assert got[1] == (round(1 / 61 + 1 / 63, 6), 2)
        assert got[3] == (round(1 / 63 + 1 / 61, 6), 2)
        assert got[2] == (round(1 / 62, 6), 1)
        assert got[4] == (round(1 / 62, 6), 1)

    def test_rank_ties_break_on_id(self, spark):
        # Two docs with equal scores: the lower id must get the better
        # rank in BOTH engines, so pin it here.
        a = spark.createDataFrame([(7, 1.0), (3, 1.0)],
                                  "doc_id long, score double")
        got = {r["doc_id"]: r["rrf_score"]
               for r in rrf_fuse([a], k=2).collect()}
        assert got[3] == round(1 / 61, 6)
        assert got[7] == round(1 / 62, 6)

    def test_empty_rankings_raise(self, spark):
        with pytest.raises(ValueError):
            rrf_fuse([])


class TestSurtKey:
    CASES = [
        ("https://docs.example.com/a?x=1", "com,example,docs)/a?x=1"),
        ("http://Example.ORG:8080/P/q", "org,example)/P/q"),
        ("https://example.com", "com,example)/"),
        ("https://a.b.co.uk/x", "uk,co,b,a)/x"),
        # param order must not change the key (review finding: the
        # SURT canonical form sorts query params)
        ("https://example.com/a?b=2&a=1", "com,example)/a?a=1&b=2"),
        ("https://example.com/a?a=1&b=2", "com,example)/a?a=1&b=2"),
    ]

    def test_cases(self, spark):
        from document_convert_to__markdown_spark.functions.url import (
            surt_key,
        )
        from pyspark.sql import functions as F

        df = spark.createDataFrame([(u,) for u, _ in self.CASES],
                                   "url string")
        got = [r["s"] for r in
               df.select(surt_key(F.col("url")).alias("s"))
               .collect()]
        assert got == [s for _, s in self.CASES]

    def test_sorted_surts_group_domains(self, spark):
        # The point of SURT: a domain's subdomains are contiguous in
        # sorted order, so range scans answer per-domain queries.
        from document_convert_to__markdown_spark.functions.url import (
            surt_key,
        )
        from pyspark.sql import functions as F

        urls = ["https://a.example.com/1", "https://z.other.net/2",
                "https://b.example.com/3", "https://example.com/4"]
        df = spark.createDataFrame([(u,) for u in urls], "url string")
        surts = sorted(r["s"] for r in
                       df.select(surt_key(F.col("url")).alias("s"))
                       .collect())
        example = [s for s in surts if s.startswith("com,example")]
        i = surts.index(example[0])
        assert surts[i:i + len(example)] == example  # contiguous block


class TestCdxSource:
    CAPS = [
        ("com,ex)/a", "20240101000000",
         {"url": "https://ex.com/a", "mime": "text/html",
          "status": "200", "digest": "sha1:AA", "length": "100",
          "offset": "0", "filename": "c-00.warc.gz"}),
        ("com,ex)/b", "20240101000100",
         {"url": "https://ex.com/b", "mime": "text/plain",
          "status": "404", "digest": "sha1:BB", "length": "7",
          "offset": "100", "filename": "c-01.warc.gz"}),
    ]

    def test_roundtrip_gz(self, spark, tmp_path):
        import gzip as _g

        from document_convert_to__markdown_spark.sources.cdx import (
            read_cdx,
            write_cdx,
        )

        with open(tmp_path / "i.cdx.gz", "wb") as fh:
            assert write_cdx(self.CAPS, fh, compress=True) == 2
        rows = {r["surt"]: r for r in
                read_cdx(spark, str(tmp_path)).collect()}
        a = rows["com,ex)/a"]
        assert (a["url"], a["status"], a["length"], a["offset"]) == (
            "https://ex.com/a", "200", 100, 0)
        assert str(a["ts"]).startswith("2024-01-01 00:00:00")

    def test_json_blob_with_spaces_survives_split(self, spark, tmp_path):
        from document_convert_to__markdown_spark.sources.cdx import (
            read_cdx,
            write_cdx,
        )

        caps = [("com,sp)/x", "20240101000000",
                 {"url": "https://sp.com/x", "mime": "text / html",
                  "status": "200", "digest": "d d d", "length": "1",
                  "offset": "2", "filename": "a b.warc.gz"})]
        with open(tmp_path / "s.cdx", "wb") as fh:
            write_cdx(caps, fh)
        r = read_cdx(spark, str(tmp_path)).collect()[0]
        assert r["mime"] == "text / html"
        assert r["filename"] == "a b.warc.gz"

    def test_malformed_line_yields_null_url_not_crash(self, spark,
                                                      tmp_path):
        (tmp_path / "bad.cdx").write_bytes(
            b"com,ok)/a 20240101000000 {\"url\": \"https://ok/a\"}\n"
            b"garbage-without-json\n")
        from document_convert_to__markdown_spark.sources.cdx import (
            read_cdx,
        )

        df = read_cdx(spark, str(tmp_path))
        assert df.count() == 2          # no silent drops
        assert df.filter("url is null").count() == 1
        assert df.filter("url = 'https://ok/a'").count() == 1

    def test_writer_sorts_by_surt(self, tmp_path):
        from document_convert_to__markdown_spark.sources.cdx import (
            write_cdx,
        )

        with open(tmp_path / "o.cdx", "wb") as fh:
            write_cdx(list(reversed(self.CAPS)), fh)
        lines = (tmp_path / "o.cdx").read_bytes().decode().splitlines()
        assert [ln.split(" ", 1)[0] for ln in lines] == ["com,ex)/a",
                                                         "com,ex)/b"]


class TestSnapshotSchemaEvolution:
    def _base(self, spark, tmp_path):
        from document_convert_to__markdown_spark.sources import snapshot

        root = str(tmp_path / "tbl")
        snapshot.commit_append(
            spark.createDataFrame([(1, "en"), (2, "de")],
                                  "doc_id long, lang string"), root)
        return snapshot, root

    def test_additive_evolution_null_fills_old_files(self, spark,
                                                     tmp_path):
        snapshot, root = self._base(spark, tmp_path)
        snapshot.commit_append(
            spark.createDataFrame([(3, "fr", 0.5)],
                                  "doc_id long, lang string, q double"),
            root, allow_evolution=True)
        cur = snapshot.read(spark, root)
        assert cur.columns == ["doc_id", "lang", "q"]
        got = {r["doc_id"]: r["q"] for r in cur.collect()}
        assert got == {1: None, 2: None, 3: 0.5}

    def test_time_travel_keeps_old_schema(self, spark, tmp_path):
        snapshot, root = self._base(spark, tmp_path)
        snapshot.commit_append(
            spark.createDataFrame([(3, "fr", 0.5)],
                                  "doc_id long, lang string, q double"),
            root, allow_evolution=True)
        v1 = snapshot.read(spark, root, version=1)
        assert v1.columns == ["doc_id", "lang"]
        assert v1.count() == 2

    def test_added_column_requires_opt_in(self, spark, tmp_path):
        snapshot, root = self._base(spark, tmp_path)
        with pytest.raises(ValueError, match="allow_evolution"):
            snapshot.commit_append(
                spark.createDataFrame(
                    [(3, "fr", 0.5)],
                    "doc_id long, lang string, q double"), root)

    def test_drop_and_retype_always_refused(self, spark, tmp_path):
        snapshot, root = self._base(spark, tmp_path)
        with pytest.raises(ValueError, match="dropped"):
            snapshot.commit_append(
                spark.createDataFrame([(3,)], "doc_id long"),
                root, allow_evolution=True)
        with pytest.raises(ValueError, match="retyped"):
            snapshot.commit_append(
                spark.createDataFrame([(3, 7)],
                                      "doc_id long, lang long"),
                root, allow_evolution=True)

    def test_same_schema_append_unaffected(self, spark, tmp_path):
        snapshot, root = self._base(spark, tmp_path)
        snapshot.commit_append(
            spark.createDataFrame([(3, "fr")],
                                  "doc_id long, lang string"), root)
        assert snapshot.read(spark, root).count() == 3


class TestWarcSelectiveFetch:
    ROWS = [(f"https://m{i}.org/p", f"member body {i}".encode())
            for i in range(30)]

    def _write(self, path):
        from document_convert_to__markdown_spark.sources.warc import (
            write_warc_members,
        )

        with open(path, "wb") as fh:
            return write_warc_members(self.ROWS, fh)

    def test_manifest_offsets_are_point_readable(self, tmp_path):
        import gzip as _g

        from document_convert_to__markdown_spark.sources.warc import (
            http_response_body,
            iter_records,
        )

        p = tmp_path / "m.warc.gz"
        manifest = self._write(p)
        assert len(manifest) == 30
        data = p.read_bytes()
        assert manifest[-1][1] + manifest[-1][2] == len(data)
        for (url, off, ln), (want_url, want_body) in zip(manifest,
                                                         self.ROWS):
            rec = next(iter_records(data[off:off + ln]))
            assert rec.target_uri == url == want_url
            assert http_response_body(rec.payload) == want_body

    def test_fetch_reads_only_requested_members(self, spark, tmp_path):
        """Corrupt every member EXCEPT the three requested ones: a
        point-reading fetch succeeds; any implementation that scans
        the archive would hit garbage."""
        p = tmp_path / "m.warc.gz"
        manifest = self._write(p)
        data = bytearray(p.read_bytes())
        keep = {5, 17, 29}
        for i, (_u, off, ln) in enumerate(manifest):
            if i not in keep:
                data[off:off + ln] = b"\x00" * ln
        p.write_bytes(bytes(data))

        from document_convert_to__markdown_spark.sources.warc import (
            fetch_warc_by_index,
        )

        caps = spark.createDataFrame(
            [("m.warc.gz", manifest[i][1], manifest[i][2])
             for i in sorted(keep)],
            "filename string, offset long, length long")
        got = sorted((r["url"], bytes(r["html"])) for r in
                     fetch_warc_by_index(spark, caps,
                                         str(tmp_path)).collect())
        assert got == sorted(self.ROWS[i] for i in sorted(keep))


class TestSitemapDiscovery:
    def test_directive_parsing(self, spark):
        from document_convert_to__markdown_spark.operators.robots import (
            sitemap_directives,
        )

        body = ("User-agent: *\nDisallow: /x\n"
                "Sitemap: https://a.com/s.xml\n"
                "SITEMAP: https://a.com/s2.xml   \n"
                "sitemap: https://a.com/s3.xml # mirror\n"
                "Sitemap: /relative.xml\n"       # dropped: not absolute
                "# Sitemap: https://a.com/commented.xml\n"
                "Sitemapx: https://a.com/notakey.xml\n")
        df = spark.createDataFrame([("a.com", body)],
                                   "host string, robots_txt string")
        got = sorted(r["sitemap_url"] for r in
                     sitemap_directives(df).collect())
        assert got == ["https://a.com/s.xml", "https://a.com/s2.xml",
                       "https://a.com/s3.xml"]

    def test_loc_extraction_and_index_flag(self, spark):
        from document_convert_to__markdown_spark.operators.robots import (
            extract_sitemap_urls,
        )

        urlset = ("<urlset><url><loc> https://a.com/1 </loc></url>"
                  "<url><loc>https://a.com/2</loc></url>"
                  "<loc>/relative</loc></urlset>")
        index = ("<sitemapindex><sitemap>"
                 "<loc>https://a.com/child1.xml</loc></sitemap>"
                 "<sitemap><loc>https://a.com/child2.xml</loc>"
                 "</sitemap></sitemapindex>")
        df = spark.createDataFrame(
            [("a.com", urlset), ("a.com", index)],
            "host string, xml string")
        rows = extract_sitemap_urls(df).collect()
        pages = sorted(r["url"] for r in rows if not r["is_index"])
        children = sorted(r["url"] for r in rows if r["is_index"])
        assert pages == ["https://a.com/1", "https://a.com/2"]
        assert children == ["https://a.com/child1.xml",
                            "https://a.com/child2.xml"]


def _drain(df, name):
    q = (df.writeStream.format("memory").queryName(name)
         .outputMode("append").trigger(availableNow=True).start())
    assert q.awaitTermination(120)
    return df.sparkSession.table(name)


class TestStreamingSourceTwins:
    def test_wet_stream_equals_batch(self, spark, tmp_path):
        from document_convert_to__markdown_spark.sources.warc import (
            read_wet_pages,
            read_wet_pages_stream,
            write_wet,
        )

        rows = [(f"https://s{i}.org/p", f"stream text {i}")
                for i in range(15)]
        with open(tmp_path / "a.wet.gz", "wb") as fh:
            write_wet(rows, fh, compress=True)
        got = _drain(read_wet_pages_stream(spark, str(tmp_path)),
                     "wet_stream_t")
        batch = read_wet_pages(spark, str(tmp_path))
        assert sorted(map(tuple, got.collect())) == \
            sorted(map(tuple, batch.collect()))

    def test_cdx_stream_equals_batch(self, spark, tmp_path):
        from document_convert_to__markdown_spark.sources.cdx import (
            read_cdx,
            read_cdx_stream,
            write_cdx,
        )

        caps = [(f"com,s{i})/", "20240101000000",
                 {"url": f"https://s{i}.com/", "mime": "text/html",
                  "status": "200", "digest": "d", "length": str(i),
                  "offset": "0", "filename": "c.warc.gz"})
                for i in range(12)]
        with open(tmp_path / "i.cdx.gz", "wb") as fh:
            write_cdx(caps, fh, compress=True)
        got = _drain(read_cdx_stream(spark, str(tmp_path)),
                     "cdx_stream_t")
        batch = read_cdx(spark, str(tmp_path))
        assert sorted(map(tuple, got.collect())) == \
            sorted(map(tuple, batch.collect()))
        assert got.filter("length = 7").count() == 1


class TestStreamStreamOuterJoin:
    def test_three_emission_classes(self, spark, tmp_path):
        """Matched click → pair row; unmatched click with a closed
        window → null-buy row; unmatched click younger than the final
        watermark → NOTHING (its window is still open)."""
        from document_convert_to__markdown_spark.streaming.stream_job import (
            stream_stream_attribution_outer,
        )

        rows = [
            # user 1: click at 00:00, purchase at 01:00 → matched
            (10, "2024-01-01 00:00:00", 1, "click", 1.0, None),
            (11, "2024-01-01 01:00:00", 1, "purchase", 5.0, None),
            # user 2: click at 00:00, no purchase; window closes 02:00,
            # final wm = min(max click 23:00, max buy 22:00) - 1h =
            # 21:00 > 02:00 → expired, null row emits
            (20, "2024-01-01 00:00:00", 2, "click", 1.0, None),
            # user 3: click at 20:30; window closes 22:30 > wm 21:00
            # → still open, nothing emits
            (30, "2024-01-01 20:30:00", 3, "click", 1.0, None),
            # watermark anchors
            (40, "2024-01-01 23:00:00", 4, "click", 1.0, None),
            (41, "2024-01-01 22:00:00", 4, "purchase", 5.0, None),
        ]
        df = spark.createDataFrame(
            [(e, __import__("datetime").datetime.fromisoformat(ts), u,
              t, v, p) for (e, ts, u, t, v, p) in rows],
            "event_id long, ts timestamp, user_id long, "
            "event_type string, value double, props string")
        path = str(tmp_path / "events")
        df.coalesce(1).write.parquet(path)

        got = {r["user_id"]: (r["n_matched"], r["n_expired_unmatched"])
               for r in stream_stream_attribution_outer(
                   spark, path).collect()}
        assert got[1] == (1, 0)       # matched
        assert got[2] == (0, 1)       # expired unmatched
        assert 3 not in got           # window still open: withheld
        # anchor user 4: matched (buy 22:00 within click 23:00's
        # window? no — buy precedes click, so click 40 is unmatched
        # and its window [23:00, 01:00+1d] is open → withheld
        assert 4 not in got


class TestWetIngest:
    ROWS = [(f"https://ex{i}.org/page", f"text body {i} é中")
            for i in range(30)]

    def _archive(self, compress):
        buf = io.BytesIO()
        n = write_wet(self.ROWS, buf, compress=compress)
        assert n == len(self.ROWS)
        return buf.getvalue()

    def test_roundtrip_plain_and_gzip(self):
        for compress in (False, True):
            data = self._archive(compress)
            got = [(u, t) for (u, _ts, t) in texts_from_wet(data)]
            assert got == self.ROWS

    def test_non_conversion_records_skipped(self):
        # A WARC response record inside the stream must be ignored.
        from document_convert_to__markdown_spark.sources.warc import (
            write_warc,
        )

        buf = io.BytesIO()
        write_warc([("https://resp.org/", b"<html>x</html>")], buf)
        write_wet(self.ROWS[:3], buf)
        got = [u for (u, _ts, _t) in texts_from_wet(buf.getvalue())]
        assert got == [u for (u, _t) in self.ROWS[:3]]

    def test_spark_reader(self, spark, tmp_path):
        with open(tmp_path / "a.wet.gz", "wb") as fh:
            write_wet(self.ROWS[:20], fh, compress=True)
        with open(tmp_path / "b.wet", "wb") as fh:
            write_wet(self.ROWS[20:], fh, compress=False)
        df = read_wet_pages(spark, str(tmp_path))
        assert df.columns == ["url", "warc_ts", "text"]
        got = sorted((r["url"], r["text"]) for r in df.collect())
        assert got == sorted(self.ROWS)
        assert df.filter("warc_ts is null").count() == 0
