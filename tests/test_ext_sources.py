"""Tests for the gated external-source parity layer (BigQuery, PDF) and
the LLM operator / registry surfaces."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from adenhq_hive_spark.functions.llm import clean_output_udf, judge_udf, score_udf
from adenhq_hive_spark.functions.registry import ToolRegistry, ToolSpec
from adenhq_hive_spark.sources.bigquery_tool import describe_dataset, run_bigquery_query
from adenhq_hive_spark.sources.pdf_tool import parse_page_range, read_pdfs

from .conftest import SF_SMOKE


class TestBigQuery:
    def test_write_rejected_before_connector(self, spark):
        res = run_bigquery_query(spark, "DROP TABLE x")
        assert not res["success"] and "read-only" in res["error"]

    def test_missing_connector_raises(self, spark):
        with pytest.raises(NotImplementedError, match="connector"):
            run_bigquery_query(spark, "SELECT 1 AS one")

    def test_injected_reader_with_clamp_and_schema(self, spark):
        reader = lambda s, sql: s.range(50).withColumnRenamed("id", "n")
        res = run_bigquery_query(spark, "SELECT 1", max_rows=10, reader=reader)
        assert res["success"]
        assert res["row_count"] == 10 and res["query_truncated"]
        assert res["schema"] == [{"name": "n", "type": "bigint"}]

    def test_live_connector_seam_when_jar_present(self, spark):
        """r8 verdict #9: exercise the REAL connector path the day the
        environment provides the jar.  Skips (does not pass vacuously)
        when the class is absent; with the jar on the classpath the
        seam must reach the connector — a credential/config failure
        comes back as the error ENVELOPE, never NotImplementedError
        (which is reserved for the missing-jar gate)."""
        try:
            spark._jvm.java.lang.Class.forName(
                "com.google.cloud.spark.bigquery.BigQueryRelationProvider"
            )
        except Exception:
            pytest.skip("spark-bigquery connector jar not on classpath")
        try:
            res = run_bigquery_query(
                spark, "SELECT 1 AS one", max_rows=5
            )
        except NotImplementedError:  # pragma: no cover - contract break
            pytest.fail(
                "connector present but the seam still raised the "
                "missing-jar NotImplementedError"
            )
        # live success or a config/credential error envelope are both
        # valid here; the contract is only that the gate opened
        assert res["success"] in (True, False)
        if not res["success"]:
            assert "read-only" not in res["error"]

    def test_describe(self, spark):
        from adenhq_hive_spark.catalog import register_views

        register_views(spark, SF_SMOKE)
        d = describe_dataset(spark)
        assert d["table_count"] >= 10


class TestPdf:
    def test_page_range_grammar(self):
        assert parse_page_range(None, 4) == [0, 1, 2, 3]
        assert parse_page_range("1-2", 4) == [0, 1]
        assert parse_page_range("2,4", 4) == [1, 3]
        assert parse_page_range("3-", 4) == [2, 3]
        assert parse_page_range("-2", 4) == [0, 1]
        assert parse_page_range("1-2,2-3", 4) == [0, 1, 2]  # dedup, ordered
        assert parse_page_range("9-12", 4) == []  # clamped away
        assert parse_page_range("9-", 4) == []  # open range past end: empty
        assert parse_page_range("1,9-", 4) == [0]  # only the in-range item
        with pytest.raises(ValueError):
            parse_page_range("0", 4)
        with pytest.raises(ValueError):
            parse_page_range("5-2", 4)

    def test_fake_extraction_pipeline(self, spark, tmp_path):
        # any binary files work — the fake kernel reads bytes only
        f = tmp_path / "doc.pdf"
        f.write_bytes(b"%PDF-fake content for plumbing test")
        df = read_pdfs(spark, str(tmp_path), pages="1-2", mode="fake")
        rows = df.collect()
        assert [r.page for r in rows] == [1, 2]
        assert all(r.n_pages == 4 for r in rows)
        assert rows[0].text.startswith("fake page 1")

    def test_raise_mode(self, spark, tmp_path):
        f = tmp_path / "doc.pdf"
        f.write_bytes(b"%PDF-x")
        with pytest.raises(Exception, match="pypdf"):
            read_pdfs(spark, str(tmp_path), mode="raise").collect()


class TestLLMOperators:
    def test_clean_output_heuristic(self, spark):
        df = spark.createDataFrame(
            [(1, "```json\n{'ok': True}\n```"), (2, "hopeless")], ["id", "raw"]
        )
        got = {r.id: r.c for r in
               df.select("id", clean_output_udf()("raw").alias("c")).collect()}
        assert got[1] == '{"ok": true}' and got[2] is None

    def test_clean_output_provider_unrecoverable_is_null(self, spark):
        """When the provider's repaired text is still unparseable the row
        must be NULL, like the heuristic tier — not the JSON string
        'null'."""
        df = spark.createDataFrame(
            [(1, "hopeless"), (2, "also hopeless")], ["id", "raw"]
        )
        prov = lambda batch: ["still not json!!" for _ in batch]
        got = {r.id: r.c for r in
               df.select("id", clean_output_udf(prov)("raw").alias("c")).collect()}
        assert got == {1: None, 2: None}

    def test_judge_heuristic(self, spark):
        df = spark.createDataFrame(
            [(1, "a thorough and complete answer to the question"),
             (2, "short"),
             (3, "Error: traceback follows " + "x" * 30)],
            ["id", "out"],
        )
        got = {r.id: r.v for r in
               df.select("id", judge_udf()("out").alias("v")).collect()}
        assert got == {1: "ACCEPT", 2: "RETRY", 3: "ESCALATE"}

    def test_score_heuristic_and_provider(self, spark):
        df = spark.createDataFrame(
            [(1, "the quick brown fox jumps over the lazy dog today")],
            ["id", "t"],
        )
        r = df.select(score_udf()("t").alias("s")).collect()[0]
        assert r.s == 1.0
        # injected provider (what a real LLM client would plug into)
        prov = lambda batch: ["0.25" for _ in batch]
        r2 = df.select(score_udf(prov)("t").alias("s")).collect()[0]
        assert r2.s == 0.25

    def test_unknown_provider(self):
        with pytest.raises(NotImplementedError):
            judge_udf("gpt-oops")


class TestRegistry:
    def test_register_and_call_from_sql(self, spark):
        reg = ToolRegistry(spark)
        reg.register(ToolSpec(
            name="shout", description="uppercase a string",
            fn=lambda s: s.upper() if s else None,
        ))
        assert "shout" in reg
        df = spark.createDataFrame([("hi",)], ["x"])
        df.createOrReplaceTempView("reg_t")
        assert spark.sql("SELECT shout(x) AS y FROM reg_t").collect()[0].y == "HI"
        listing = reg.list_tools()
        assert listing[0]["name"] == "shout"

    def test_vectorized_registration(self, spark):
        import pandas as pd

        reg = ToolRegistry(spark)
        reg.register(ToolSpec(
            name="vec_len", description="string length, vectorized",
            fn=lambda s: s.str.len(), return_type="int", vectorized=True,
        ))
        df = spark.createDataFrame([("abc",), ("de",)], ["x"])
        got = [r.n for r in df.select(F.expr("vec_len(x)").alias("n")).collect()]
        assert got == [3, 2]


def test_udtf_registration(spark):
    from adenhq_hive_spark.functions.registry import ToolRegistry

    class SplitWords:
        def eval(self, text: str):
            for i, w in enumerate((text or "").split()):
                yield (i, w)

    reg = ToolRegistry(spark)
    reg.register_udtf("split_words", SplitWords, "pos int, word string")
    rows = spark.sql(
        "SELECT * FROM split_words('the quick fox')"
    ).collect()
    assert [(r.pos, r.word) for r in rows] == [(0, "the"), (1, "quick"), (2, "fox")]
    assert reg.list_tools()[0]["parameters"] == {"kind": "udtf"}


class TestPdfStdlibCodec:
    """Real extraction through the stdlib codec (sources/pdf_codec.py):
    hand-built spec-conforming PDFs with Flate and raw content streams,
    literal/hex strings, escapes, and multi-page /Kids order."""

    @staticmethod
    def _pdf(pages_ops: list[bytes], compress: bool) -> bytes:
        import zlib

        objs: list[bytes] = []
        n_pages = len(pages_ops)
        kids = " ".join(f"{3 + 2 * i} 0 R" for i in range(n_pages))
        objs.append(b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
        objs.append(
            f"2 0 obj\n<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>\nendobj\n".encode()
        )
        for i, ops in enumerate(pages_ops):
            pnum, cnum = 3 + 2 * i, 4 + 2 * i
            objs.append(
                f"{pnum} 0 obj\n<< /Type /Page /Parent 2 0 R /Contents {cnum} 0 R >>\nendobj\n".encode()
            )
            data = zlib.compress(ops) if compress else ops
            filt = b"/Filter /FlateDecode " if compress else b""
            objs.append(
                b"%d 0 obj\n<< %s/Length %d >>\nstream\n%s\nendstream\nendobj\n"
                % (cnum, filt, len(data), data)
            )
        return b"%PDF-1.4\n" + b"".join(objs) + b"%%EOF\n"

    def test_extract_flate_and_raw(self, tmp_path, spark):
        p1 = (b"BT /F1 12 Tf 72 720 Td (Hello, PDF world!) Tj "
              b"0 -14 Td (Second line \\(escaped\\)) Tj ET")
        p2 = (b"BT [ (Frag) -250 (mented ) ] TJ T* "
              b"<48657820737472696E67> Tj ET")
        for compress in (False, True):
            f = tmp_path / f"doc_{compress}.pdf"
            f.write_bytes(self._pdf([p1, p2], compress))
            df = read_pdfs(spark, str(f), mode="real")
            rows = {(r.page): r.text for r in df.collect()}
            assert "Hello, PDF world!" in rows[1]
            assert "Second line (escaped)" in rows[1]
            assert rows[1].count("\n") == 1  # Td line break
            assert "Fragmented " in rows[2].replace("\n", "")
            assert "Hex string" in rows[2]

    def test_page_range_selection_real(self, tmp_path, spark):
        pages = [b"BT (page one) Tj ET", b"BT (page two) Tj ET",
                 b"BT (page three) Tj ET"]
        f = tmp_path / "three.pdf"
        f.write_bytes(self._pdf(pages, True))
        df = read_pdfs(spark, str(tmp_path), pages="2-", mode="real")
        got = sorted((r.page, r.text) for r in df.collect())
        assert got == [(2, "page two"), (3, "page three")]
        assert all(r.n_pages == 3 for r in df.collect())

    def test_unsupported_structures_yield_empty(self):
        from adenhq_hive_spark.sources.pdf_codec import extract_pages

        # broken flate data -> page present, text empty (never wrong text)
        body = self._pdf([b"BT (x) Tj ET"], False).replace(
            b"<< /Length", b"<< /Filter /FlateDecode /Length"
        )
        assert extract_pages(body) == [""]
        assert extract_pages(b"%PDF-1.7 nothing here") == []

    def test_tagged_pdf_marked_content_dicts(self):
        """<</MCID 0>> BDC inside BT..ET (Word/LibreOffice tagged PDFs)
        must tokenize as a dict, not crash as a malformed hex string."""
        from adenhq_hive_spark.sources.pdf_codec import extract_pages

        ops = (b"BT /F1 12 Tf <</MCID 0>> BDC (Tagged text) Tj EMC "
               b"<< /Nested << /Deep 1 >> >> BDC (More) Tj EMC ET")
        pages = extract_pages(self._pdf([ops], False))
        assert pages == ["Tagged textMore"]
        # malformed hex string is dropped, not raised
        bad = b"BT (ok) Tj <zz> Tj ET"
        assert extract_pages(self._pdf([bad], False)) == ["ok"]

    def test_object_stream_pdf_15(self):
        """PDF 1.5 compressed object streams: catalog/pages/page dicts
        packed in a /Type /ObjStm are discovered and their text extracted."""
        import zlib

        from adenhq_hive_spark.sources.pdf_codec import extract_pages

        packed = [
            (1, b"<< /Type /Catalog /Pages 2 0 R >>"),
            (2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>"),
            (3, b"<< /Type /Page /Parent 2 0 R /Contents 5 0 R >>"),
        ]
        bodies = b""
        header = []
        for num, body in packed:
            header.append(f"{num} {len(bodies)}".encode())
            bodies += body + b" "
        head = b" ".join(header) + b" "
        stm = zlib.compress(head + bodies)
        content = b"BT (from objstm) Tj ET"
        pdf = (
            b"%%PDF-1.5\n"
            b"4 0 obj\n<< /Type /ObjStm /N 3 /First %d /Filter /FlateDecode"
            b" /Length %d >>\nstream\n%s\nendstream\nendobj\n"
            b"5 0 obj\n<< /Length %d >>\nstream\n%s\nendstream\nendobj\n"
            b"%%%%EOF\n"
            % (len(head), len(stm), stm, len(content), content)
        )
        assert extract_pages(pdf) == ["from objstm"]


class TestPdfCidFonts:
    """CID / composite fonts: shown strings decode through the font's
    /ToUnicode CMap (bfchar + bfrange forms), selected by Tf and
    inherited down the /Pages tree."""

    @staticmethod
    def _cid_pdf(cmap: bytes, ops: bytes) -> bytes:
        objs = [
            b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n",
            b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 "
            b"/Resources << /Font << /F9 5 0 R >> >> >>\nendobj\n",
            b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\n"
            b"endobj\n",
            b"4 0 obj\n<< /Length %d >>\nstream\n%s\nendstream\nendobj\n"
            % (len(ops), ops),
            b"5 0 obj\n<< /Type /Font /Subtype /Type0 /ToUnicode 6 0 R >>\n"
            b"endobj\n",
            b"6 0 obj\n<< /Length %d >>\nstream\n%s\nendstream\nendobj\n"
            % (len(cmap), cmap),
        ]
        return b"%PDF-1.6\n" + b"".join(objs) + b"%%EOF\n"

    def test_bfchar_and_bfrange_decode(self):
        from adenhq_hive_spark.sources.pdf_codec import extract_pages

        cmap = (
            b"/CIDInit /ProcSet findresource begin\n"
            b"begincmap\n"
            b"1 begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n"
            b"2 beginbfchar\n"
            b"<0001> <0048>\n"            # H
            b"<0002> <00690021>\n"        # i!  (multi-unit dst)
            b"endbfchar\n"
            b"1 beginbfrange\n"
            b"<0010> <0012> <0061>\n"     # a, b, c (incremented scalar)
            b"endbfrange\n"
            b"1 beginbfrange\n"
            b"<0020> <0021> [<0058> <0059>]\n"  # X, Y (array form)
            b"endbfrange\n"
            b"endcmap\n"
        )
        ops = b"BT /F9 12 Tf <00010002> Tj <001000110012> Tj " \
              b"<00200021> Tj ET"
        assert extract_pages(self._cid_pdf(cmap, ops)) == ["Hi!abcXY"]

    def test_unmapped_codes_dropped_and_latin1_fallback(self):
        from adenhq_hive_spark.sources.pdf_codec import extract_pages

        cmap = (
            b"begincmap\n1 begincodespacerange\n<0000> <FFFF>\n"
            b"endcodespacerange\n1 beginbfchar\n<0001> <0041>\nendbfchar\n"
            b"endcmap\n"
        )
        # 0001 -> A; 0999 unmapped -> dropped, not garbled
        ops = b"BT /F9 12 Tf <00010999> Tj ET"
        assert extract_pages(self._cid_pdf(cmap, ops)) == ["A"]
        # a font with no Tf selection in scope decodes Latin-1
        ops2 = b"BT (plain) Tj ET"
        assert extract_pages(self._cid_pdf(cmap, ops2)) == ["plain"]

    def test_font_switch_mid_page(self):
        from adenhq_hive_spark.sources.pdf_codec import extract_pages

        cmap = (
            b"begincmap\n1 begincodespacerange\n<0000> <FFFF>\n"
            b"endcodespacerange\n1 beginbfchar\n<0007> <005A>\nendbfchar\n"
            b"endcmap\n"
        )
        # F9 is the CID font; F1 has no entry -> Latin-1
        ops = b"BT /F9 12 Tf <0007> Tj /F1 10 Tf (after) Tj ET"
        assert extract_pages(self._cid_pdf(cmap, ops)) == ["Zafter"]
