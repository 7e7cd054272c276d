"""Minimal-PDF text layer tests (S4/S5): parser semantics, writer
round-trip, the E3 clip-retry constants, the S4 branch inside the fused
extraction UDF, and template extraction over real PDF bytes."""

from __future__ import annotations

import json

import pytest

from ocr_api_spark.sources.pdftext import (
    MiniPdfError,
    clip_text,
    parse_pdf,
    pdf_text,
    write_minimal_pdf,
)


def test_roundtrip_lines_and_pages():
    pdf = write_minimal_pdf(
        [
            [(72, 72, 12, "INCOME TAX DEPARTMENT"), (72, 90, 12, "RAHUL SHARMA")],
            [(72, 100, 10, "Second page line")],
        ]
    )
    pages = parse_pdf(pdf)
    assert len(pages) == 2
    assert pages[0].extract_text() == "INCOME TAX DEPARTMENT\nRAHUL SHARMA"
    assert pdf_text(pdf) == "INCOME TAX DEPARTMENT\nRAHUL SHARMA\nSecond page line\n"


def test_same_line_words_sorted_by_x():
    pdf = write_minimal_pdf([[(300, 50, 12, "WORLD"), (72, 50, 12, "HELLO")]])
    assert parse_pdf(pdf)[0].extract_text() == "HELLO WORLD"


def test_escapes_round_trip():
    pdf = write_minimal_pdf([[(72, 72, 12, "paren (x) and \\ slash")]])
    assert parse_pdf(pdf)[0].extract_text() == "paren (x) and \\ slash"


def test_content_stream_operators():
    """Hand-written content stream: Tm, TD + T*, TJ with kerning, hex
    strings, ' (next-line show)."""
    content = (
        b"BT /F1 10 Tf 100 700 Tm (first) Tj ET\n"
        b"BT /F1 10 Tf 50 600 Td 0 -20 TD (second) Tj T* (third) Tj ET\n"
        b"BT /F1 10 Tf 50 500 Td [(ker) 100 (ned)] TJ ET\n"
        b"BT /F1 10 Tf 50 400 Td <48455828> Tj ET\n"
        b"BT /F1 10 Tf 50 300 Td 15 TL (a) Tj (b) ' ET\n"
    )
    pdf = write_minimal_pdf([[]])
    pdf = pdf.replace(
        b"<< /Length 0 >>\nstream\n\nendstream",
        b"<< /Length %d >>\nstream\n%s\nendstream" % (len(content), content),
    )
    page = parse_pdf(pdf)[0]
    text = page.extract_text()
    assert "first" in text and "second" in text and "third" in text
    assert "ker ned" in text  # two TJ show ops on one baseline
    assert "HEX(" in text  # hex string decode
    assert "a\nb" in text or ("a" in text and "b" in text)
    # TD sets leading: 'second' at y 580 -> T* drops another 20 -> 'third' at 560
    tops = {s.text: round(s.top) for s in page.spans}
    assert tops["third"] - tops["second"] == 20
    assert tops["b"] - tops["a"] == 15  # TL leading for '


def test_compressed_stream_rejected():
    pdf = write_minimal_pdf([[(72, 72, 12, "x")]])
    pdf = pdf.replace(b"<< /Length", b"<< /Filter /FlateDecode /Length")
    with pytest.raises(MiniPdfError):
        parse_pdf(pdf)
    with pytest.raises(MiniPdfError):
        parse_pdf(b"not a pdf at all")


def test_clip_retry_boxes():
    """First box is (x, y-10, x+w+7, y+h-15); the retry widens to
    (x, y-10, x+w+50, y+h-5) — app.py:3938-3941 constants."""
    # word at x=200, top=100, size 10 -> box (200, 100)-(200+5*len, 110)
    pdf = write_minimal_pdf([[(200, 100, 10, "VALUE")]])  # x1 = 225, bottom = 110
    page = parse_pdf(pdf)[0]
    # field rect: x=195, y=95, w=30, h=22: box1 = (195, 85, 232, 102) -> bottom 110 > 102 misses
    #                                      box2 = (195, 85, 275, 112) -> catches
    assert clip_text(page, 195, 95, 30, 22) == "VALUE"
    # fully out of reach for both boxes
    assert clip_text(page, 400, 400, 10, 10) is None


@pytest.fixture(scope="module")
def session():
    from ocr_api_spark.plans.session import build_session

    return build_session(app_name="pdf-tests", master="local[4]", shuffle_partitions=4)


def test_fused_udf_pdf_branch(session):
    """S4 in the pipeline: a row with empty text and a %PDF payload goes
    through the PDF text layer + clean_text (not the HTML boilerplate)."""
    from pyspark.sql import functions as F

    from ocr_api_spark.kernels.common import clean_text
    from ocr_api_spark.operators.extract import fused_extract_udf

    pdf_bytes = write_minimal_pdf(
        [[(72, 72, 12, "Permanent Account Number"), (72, 90, 12, "ABCPS1234F")]]
    )
    df = session.createDataFrame(
        [("u1", "", bytearray(pdf_bytes), "pan")], "url string, text string, html binary, doc_type string"
    )
    nulls = [F.lit(None).cast("string")] * 9
    out = df.withColumn(
        "x", fused_extract_udf(F.col("text"), F.col("html"), F.col("doc_type"), *nulls)
    ).select("x.extracted_text", "x.status", "x.pan").collect()[0]
    expected = clean_text(pdf_text(pdf_bytes))
    assert out["extracted_text"] == expected
    assert out["status"] == "Completed"
    assert out["pan"]["ocr_pan_number"] == "ABCPS1234F"


def test_template_extraction_over_real_pdf(session):
    """E3 end-to-end on document bytes: write a PDF, clip via the
    template rects (pdf_clips), fold — matches the pre-clipped-table
    path exactly."""
    from ocr_api_spark.operators.template import pdf_clips, template_extraction

    pdf_bytes = write_minimal_pdf(
        [
            [(100, 100, 10, "RAHUL SHARMA")],
            [(100, 200, 10, "12345678")],
        ]
    )
    pdfs = session.createDataFrame(
        [("d1", bytearray(pdf_bytes))], "document_id string, pdf binary"
    )
    templates = session.createDataFrame(
        [
            ("d1", 1, "name", 95.0, 95.0, 80.0, 30.0),
            ("d1", 2, "account", 95.0, 195.0, 80.0, 30.0),
        ],
        "document_id string, page int, field string, x double, y double, width double, height double",
    )
    clips = pdf_clips(pdfs, templates)
    got = {(r["page"], r["field"]): r["clip_text"] for r in clips.collect()}
    assert got[(1, "name")] == "RAHUL SHARMA"
    assert got[(2, "account")] == "12345678"

    docs = session.createDataFrame(
        [("d1", json.dumps({"name": "RAHUL SHARMA", "account": "12345678"}))],
        "document_id string, felds_json string",
    )
    out = template_extraction(docs, templates, clips).collect()[0]
    assert out["ocrdata"] == {"name": "RAHUL SHARMA", "account": "12345678"}
    assert out["average_match_percentage"] == 100.0


def test_pdf_clips_missing_page_and_bad_pdf(session):
    from ocr_api_spark.operators.template import pdf_clips

    pdfs = session.createDataFrame(
        [("d1", bytearray(b"junk-not-pdf"))], "document_id string, pdf binary"
    )
    templates = session.createDataFrame(
        [("d1", 3, "f", 0.0, 0.0, 10.0, 10.0)],
        "document_id string, page int, field string, x double, y double, width double, height double",
    )
    rows = pdf_clips(pdfs, templates).collect()
    assert rows[0]["clip_text"] is None


def test_malformed_pdf_is_not_a_poison_pill(session):
    """A payload that starts with %PDF but has an unparseable content
    stream (e.g. a bad octal escape) must route to the C4 fallback
    (resolved text None -> status Failed), never fail the Spark task."""
    from pyspark.sql import functions as F

    from ocr_api_spark.operators.extract import fused_extract_udf

    good = write_minimal_pdf([[(72, 72, 12, "Permanent Account Number"), (72, 90, 12, "ABCPS1234F")]])
    # invalid octal escape: parses tolerantly (the \\8 is literal), never raises
    odd = good.replace(b"(Permanent Account Number)", b"(C:\\8th-file after bad escape)")
    # compressed stream: MiniPdfError -> no text -> the row fails, not the job
    poison = good.replace(b"<< /Length", b"<< /Filter /FlateDecode /Length")
    df = session.createDataFrame(
        [
            ("ok", "", bytearray(good), "pan"),
            ("odd", "", bytearray(odd), "pan"),
            ("poison", "", bytearray(poison), "pan"),
        ],
        "url string, text string, html binary, doc_type string",
    )
    nulls = [F.lit(None).cast("string")] * 9
    out = {
        r["url"]: r
        for r in df.withColumn(
            "x", fused_extract_udf(F.col("text"), F.col("html"), F.col("doc_type"), *nulls)
        )
        .select("url", "x.status", "x.error")
        .collect()
    }
    assert out["ok"]["status"] == "Completed"
    assert out["odd"]["status"] == "Completed"  # tolerant parse, row survives
    assert out["poison"]["status"] == "Failed"  # row failed, job survived
    assert out["poison"]["error"] == "no text"


def test_pdf_roundtrip_property():
    """Property: for any layout of printable-latin-1 words at distinct
    line positions, write→parse reproduces the exact line structure."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    word = st.text(
        alphabet=st.characters(min_codepoint=33, max_codepoint=126),
        min_size=1,
        max_size=12,
    )
    line = st.lists(word, min_size=1, max_size=6).map(" ".join)

    @settings(max_examples=60, deadline=None)
    @given(st.lists(line, min_size=1, max_size=8))
    def check(lines):
        spans = [(72.0, 72.0 + 20.0 * i, 10.0, ln) for i, ln in enumerate(lines)]
        pdf = write_minimal_pdf([spans])
        got = parse_pdf(pdf)[0].extract_text()
        assert got == "\n".join(lines)

    check()


def test_pdf_from_text_roundtrip_property():
    """pdf_from_text→pdf_text preserves the word sequence for any
    space-separated latin-1 text (whitespace-normalized)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from ocr_api_spark.sources.pdftext import pdf_from_text

    # printable latin-1 minus unicode whitespace (\xa0 would be eaten by
    # the .split() normalization below, not by the parser)
    word = st.text(
        alphabet=st.characters(
            min_codepoint=33, max_codepoint=255, blacklist_characters="\xad\xa0"
        ).filter(lambda c: not (127 <= ord(c) <= 160)),
        min_size=1,
        max_size=10,
    )

    @settings(max_examples=60, deadline=None)
    @given(st.lists(word, min_size=0, max_size=80))
    def check(words):
        text = " ".join(words)
        out = pdf_text(pdf_from_text(text))
        assert out.replace("\n", " ").split() == [
            w.encode("latin-1", errors="replace").decode("latin-1") for w in words
        ]

    check()
