import re

from pyspark.sql import functions as F

from tric_spark import graph, synth
from tric_spark.extract import (
    extract_outlinks,
    extract_text,
    outlink_edges,
    with_extracted,
)


def test_pinned_extractor_pure():
    html = (
        b"<html><head><title> T1 </title></head><body>"
        b"<p>hello <b>world</b></p><p></p><p>  two  </p>"
        b'<a href="https://a.example/x">l</a><a href="https://b.example/y">l</a>'
        b"</body></html>"
    )
    assert extract_text(html) == "T1\nhello world\ntwo"
    assert extract_outlinks(html) == ["https://a.example/x", "https://b.example/y"]
    assert extract_text(None) == ""
    assert extract_outlinks(b"<html></html>") == []


def test_byte_identity_text_per_url(spark):
    """North-rule invariant: engine-extracted text == pinned extractor
    output == the pages table's text column, byte-for-byte per url."""
    pages = synth.pages_table(spark, n_pages=300, seed=42)
    ext = with_extracted(pages).select("url", "text", "extracted_text", "html").collect()
    assert len(ext) == 300
    for r in ext:
        pinned = extract_text(bytes(r.html))
        assert r.extracted_text == r.text == pinned, r.url
        assert r.extracted_text.encode() == r.text.encode()


def test_outlink_edges_match_idspace_graph(spark):
    """Extraction path (html → hrefs → parse ids) reproduces the id-space
    generator exactly — the whole pages→edges pipeline is consistent."""
    n = 250
    pages = synth.pages_table(spark, n_pages=n, seed=42)
    via_html = (
        outlink_edges(pages)
        .select(
            F.regexp_extract("src_url", r"/p/(\d+)$", 1).cast("long").alias("src"),
            F.regexp_extract("dst_url", r"/p/(\d+)$", 1).cast("long").alias("dst"),
        )
    )
    direct = synth.link_edges(spark, n_pages=n, seed=42)
    assert via_html.exceptAll(direct).count() == 0
    assert direct.exceptAll(via_html).count() == 0
    assert direct.count() > n  # sanity: avg out-degree > 1


def test_jvm_href_twin_byte_equality(spark):
    """The JVM regexp_extract_all twin must reproduce the pinned Python
    extractor byte-for-byte — on the synth corpus and on adversarial
    snippets (case, quote style, newlines inside the tag)."""
    from tric_spark.extract import outlinks_jvm

    pages = synth.pages_table(spark, n_pages=300, seed=42)
    rows = pages.select("url", "html", outlinks_jvm().alias("jvm_links")).collect()
    assert len(rows) == 300
    for r in rows:
        assert list(r.jvm_links) == extract_outlinks(bytes(r.html)), r.url

    tricky = [
        '<A HREF="https://x/1">c</A>',
        "<a class='z'\nhref='https://x/2'>c</a>",
        '<a href="">empty</a><a data-href="https://no/3">skip</a>',
        '<ahref="https://no/4">not-a-tag</a>',
        '<a id="k" href="https://x/5">c</a> text <a href=\'https://x/6\'>c</a>',
        # ADVICE r2: non-ASCII whitespace inside the tag — Python's \s is
        # Unicode-aware, so the JVM twin needs (?U) to agree
        '<a href="https://x/7">nbsp</a>',
        '<a class="q" href="https://x/8">em-space</a>',
        '<a　href="https://x/9">ideographic</a>',
    ]
    df = spark.createDataFrame([(t,) for t in tricky], "html string")
    got = [list(r.l) for r in df.select(outlinks_jvm().alias("l")).collect()]
    want = [extract_outlinks(t) for t in tricky]
    assert got == want, list(zip(got, want))


TRICKY_TEXT = [
    "<html><TITLE> Shouty </TITLE><P>case <B>folds</B></P></html>",
    "<title>a</title><title>b</title><p>first title wins</p>",
    "<p>no title at all</p><p>  </p><p>\t\n</p>",
    "<title>   </title><p>ws-only title drops</p>",
    "<p class='x'\nattr>multi\nline</p>",
    "<p> nbsp padded </p><p>　ideographic　pad　</p>",
    "<p> line-sep para-sep</p>",
    "<p>unclosed stays out",
    "<html>no paragraphs</html>",
    "<p>a<p>nested open</p>b</p><p>tail</p>",
    "<p>keep &amp; entities &#160; raw</p>",
]


def test_jvm_text_twin_byte_equality(spark):
    """VERDICT r2 #3: the JVM full-text twin (the default 100-TB path every
    textstats/dedup consumer sits on) must reproduce the pinned extractor
    byte-for-byte — synth corpus plus adversarial snippets including
    Unicode whitespace and case."""
    from tric_spark.extract import extracted_text_jvm

    pages = synth.pages_table(spark, n_pages=300, seed=42)
    rows = pages.select("url", "html", extracted_text_jvm().alias("jvm_text")).collect()
    assert len(rows) == 300
    for r in rows:
        assert r.jvm_text == extract_text(bytes(r.html)), r.url

    df = spark.createDataFrame([(t,) for t in TRICKY_TEXT], "html string")
    got = [r.t for r in df.select(extracted_text_jvm().alias("t")).collect()]
    want = [extract_text(t) for t in TRICKY_TEXT]
    assert got == want, list(zip(got, want))


def test_with_extracted_default_plan_has_no_python(spark):
    """with_extracted defaults to the JVM twins — the full extraction stage
    (text + outlinks) must stay inside whole-stage codegen."""
    import contextlib
    import io

    pages = synth.pages_table(spark, n_pages=50, seed=42)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        with_extracted(pages).explain(mode="formatted")
    plan = buf.getvalue()
    assert "Python" not in plan and "ArrowEval" not in plan, plan
    # the UDF fallback path still carries the pinned extractor
    ext = with_extracted(pages, jvm=False).select("text", "extracted_text").collect()
    assert all(r.extracted_text == r.text for r in ext)


def test_outlink_edges_default_plan_has_no_python(spark):
    """The 100-TB ingest stage (edge build) must run JVM-side."""
    import contextlib
    import io

    pages = synth.pages_table(spark, n_pages=50, seed=42)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        outlink_edges(pages).explain(mode="formatted")
    plan = buf.getvalue()
    assert "Python" not in plan and "ArrowEval" not in plan, plan


def test_synth_determinism_across_parallelism(spark):
    """Same table at 2 and 16 partitions — the LCG-analog invariant
    (pure function of (seed, id), SURVEY §2.1)."""
    a = synth.pages_table(spark, 200, seed=7).repartition(2).orderBy("vid").collect()
    b = synth.pages_table(spark, 200, seed=7).repartition(16).orderBy("vid").collect()
    assert a == b


def test_synth_has_hubs(spark):
    """The degree law must produce hub vertices (skew is exercised)."""
    edges = synth.link_edges(spark, 2000, seed=42)
    sym = graph.symmetrize(graph.canonical_edges(edges))
    top = graph.degrees(sym).agg(F.max("degree")).collect()[0][0]
    assert top >= 50, f"max degree {top} too small for skew tests"


def test_vertex_id_assignment(spark):
    pages = synth.pages_table(spark, 300, seed=42)
    ids = graph.assign_vertex_ids(pages.select("url"))
    assert ids.count() == 300
    assert graph.audit_id_collisions(ids) == 0
    dense = graph.assign_dense_ids(pages.select("url"))
    got = [r.vid for r in dense.orderBy("vid").collect()]
    assert got == list(range(300))
