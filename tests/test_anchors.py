"""Anchor-text extraction: JVM twin byte-equality vs the pinned python
extractor on synth + adversarial html, edge table parity, summary golden."""

from tric_spark import synth
from tric_spark.extract import anchor_edges, anchor_summary, anchors_jvm, extract_anchors


TRICKY = [
    '<A HREF="https://x/1">Click Here</A>',
    "<a class='z'\nhref='https://x/2'>two\nlines</a>",
    '<a href="https://x/3"><b>bold</b> text</a>',
    '<a href="https://x/4">  padded  </a>',
    '<a href="https://x/5"></a>',  # empty anchor
    '<a href="https://x/6">a</a> mid <a href=\'https://x/7\'>b</a>',
    '<ahref="https://no/8">not-a-tag</a>',
    '<a data-href="https://no/9">skip</a>',
    '<a id="k" href="https://x/10">nested <i>tag</i> tail</a>',
]


def test_jvm_anchor_twin_byte_equality(spark):
    pages = synth.pages_table(spark, n_pages=200, seed=42)
    rows = pages.select("url", "html", anchors_jvm().alias("j")).collect()
    for r in rows:
        got = [(p.href, p.anchor) for p in r.j]
        assert got == extract_anchors(bytes(r.html)), r.url

    df = spark.createDataFrame(
        [(str(i), h) for i, h in enumerate(TRICKY)], "url string, html string"
    )
    for r in df.select("url", "html", anchors_jvm().alias("j")).collect():
        got = [(p.href, p.anchor) for p in r.j]
        assert got == extract_anchors(r.html), r.html


def test_anchor_edges_jvm_equals_udf_path(spark):
    pages = synth.pages_table(spark, n_pages=120, seed=7)
    a = sorted(
        (r.src_url, r.dst_url, r.anchor)
        for r in anchor_edges(pages, jvm=True).collect()
    )
    b = sorted(
        (r.src_url, r.dst_url, r.anchor)
        for r in anchor_edges(pages, jvm=False).collect()
    )
    assert a == b and a


def test_anchor_summary_golden(spark):
    rows = [
        ("s1", "t", "good page"),
        ("s2", "t", "good page"),
        ("s3", "t", "best page"),
        ("s4", "t", "zzz"),
        ("s5", "t", ""),  # empty anchors don't count
        ("s6", "u", "only one"),
    ]
    edges = spark.createDataFrame(
        rows, "src_url string, dst_url string, anchor string"
    )
    got = {r.dst_url: (r.n_anchors, list(r.top_anchors)) for r in anchor_summary(edges, k=2).collect()}
    # count desc, text asc: "good page"×2, then "best page" (ties by text)
    assert got["t"] == (4, ["good page", "best page"])
    assert got["u"] == (1, ["only one"])
