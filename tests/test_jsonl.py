import glob
import json
import os

from pyspark.sql import functions as F

from tric_spark.sources.jsonl import (
    CORRUPT_COL,
    read_jsonl,
    write_jsonl,
)
from tric_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_roundtrip_documents(spark, tmp_path):
    docs = load_table(spark, SF, "documents")
    path = str(tmp_path / "docs_jsonl")
    write_jsonl(docs, path)
    back = read_jsonl(spark, path)
    assert back.schema == docs.schema
    a = {tuple(r) for r in docs.collect()}
    b = {tuple(r) for r in back.collect()}
    assert a == b
    # one part per partition, plain text lines
    parts = glob.glob(os.path.join(path, "part-*"))
    assert parts
    with open(parts[0]) as fh:
        json.loads(fh.readline())


def test_gzip_roundtrip(spark, tmp_path):
    docs = load_table(spark, SF, "documents")
    path = str(tmp_path / "docs_gz")
    write_jsonl(docs, path, codec="gzip")
    assert glob.glob(os.path.join(path, "part-*.gz"))
    assert read_jsonl(spark, path).count() == docs.count()


def test_corrupt_lines_quarantined_not_fatal(spark, tmp_path):
    path = str(tmp_path / "dirty")
    os.makedirs(path)
    good = {"doc_id": 1, "text": "a b", "lang": "en", "source": "s", "n_chars": 3}
    partial = {"doc_id": 2}  # parses; missing fields -> NULL
    with open(os.path.join(path, "part-00000.json"), "w") as fh:
        fh.write(json.dumps(good) + "\n")
        fh.write("{this is not json\n")
        fh.write(json.dumps(partial) + "\n")

    clean = read_jsonl(spark, path)
    assert {r.doc_id for r in clean.collect()} == {1, 2}
    assert clean.filter(F.col("doc_id") == 2).first().text is None

    kept = read_jsonl(spark, path, keep_corrupt=True)
    corrupt = kept.filter(F.col(CORRUPT_COL).isNotNull())
    assert corrupt.count() == 1
    assert "not json" in corrupt.first()[CORRUPT_COL]
