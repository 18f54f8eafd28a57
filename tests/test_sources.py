"""CSV/TSV source surface (SURVEY §2.1 S1/S2/S6): ISO-8859-1 decoding,
projection pushdown, all-string typing, TSV round-trip."""

from __future__ import annotations

import os
import tempfile

from amr_kg_spark.sources.files import read_csv, read_tsv, write_tsv


def test_csv_iso8859_projection(spark):
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "vocab.csv")
        with open(p, "w", encoding="ISO-8859-1") as f:
            f.write("id,name,extra\n1,Tétracycline,x\n2,Pénicilline,y\n")
        df = read_csv(spark, p, usecols=["id", "name"])
        assert df.columns == ["id", "name"]
        assert [f.dataType.simpleString() for f in df.schema.fields] == [
            "string",
            "string",
        ]
        names = {r.name for r in df.collect()}
        assert names == {"Tétracycline", "Pénicilline"}


def test_tsv_roundtrip(spark):
    with tempfile.TemporaryDirectory() as d:
        src = os.path.join(d, "in.tsv")
        with open(src, "w") as f:
            f.write("subj\tpred\tobj\nA\tr\tB\nC\ts\tD\n")
        df = read_tsv(spark, src)
        out = os.path.join(d, "out")
        write_tsv(df, out)
        back = read_tsv(spark, out)
        assert {tuple(r) for r in back.collect()} == {("A", "r", "B"), ("C", "s", "D")}
