"""TableIO facade dispatch (sources/io.py): the sandbox has no Iceberg
jars, so the Iceberg branch is exercised against a stub catalog — the
point is that every method routes through writeTo/overwritePartitions/
read.table when a catalog is present, and through parquet when not."""

from pdf_parser_spark.sources import io as tio


class _FakeWriteTo:
    def __init__(self, calls, name):
        self.calls = calls
        self.name = name

    def append(self):
        self.calls.append(("append", self.name))

    def overwritePartitions(self):
        self.calls.append(("overwritePartitions", self.name))


class _FakeDF:
    def __init__(self, calls):
        self.calls = calls

    def writeTo(self, name):
        return _FakeWriteTo(self.calls, name)


class _FakeSpark:
    def __init__(self, calls):
        self.calls = calls
        outer = self

        class _Catalog:
            def tableExists(self, name):
                outer.calls.append(("tableExists", name))
                return True

        class _Read:
            def table(self, name):
                outer.calls.append(("read.table", name))
                return f"df:{name}"

        self.catalog = _Catalog()
        self.read = _Read()


def test_iceberg_branch_dispatch(monkeypatch):
    calls = []
    monkeypatch.setattr(tio, "_iceberg_available", lambda spark: True)
    t = tio.TableIO(_FakeSpark(calls), "cat.db")
    assert t.iceberg is True

    assert t.exists("extracted") is True
    assert t.read("extracted") == "df:cat.db/extracted"
    df = _FakeDF(calls)
    t.append(df, "lineage")
    t.overwrite_partitions(df, "extracted", "part_id")
    assert calls == [
        ("tableExists", "cat.db/extracted"),
        ("read.table", "cat.db/extracted"),
        ("append", "cat.db/lineage"),
        ("overwritePartitions", "cat.db/extracted"),
    ]


def test_parquet_branch_roundtrip(spark, tmp_path):
    """Without a catalog the facade must fall back to parquet with
    dynamic partition overwrite (resume idempotency)."""
    root = str(tmp_path / "tables")
    t = tio.TableIO(spark, root)
    assert t.iceberg is False
    assert not t.exists("extracted")

    df = spark.createDataFrame(
        [(1, "a", 0), (2, "b", 1)], ["id", "v", "part_id"]
    )
    t.overwrite_partitions(df, "extracted", "part_id")
    assert t.exists("extracted")
    assert t.read("extracted").count() == 2

    # dynamic overwrite: rewriting ONLY part 1 must keep part 0 intact
    df2 = spark.createDataFrame([(3, "c", 1)], ["id", "v", "part_id"])
    t.overwrite_partitions(df2, "extracted", "part_id")
    got = sorted(
        (r.id, r.part_id) for r in t.read("extracted").collect()
    )
    assert got == [(1, 0), (3, 1)]

    t.append(df2, "lineage")
    t.append(df2, "lineage")
    assert t.read("lineage").count() == 2
