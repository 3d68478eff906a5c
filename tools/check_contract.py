"""Local replica of the driver's correctness gate: run every
__spark_entry__ query at a given SF and diff it against its DuckDB oracle
(row count + column names + order-insensitive values).

    python tools/check_contract.py [sf_dir]
"""

from __future__ import annotations

import math
import sys

sys.path.insert(0, ".")


def canon(v):
    """Full-precision, TYPE-AWARE canonical form. The driver compares
    Arrow-level values, where DuckDB's integer sum() surfaces as
    decimal128/hugeint while Spark's is int64 — `str()` at 9 sig figs
    masked exactly that class of mismatch in round 1 (flagship/
    lang_profile), so floats use repr() and non-str types carry their
    type name."""
    if isinstance(v, float):
        if math.isnan(v):
            return "float:nan"
        return f"float:{v!r}"
    if isinstance(v, bytes):
        return f"bytes:{v.hex()}"
    if isinstance(v, str):
        # prefixed like every other type so the canonical space is
        # injective — a literal string 'int:5' must not collide with
        # int 5 from the other engine
        return f"str:{v}"
    return f"{type(v).__name__}:{v}"


def rowset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(canon(r[i]) for i in order) for r in rows)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:]) or None

    import duckdb

    import __spark_entry__ as entrymod
    from pdf_parser_spark.session import get_spark

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    spark = get_spark(app_name="contract-check")
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sdf = fn(spark, sf_dir)
        srows = sdf.collect()
        scols = sdf.columns
        if name not in oracles:
            print(f"{name:28s} rows-only: {len(srows)} rows  OK(weak)")
            continue
        if (
            "VALUES-ORACLE(sf0.01)" in oracles[name]
            and "sf0.01" not in sf_dir
        ):
            # authoring-time literal pinned to the driver's sf — only
            # comparable there
            print(f"{name:28s} skipped: VALUES oracle is sf0.01-only")
            continue
        # fetch through Arrow — the driver does — so DuckDB HUGEINT/
        # DECIMAL results surface as Decimal and fail canon() against a
        # Spark int, exactly as they fail the driver's value hash
        otab = con.execute(oracles[name]).fetch_arrow_table()
        ocols = otab.column_names
        orows = [
            tuple(d[c] for c in ocols) for d in otab.to_pylist()
        ]
        ok_count = len(srows) == len(orows)
        ok_schema = sorted(scols) == sorted(ocols)
        ok_vals = ok_count and ok_schema and (
            rowset(scols, [tuple(r) for r in srows]) == rowset(ocols, orows)
        )
        status = "OK" if ok_vals else "MISMATCH"
        print(
            f"{name:28s} spark={len(srows):6d} duck={len(orows):6d} "
            f"schema={'ok' if ok_schema else f'{sorted(scols)} vs {sorted(ocols)}'} "
            f"{status}"
        )
        if not ok_vals:
            failed.append(name)
            if ok_count and ok_schema:
                a = rowset(scols, [tuple(r) for r in srows])
                b = rowset(ocols, orows)
                diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
                for x, y in diffs:
                    print(f"   spark: {x}\n   duck : {y}")
    spark.stop()
    print("FAILED:", failed if failed else "none")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
