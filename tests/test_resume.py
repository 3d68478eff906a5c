"""Checkpoint-resume via the lineage sidecar (north rule; SURVEY.md §5
layer 3): kill after k waves, re-run, assert completed partitions are not
recomputed and the final output has no duplicates and no losses."""

import os

from pyspark.sql import functions as F

from pdf_parser_spark.pipeline import (
    EXTRACTED_TABLE,
    LINEAGE_TABLE,
    done_parts,
    run_extraction,
)
from pdf_parser_spark.sources import TableIO


def _mtimes(root: str) -> dict[str, float]:
    out = {}
    for dirpath, _dirnames, filenames in os.walk(root):
        for f in filenames:
            if f.endswith(".parquet"):
                p = os.path.join(dirpath, f)
                out[p] = os.path.getmtime(p)
    return out


def test_kill_and_resume(spark, corpus_df, tmp_path):
    out_root = str(tmp_path / "out")
    n_parts = 8

    # simulated kill: stop after 2 of 4 waves
    s1 = run_extraction(
        spark, corpus_df, out_root, run_id="r1", n_parts=n_parts,
        waves=4, max_waves=2,
    )
    assert s1.waves_run == 2
    io = TableIO(spark, out_root)
    done1 = done_parts(io, "r1")
    assert 0 < len(done1) < n_parts

    part_dir = os.path.join(out_root, EXTRACTED_TABLE)
    before = _mtimes(part_dir)
    done_files_before = {
        p: t for p, t in before.items()
        if any(f"part_id={d}/" in p for d in done1)
    }
    assert done_files_before

    # resume: same run_id — remaining partitions only
    s2 = run_extraction(
        spark, corpus_df, out_root, run_id="r1", n_parts=n_parts, waves=1,
    )
    assert s2.parts_done_before == len(done1)
    assert s2.parts_processed == n_parts - len(done1)

    # completed partitions were NOT recomputed (files untouched)
    after = _mtimes(part_dir)
    for p, t in done_files_before.items():
        assert after[p] == t, f"recomputed: {p}"

    # no dup, no loss
    result = io.read(EXTRACTED_TABLE)
    n_input = corpus_df.count()
    assert result.count() == n_input
    assert result.select("url").distinct().count() == n_input

    # lineage covers all partitions exactly once with status done
    lin = io.read(LINEAGE_TABLE).filter(F.col("run_id") == "r1")
    got_parts = sorted(
        r.part_id for r in lin.filter("status = 'done'").select("part_id").collect()
    )
    assert got_parts == sorted(set(got_parts))
    assert set(got_parts) == set(range(n_parts)) & {
        r.part_id
        for r in result.select("part_id").distinct().collect()
    } | set(got_parts)  # every written part is marked done
    assert lin.agg(F.sum("n_docs")).collect()[0][0] == n_input


def test_rerun_after_unmarked_partition_is_idempotent(spark, corpus_df, tmp_path):
    """A wave that wrote data but crashed before its lineage append must be
    fully rewritten on resume — dynamic partition overwrite, no dups."""
    out_root = str(tmp_path / "out2")
    io = TableIO(spark, out_root)
    run_extraction(
        spark, corpus_df, out_root, run_id="r2", n_parts=4, waves=1,
    )
    # simulate the crash: delete the lineage marker for one partition
    lin = io.read(LINEAGE_TABLE).filter("part_id <> 1").collect()
    import shutil

    from pdf_parser_spark import schemas

    shutil.rmtree(os.path.join(out_root, LINEAGE_TABLE))
    io.append(spark.createDataFrame(lin, schemas.LINEAGE), LINEAGE_TABLE)

    run_extraction(
        spark, corpus_df, out_root, run_id="r2", n_parts=4, waves=1,
    )
    result = io.read(EXTRACTED_TABLE)
    n_input = corpus_df.count()
    assert result.count() == n_input
    assert result.select("url").distinct().count() == n_input
