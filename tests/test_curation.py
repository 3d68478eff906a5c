"""End-to-end curation pipeline (functions/curation.py + jobs/curate.py):
stage composition invariants, CLI summary contract, parquet-level
resume, and the optional crawl-level URL-dedup stage."""

import os

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def test_curate_composition_invariants(spark):
    from pdf_parser_spark.functions import curate, gopher_quality_filter

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    res = curate(
        docs, rates={"en": 100, "fr": 100, "de": 100}, default_pct=100,
        hash_fn="md5",
    )
    out = res.curated
    # schema: input columns with text replaced by clean_text
    assert set(out.columns) == (set(docs.columns) - {"text"}) | {"clean_text"}

    kept_ids = {
        r.doc_id
        for r in gopher_quality_filter(docs).filter("keep").collect()
    }
    out_ids = {r.doc_id for r in out.collect()}
    # rates=100 everywhere -> output is exactly (kept - cluster dupes)
    assert out_ids <= kept_ids
    dupes = {
        r.doc_id
        for r in res.audit["clusters"].filter(
            "doc_id <> cluster_id"
        ).collect()
    }
    assert out_ids == kept_ids - dupes
    # every cluster dupe that passed quality was dropped
    assert all(d not in out_ids for d in dupes)


def test_curate_repetition_filter(spark):
    """With repetition_filter=True a template-spam doc (passes the
    doc-level gopher rules, fails the top-ngram caps) is dropped; the
    diverse doc survives both."""
    from pdf_parser_spark.functions import curate

    # 30 distinct filler words keep the gopher distinct-ratio rule
    # happy (38/46 = 0.83); the repeated bigram alone trips the
    # top-2gram cap (16/46 = 0.35 > 0.20)
    filler = " ".join(
        f"word{i:02d}" for i in range(30)
    )
    spam = filler + " click here" * 8
    good = ("the quick brown fox jumps over a lazy dog while two red "
            "birds watch from tall green trees near my old house today")
    docs = spark.createDataFrame(
        [(1, spam, "en", "s"), (2, good, "en", "s")],
        "doc_id long, text string, lang string, source string",
    )
    base = {r.doc_id for r in curate(
        docs, rates={}, default_pct=100, hash_fn="md5"
    ).curated.collect()}
    filt = curate(
        docs, rates={}, default_pct=100, hash_fn="md5",
        repetition_filter=True,
    )
    ids = {r.doc_id for r in filt.curated.collect()}
    assert base == {1, 2} and ids == {2}
    assert {r.doc_id: r.keep for r in filt.audit["repetition"].collect()} \
        == {1: False, 2: True}


def test_curate_url_stage(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").withColumn(
        "url",
        F.concat(
            F.lit("https://x.example/doc/"),
            # two doc_ids share each canonical url -> min-id keeper only
            (F.floor(F.col("doc_id") / 2)).cast("string"),
        ),
    )
    from pdf_parser_spark.functions import curate

    res = curate(
        docs, rates={}, default_pct=100, url_col="url", hash_fn="md5"
    )
    ids = {r.doc_id for r in res.curated.collect()}
    # only even ids can survive (odd ids lose the URL-keeper race)
    assert ids and all(i % 2 == 0 for i in ids)

    # with a host quota, at most N survivors per host (single host here)
    res_q = curate(
        docs, rates={}, default_pct=100, url_col="url", host_quota=10,
        hash_fn="md5",
    )
    ids_q = {r.doc_id for r in res_q.curated.collect()}
    assert ids_q <= ids and len(ids_q) <= 10


def test_curate_cli_and_resume(spark, tmp_path):
    from pdf_parser_spark.jobs.curate import main, parse_rates

    assert parse_rates("en=50, fr=25") == {"en": 50, "fr": 25}
    assert parse_rates("") == {}

    out = str(tmp_path / "cur")
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = main([
            "--input", f"{SF_DIR}/documents.parquet",
            "--output", out, "--run-id", "c1",
        ])
    assert rc == 0
    line = [l for l in buf.getvalue().splitlines() if l.startswith("run_id=")][-1]
    stats = dict(kv.split("=") for kv in line.split())
    assert stats["run_id"] == "c1" and int(stats["docs_in"]) == 500
    assert 0 < int(stats["curated"]) <= int(stats["deduped"]) <= int(stats["kept"])

    stages = ["quality", "pii", "redacted", "pairs", "clusters", "curated"]
    for s in stages:
        assert os.path.exists(f"{out}/stages/{s}/_SUCCESS"), s
    mtimes = {s: os.path.getmtime(f"{out}/stages/{s}/_SUCCESS") for s in stages}

    # re-run: every stage resumes from its _SUCCESS marker (no rewrite)
    buf2 = io.StringIO()
    with contextlib.redirect_stdout(buf2):
        rc = main([
            "--input", f"{SF_DIR}/documents.parquet",
            "--output", out, "--run-id", "c2",
        ])
    assert rc == 0
    line2 = [l for l in buf2.getvalue().splitlines() if l.startswith("run_id=")][-1]
    stats2 = dict(kv.split("=") for kv in line2.split())
    assert stats2["curated"] == stats["curated"]
    for s in stages:
        assert os.path.getmtime(f"{out}/stages/{s}/_SUCCESS") == mtimes[s], s

    # changed parameter -> the _PARAMS fingerprint invalidates exactly
    # the stages it can affect: pairs/clusters/curated recompute,
    # quality/pii/redacted resume untouched (marker-only resume used to
    # silently reuse stale outputs computed under the old threshold)
    buf3 = io.StringIO()
    with contextlib.redirect_stdout(buf3):
        rc = main([
            "--input", f"{SF_DIR}/documents.parquet",
            "--output", out, "--run-id", "c3",
            "--threshold", "0.9",
        ])
    assert rc == 0
    for s in ["quality", "pii", "redacted"]:
        assert os.path.getmtime(f"{out}/stages/{s}/_SUCCESS") == mtimes[s], s
    for s in ["pairs", "clusters", "curated"]:
        assert os.path.getmtime(f"{out}/stages/{s}/_SUCCESS") > mtimes[s], s


def test_curate_normalize_stage(spark):
    """With normalize=True an NFD spelling of a quality doc dedups
    against its NFC twin (same bytes after canonicalization); without
    it the two spellings hash apart and both survive."""
    from pdf_parser_spark.functions import curate

    base = (
        "the quick brown fox jumps over the lazy dog while the calm "
        "river flows past the old stone bridge and the busy market "
        "square where people gather every single morning to trade"
    )
    nfc = base.replace("river", "rivière")
    nfd = base.replace("river", "rivière")
    docs = spark.createDataFrame(
        [(1, nfc, "en"), (2, nfd, "en")], ["doc_id", "text", "lang"]
    )
    plain = curate(
        docs, rates={"en": 100}, default_pct=100, threshold=0.9,
        hash_fn="md5",
    ).curated
    assert {r.doc_id for r in plain.collect()} == {1, 2}

    norm = curate(
        docs, rates={"en": 100}, default_pct=100, threshold=0.9,
        normalize=True, hash_fn="md5",
    ).curated
    # min-id keeper survives, the NFD twin is recognized as a dup
    assert {r.doc_id for r in norm.collect()} == {1}


def test_curate_resume_invalidates_on_input_change(spark, tmp_path):
    """Same --output, different input fingerprint: every stage must
    recompute (round-4 review: marker+params resume silently reused the
    old corpus's stages when only the input changed)."""
    from pdf_parser_spark.functions import curate

    def mk(prefix, base_id):
        rows = []
        for i in range(30):
            words = " ".join(
                f"{prefix}{(i * 37 + j * 11) % 997}" for j in range(80)
            )
            rows.append((base_id + i, words, "en"))
        return spark.createDataFrame(rows, ["doc_id", "text", "lang"])

    a = mk("alpha", 0)
    b = mk("beta", 100)
    out = str(tmp_path / "stages")
    r1 = curate(a, rates={"en": 100}, default_pct=100,
                materialize_dir=out, input_fingerprint="corpus-a")
    ids1 = {r.doc_id for r in r1.curated.collect()}
    r2 = curate(b, rates={"en": 100}, default_pct=100,
                materialize_dir=out, input_fingerprint="corpus-b")
    ids2 = {r.doc_id for r in r2.curated.collect()}
    assert ids1 and all(i < 100 for i in ids1)
    assert ids2 and all(i >= 100 for i in ids2)  # NOT stale corpus-a


def test_curate_string_ids_with_normalize(spark):
    """id_col is generic: string doc ids flow through the normalize
    kernel (round-4 review: hardcoded `doc_id long` schema)."""
    from pdf_parser_spark.functions import curate

    docs = spark.createDataFrame(
        [(f"doc-{i}", "a perfectly ordinary document with plenty of "
          "distinct words to pass the quality gate here", "en")
         for i in range(5)],
        ["doc_id", "text", "lang"],
    )
    out = curate(docs, rates={"en": 100}, default_pct=100,
                 normalize=True).curated
    assert {r.doc_id for r in out.collect()} <= {f"doc-{i}" for i in range(5)}
    assert out.count() >= 1


def test_filter_funnel(spark):
    """First-failing-stage attribution, ordered application, one-pass
    plan (single aggregate, no per-stage scans)."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from pdf_parser_spark.functions import filter_funnel
    from tests.test_plans import count_nodes, plan_of

    docs = spark.createDataFrame(
        [
            (1, 100, "en"),   # passes both
            (2, 10, "en"),    # fails len (charged to len even though lang ok)
            (3, 100, "und"),  # passes len, fails lang
            (4, 5, "und"),    # fails BOTH -> charged to len only
        ],
        "doc_id long, n_chars long, lang string",
    )
    out = filter_funnel(
        docs,
        [
            ("min_len", F.col("n_chars") >= 50),
            ("lang_known", F.col("lang") != "und"),
        ],
    )
    rows = {r["stage"]: r for r in out.collect()}
    assert rows["min_len"]["docs_in"] == 4
    assert rows["min_len"]["docs_out"] == 2
    assert rows["min_len"]["dropped"] == 2 and rows["min_len"]["drop_pct"] == 0.5
    assert rows["lang_known"]["docs_in"] == 2
    assert rows["lang_known"]["docs_out"] == 1
    assert rows["lang_known"]["drop_pct"] == 0.5

    plan = plan_of(out)
    assert count_nodes(plan, "Scan ExistingRDD") + count_nodes(
        plan, "FileScan parquet"
    ) <= 1  # one pass over the input
    # partial + final agg only (AQE's final-plan section may repeat the
    # node, so bound rather than pin the exact count)
    assert 2 <= count_nodes(plan, "HashAggregate") <= 4

    with _pytest.raises(ValueError):
        filter_funnel(docs, [])


def test_curate_keeper_longest(spark):
    """keeper='longest' keeps the longest redacted text per near-dup
    cluster instead of the min id, singletons unaffected, and the
    keeper is part of the curated-stage fingerprint (param change ->
    recompute)."""
    import pytest as _pytest

    from pdf_parser_spark.functions import curate

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    kw = dict(
        rates={"en": 100, "fr": 100, "de": 100, "zh": 100, "und": 100},
        default_pct=100, hash_fn="md5",
    )
    res_min = curate(docs, keeper="min_id", **kw)
    res_long = curate(docs, keeper="longest", **kw)
    ids_min = {r.doc_id for r in res_min.curated.collect()}
    ids_long = {r.doc_id for r in res_long.curated.collect()}
    # same number of survivors (one per cluster either way)...
    assert len(ids_min) == len(ids_long)

    # ...and in every multi-doc cluster the longest clean_text won
    clusters = {}
    for r in res_long.audit["clusters"].collect():
        clusters.setdefault(r.cluster_id, []).append(r.doc_id)
    # replicate the pipeline's pre-cluster relation to read every
    # member's clean_text length (audit exposes counts, not text)
    from pdf_parser_spark.functions import gopher_quality_filter, redact_pii

    kept = docs.join(
        gopher_quality_filter(docs).filter("keep").select("doc_id"),
        "doc_id",
        "left_semi",
    )
    lens = {
        r.doc_id: len(r.clean_text)
        for r in redact_pii(kept).select("doc_id", "clean_text").collect()
    }
    multi = {c: m for c, m in clusters.items() if len(m) > 1}
    assert multi, "fixture must contain at least one near-dup cluster"
    for members in multi.values():
        winner = [d for d in members if d in ids_long]
        if not winner:
            continue  # whole cluster failed quality upstream
        best = max(
            (d for d in members if d in lens),
            key=lambda d: (lens[d], -d),
        )
        assert winner == [best]

    with _pytest.raises(ValueError):
        curate(docs, keeper="newest", **kw)


def test_filter_funnel_quoted_stage_name(spark):
    from pyspark.sql import functions as F

    from pdf_parser_spark.functions import filter_funnel

    docs = spark.createDataFrame([(1, 5), (2, 50)], "doc_id long, n long")
    out = filter_funnel(docs, [("n >= '10'", F.col("n") >= 10)]).collect()
    assert out[0]["stage"] == "n >= '10'" and out[0]["docs_out"] == 1


def test_filter_funnel_backslash_stage_name(spark):
    """Stage names reach a Spark SQL string literal, which interprets
    backslash escapes (escapedStringLiterals=false default) — a name
    containing a backslash must round-trip verbatim (round-4 ADVICE)."""
    from pyspark.sql import functions as F

    from pdf_parser_spark.functions import filter_funnel

    docs = spark.createDataFrame([(1, 5), (2, 50)], "doc_id long, n long")
    name = r"regex \d+ and quote ' mix"
    out = filter_funnel(docs, [(name, F.col("n") >= 10)]).collect()
    assert out[0]["stage"] == name and out[0]["docs_out"] == 1


def test_curate_cjk_quality_stage(spark, tmp_path):
    """curate(cjk=True) keeps unspaced zh/ja documents the latin
    tokenizer would drop, the flag is part of the quality stage's
    fingerprint (flipping it recomputes quality), and the CLI exposes
    it as --cjk."""
    import json as _json

    from pdf_parser_spark.functions import curate
    from pdf_parser_spark.functions.textseg import build_cjk_probe

    rows = [
        (i, t, lang) for i, t, lang in build_cjk_probe() if i in (0, 1, 5)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    kw = dict(rates={"en": 100, "zh": 100, "ja": 100}, default_pct=100,
              threshold=0.2)

    latin = curate(docs, **kw)
    assert {r.doc_id for r in latin.curated.collect()} == {5}
    cjk = curate(docs, cjk=True, **kw)
    assert {r.doc_id for r in cjk.curated.collect()} == {0, 1, 5}

    # fingerprint: flipping cjk invalidates the materialized quality
    # stage (the _PARAMS digest must change)
    mdir = str(tmp_path / "stages")
    curate(docs, materialize_dir=mdir, **kw)
    with open(f"{mdir}/quality/_PARAMS.json") as f:
        fp_latin = _json.load(f)["fingerprint"]
    curate(docs, cjk=True, materialize_dir=mdir, **kw)
    with open(f"{mdir}/quality/_PARAMS.json") as f:
        meta = _json.load(f)
    assert meta["fingerprint"] != fp_latin
    assert meta["params"]["cjk"] is True

    # CLI wiring
    import subprocess
    import sys

    inp = str(tmp_path / "docs")
    docs.write.mode("overwrite").parquet(inp)
    out = subprocess.run(
        [sys.executable, "-m", "pdf_parser_spark.jobs.curate",
         "--input", inp, "--output", str(tmp_path / "o"), "--run-id",
         "cjk1", "--rates", "en=100,zh=100,ja=100", "--default-pct",
         "100", "--cjk"],
        cwd="/root/repo", capture_output=True, text=True, timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    line = [l for l in out.stdout.splitlines() if l.startswith("run_id=")][-1]
    assert "kept=3" in line and "curated=3" in line, line
