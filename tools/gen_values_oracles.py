"""Generate VALUES-literal DuckDB oracles for the two contract queries
whose semantics are not SQL-expressible, via INDEPENDENT pure-Python
replicas (no Spark involved):

- ``pdf_extract``: runs the single-process extraction oracle
  (pdf_parser_spark/oracle.py) over the same 48 deterministic synth
  docs the Spark query builds, and summarizes the same fields.
- ``embedding_near_dup``: recomputes hashed-BoW embeddings, SRP-LSH
  buckets, multi-probe candidates and the exact cosine verify in plain
  Python/numpy over the sf0.01 ``documents`` parquet — replicating
  Spark's numeric semantics exactly (md5-60bit token hash, integer
  bucket counts, float32 normalized values, LEFT-FOLD double sums in
  element order, BigDecimal HALF_UP rounding at 6 dp).

Writes ``oracle_values.py`` at the repo root, imported by
``__spark_entry__``. Re-run after changing the operators:

    python tools/gen_values_oracles.py
"""

from __future__ import annotations

import hashlib
import math
import os
import sys
from decimal import ROUND_HALF_UP, Decimal

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")


def _h60(s: str) -> int:
    """Python twin of hash64(col, fn='md5'): top 60 bits of md5."""
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


def _round6(x: float) -> Decimal:
    """Spark round(double, 6): BigDecimal.valueOf(x) (shortest decimal
    repr — identical to Python repr) setScale(6, HALF_UP)."""
    return Decimal(repr(x)).quantize(Decimal("0.000001"), ROUND_HALF_UP)


def gen_pdf_extract_rows() -> list[tuple]:
    from pdf_parser_spark.oracle import extract_document
    from pdf_parser_spark.synth import make_pdf_doc

    rows = []
    for doc_id in range(48):
        d = make_pdf_doc(14 + 20 * doc_id)  # same indices as the query
        o = extract_document(f"rstr://doc/{doc_id}", d.blob)
        rows.append(
            (
                o.url,
                o.n_pages,
                len(o.clauses or {}),
                len(o.table_pages or []),
                len(o.extracted_text or ""),
                o.error,
            )
        )
    return rows


def gen_embedding_pairs(
    sf_dir: str,
    threshold: float = 0.95,
    dim: int = 64,
    n_planes: int = 16,
) -> list[tuple]:
    import numpy as np
    import pyarrow.parquet as pq

    t = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    ids = t["doc_id"].to_pylist()
    texts = t["text"].to_pylist()

    rng = np.random.Generator(np.random.PCG64([7, dim, n_planes]))
    planes = rng.standard_normal((n_planes, dim)).tolist()

    embs: dict[int, tuple[list, int]] = {}
    for did, text in zip(ids, texts):
        # F.split(F.trim(text), " ") keeps inner empties; trim is
        # space-only (not python .strip(), which also eats \t\n)
        toks = [w for w in text.strip(" ").split(" ") if w]
        if not toks:
            continue  # no tokens -> absent from the groupBy -> no row
        counts = [0] * dim
        for w in toks:
            counts[_h60(w) % dim] += 1
        acc = 0.0
        for c in counts:  # interpreted-HOF fold: in-order double sum
            acc += float(c) * float(c)
        denom = max(math.sqrt(acc), 1e-12)
        emb = [float(np.float32(float(c) / denom)) for c in counts]
        bucket = 0
        for i, p in enumerate(planes):
            # _dot unrolled left fold, element order 1..dim
            a2 = emb[0] * p[0]
            for j in range(1, dim):
                a2 = a2 + emb[j] * p[j]
            if a2 > 0:
                bucket |= 1 << i
        embs[did] = (emb, bucket)

    def dot(a: list, b: list) -> float:
        a1 = a[0] * b[0]
        for j in range(1, dim):
            a1 = a1 + a[j] * b[j]
        return a1

    out = []
    dids = sorted(embs)
    for i, x in enumerate(dids):
        ea, ba = embs[x]
        for y in dids[i + 1 :]:
            eb, bb = embs[y]
            if (ba ^ bb).bit_count() > 1:  # multi-probe Hamming<=1
                continue
            cosv = dot(ea, eb) / (
                math.sqrt(dot(ea, ea)) * math.sqrt(dot(eb, eb))
            )
            r = _round6(cosv)
            if float(r) >= threshold:
                out.append((x, y, r))
    return out


def _sql_str(v) -> str:
    if v is None:
        return "NULL"
    return "'" + str(v).replace("'", "''") + "'"


def build() -> str:
    pdf_rows = gen_pdf_extract_rows()
    pdf_values = ",\n".join(
        f"  ({_sql_str(u)}, {np_}, {nc}, {nt}, {nch}, {_sql_str(err)})"
        for (u, np_, nc, nt, nch, err) in pdf_rows
    )
    pdf_sql = (
        "-- VALUES-ORACLE: single-process-oracle replay, "
        "tools/gen_values_oracles.py\n"
        "SELECT url, CAST(n_pages AS INT) AS n_pages,\n"
        "       CAST(n_clauses AS INT) AS n_clauses,\n"
        "       CAST(n_table_pages AS INT) AS n_table_pages,\n"
        "       CAST(n_chars AS INT) AS n_chars,\n"
        "       CAST(error AS VARCHAR) AS error\n"
        f"FROM (VALUES\n{pdf_values}\n"
        ") AS t(url, n_pages, n_clauses, n_table_pages, n_chars, error)"
    )

    emb_rows = gen_embedding_pairs(SF_DIR)
    if emb_rows:
        emb_values = ",\n".join(
            f"  ({a}, {b}, '{c}')" for (a, b, c) in emb_rows
        )
        emb_sql = (
            "-- VALUES-ORACLE(sf0.01): pure-python LSH replica, "
            "tools/gen_values_oracles.py\n"
            "SELECT CAST(id_a AS BIGINT) AS id_a, "
            "CAST(id_b AS BIGINT) AS id_b,\n"
            "       CAST(cosine AS DOUBLE) AS cosine\n"
            f"FROM (VALUES\n{emb_values}\n) AS t(id_a, id_b, cosine)"
        )
    else:
        emb_sql = (
            "-- VALUES-ORACLE(sf0.01): empty result\n"
            "SELECT CAST(NULL AS BIGINT) AS id_a, "
            "CAST(NULL AS BIGINT) AS id_b, "
            "CAST(NULL AS DOUBLE) AS cosine WHERE 1 = 0"
        )

    body = (
        '"""GENERATED by tools/gen_values_oracles.py — do not edit.\n\n'
        "VALUES-literal DuckDB oracles for the non-SQL-expressible\n"
        "contract queries, computed by independent pure-Python replicas\n"
        '(see the generator for the derivation).\n"""\n\n'
        f"PDF_EXTRACT_ORACLE = {pdf_sql!r}\n\n"
        f"EMBEDDING_NEAR_DUP_ORACLE = {emb_sql!r}\n"
    )
    out_path = os.path.join(REPO, "oracle_values.py")
    with open(out_path, "w") as f:
        f.write(body)
    return out_path


if __name__ == "__main__":
    p = build()
    print(p)
