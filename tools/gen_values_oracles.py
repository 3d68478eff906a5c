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


def _dot_lf(a: list, b: list, dim: int) -> float:
    """Python twin of similarity._dot's unrolled left fold: products in
    element order, sequential double adds — the same IEEE op sequence
    whole-stage codegen emits."""
    acc = a[0] * b[0]
    for j in range(1, dim):
        acc = acc + a[j] * b[j]
    return acc


def _read_embeddings(sf_dir: str) -> tuple[list[int], list[list[float]]]:
    import pyarrow.parquet as pq

    t = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    ids = t["vec_id"].to_pylist()
    # float32 -> python float is exact widening, matching Spark's
    # element_at(...).cast('double')
    vecs = [[float(v) for v in e] for e in t["embedding"].to_pylist()]
    return ids, vecs


def _rank_topk(
    scored: dict[int, list[tuple[float, int]]], k: int
) -> list[tuple]:
    """row_number() over (ORDER BY cosine DESC, neighbor_id ASC), <=k."""
    out = []
    for qid in sorted(scored):
        ranked = sorted(scored[qid], key=lambda t: (-t[0], t[1]))
        for rank, (_, nid) in enumerate(ranked[:k], start=1):
            out.append((qid, nid, rank))
    return out


def gen_lsh_topk_rows(
    sf_dir: str,
    k: int = 5,
    n_planes: int = 8,
    dim: int = 64,
    n_tables: int = 4,
) -> list[tuple]:
    """Replica of similarity.lsh_cosine_topk (multi-table, Hamming<=1
    multi-probe) for queries vec_id < 10: a pair is a candidate iff some
    table's codes differ in at most one plane; exact cosine rerank."""
    import numpy as np

    ids, vecs = _read_embeddings(sf_dir)
    all_planes = []
    for t in range(n_tables):
        rng = np.random.Generator(np.random.PCG64([7 + t, dim, n_planes]))
        all_planes.append(
            [[float(x) for x in row] for row in rng.standard_normal((n_planes, dim))]
        )

    def codes(v: list) -> list[int]:
        out = []
        for planes in all_planes:
            b = 0
            for i, p in enumerate(planes):
                if _dot_lf(v, p, dim) > 0:
                    b |= 1 << i
            out.append(b)
        return out

    side = {
        vid: (v, codes(v), math.sqrt(_dot_lf(v, v, dim)))
        for vid, v in zip(ids, vecs)
    }
    scored: dict[int, list[tuple[float, int]]] = {}
    for qid in sorted(i for i in ids if i < 10):
        qv, qc, qn = side[qid]
        cands = []
        for nid, (cv, cc, cn) in side.items():
            if nid == qid:
                continue
            if not any((a ^ b).bit_count() <= 1 for a, b in zip(qc, cc)):
                continue
            cands.append((_dot_lf(qv, cv, dim) / (qn * cn), nid))
        if cands:
            scored[qid] = cands
    return _rank_topk(scored, k)


def gen_ivf_topk_rows(
    sf_dir: str,
    k: int = 5,
    nlist: int = 16,
    nprobe: int = 3,
    dim: int = 64,
    seed: int = 7,
    max_train: int = 512,
) -> list[tuple]:
    """Replica of similarity.ivf_cosine_topk for queries vec_id < 10.
    The coarse-quantizer fit is the SAME deterministic pure-numpy
    function the operator runs driver-side (shared derivation, like
    random_hyperplanes); assignment, probing and rerank are replicated
    independently with the engine's exact fold order."""
    import numpy as np

    from pdf_parser_spark.functions.similarity import ivf_fit_centroids

    ids, vecs = _read_embeddings(sf_dir)
    order = sorted(range(len(ids)), key=lambda i: ids[i])
    train = np.array(
        [vecs[i] for i in order[:max_train]], dtype=np.float64
    )
    centroids = ivf_fit_centroids(train, nlist, seed=seed)
    c_sq = [sum(x * x for x in c) for c in centroids]  # plan-time literal

    def nearest(v: list, n: int) -> list[int]:
        dvv = _dot_lf(v, v, dim)
        ds = []
        for li, c in enumerate(centroids):
            ds.append(((dvv - 2 * _dot_lf(v, c, dim)) + c_sq[li], li))
        ds.sort()  # (d2, list_id) — array_sort's struct order
        return [li for _, li in ds[:n]]

    side = {
        vid: (v, nearest(v, 1)[0], math.sqrt(_dot_lf(v, v, dim)))
        for vid, v in zip(ids, vecs)
    }
    scored: dict[int, list[tuple[float, int]]] = {}
    for qid in sorted(i for i in ids if i < 10):
        qv, _, qn = side[qid]
        probes = set(nearest(qv, nprobe))
        cands = []
        for nid, (cv, clist, cn) in side.items():
            if nid == qid or clist not in probes:
                continue
            cands.append((_dot_lf(qv, cv, dim) / (qn * cn), nid))
        if cands:
            scored[qid] = cands
    return _rank_topk(scored, k)


def gen_q8_topk_rows(sf_dir: str, k: int = 5, dim: int = 64) -> list[tuple]:
    """Replica of similarity.q8_cosine_topk for queries vec_id < 10:
    symmetric int8 quantization (np.rint — IEEE round-half-even, the
    same op the kernel runs), EXACT integer dots in python bignums, and
    norms via math.sqrt of the exact integer square sum (the kernel's
    float64 sum of int-valued squares is exact below 2^53, so both
    engines feed sqrt the same value)."""
    import numpy as np

    ids, vecs = _read_embeddings(sf_dir)

    def quant(v: list):
        V = np.asarray(v, dtype=np.float64)
        s = np.abs(V).max() / 127.0
        if s == 0.0:
            s = 1.0
        q = [int(x) for x in np.rint(V / s)]
        return q, math.sqrt(sum(x * x for x in q))

    side = {vid: quant(v) for vid, v in zip(ids, vecs)}
    scored: dict[int, list[tuple[float, int]]] = {}
    for qid in sorted(i for i in ids if i < 10):
        qq, qn = side[qid]
        cands = []
        for nid, (cq, cn) in side.items():
            if nid == qid:
                continue
            dot = 0
            for j in range(dim):
                dot += qq[j] * cq[j]
            cands.append((float(dot) / (qn * cn), nid))
        scored[qid] = cands
    return _rank_topk(scored, k)


def gen_multimodal_rows(n: int = 24) -> list[tuple]:
    """Expected features for build_demo_media, computed with INDEPENDENT
    stdlib integer arithmetic from the SOURCE arrays (uint8/int16 sums
    are exact in both int and float64-pairwise summation, so these equal
    the engine's numpy means bit-for-bit) — never through the decode
    path under test."""
    import numpy as np

    rows = []
    for i in range(n):
        kind = i % 6
        if kind == 0:  # FAKE image
            w, h, c = 16 + i, 12, (i % 3) + 1
            rng = np.random.Generator(np.random.PCG64(i))
            px = rng.integers(0, 256, (h, w, c), dtype=np.uint8)
            mean = int(px.sum(dtype=np.int64)) / px.size
            rows.append(
                (i, "image", w, h, c, None, None, None, _round6(mean), None)
            )
        elif kind == 1:  # FAKE audio
            nsamp = 1000 + i
            rng = np.random.Generator(np.random.PCG64(i))
            s = rng.integers(-(2**15), 2**15, nsamp, dtype=np.int16)
            mean = sum(abs(int(x)) for x in s) / nsamp
            rows.append(
                (i, "audio", None, None, None, None, 8000,
                 _round6(nsamp / 8000), _round6(mean), None)
            )
        elif kind == 2:  # FAKE video (every 2nd frame sampled)
            w, h, nf = 8, 6, 5 + (i % 4)
            rng = np.random.Generator(np.random.PCG64(i))
            f = rng.integers(0, 256, (nf, h, w), dtype=np.uint8)
            sampled = f[::2]
            mean = int(sampled.sum(dtype=np.int64)) / sampled.size
            rows.append(
                (i, "video", w, h, None, nf, None, None, _round6(mean), None)
            )
        elif kind == 3:  # real BMP
            h, w = 10 + i % 5, 7 + i % 3
            rng = np.random.Generator(np.random.PCG64([91, i]))
            px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            mean = int(px.sum(dtype=np.int64)) / px.size
            rows.append(
                (i, "image", w, h, 3, None, None, None, _round6(mean), None)
            )
        elif kind == 4:  # real WAV
            nsamp = 500 + i
            rng = np.random.Generator(np.random.PCG64([92, i]))
            s = rng.integers(-30000, 30000, nsamp, dtype=np.int16)
            mean = sum(abs(int(x)) for x in s) / nsamp
            rows.append(
                (i, "audio", None, None, None, None, 16000,
                 _round6(nsamp / 16000), _round6(mean), None)
            )
        else:  # real PNG
            c = (i % 4) + 1
            rng = np.random.Generator(np.random.PCG64([93, i]))
            px = rng.integers(0, 256, (9, 11, c), dtype=np.uint8)
            mean = int(px.sum(dtype=np.int64)) / px.size
            rows.append(
                (i, "image", 11, 9, c, None, None, None, _round6(mean), None)
            )
    rows.append((n, None, None, None, None, None, None, None, None, "no_codec"))
    rows.append(
        (n + 1, None, None, None, None, None, None, None, None, "bad_media")
    )
    # header-probe rows (build_demo_media n+2/n+3): metadata comes from
    # the JFIF/BMFF structures the encoders write — restated here as the
    # literal values those headers carry, never through the probe code
    rows.append(
        (n + 2, "image", 640, 480, 3, None, None, None, None,
         "decode_stubbed")
    )
    rows.append(
        (n + 3, "video", 1280, 720, None, 300, None, _round6(6000 / 600),
         None, "decode_stubbed")
    )
    return rows


def gen_pq_topk_rows(
    sf_dir: str,
    k: int = 5,
    m: int = 8,
    ksub: int = 16,
    rerank: int = 32,
    dim: int = 64,
    seed: int = 7,
    max_train: int = 512,
) -> list[tuple]:
    """Replica of similarity.pq_cosine_topk for queries vec_id < 10.
    Codebook fit is the SHARED pq_fit_codebooks on the same normalized
    float64 sample (the ivf_fit_centroids sharing pattern); code
    assignment, LUT scoring (subspace-order fold), candidate cut and
    exact rerank are replicated independently with the engine's exact
    fold order and tie rules."""
    import numpy as np

    from pdf_parser_spark.functions.similarity import pq_fit_codebooks

    ids, vecs = _read_embeddings(sf_dir)
    dsub = dim // m

    def norml(v: list) -> tuple[list, float]:
        n = math.sqrt(_dot_lf(v, v, dim))
        return [x / (n if n else 1.0) for x in v], n

    order = sorted(range(len(ids)), key=lambda i: ids[i])
    train_n = np.array(
        [norml(vecs[i])[0] for i in order[:max_train]], dtype=np.float64
    )
    codebooks = pq_fit_codebooks(train_n, m, ksub, seed=seed)
    c_sq = [
        [sum(x * x for x in c) for c in cb] for cb in codebooks
    ]

    def assign(vn: list) -> list[int]:
        codes = []
        for j in range(m):
            sub = vn[j * dsub : (j + 1) * dsub]
            dvv = _dot_lf(sub, sub, dsub)
            ds = []
            for ci, c in enumerate(codebooks[j]):
                ds.append(
                    ((dvv - 2 * _dot_lf(sub, c, dsub)) + c_sq[j][ci], ci)
                )
            ds.sort()  # ties -> lowest code id
            codes.append(ds[0][1])
        return codes

    side = {}
    for vid, v in zip(ids, vecs):
        vn, n = norml(v)
        side[vid] = (v, assign(vn), n)

    out_scored: dict[int, list[tuple[float, int]]] = {}
    for qid in sorted(i for i in ids if i < 10):
        qv, _, qn = side[qid]
        qnv = [x / (qn if qn else 1.0) for x in qv]
        lut = [
            [
                _dot_lf(qnv[j * dsub : (j + 1) * dsub], c, dsub)
                for c in codebooks[j]
            ]
            for j in range(m)
        ]
        approx = []
        for nid, (cv, codes, cn) in side.items():
            if nid == qid:
                continue
            s = lut[0][codes[0]]
            for j in range(1, m):
                s = s + lut[j][codes[j]]
            approx.append((s, nid))
        approx.sort(key=lambda t: (-t[0], t[1]))
        cands = []
        for _, nid in approx[:rerank]:
            cv, _, cn = side[nid]
            cands.append((_dot_lf(qv, cv, dim) / (qn * cn), nid))
        if cands:
            out_scored[qid] = cands
    return _rank_topk(out_scored, k)


def gen_bpe_apply_rows(
    sf_dir: str, n_merges: int = 200, top_words: int = 4096
) -> list[tuple]:
    """Pure-Python replica of __spark_entry__.q_bpe_apply: word counts
    via Counter over the SAME Python-re pre-tokenizer, the same total
    (cnt desc, word asc) top-words cut, the same shared learn/encode
    kernel (kernels/bpe.py) — no Spark involved."""
    from collections import Counter

    import pyarrow.parquet as pq

    from pdf_parser_spark.kernels.bpe import (
        encode,
        h60,
        learn_merges,
        pretokenize,
    )

    t = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    ids = t["doc_id"].to_pylist()
    texts = t["text"].to_pylist()
    c: Counter = Counter()
    for txt in texts:
        c.update(pretokenize(txt))
    top = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:top_words]
    merges = learn_merges(dict(top), n_merges)
    ranks = {p: i for i, p in enumerate(merges)}
    memo: dict = {}
    rows = []
    for doc_id, txt in zip(ids, texts):
        toks = encode(txt, ranks, memo)
        rows.append(
            (doc_id, len(toks), len(set(toks)), h60("\x1f".join(toks)))
        )
    return rows


def gen_compression_rows(sf_dir: str) -> list[tuple]:
    """Pure-Python replica of quality.compression_ratio (zlib level 6)
    over the documents table: (doc_id, n_bytes, n_compressed,
    ratio[4dp, Spark HALF_UP rounding])."""
    import zlib

    import duckdb

    rows = duckdb.sql(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet' "
        "ORDER BY doc_id"
    ).fetchall()
    out = []
    for doc_id, text in rows:
        raw = (text or "").encode("utf-8")
        nb = len(raw)
        nc = len(zlib.compress(raw, 6)) if nb else 0
        ratio = (
            Decimal(repr(nc / nb)).quantize(Decimal("0.0001"), ROUND_HALF_UP)
            if nb
            else Decimal("0.0")
        )
        out.append((doc_id, nb, nc, ratio))
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

    def topk_sql(rows: list[tuple], label: str) -> str:
        vals = ",\n".join(f"  ({q}, {n}, {r})" for (q, n, r) in rows)
        return (
            f"-- VALUES-ORACLE(sf0.01): pure-python {label} replica, "
            "tools/gen_values_oracles.py\n"
            "SELECT CAST(query_id AS BIGINT) AS query_id,\n"
            "       CAST(neighbor_id AS BIGINT) AS neighbor_id,\n"
            "       CAST(rank AS INT) AS rank\n"
            f"FROM (VALUES\n{vals}\n) AS t(query_id, neighbor_id, rank)"
        )

    lsh_sql = topk_sql(gen_lsh_topk_rows(SF_DIR), "SRP-LSH top-k")
    ivf_sql = topk_sql(gen_ivf_topk_rows(SF_DIR), "IVF top-k")
    q8_sql = topk_sql(gen_q8_topk_rows(SF_DIR), "int8-quantized top-k")
    pq_sql = topk_sql(gen_pq_topk_rows(SF_DIR), "product-quantization top-k")

    bpe_rows = gen_bpe_apply_rows(SF_DIR)
    bpe_values = ",\n".join(
        f"  ({i}, {nt}, {nd}, {th})" for (i, nt, nd, th) in bpe_rows
    )
    bpe_sql = (
        "-- VALUES-ORACLE(sf0.01): pure-python BPE replica "
        "(shared kernels/bpe.py), tools/gen_values_oracles.py\n"
        "SELECT CAST(doc_id AS BIGINT) AS doc_id,\n"
        "       CAST(n_tokens AS INT) AS n_tokens,\n"
        "       CAST(n_token_types AS INT) AS n_token_types,\n"
        "       CAST(tokens_h AS BIGINT) AS tokens_h\n"
        f"FROM (VALUES\n{bpe_values}\n"
        ") AS t(doc_id, n_tokens, n_token_types, tokens_h)"
    )

    comp_rows = gen_compression_rows(SF_DIR)
    comp_values = ",\n".join(
        f"  ({i}, {nb}, {nc}, {r})" for (i, nb, nc, r) in comp_rows
    )
    comp_sql = (
        "-- VALUES-ORACLE(sf0.01): pure-python zlib replica, "
        "tools/gen_values_oracles.py\n"
        "SELECT CAST(doc_id AS BIGINT) AS doc_id,\n"
        "       CAST(n_bytes AS BIGINT) AS n_bytes,\n"
        "       CAST(n_compressed AS BIGINT) AS n_compressed,\n"
        "       CAST(ratio AS DOUBLE) AS ratio\n"
        f"FROM (VALUES\n{comp_values}\n"
        ") AS t(doc_id, n_bytes, n_compressed, ratio)"
    )

    mm_rows = gen_multimodal_rows()
    def _cell(v):
        if v is None:
            return "NULL"
        if isinstance(v, str):
            return _sql_str(v)
        return f"'{v}'" if not isinstance(v, int) else str(v)

    mm_values = ",\n".join(
        "  (" + ", ".join(_cell(c) for c in row) + ")" for row in mm_rows
    )
    mm_sql = (
        "-- VALUES-ORACLE: independent stdlib-arithmetic replica, "
        "tools/gen_values_oracles.py\n"
        "SELECT CAST(media_id AS BIGINT) AS media_id,\n"
        "       CAST(kind AS VARCHAR) AS kind,\n"
        "       CAST(width AS INT) AS width, CAST(height AS INT) AS height,\n"
        "       CAST(channels AS INT) AS channels,\n"
        "       CAST(n_frames AS INT) AS n_frames,\n"
        "       CAST(sample_rate AS INT) AS sample_rate,\n"
        "       CAST(duration_s AS DOUBLE) AS duration_s,\n"
        "       CAST(mean_intensity AS DOUBLE) AS mean_intensity,\n"
        "       CAST(error_class AS VARCHAR) AS error_class\n"
        f"FROM (VALUES\n{mm_values}\n"
        ") AS t(media_id, kind, width, height, channels, n_frames, "
        "sample_rate, duration_s, mean_intensity, error_class)"
    )

    body = (
        '"""GENERATED by tools/gen_values_oracles.py — do not edit.\n\n'
        "VALUES-literal DuckDB oracles for the non-SQL-expressible\n"
        "contract queries, computed by independent pure-Python replicas\n"
        '(see the generator for the derivation).\n"""\n\n'
        f"PDF_EXTRACT_ORACLE = {pdf_sql!r}\n\n"
        f"EMBEDDING_NEAR_DUP_ORACLE = {emb_sql!r}\n\n"
        f"MULTIMODAL_ORACLE = {mm_sql!r}\n\n"
        f"LSH_TOPK_ORACLE = {lsh_sql!r}\n\n"
        f"IVF_TOPK_ORACLE = {ivf_sql!r}\n\n"
        f"Q8_TOPK_ORACLE = {q8_sql!r}\n\n"
        f"PQ_TOPK_ORACLE = {pq_sql!r}\n\n"
        f"BPE_APPLY_ORACLE = {bpe_sql!r}\n\n"
        f"COMPRESSION_ORACLE = {comp_sql!r}\n"
    )
    return body


def write(out_path: str | None = None) -> str:
    out_path = out_path or os.path.join(REPO, "oracle_values.py")
    with open(out_path, "w") as f:
        f.write(build())
    return out_path


if __name__ == "__main__":
    print(write())
