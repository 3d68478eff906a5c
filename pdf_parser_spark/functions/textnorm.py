"""Unicode text normalization for web-crawl curation.

Raw crawl text arrives in mixed normalization forms (NFD from macOS
filenames and some CMSes, stray BOMs, C0 control bytes from broken
encodings, run-on whitespace). Training-data pipelines canonicalize
before hashing/dedup — otherwise visually identical documents hash
differently and dedup misses them.

Pipeline (order is part of the contract, both engines):
1. Unicode NFC composition — an Arrow kernel (Python ``unicodedata``);
   Spark's function library has no normalization builtin, and a kernel
   keeps it vectorized per batch instead of per-row JVM UDF calls.
2. strip C0 controls (except tab/newline, handled next), DEL, and the
   BOM/ZWNBSP — codegen ``regexp_replace`` with an explicit class
   (explicit ranges behave identically on Java regex and RE2).
3. collapse whitespace runs (space/tab/CR/LF) to one space — explicit
   class again, NOT ``\\s`` (Java ``\\s`` is ASCII-only, RE2/Python
   differ; the repo's cross-engine rule is "never \\s across engines").
4. trim.

Scale: shuffle-free end to end — one mapInPandas plus codegen
projections; normalization cost is linear per batch and embarrassingly
parallel. The DuckDB oracle recomputes the same chain with
``nfc_normalize`` + RE2 ``regexp_replace`` over the same raw VALUES —
two INDEPENDENT engines agreeing on the bytes, not a replayed literal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# class 2: C0 controls minus \t(09)/\n(0A)/\r(0D) — those are whitespace
# and handled by the collapse — plus DEL and BOM/ZWNBSP
_CTRL_JAVA = "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F\\uFEFF]"
_CTRL_RE2 = r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F\x{FEFF}]"
_WS_JAVA = "[ \\t\\r\\n]+"
_WS_RE2 = r"[ \t\r\n]+"


def normalize_text(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    form: str = "NFC",
) -> DataFrame:
    """Canonicalize a text column: NFC -> control/BOM strip ->
    whitespace collapse -> trim. Returns (doc_id, text_norm, changed)."""

    def nfc(batches):
        import unicodedata

        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "_raw": pdf[text_col],
                    "_nfc": [
                        unicodedata.normalize(form, t) if t is not None else None
                        for t in pdf[text_col]
                    ],
                }
            )

    id_type = df.schema[id_col].dataType.simpleString()
    out = df.select(F.col(id_col), F.col(text_col)).mapInPandas(
        nfc, schema=f"doc_id {id_type}, _raw string, _nfc string"
    )
    t = F.regexp_replace(F.col("_nfc"), _CTRL_JAVA, "")
    t = F.regexp_replace(t, _WS_JAVA, " ")
    t = F.trim(t)
    return out.select(
        "doc_id",
        t.alias("text_norm"),
        (t != F.col("_raw")).alias("changed"),
    )


def build_norm_probe() -> list[tuple[int, str]]:
    """Deterministic probe corpus exercising every normalization rule —
    shared by the contract query AND its DuckDB oracle generator (one
    source of truth for the raw inputs)."""
    return [
        (0, "plain ascii text stays untouched"),
        # NFD e+combining-acute / o+combining-circumflex -> NFC
        (1, "cafe\u0301 and ho\u0302tel"),
        # the same words already NFC -- must normalize to equal bytes
        (2, "caf\u00e9 and h\u00f4tel"),
        # BOM + C0 controls + DEL stripped
        (3, "\ufeffbom\x01 and\x02 controls\x7f here"),
        # whitespace runs: tabs, CRLF, multiple spaces -> single space
        (4, "a\t\tb\r\nc   d  e"),
        # leading/trailing whitespace trimmed
        (5, "   padded   "),
        # Hangul jamo sequence composes to syllables under NFC
        (6, "\u1112\u1161\u11ab\u1100\u116e\u11a8"),
        # Greek with combining acute
        (7, "\u03b1\u0301\u03b5\u0301"),
        # empty and whitespace-only
        (8, ""),
        (9, " \t "),
        # angstrom sign U+212B -> NFC canonical composition U+00C5
        (10, "unit: 10 \u212b wide"),
    ]


def mk_norm_oracle_sql() -> str:
    """DuckDB replica: same raw VALUES, nfc_normalize + RE2 regexes."""
    vals = ",\n  ".join(
        "({}, '{}')".format(i, s.replace("'", "''"))
        for i, s in build_norm_probe()
    )
    return f"""
WITH raw(doc_id, text) AS (VALUES
  {vals}
),
n AS (SELECT doc_id, text AS raw, nfc_normalize(text) AS t FROM raw)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       trim(regexp_replace(regexp_replace(t,
            '{_CTRL_RE2}', '', 'g'), '{_WS_RE2}', ' ', 'g')) AS text_norm,
       trim(regexp_replace(regexp_replace(t,
            '{_CTRL_RE2}', '', 'g'), '{_WS_RE2}', ' ', 'g')) != raw
         AS changed
FROM n
"""
