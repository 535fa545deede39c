"""Content-defined chunking, production form: table-driven rolling
fingerprint in an Arrow-batched mapInPandas (q436).

q380 computes CDC boundaries with `md5(substr(text, p-3, 4))` inside a
JVM higher-order filter — bit-equal in SQL on both engines, but an md5
per position is the wrong constant factor at 100 TB. This module ships
the swap q380's docstring documents: the boundary fingerprint becomes
a 4-byte tabulation hash (Carter-Wegman tabulation hashing; the same
table-lookup scheme the gear/FastCDC family uses for its rolling
fingerprint) —

    fp(p) = T0[b(p-3)] ^ T1[b(p-2)] ^ T2[b(p-1)] ^ T3[b(p)]
    cut after p  iff  fp(p) % 32 == 0        (expected chunk ~32 chars)

One gather + three XORs per byte, fully vectorizable, and the boundary
CONTRACT is identical to q380's md5 form: a cut depends only on the
trailing 4-gram, so an insertion early in a document reshifts nothing
downstream — every boundary after the edit survives (asserted on the
fixture's insertion pair in tests/test_cdc_gear.py, for BOTH the
tabulated and the md5 fingerprint; the md5-form boundaries computed
here in Python are additionally asserted bit-identical to q380's SQL
boundary expression on the same corpus, which is the bridge proving
the Arrow path and the SQL path implement the same contract).

Grading follows the q110 fixture-bridge pattern: the corpus is
DETERMINISTIC (md5-driven segment choices, no RNG), so the expected
chunk census is a closed-form literal — the oracle is a VALUES
relation recomputed with an INDEPENDENT pure-Python implementation
(per-position hashlib arithmetic, no numpy, no shared rolling code).

At scale: boundary detection is embarrassingly parallel per document
(mapInPandas, no shuffle), and the census is one exchange keyed by
(source, chunk hash) with map-side partial aggregation — the same
downstream plan as q380.
"""

from __future__ import annotations

import hashlib

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cli_spark.plans.registry import register

MOD = 32  # boundary density: expected chunk length ~32 chars

# ---------------------------------------------------------------- tables
# Tabulation tables are the SPEC shared by engine and golden: position-
# keyed md5 of the byte value, truncated to 64 bits. Everything built
# from them (rolling eval, boundary census) is implemented twice and
# cross-asserted.


def _table_entry(k: int, b: int) -> int:
    return int(hashlib.md5(f"gear:{k}:{b}".encode()).hexdigest()[:16], 16)


_TABLES = [
    np.array([_table_entry(k, b) for b in range(256)], dtype=np.uint64)
    for k in range(4)
]


# ---------------------------------------------------------------- fixture
# Deterministic ASCII corpus: 3 sources x 14 docs of md5-chosen word
# segments, a 6-segment SHARED pool reused across docs (cross-document
# duplicate chunk mass — the redundancy CDC dedup reclaims), plus an
# insertion pair (doc 900/901: identical text except a 21-char insert
# near the front) demonstrating boundary survival past an edit.

_WORDS = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet "
    "kilo lima mike november oscar papa quebec romeo sierra tango "
    "uniform victor whiskey xray yankee zulu"
).split()


def _pick(tag: str, n: int) -> int:
    return int(hashlib.md5(tag.encode()).hexdigest()[:8], 16) % n


def _segment(seed: int, n_words: int) -> str:
    return " ".join(
        _WORDS[_pick(f"seg:{seed}:{j}", len(_WORDS))] for j in range(n_words)
    )


_SHARED = [_segment(1000 + k, 24) for k in range(6)]

SOURCES = ("web", "books", "code")


def corpus() -> list[tuple[int, str, str]]:
    rows: list[tuple[int, str, str]] = []
    doc_id = 0
    for s_idx, source in enumerate(SOURCES):
        for d in range(14):
            segs = []
            for k in range(3 + d % 4):
                h = _pick(f"doc:{source}:{d}:{k}", 3 * len(_SHARED))
                if h % 3 == 0:
                    segs.append(_SHARED[h // 3])
                else:
                    segs.append(_segment(s_idx * 1000 + d * 10 + k, 16 + h % 12))
            rows.append((doc_id, source, " ".join(segs)))
            doc_id += 1
    base = " ".join(_segment(7000 + k, 20) for k in range(5))
    rows.append((900, "web", base))
    rows.append((901, "web", base[:37] + "INSERTED-PREFIX-EDIT " + base[37:]))
    return rows


# ------------------------------------------------------------ engine path


def boundaries_np(data: bytes) -> np.ndarray:
    """Vectorized boundary positions (1-based cut-after offsets): one
    uint8 view, four table gathers, three XORs — no per-byte Python."""
    b = np.frombuffer(data, dtype=np.uint8)
    if b.size < 4:
        return np.empty(0, dtype=np.int64)
    fp = (
        _TABLES[0][b[:-3]]
        ^ _TABLES[1][b[1:-2]]
        ^ _TABLES[2][b[2:-1]]
        ^ _TABLES[3][b[3:]]
    )
    return (np.nonzero(fp % MOD == 0)[0] + 4).astype(np.int64)


def _chunk_rows(it):
    """mapInPandas kernel: per document, tabulated boundaries -> chunk
    (hash, length) rows. Module-level so cloudpickle ships it by
    reference and workers import it from the installed package."""
    import pandas as pd

    for pdf in it:
        srcs: list[str] = []
        hs: list[str] = []
        lens: list[int] = []
        for source, text in zip(pdf["source"], pdf["text"]):
            data = text.encode("utf-8")
            cuts = [0, *boundaries_np(data).tolist(), len(data)]
            for lo, hi in zip(cuts, cuts[1:]):
                if hi > lo:
                    srcs.append(source)
                    hs.append(hashlib.md5(data[lo:hi]).hexdigest())
                    lens.append(hi - lo)
        yield pd.DataFrame({"source": srcs, "h": hs, "clen": lens})


@register(
    "q436_gear_cdc_chunking",
    # Closed-form literal over the deterministic fixture corpus,
    # recomputed with the independent pure-Python golden (see
    # oracle_census() below and tests/test_cdc_gear.py) — the q110
    # fixture-bridge pattern.
    oracle="""
SELECT * FROM (VALUES
  ('books', 245, 178, 8226, 1539, 187089),
  ('code',  257, 196, 8343,  885, 106076),
  ('web',   303, 207, 9441, 1871, 198178)
) AS t(source, n_chunks, n_distinct_chunks, total_chars, dup_chars,
       dup_ppm)
""",
    tags=("dedup", "cdc", "chunking", "mapinpandas"),
)
def q436_gear_cdc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC chunk-dedup census, production boundary kernel [q380's
    documented swap]: tabulation-hash fingerprints in Arrow-batched
    mapInPandas (vectorized numpy, zero per-byte Python), then the
    exact q380 downstream — one exchange keyed by (source, chunk
    hash), map-side combine, per-source duplicate-mass rollup."""
    docs = spark.createDataFrame(
        corpus(), "doc_id long, source string, text string"
    ).repartition(8)
    chunks = docs.mapInPandas(_chunk_rows, "source string, h string, clen int")
    per_chunk = chunks.groupBy("source", "h").agg(
        F.count(F.lit(1)).alias("occ"), F.min("clen").alias("clen")
    )
    return per_chunk.groupBy("source").agg(
        F.sum("occ").cast("long").alias("n_chunks"),
        F.count(F.lit(1)).alias("n_distinct_chunks"),
        F.sum(F.col("occ") * F.col("clen")).cast("long").alias("total_chars"),
        F.sum((F.col("occ") - 1) * F.col("clen")).cast("long").alias("dup_chars"),
        (
            F.sum((F.col("occ") - 1) * F.col("clen")) * F.lit(1000000)
            / F.sum(F.col("occ") * F.col("clen"))
        )
        .cast("long")
        .alias("dup_ppm"),
    )


# ---------------------------------------------------------- golden path
# Independent implementations used by the oracle literal and the test
# suite: per-position hashlib arithmetic, no numpy, no shared rolling
# code with the engine kernel above.


def boundaries_golden(text: str) -> list[int]:
    data = text.encode("utf-8")
    out = []
    for p in range(4, len(data) + 1):
        fp = 0
        for k in range(4):
            fp ^= _table_entry(k, data[p - 4 + k])
        if fp % MOD == 0:
            out.append(p)
    return out


def boundaries_md5_golden(text: str) -> list[int]:
    """q380's md5-of-trailing-4-gram boundary rule, evaluated in
    Python — asserted bit-identical to the SQL expression in tests."""
    out = []
    for p in range(4, len(text) + 1):
        byte = int(hashlib.md5(text[p - 4 : p].encode()).hexdigest()[:2], 16)
        if byte % MOD == 0:
            out.append(p)
    return out


def oracle_census() -> dict[str, tuple[int, int, int, int, int]]:
    """Pure-Python census over the fixture corpus; the q436 oracle's
    VALUES rows are exactly this function's output."""
    per_chunk: dict[tuple[str, str], list[int]] = {}
    for _doc_id, source, text in corpus():
        data = text.encode("utf-8")
        cuts = [0, *boundaries_golden(text), len(data)]
        for lo, hi in zip(cuts, cuts[1:]):
            if hi > lo:
                key = (source, hashlib.md5(data[lo:hi]).hexdigest())
                rec = per_chunk.setdefault(key, [0, hi - lo])
                rec[0] += 1
    out: dict[str, tuple[int, int, int, int, int]] = {}
    for source in sorted(set(s for s, _ in per_chunk)):
        rows = [v for (s, _), v in per_chunk.items() if s == source]
        n_chunks = sum(occ for occ, _ in rows)
        n_distinct = len(rows)
        total = sum(occ * ln for occ, ln in rows)
        dup = sum((occ - 1) * ln for occ, ln in rows)
        out[source] = (n_chunks, n_distinct, total, dup, dup * 1000000 // total)
    return out
