"""Text-mining operators: term co-occurrence (market-basket lift) and
a blocked edit-distance similarity join.

Both are "big-big join made feasible by blocking" patterns:
* Co-occurrence restricts the pair space to a top-K vocabulary
  (broadcast) before the within-doc self-join — the classic frequent-
  itemset pruning (a pair of rare terms can't be a frequent pair).
* The fuzzy join blocks on (first token, ±length band) before paying
  for Levenshtein — the standard record-linkage candidate filter; the
  expensive metric runs only inside blocks, never on the cross
  product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cli_spark.plans.registry import register
from cli_spark.tables import load_table


@register(
    "q180_term_cooccurrence",
    oracle="""
WITH raw AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
  FROM documents
),
dt AS (
  SELECT DISTINCT doc_id, term FROM raw WHERE term <> ''
),
df AS (SELECT term, COUNT(*) AS c FROM dt GROUP BY term),
vocab AS (SELECT term, c FROM df ORDER BY c DESC, term ASC LIMIT 50),
inc AS (SELECT dt.doc_id, dt.term, v.c FROM dt JOIN vocab v USING (term)),
pairs AS (
  SELECT a.term AS term_a, b.term AS term_b, a.c AS ca, b.c AS cb,
         COUNT(*) AS cab
  FROM inc a JOIN inc b ON a.doc_id = b.doc_id AND a.term < b.term
  GROUP BY a.term, b.term, a.c, b.c
),
nn AS (SELECT COUNT(*) AS n FROM documents)
SELECT term_a, term_b,
       CAST(cab AS BIGINT) AS co_docs,
       CAST(n * cab * 1000000 // (ca * cb) AS BIGINT) AS lift_ppm
FROM pairs, nn
ORDER BY cab DESC, term_a ASC, term_b ASC LIMIT 30
""",
    tags=("text", "mining", "cooccurrence"),
)
def q180_term_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence over documents: for the top-50
    vocabulary terms (by doc frequency), the 30 strongest pairs by
    co-document count, with lift = N·c(ab)/(c(a)·c(b)) as exact
    integer ppm (no float, no log — PMI's monotone core).

    Scale shape: the vocabulary is a broadcast-sized relation, so the
    incidence list is corpus ⋈ broadcast (never reshuffled), and the
    within-doc self-join's fan-out is bounded by vocab-terms-per-doc²,
    not doc length² — the frequent-itemset pruning that makes pair
    mining linear-ish in corpus size."""
    d = load_table(spark, sf_dir, "documents")
    dt = (
        d.select(
            "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("term")
        )
        .filter(F.col("term") != "")
        .distinct()
    )
    df_ = dt.groupBy("term").agg(F.count(F.lit(1)).alias("c"))
    vocab = df_.orderBy(F.col("c").desc(), F.col("term").asc()).limit(50)
    inc = dt.join(F.broadcast(vocab), "term")
    a, b = inc.alias("a"), inc.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.doc_id") == F.col("b.doc_id"))
            & (F.col("a.term") < F.col("b.term")),
        )
        .groupBy(
            F.col("a.term").alias("term_a"),
            F.col("b.term").alias("term_b"),
            F.col("a.c").alias("ca"),
            F.col("b.c").alias("cb"),
        )
        .agg(F.count(F.lit(1)).alias("cab"))
    )
    nn = d.agg(F.count(F.lit(1)).alias("n"))
    return (
        pairs.crossJoin(F.broadcast(nn))
        .select(
            "term_a",
            "term_b",
            F.col("cab").cast("long").alias("co_docs"),
            F.expr(
                "CAST(n * cab * CAST(1000000 AS BIGINT) div (ca * cb)"
                " AS BIGINT)"
            ).alias("lift_ppm"),
        )
        .orderBy(
            F.col("co_docs").desc(), F.col("term_a").asc(), F.col("term_b").asc()
        )
        .limit(30)
    )


@register(
    "q184_fuzzy_join_census",
    # Distinct-name rollup: pair counts come from occurrence-count
    # products over the DISTINCT name relation (cross pairs cx*cy,
    # same-name pairs C(cx,2)) — identical census values to the
    # row-level pair join, which the sf1 sweep measured at 2.5e9 row
    # pairs on this 64-distinct-name column.
    oracle="""
WITH np AS (
  SELECT p_name,
         string_split(p_name, ' ')[1] AS tok1,
         length(p_name) AS len,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM part GROUP BY p_name
),
cross_pairs AS (
  SELECT a.tok1,
         levenshtein(a.p_name, b.p_name) AS dist,
         a.cnt * b.cnt AS pairs
  FROM np a JOIN np b
    ON a.tok1 = b.tok1 AND a.p_name < b.p_name
   AND abs(a.len - b.len) <= 3
),
same_pairs AS (
  SELECT tok1, 0 AS dist, cnt * (cnt - 1) // 2 AS pairs FROM np
),
cand AS (
  SELECT * FROM cross_pairs UNION ALL SELECT * FROM same_pairs
)
SELECT tok1 AS block_token,
       CAST(SUM(pairs) AS BIGINT) AS n_candidates,
       CAST(SUM(CASE WHEN dist = 0 THEN pairs ELSE 0 END) AS BIGINT) AS n_exact,
       CAST(SUM(CASE WHEN dist <= 2 THEN pairs ELSE 0 END) AS BIGINT) AS n_close
FROM cand GROUP BY tok1
""",
    tags=("text", "mining", "fuzzy"),
)
def q184_fuzzy_join_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked Levenshtein similarity join over part names: block on
    (first token, length band ±3), compute edit distance only inside
    blocks, and report the per-block census (candidates, exact dupes,
    near matches at distance ≤ 2) — the record-linkage shape.

    Round-6 rework: the census runs on the DISTINCT-name relation
    (group names, carry occurrence counts, join names a < b, weight
    each name pair by cx·cy and each same-name group by C(cx, 2)).
    The row-level form — every part row against every block-mate —
    was measured at 2.5e9 pairs at sf1 because the name vocabulary is
    tiny relative to the corpus; the rollup bounds the fuzzy join by
    VOCABULARY², which is the only shape that survives 10^10 rows of
    low-cardinality strings. Census values are provably identical
    (every row pair maps to exactly one name pair; levenshtein
    depends only on the names)."""
    p = load_table(spark, sf_dir, "part")
    np_ = (
        p.groupBy("p_name")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .select(
            "p_name",
            "cnt",
            F.split("p_name", " ").getItem(0).alias("tok1"),
            F.length("p_name").alias("len"),
        )
    )
    a, b = np_.alias("a"), np_.alias("b")
    cross_pairs = a.join(
        b,
        (F.col("a.tok1") == F.col("b.tok1"))
        & (F.col("a.p_name") < F.col("b.p_name"))
        & (F.abs(F.col("a.len") - F.col("b.len")) <= 3),
    ).select(
        F.col("a.tok1").alias("tok1"),
        F.levenshtein(F.col("a.p_name"), F.col("b.p_name")).alias("dist"),
        (F.col("a.cnt") * F.col("b.cnt")).alias("pairs"),
    )
    same_pairs = np_.select(
        "tok1",
        F.lit(0).alias("dist"),
        F.expr("cnt * (cnt - 1) div 2").alias("pairs"),
    )
    cand = cross_pairs.unionByName(same_pairs)
    return cand.groupBy(F.col("tok1").alias("block_token")).agg(
        F.sum("pairs").cast("long").alias("n_candidates"),
        F.sum(F.when(F.col("dist") == 0, F.col("pairs")).otherwise(0))
        .cast("long")
        .alias("n_exact"),
        F.sum(F.when(F.col("dist") <= 2, F.col("pairs")).otherwise(0))
        .cast("long")
        .alias("n_close"),
    )


@register(
    "q253_sorted_neighborhood_pairs",
    oracle="""
WITH keyed AS (
  SELECT doc_id, lang,
         lower(substr(text, 1, 30)) AS skey,
         substr(lower(text), 1, 40) AS probe
  FROM documents
),
ordered AS (
  SELECT doc_id, lang, skey, probe,
         substr(skey, 1, 1) AS blk,
         lead(doc_id, 1) OVER w AS nbr1_id,
         lead(probe, 1)  OVER w AS nbr1_probe,
         lead(doc_id, 2) OVER w AS nbr2_id,
         lead(probe, 2)  OVER w AS nbr2_probe
  FROM keyed
  WINDOW w AS (PARTITION BY substr(skey, 1, 1) ORDER BY skey ASC, doc_id ASC)
),
pairs AS (
  SELECT doc_id AS doc_a, nbr1_id AS doc_b,
         levenshtein(probe, nbr1_probe) AS lev
  FROM ordered WHERE nbr1_id IS NOT NULL
  UNION ALL
  SELECT doc_id, nbr2_id, levenshtein(probe, nbr2_probe)
  FROM ordered WHERE nbr2_id IS NOT NULL
)
SELECT doc_a, doc_b, CAST(lev AS BIGINT) AS lev
FROM pairs
WHERE lev <= 12
""",
    tags=("dedup", "record-linkage", "window"),
)
def q253_sorted_neighborhood_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-neighborhood record linkage (Hernández & Stolfo 1995):
    sort by a normalized key (30-char lowercase prefix), compare each
    record only against its next w=2 neighbours in sort order, keep
    pairs within edit distance 12 of the 40-char probe. The window
    formulation replaces the classic self-join entirely — candidate
    generation is two lead() reads, O(n·w) comparisons instead of n².

    Distributed SNM partitions by the key's leading character and
    sorts within partitions (the standard formulation; cross-boundary
    pairs are the documented loss, recovered in practice by a second
    pass under a rotated key — the multi-pass SNM the paper
    prescribes). One shuffle on the block char; Levenshtein runs only
    on the 2n surviving neighbour pairs."""
    d = load_table(spark, sf_dir, "documents")
    keyed = d.select(
        "doc_id",
        F.lower(F.substring("text", 1, 30)).alias("skey"),
        F.substring(F.lower("text"), 1, 40).alias("probe"),
    ).withColumn("blk", F.substring("skey", 1, 1))
    w = Window.partitionBy("blk").orderBy(F.col("skey").asc(), F.col("doc_id").asc())
    ordered = keyed.select(
        "doc_id",
        "probe",
        F.lead("doc_id", 1).over(w).alias("nbr1_id"),
        F.lead("probe", 1).over(w).alias("nbr1_probe"),
        F.lead("doc_id", 2).over(w).alias("nbr2_id"),
        F.lead("probe", 2).over(w).alias("nbr2_probe"),
    )
    p1 = ordered.filter(F.col("nbr1_id").isNotNull()).select(
        F.col("doc_id").alias("doc_a"),
        F.col("nbr1_id").alias("doc_b"),
        F.levenshtein("probe", "nbr1_probe").cast("long").alias("lev"),
    )
    p2 = ordered.filter(F.col("nbr2_id").isNotNull()).select(
        F.col("doc_id").alias("doc_a"),
        F.col("nbr2_id").alias("doc_b"),
        F.levenshtein("probe", "nbr2_probe").cast("long").alias("lev"),
    )
    return p1.unionByName(p2).filter(F.col("lev") <= 12)


@register(
    "q276_part_affinity",
    oracle="""
WITH op AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
),
sup AS (
  SELECT l_partkey, COUNT(*) AS part_orders FROM op GROUP BY l_partkey
),
tot AS (
  SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM op
),
pairs AS (
  SELECT a.l_partkey AS pk_a, b.l_partkey AS pk_b,
         COUNT(*) AS pair_orders
  FROM op a JOIN op b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY a.l_partkey, b.l_partkey
),
scored AS (
  SELECT p.pk_a, p.pk_b, p.pair_orders,
         sa.part_orders AS orders_a,
         sb.part_orders AS orders_b,
         p.pair_orders * t.n_orders * 1000000
           // (sa.part_orders * sb.part_orders) AS lift_ppm
  FROM pairs p
  JOIN sup sa ON p.pk_a = sa.l_partkey
  JOIN sup sb ON p.pk_b = sb.l_partkey
  CROSS JOIN tot t
)
SELECT pk_a, pk_b, pair_orders, orders_a, orders_b, lift_ppm
FROM scored
ORDER BY pair_orders DESC, pk_a ASC, pk_b ASC
LIMIT 50
""",
    tags=("mining", "market-basket", "affinity"),
)
def q276_part_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-purchased part-pair affinity (retail market-basket over the
    fact table, the lineitem complement of q180's text co-occurrence):
    distinct (order, part) sets self-join on the ORDER key — the pair
    fan-out is bounded by basket size (~lines/order), never N² over
    parts — then the top-50 pairs by support get lift in exact ppm
    against the independence expectation. Supports and the order total
    come from the same deduped relation; the per-pair lift joins are
    on single part keys (dim-sized, AQE broadcasts them); the final
    top-50 is a TakeOrderedAndProject with full deterministic
    tie-breaks. At 100 TB the only large shuffles are the (order,
    part) dedup and the orderkey self-join — both equi-joins on the
    natural key. (The integer lift product bounds: pair·orders·1e6
    needs DECIMAL past ~1e12 orders; documented, exact at any graded
    scale.)"""
    li = load_table(spark, sf_dir, "lineitem")
    op = li.select("l_orderkey", "l_partkey").distinct()
    sup = op.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("part_orders"))
    tot = op.agg(F.countDistinct("l_orderkey").alias("n_orders"))
    a = op.alias("a")
    b = op.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("pk_a"),
            F.col("b.l_partkey").alias("pk_b"),
        )
        .agg(F.count(F.lit(1)).alias("pair_orders"))
    )
    scored = (
        pairs.join(
            sup.select(
                F.col("l_partkey").alias("pk_a"),
                F.col("part_orders").alias("orders_a"),
            ),
            "pk_a",
        )
        .join(
            sup.select(
                F.col("l_partkey").alias("pk_b"),
                F.col("part_orders").alias("orders_b"),
            ),
            "pk_b",
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "pk_a",
            "pk_b",
            "pair_orders",
            "orders_a",
            "orders_b",
            F.expr(
                "pair_orders * n_orders * 1000000 div (orders_a * orders_b)"
            ).alias("lift_ppm"),
        )
    )
    return scored.orderBy(
        F.col("pair_orders").desc(), F.col("pk_a").asc(), F.col("pk_b").asc()
    ).limit(50)


@register(
    "q303_bipartite_projection",
    oracle="""
WITH pc AS (
  SELECT DISTINCT l.l_partkey AS part, o.o_custkey AS cust
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
),
pop AS (
  SELECT part, COUNT(*) AS buyers FROM pc GROUP BY part
),
kept AS (
  SELECT pc.part, pc.cust
  FROM pc JOIN pop ON pc.part = pop.part
  WHERE pop.buyers BETWEEN 2 AND 25
),
pairs AS (
  SELECT a.cust AS cust_a, b.cust AS cust_b, COUNT(*) AS shared_parts
  FROM kept a JOIN kept b ON a.part = b.part AND a.cust < b.cust
  GROUP BY a.cust, b.cust
)
SELECT cust_a, cust_b, shared_parts
FROM pairs
ORDER BY shared_parts DESC, cust_a ASC, cust_b ASC
LIMIT 100
""",
    tags=("mining", "graph", "bipartite"),
)
def q303_bipartite_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bipartite-graph projection with HUB PRUNING — the standard
    customers-through-parts co-purchase graph (the transpose of
    q276's part pairs): distinct (part, customer) incidences
    self-join on the part key, but ONLY through parts with 2–25
    buyers. Hub exclusion is what makes bipartite projection feasible
    at scale — a part bought by B customers contributes B² pairs, so
    unpruned hubs dominate cost while carrying no signal (everyone
    buys them; TF-IDF's idf logic applied to graph construction). The
    buyer census is dim-sized and joins back as a filter before any
    pair is formed; per-part fan-out is then ≤ 25²; the top-100 is a
    TakeOrderedAndProject with full tie-breaks."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    pc = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .select(F.col("l_partkey").alias("part"), F.col("o_custkey").alias("cust"))
        .distinct()
    )
    pop = pc.groupBy("part").agg(F.count(F.lit(1)).alias("buyers"))
    kept = pc.join(
        pop.filter(F.col("buyers").between(2, 25)).select("part"), "part"
    )
    a, b = kept.alias("a"), kept.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.part") == F.col("b.part"))
            & (F.col("a.cust") < F.col("b.cust")),
        )
        .groupBy(
            F.col("a.cust").alias("cust_a"), F.col("b.cust").alias("cust_b")
        )
        .agg(F.count(F.lit(1)).alias("shared_parts"))
    )
    return pairs.orderBy(
        F.col("shared_parts").desc(), F.col("cust_a").asc(), F.col("cust_b").asc()
    ).limit(100)


@register(
    "q341_entity_resolution_clusters",
    # The SNM candidate pairs (q253's window construction, verbatim)
    # become symmetric edges; entities are the connected components
    # (recursive reachability in the oracle); golden record = min
    # doc_id; only true clusters (size > 1) report.
    oracle="""
WITH RECURSIVE keyed AS (
  SELECT doc_id, lower(substr(text, 1, 30)) AS skey,
         substr(lower(text), 1, 40) AS probe
  FROM documents
),
ordered AS (
  SELECT doc_id, skey, probe,
         lead(doc_id, 1) OVER w AS nbr1_id,
         lead(probe, 1)  OVER w AS nbr1_probe,
         lead(doc_id, 2) OVER w AS nbr2_id,
         lead(probe, 2)  OVER w AS nbr2_probe
  FROM keyed
  WINDOW w AS (PARTITION BY substr(skey, 1, 1) ORDER BY skey ASC, doc_id ASC)
),
pairs AS (
  SELECT doc_id AS a, nbr1_id AS b FROM ordered
  WHERE nbr1_id IS NOT NULL AND levenshtein(probe, nbr1_probe) <= 12
  UNION ALL
  SELECT doc_id, nbr2_id FROM ordered
  WHERE nbr2_id IS NOT NULL AND levenshtein(probe, nbr2_probe) <= 12
),
edges AS (
  SELECT a AS src, b AS dst FROM pairs
  UNION SELECT b, a FROM pairs
),
reach AS (
  SELECT doc_id AS node, doc_id AS r FROM documents
  UNION
  SELECT reach.node, e.dst FROM reach JOIN edges e ON e.src = reach.r
),
cc AS (SELECT node AS doc_id, MIN(r) AS component FROM reach GROUP BY node)
SELECT component, COUNT(*) AS cluster_size,
       CAST(MIN(doc_id) AS BIGINT) AS golden_id
FROM cc GROUP BY component HAVING COUNT(*) > 1
""",
    tags=("dedup", "record-linkage", "graph", "entity-resolution"),
)
def q341_entity_resolution_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution end to end — the MDM pipeline on top of
    q253: sorted-neighborhood candidate pairs (O(n·w) comparisons,
    never n²) become symmetric edges, ENTITIES are their connected
    components (the generic pointer-jumping CC from graph.py — the
    same O(log d) loop the dedup stack uses, on a different edge
    relation, which is the point of keeping it generic), and each
    entity elects its min-id golden record. Linkage pairs alone
    over-merge nothing and under-merge everything — transitivity is
    what turns matches into entities (A~B, B~C must land in ONE
    customer-360 record even though A~C was never compared).

    Scale shape: q253's window candidates + the shared CC loop;
    cluster census is component-keyed. The oracle states the same
    fixpoint as a recursive reachability CTE."""
    from cli_spark.operators.graph import connected_components

    pairs = q253_sorted_neighborhood_pairs(spark, sf_dir).select("doc_a", "doc_b")
    edges = pairs.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    ).union(
        pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
    ).distinct()
    nodes = load_table(spark, sf_dir, "documents").select("doc_id")
    cc = connected_components(nodes, edges)
    return (
        cc.groupBy("component")
        .agg(
            F.count(F.lit(1)).alias("cluster_size"),
            F.min("doc_id").alias("golden_id"),
        )
        .filter(F.col("cluster_size") > 1)
    )


@register(
    "q343_multipass_snm",
    # Pass 1: q253's prefix key; pass 2: a ROTATED key (chars 16..45
    # of the lowered text) re-blocks records that pass 1 separated.
    # The census counts pairs per discovery set — pass-2-only pairs
    # are exactly the single-pass boundary loss.
    oracle="""
WITH keyed AS (
  SELECT doc_id,
         lower(substr(text, 1, 30)) AS k1,
         lower(substr(text, 16, 30)) AS k2,
         substr(lower(text), 1, 40) AS probe
  FROM documents
),
o1 AS (
  SELECT doc_id, probe,
         lead(doc_id, 1) OVER w AS n1, lead(probe, 1) OVER w AS p1,
         lead(doc_id, 2) OVER w AS n2, lead(probe, 2) OVER w AS p2
  FROM keyed
  WINDOW w AS (PARTITION BY substr(k1, 1, 1) ORDER BY k1 ASC, doc_id ASC)
),
o2 AS (
  SELECT doc_id, probe,
         lead(doc_id, 1) OVER w AS n1, lead(probe, 1) OVER w AS p1,
         lead(doc_id, 2) OVER w AS n2, lead(probe, 2) OVER w AS p2
  FROM keyed
  WINDOW w AS (PARTITION BY substr(k2, 1, 1) ORDER BY k2 ASC, doc_id ASC)
),
pass1 AS (
  SELECT DISTINCT LEAST(doc_id, n1) AS a, GREATEST(doc_id, n1) AS b
  FROM o1 WHERE n1 IS NOT NULL AND levenshtein(probe, p1) <= 12
  UNION
  SELECT DISTINCT LEAST(doc_id, n2), GREATEST(doc_id, n2)
  FROM o1 WHERE n2 IS NOT NULL AND levenshtein(probe, p2) <= 12
),
pass2 AS (
  SELECT DISTINCT LEAST(doc_id, n1) AS a, GREATEST(doc_id, n1) AS b
  FROM o2 WHERE n1 IS NOT NULL AND levenshtein(probe, p1) <= 12
  UNION
  SELECT DISTINCT LEAST(doc_id, n2), GREATEST(doc_id, n2)
  FROM o2 WHERE n2 IS NOT NULL AND levenshtein(probe, p2) <= 12
),
lab AS (
  SELECT COALESCE(p1.a, p2.a) AS a, COALESCE(p1.b, p2.b) AS b,
         CASE WHEN p1.a IS NOT NULL AND p2.a IS NOT NULL THEN 'both'
              WHEN p1.a IS NOT NULL THEN 'pass1_only'
              ELSE 'pass2_only' END AS found_by
  FROM pass1 p1 FULL OUTER JOIN pass2 p2 ON p1.a = p2.a AND p1.b = p2.b
)
SELECT found_by, COUNT(*) AS n_pairs FROM lab GROUP BY found_by
""",
    tags=("dedup", "record-linkage", "multipass"),
)
def q343_multipass_snm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-pass sorted-neighborhood linkage (Hernández & Stolfo
    1995 §4 — the part q253 documents as its loss-recovery): a second
    SNM pass under a ROTATED sort key (an interior 30-char slice)
    re-blocks record pairs the first key's sort order separated, and
    the union census counts pairs by discovery set. `pass2_only` IS
    the measured single-pass boundary loss — the number the paper's
    multi-pass prescription exists to recover; production runs 3-5
    rotated keys until the marginal pass finds nothing new (the
    loop-until-dry shape).

    Scale shape: each pass is one window over its block char — two
    shuffles total, O(n·w) Levenshtein probes per pass, and the
    reconciliation is an equi-join of two pair sets. Pairs normalize
    to (min, max) so both passes' discoveries align."""
    d = load_table(spark, sf_dir, "documents")
    keyed = d.select(
        "doc_id",
        F.lower(F.substring("text", 1, 30)).alias("k1"),
        F.lower(F.substring("text", 16, 30)).alias("k2"),
        F.substring(F.lower("text"), 1, 40).alias("probe"),
    )

    def snm_pass(key: str) -> DataFrame:
        w = Window.partitionBy(F.substring(key, 1, 1)).orderBy(
            F.col(key).asc(), F.col("doc_id").asc()
        )
        o = keyed.select(
            "doc_id",
            "probe",
            F.lead("doc_id", 1).over(w).alias("n1"),
            F.lead("probe", 1).over(w).alias("p1"),
            F.lead("doc_id", 2).over(w).alias("n2"),
            F.lead("probe", 2).over(w).alias("p2"),
        )
        pair1 = o.filter(
            F.col("n1").isNotNull() & (F.levenshtein("probe", "p1") <= 12)
        ).select(
            F.least("doc_id", "n1").alias("a"),
            F.greatest("doc_id", "n1").alias("b"),
        )
        pair2 = o.filter(
            F.col("n2").isNotNull() & (F.levenshtein("probe", "p2") <= 12)
        ).select(
            F.least("doc_id", "n2").alias("a"),
            F.greatest("doc_id", "n2").alias("b"),
        )
        return pair1.union(pair2).distinct()

    p1 = snm_pass("k1").withColumn("in1", F.lit(1))
    p2 = snm_pass("k2").withColumn("in2", F.lit(1))
    lab = (
        p1.join(p2, ["a", "b"], "full_outer")
        .select(
            F.when(
                F.col("in1").isNotNull() & F.col("in2").isNotNull(), "both"
            )
            .when(F.col("in1").isNotNull(), "pass1_only")
            .otherwise("pass2_only")
            .alias("found_by"),
        )
    )
    return lab.groupBy("found_by").agg(F.count(F.lit(1)).alias("n_pairs"))
