"""Similarity search over embedding columns (extension beyond the
reference — BASELINE.json north star).

Scale design (100 TB thinking):
  * Brute-force top-k: queries are broadcast (tiny side), the corpus scans
    once; the dot product is a Catalyst fold over `array<double>` — pure
    JVM, no Python. Per-query top-k via window group-limit, so only k rows
    per query survive the shuffle.
  * LSH-bucketed ANN (the scale path): deterministic random-hyperplane
    signatures computed scan-side; candidates come from an equi-join on the
    bucket id, shrinking the pair space from O(n·q) to O(n·q/2^bits). The
    same top-k tail runs over candidates only. Recall vs brute force is
    asserted in tests/test_similarity.py.

Determinism for the oracle: cosine is computed in float64 with an explicit
left-to-right fold (both engines evaluate element-wise in array order) and
the emitted value is rounded to 6 decimals; ranking ties are broken by
vec_id, so Spark and DuckDB produce identical top-k sets.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from hopspark.catalog import read_table
from hopspark.ckpt import materialize

N_QUERIES = 3  # vec_id < 3 are the query vectors in the demo queries
TOP_K = 5


def _dvec(col: str) -> Column:
    """float32 array → float64 array (exact widening)."""
    return F.transform(F.col(col), lambda x: x.cast("double"))


def _dot(a: Column, b: Column) -> Column:
    """Sequential left-to-right fold — deterministic IEEE summation order."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (F.sqrt(_dot(a, a)) * F.sqrt(_dot(b, b)))


def knn_bruteforce_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-k cosine neighbours for the first N_QUERIES vectors."""
    emb = read_table(spark, "embeddings", sf_dir)
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    corpus = emb.select(F.col("vec_id").alias("cand_id"), "embedding")
    scored = (
        F.broadcast(queries)
        .crossJoin(corpus)
        .filter(F.col("cand_id") != F.col("query_id"))
        .select(
            "query_id",
            "cand_id",
            F.round(cosine(_dvec("q_emb"), _dvec("embedding")), 6).alias("cos_sim"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .orderBy("query_id", "rank")
    )


KNN_BRUTEFORCE_SQL = f"""
WITH q AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS q_emb
  FROM embeddings WHERE vec_id < {N_QUERIES}
),
scored AS (
  SELECT q.query_id, e.vec_id AS cand_id,
         ROUND(
           list_dot_product(q.q_emb, CAST(e.embedding AS DOUBLE[]))
           / (SQRT(list_dot_product(q.q_emb, q.q_emb))
              * SQRT(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                      CAST(e.embedding AS DOUBLE[])))),
           6) AS cos_sim
  FROM q CROSS JOIN embeddings e
  WHERE e.vec_id != q.query_id
)
SELECT query_id, cand_id, cos_sim, rank FROM (
  SELECT query_id, cand_id, cos_sim,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, cand_id ASC) AS rank
  FROM scored
) WHERE rank <= {TOP_K}
ORDER BY query_id, rank
"""


def embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label norm statistics — vector math + aggregation mix."""
    emb = read_table(spark, "embeddings", sf_dir)
    norm = F.sqrt(_dot(_dvec("embedding"), _dvec("embedding")))
    return (
        emb.select("label", F.round(norm, 6).alias("norm"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.round(F.min("norm"), 6).alias("min_norm"),
            F.round(F.max("norm"), 6).alias("max_norm"),
        )
        .orderBy("label")
    )


EMBEDDING_NORMS_SQL = """
WITH n AS (
  SELECT label,
         ROUND(SQRT(list_dot_product(CAST(embedding AS DOUBLE[]),
                                     CAST(embedding AS DOUBLE[]))), 6) AS norm
  FROM embeddings
)
SELECT label, COUNT(*) AS n_vecs,
       ROUND(MIN(norm), 6) AS min_norm,
       ROUND(MAX(norm), 6) AS max_norm
FROM n GROUP BY label ORDER BY label
"""

# --- LSH-bucketed ANN (scale path; rows-only driver check) ------------------

N_PLANES = 8


def _lsh_bucket(vec: Column, n_planes: int = N_PLANES) -> Column:
    """Random-hyperplane signature: plane weights are a deterministic
    pseudo-random function of (plane, dim) via xxhash64 — reproducible
    across runs and cluster sizes with zero data movement."""
    bits = []
    for p in range(n_planes):
        w = F.transform(
            F.sequence(F.lit(0), F.size(vec) - 1),
            lambda i: (
                F.xxhash64(F.lit(p), i).cast("double") / F.lit(9.223372036854776e18)
            ),
        )
        proj = F.aggregate(
            F.zip_with(vec, w, lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x
        )
        bits.append(F.when(proj >= 0, F.lit(1)).otherwise(F.lit(0)) * (2**p))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN: exact top-k *within* each query's LSH bucket. Unit tests measure
    recall against knn_bruteforce_cosine; the driver check is rows-only
    (hash functions are engine-specific, not SQL-reproducible)."""
    emb = read_table(spark, "embeddings", sf_dir).select(
        "vec_id", _dvec("embedding").alias("emb")
    )
    bucketed = emb.select("vec_id", "emb", _lsh_bucket(F.col("emb")).alias("bucket"))
    queries = bucketed.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("emb").alias("q_emb"),
        "bucket",
    )
    scored = (
        F.broadcast(queries)
        .join(bucketed, "bucket")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("cand_id"),
            F.round(cosine(F.col("q_emb"), F.col("emb")), 6).alias("cos_sim"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .orderBy("query_id", "rank")
    )


# --- IVF-style ANN (coarse quantization; rows-only driver check) ------------

N_CENTROIDS = 8
N_PROBE = 2
KMEANS_ITERS = 2


def _centroids(
    spark: SparkSession, sf_dir: str, iters: int = KMEANS_ITERS
) -> DataFrame:
    """Coarse centroids: deterministic first-N seeding refined by `iters`
    distributed Lloyd iterations — assign every vector to its nearest
    centroid (one broadcast pass over the corpus), then recompute each
    cell's element-wise mean via posexplode + per-(cell, dimension)
    averages (partial aggregation map-side; no vector list ever collected).
    Empty cells fall back to their seed so the cell count stays fixed.
    Float means vary at ulp scale with partition order, but cell COUNTS and
    the search structure are stable (rows-only check; recall unit-tested)."""
    emb = read_table(spark, "embeddings", sf_dir).select(
        "vec_id", _dvec("embedding").alias("emb")
    )
    seeds = emb.filter(F.col("vec_id") < N_CENTROIDS).select(
        F.col("vec_id").alias("centroid_id"), F.col("emb").alias("c_emb")
    )
    cents = seeds
    for _ in range(iters):
        scored = emb.crossJoin(F.broadcast(cents)).select(
            "vec_id",
            "emb",
            "centroid_id",
            cosine(F.col("emb"), F.col("c_emb")).alias("c_sim"),
        )
        w = W.partitionBy("vec_id").orderBy(F.desc("c_sim"), F.asc("centroid_id"))
        assigned = (
            scored.withColumn("r", F.row_number().over(w))
            .filter(F.col("r") == 1)
            .select("centroid_id", "emb")
        )
        means = (
            assigned.select("centroid_id", F.posexplode("emb").alias("pos", "val"))
            .groupBy("centroid_id", "pos")
            .agg(F.avg("val").alias("m"))
            .groupBy("centroid_id")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))),
                    lambda s: s.m,
                ).alias("c_emb")
            )
        )
        lost = seeds.join(
            means.select("centroid_id"), "centroid_id", "left_anti"
        )
        # localCheckpoint per Lloyd iteration (r12, guide §5 / §3.3 "very
        # large plans"): `means` is referenced twice per round (union +
        # lost's anti-join), so a lazy loop DOUBLES the plan each
        # iteration and the final centroids' lineage re-executes once per
        # downstream consumer (ann_ivf_topk scores corpus AND queries
        # against them). Same bounded-lineage discipline as the CC and
        # PageRank loops in graph.py.
        cents = materialize(means.unionByName(lost))
    return cents


def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF search: corpus assigned to nearest centroid (inverted lists);
    each query probes its N_PROBE nearest cells and ranks exactly within
    them. At scale the assignment is one broadcast-join pass over the
    corpus and each query touches ~N_PROBE/N_CENTROIDS of the data."""
    emb = read_table(spark, "embeddings", sf_dir).select(
        "vec_id", _dvec("embedding").alias("emb")
    )
    cents = _centroids(spark, sf_dir)

    def nearest_cells(df: DataFrame, vec_col: str, out: str, keep: int) -> DataFrame:
        scored = df.crossJoin(F.broadcast(cents)).select(
            *df.columns,
            "centroid_id",
            cosine(F.col(vec_col), F.col("c_emb")).alias("c_sim"),
        )
        w = W.partitionBy(*[c for c in df.columns if c != vec_col][:1] or [vec_col]).orderBy(
            F.desc("c_sim"), F.asc("centroid_id")
        )
        return (
            scored.withColumn("c_rank", F.row_number().over(w))
            .filter(F.col("c_rank") <= keep)
            .select(*df.columns, F.col("centroid_id").alias(out))
        )

    assigned = nearest_cells(emb, "emb", "cell", keep=1)
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("emb").alias("q_emb")
    )
    probed = nearest_cells(queries, "q_emb", "cell", keep=N_PROBE)
    scored = (
        F.broadcast(probed)
        .join(assigned, "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("cand_id"),
            F.round(cosine(F.col("q_emb"), F.col("emb")), 6).alias("cos_sim"),
        )
        .distinct()
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .orderBy("query_id", "rank")
    )


# --- int8 quantization --------------------------------------------------------


def emb_quantize_int8_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric per-vector int8 quantization of the embedding column — the
    standard 4× storage/bandwidth reduction step before an ANN index build
    at 100 TB scale.  scale = max |x|; q_i = floor(round(x_i/scale·127, 9) + 0.5)
    (half-up spelled as an exact floor — no round() rounding-mode
    dependence; the 9-dp rounding of the product is a guard band so a
    knife-edge product cannot flip the floor on a sub-1e-9 evaluation
    difference between engines).
    Everything is scan-side Catalyst array expressions: no shuffle at all
    except the final presentation sort, and the int8 payload is 4× smaller
    than the float input at the exchange.  n_clip counts saturated lanes
    (|q| = 127) — the per-vector quality signal a pipeline monitors."""
    emb = read_table(spark, "embeddings", sf_dir)
    da = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    # materialize the scale as a COLUMN before the quantizing transform —
    # referencing the array_max expression inside the per-element lambda
    # would re-evaluate it for every lane (O(d²) per vector; measured 2.8s
    # → 0.4s at sf0.1 for d=64)
    # the internal full-precision column must NOT share the output alias
    # "scale": Spark's lateral column-alias resolution would bind the
    # lambda's reference to the 6-dp ROUNDED select-list alias instead of
    # this column (observed: a -56.5000374 product became -56.49967 and
    # quantized one step off)
    staged = emb.select("vec_id", da.alias("da")).withColumn(
        "s_full", F.array_max(F.transform(F.col("da"), F.abs))
    )
    q = F.transform(
        F.col("da"),
        # the 9-dp rounding of the product absorbs ~1-ulp evaluation
        # differences between engines, which otherwise flip the floor at
        # knife-edge products
        lambda x: F.floor(
            F.round(x / F.col("s_full") * 127, 9) + 0.5
        ).cast("int"),
    )
    return (
        staged.select(
            "vec_id",
            F.round(F.col("s_full"), 6).alias("scale"),
            q.alias("q"),
            F.size(F.filter(q, lambda v: F.abs(v) == 127)).alias("n_clip"),
        )
        .orderBy("vec_id")
    )


def emb_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-facing shape of :func:`emb_quantize_int8_array`: the int8 lane
    array is serialized to a comma-joined string column ``q_csv`` so every
    output column is scalar.  The driver's oracle harness canonicalizes
    results with pandas ``sort_values`` over all columns, which cannot
    factorize list-valued cells (CORRECTNESS_r07: "unhashable type: 'list'")
    — any query registered for the oracle gate must emit scalar columns
    only.  Programs that want the raw ``array<int>`` use the *_array form."""
    out = emb_quantize_int8_array(spark, sf_dir)
    return out.select(
        "vec_id",
        "scale",
        F.array_join(F.col("q"), ",").alias("q_csv"),
        "n_clip",
    )


EMB_QUANTIZE_INT8_SQL = """
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
),
s AS (
  SELECT vec_id, emb,
         list_max(list_transform(emb, x -> abs(x))) AS scale
  FROM e
)
SELECT vec_id,
       ROUND(scale, 6) AS scale,
       array_to_string(
         list_transform(emb, x -> CAST(FLOOR(ROUND(x / scale * 127, 9) + 0.5) AS INT)),
         ',') AS q_csv,
       CAST(len(list_filter(
         list_transform(emb, x -> CAST(FLOOR(ROUND(x / scale * 127, 9) + 0.5) AS INT)),
         v -> abs(v) = 127)) AS INT) AS n_clip
FROM s ORDER BY vec_id
"""


QUERIES: dict[str, tuple] = {
    "sim_knn_bruteforce_cosine": (knn_bruteforce_cosine, KNN_BRUTEFORCE_SQL),
    "emb_quantize_int8": (emb_quantize_int8, EMB_QUANTIZE_INT8_SQL),
    "sim_embedding_norms": (embedding_norms, EMBEDDING_NORMS_SQL),
    "sim_ann_lsh_topk": (ann_lsh_topk, None),
    "sim_ann_ivf_topk": (ann_ivf_topk, None),
}
