"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k (exact baseline) and a deterministic
random-hyperplane LSH bucketing (the scale path: candidates come from one
shuffle on the bucket key instead of a full cross join).

Float determinism: all dot products are computed in float64 with a
left-to-right fold in BOTH engines (Spark ``aggregate`` over ``zip_with``;
DuckDB ``list_dot_product`` on DOUBLE[]), similarities rounded before ranking
so cross-engine rank order is stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .textstats import FP_MOD


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(_dot(a, a))


def cosine_topk(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_ids: list[int] | None = None,
    k: int = 5,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector (broadcast join).

    The query side is small by construction => broadcast hash join, one pass
    over the corpus, no shuffle of the big side. Ranking uses the rounded
    similarity with id tie-break so results are deterministic.
    """
    query_ids = query_ids or list(range(10))
    q = df.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    )
    c = df.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv"))
    pairs = c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
    sim = F.round(_dot(F.col("_qv"), F.col("_cv")) / (_norm(F.col("_qv")) * _norm(F.col("_cv"))), 6)
    scored = pairs.select("query_id", "neighbor_id", sim.alias("cosine_sim"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine_sim")
    )


def hyperplane_lsh_buckets(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Sign-of-projection LSH bucket per vector (deterministic planes).

    Plane p's component j = ((seed-derived integer hash) mod 2001 - 1000)/1000
    — reproducible anywhere, no RNG state. Vectors in the same bucket are
    near-duplicate candidates; at scale the candidate join shuffles on
    ``bucket`` only.
    """
    planes = []
    for p in range(n_planes):
        comps = []
        for j in range(dim):
            h = (((seed * 1_000_003 + p * 131 + j * 31) * 2_654_435_761) % FP_MOD) % 2001
            comps.append((h - 1000) / 1000.0)
        planes.append(comps)
    bucket_bits = []
    for p, comps in enumerate(planes):
        plane = F.array(*[F.lit(c) for c in comps])
        proj = _dot(F.col(vec_col), plane)
        bucket_bits.append(F.when(proj > 0, F.lit(2 ** p)).otherwise(F.lit(0)).cast("long"))
    bucket = bucket_bits[0]
    for bb in bucket_bits[1:]:
        bucket = bucket + bb
    return df.select(F.col(id_col), bucket.alias("bucket"))


def ivf_assign(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    broadcast_threshold: int = 64,
    refine_iters: int = 0,
    scale: int = 1000,
) -> DataFrame:
    """IVF coarse quantization: assign every vector to its nearest of
    ``n_cells`` centroid seeds (deterministically the vectors with the
    n_cells smallest ids — no iterative k-means, so the assignment is exactly
    reproducible in SQL). Returns (id, cell).

    ``refine_iters > 0`` runs that many deterministic integer-exact Lloyd
    iterations first (``ivf_refine_centroids``) and assigns against the
    refined centroids — same argmax rule on the quantized vectors.

    Two physical strategies, same result (identical (sim, lowest-seed-id)
    argmax rule):
    - n_cells <= broadcast_threshold: centroids embedded as literal arrays =>
      pure JVM expressions, narrow map, no join at all;
    - above it: BROADCAST-JOIN argmax — the centroid table is broadcast and
      the best cell is picked with a max_by aggregation. Plan size stays KB
      at the 2^10-2^14 cells a 100 TB corpus wants (the literal form would
      bloat the plan with n_cells embedded float arrays), at the cost of one
      map-side-combined aggregation on the vector id."""
    if refine_iters > 0:
        cents = ivf_refine_centroids(
            df, id_col=id_col, vec_col=vec_col, n_cells=n_cells,
            n_iters=refine_iters, scale=scale)
        qv = F.transform(
            F.col(vec_col), lambda x: F.round(x.cast("double") * scale).cast("long"))
        q = df.select(F.col(id_col).alias("_vid"), qv.alias("_qv"))
        return _q_assign(q, cents).withColumnRenamed("_vid", id_col)

    if n_cells <= broadcast_threshold:
        seeds = (
            df.filter(F.col(id_col) < n_cells)
            .select(id_col, vec_col)
            .collect()
        )
        vec = F.col(vec_col)
        nv = _norm(vec)
        entries = []
        for r in sorted(seeds, key=lambda r: r[0]):
            sid = int(r[0])
            svec = F.array(*[F.lit(float(x)) for x in r[1]])
            sim = F.round(_dot(vec, svec) / (nv * _norm(svec)), 6)
            # max of (sim, -sid) == best sim, ties to the lowest seed id
            entries.append(F.struct(sim.alias("s"), F.lit(-sid).cast("long").alias("nid")))
        cell = -F.array_max(F.array(*entries)).getField("nid")
        return df.select(F.col(id_col), cell.cast("int").alias("cell"))

    seeds = df.filter(F.col(id_col) < n_cells).select(
        F.col(id_col).alias("_sid"), F.col(vec_col).alias("_svec")
    )
    pairs = df.select(F.col(id_col), F.col(vec_col)).crossJoin(F.broadcast(seeds))
    sim = F.round(
        _dot(F.col(vec_col), F.col("_svec"))
        / (_norm(F.col(vec_col)) * _norm(F.col("_svec"))), 6
    )
    # max of struct(sim, -sid): best sim, ties to the lowest seed id — the
    # exact rule of the literal path and of the SQL row_number oracle
    return (
        pairs.select(F.col(id_col), F.col("_sid"), sim.alias("_s"))
        .groupBy(id_col)
        .agg(F.max(F.struct(F.col("_s").alias("s"),
                            (-F.col("_sid")).alias("nid"))).alias("m"))
        .select(F.col(id_col), (-F.col("m.nid")).cast("int").alias("cell"))
    )


def _q_assign(q: DataFrame, cents: list[tuple[int, list[int]]]) -> DataFrame:
    """Argmax assignment of quantized vectors to integer centroids via
    broadcast join: sim = round(dot/(|v||c|), 6) with products/sums exact in
    int64 (and in double — all < 2^53), ties to the lowest cell id. One
    map-side-combined aggregation; no plan-literal bloat."""
    spark = q.sparkSession
    cdf = spark.createDataFrame(
        [(c, v) for c, v in cents], "cell int, _cv array<long>")
    pairs = q.crossJoin(F.broadcast(cdf))
    dot = _dot(F.col("_qv"), F.col("_cv"))
    nn = _norm(F.col("_qv")) * _norm(F.col("_cv"))
    sim = F.when(nn > 0, F.round(dot / nn, 6)).otherwise(F.lit(-1.0))
    return (
        pairs.select("_vid", "cell", sim.alias("_s"))
        .groupBy("_vid")
        .agg(F.max(F.struct(F.col("_s").alias("s"),
                            (-F.col("cell")).cast("long").alias("nid"))).alias("m"))
        .select(F.col("_vid"), (-F.col("m.nid")).cast("int").alias("cell"))
    )


def ivf_refine_centroids(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    n_iters: int = 2,
    scale: int = 1000,
) -> list[tuple[int, list[int]]]:
    """Deterministic Lloyd (k-means) refinement of the IVF coarse quantizer
    (round-3 verdict item 4: id-seeded cells go unbalanced on skewed data).

    Exactly reproducible across engines — no float accumulation anywhere:
    embeddings are quantized to integers (``round(x·scale)``) and each
    centroid is kept as the elementwise integer SUM of its members (cosine
    is scale-invariant, so sum ≡ mean — no division, no drift). Every dot
    product is exact int64 arithmetic (< 2^53, so also exact in double), so
    a DuckDB oracle unrolling the same iterations hash-matches bit-for-bit.

    Per iteration: one broadcast-join argmax assignment + one (cell, pos)
    aggregation — both map-side combined; centroids (n_cells × dim longs)
    are the only driver-side state. A cell left empty by an iteration keeps
    its previous centroid. n_iters is small and fixed (2-3 captures most of
    the balance win; this is a coarse quantizer, not a clustering product).
    """
    qv = F.transform(
        F.col(vec_col), lambda x: F.round(x.cast("double") * scale).cast("long"))
    q = df.select(F.col(id_col).alias("_vid"), qv.alias("_qv"))
    cents = sorted(
        (int(r[0]), [int(x) for x in r[1]])
        for r in q.filter(F.col("_vid") < n_cells).collect()
    )
    for _ in range(n_iters):
        assign = _q_assign(q, cents)
        sums = (
            q.join(assign, "_vid")
            .select("cell", F.posexplode("_qv"))
            .groupBy("cell", "pos")
            .agg(F.sum("col").alias("s"))
            .groupBy("cell")
            .agg(F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "s"))),
                lambda st: st.getField("s")).alias("c"))
            .collect()
        )
        new = {int(r[0]): [int(x) for x in r[1]] for r in sums}
        cents = [(cell, new.get(cell, old)) for cell, old in cents]
    return cents


def ivf_topk(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_ids: list[int] | None = None,
    n_cells: int = 16,
    k: int = 5,
    broadcast_threshold: int = 64,
    refine_iters: int = 0,
) -> DataFrame:
    """IVF ANN search (nprobe=1): exact cosine top-k, but only within the
    query's own quantizer cell — the candidate join shuffles on ``cell``
    instead of broadcasting the corpus. Approximate by design (neighbors in
    other cells are unseen), deterministic, SQL-twin-checkable.
    ``refine_iters`` > 0 uses Lloyd-refined centroids for the cell map."""
    query_ids = query_ids or list(range(10))
    assign = ivf_assign(df, id_col=id_col, vec_col=vec_col, n_cells=n_cells,
                        broadcast_threshold=broadcast_threshold,
                        refine_iters=refine_iters)
    withc = df.select(F.col(id_col), F.col(vec_col)).join(assign, id_col)
    q = withc.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv"), "cell"
    )
    c = withc.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv"), "cell")
    pairs = c.join(F.broadcast(q), ["cell"]).filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    sim = F.round(_dot(F.col("_qv"), F.col("_cv")) / (_norm(F.col("_qv")) * _norm(F.col("_cv"))), 6)
    scored = pairs.select("query_id", "neighbor_id", sim.alias("cosine_sim"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine_sim")
    )


def lsh_near_pairs(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    dim: int = 64,
    min_cosine: float = 0.9,
) -> DataFrame:
    """Candidate pairs from shared LSH bucket, verified by exact cosine."""
    b = hyperplane_lsh_buckets(df, id_col=id_col, vec_col=vec_col, n_planes=n_planes, dim=dim)
    v = df.select(F.col(id_col), F.col(vec_col))
    withb = v.join(b, id_col)
    a, c = withb.alias("a"), withb.alias("b")
    pairs = a.join(
        c,
        (F.col("a.bucket") == F.col("b.bucket")) & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
    )
    sim = F.round(
        _dot(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}"))
        / (_norm(F.col(f"a.{vec_col}")) * _norm(F.col(f"b.{vec_col}"))),
        6,
    )
    return (
        pairs.select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            sim.alias("cosine_sim"),
        )
        .filter(F.col("cosine_sim") >= min_cosine)
    )
