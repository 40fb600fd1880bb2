"""Similarity search over embedding columns (array<float>).

Two paths, mirroring production ANN architecture:

- brute-force cosine top-k: exact baseline. Query set x corpus via a
  broadcast of the (small) query side — the corpus never shuffles; the
  dot product is a JVM-side higher-order ``aggregate`` over
  ``zip_with``, codegen'd, no Python in the loop.
- sign-LSH bucketed ANN: coarse quantizer = sign bits of the first k
  dimensions (deterministic hyperplanes); candidates are only the
  query's bucket, turning the n*m cross product into a bucket-local
  join. Recall is partial by design — the oracle replays the same
  bucketing, and the exactness tests quantify recall vs brute force.

At 100 TB the corpus is partitioned by bucket (or IVF cell): the probe
is a hash join on bucket id + per-bucket top-k, which AQE handles with
skew splitting if a bucket runs hot.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

from ..functions.portable import prnd
from ..pinning import pin_frame


def as_double_vec(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential-order dot product (matches DuckDB list_dot_product)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "v",
    round_to: int = 6,
) -> DataFrame:
    """Exact top-k by cosine for each query vector.

    Output: (query_id, vec_id, cos_sim, rank), rank 1..k, deterministic
    tie-break on the rounded similarity then corpus id.

    Execution: the (small) query matrix is broadcast to every task as a
    normalized numpy array; a ``mapInPandas`` kernel scores each corpus
    Arrow batch against all queries with one BLAS matmul — the corpus
    never shuffles and Python cost is one vectorized call per batch,
    not per pair. Per-task partial top-k bounds kernel output to
    k rows per query per batch before the final global ranking window.
    """
    import numpy as np
    import pandas as pd

    spark = corpus.sparkSession
    q_rows = queries.select(id_col, vec_col).collect()
    qids = np.array([r[0] for r in q_rows], dtype="int64")
    qm = np.stack([np.asarray(r[1], dtype="float64") for r in q_rows])
    qm = qm / np.linalg.norm(qm, axis=1, keepdims=True)
    bc = spark.sparkContext.broadcast((qids, qm))

    scale = float(10**round_to)

    def kernel(batches):
        ids, qmat = bc.value
        for pdf in batches:
            vm = np.stack([np.asarray(v, dtype="float64") for v in pdf[vec_col]])
            vm = vm / np.linalg.norm(vm, axis=1, keepdims=True)
            sims = vm @ qmat.T  # (batch, n_queries)
            # round on the portable grid INSIDE the kernel (same IEEE ops
            # as prnd/o_rnd) so the partial top-k uses the exact global
            # ordering key (rounded sim desc, id asc) — provably a
            # superset of the global top-k
            sims = np.floor(sims * scale + 0.5001) / scale
            vid = pdf[id_col].to_numpy()
            full = pd.DataFrame(
                {
                    "query_id": np.repeat(ids, len(vid)),
                    id_col: np.tile(vid, len(ids)),
                    "cos_sim": sims.T.reshape(-1),
                }
            )
            full = full[full["query_id"] != full[id_col]]
            full = (
                full.sort_values(
                    ["query_id", "cos_sim", id_col], ascending=[True, False, True]
                )
                .groupby("query_id", sort=False)
                .head(k)
            )
            yield full

    from ..sources.readers import spread_small_scan

    # The kernel is map-side CPU work on the never-shuffled corpus: an
    # under-partitioned scan (one parquet file) would score every batch
    # in one task. Identity when input splits already >= parallelism.
    scored = spread_small_scan(corpus.select(id_col, vec_col)).mapInPandas(
        kernel, schema=f"query_id long, {id_col} long, cos_sim double"
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def sign_bucket(vec_col: Column, bits: int = 4) -> Column:
    """Coarse quantizer: concatenated sign bits of the first `bits` dims."""
    parts = [
        F.when(F.element_at(vec_col, i + 1) >= 0, "1").otherwise("0")
        for i in range(bits)
    ]
    return F.concat(*parts)


def sign_bucket_int(vec_col: Column, bits: int) -> Column:
    """Sign bucket as an integer (bit i set when dim i+1 >= 0) — XOR-able
    for Hamming-ball multiprobe."""
    out = F.lit(0)
    for i in range(bits):
        out = out + F.when(F.element_at(vec_col, i + 1) >= 0, F.lit(1 << i)).otherwise(
            F.lit(0)
        )
    return out.cast("int")


def probe_masks(bits: int, multiprobe: int) -> list[int]:
    """All XOR masks within Hamming distance ``multiprobe`` of 0 —
    applied to a query's bucket they enumerate its probe ball."""
    return [m for m in range(1 << bits) if bin(m).count("1") <= multiprobe]


def bucketed_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    bits: int = 4,
    multiprobe: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "v",
    round_to: int = 6,
) -> DataFrame:
    """Approximate top-k: probe the query's sign-LSH bucket plus every
    bucket within Hamming distance ``multiprobe`` (classic multiprobe
    LSH: neighbors that differ in a few quantization bits are the
    likeliest to hold missed true neighbors).

    Execution: the corpus is bucketed ONCE (integer sign bucket); the
    small query side explodes into its probe ball (sum_{d<=mp} C(bits,d)
    buckets) and broadcasts; candidates come from the bucket hash join —
    never a cross product. Each corpus vector lives in exactly one
    bucket and probe buckets are distinct, so no candidate dedup is
    needed. Tuning is corpus-dependent: recall@k vs fraction-of-corpus-
    scanned is measured in tests/test_plans.py (this repo's synthetic
    near-isotropic embeddings need a wide ball — bits=6, multiprobe=3
    for ~90% recall@5; clustered real corpora keep recall with far
    fewer probes and more bits)."""
    import pandas as pd

    c = corpus.withColumn("_bkt", sign_bucket_int(F.col(vec_col), bits))
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qv"),
        sign_bucket_int(F.col(vec_col), bits).alias("_qbkt"),
    )
    masks = probe_masks(bits, multiprobe)
    q = q.withColumn(
        "_bkt",
        F.explode(F.array(*[F.col("_qbkt").bitwiseXOR(F.lit(m)) for m in masks])),
    )
    joined = c.join(F.broadcast(q), "_bkt").filter(
        F.col(id_col) != F.col("query_id")
    )
    sim = prnd(cosine(F.col("_qv"), F.col(vec_col)), round_to)
    scored = joined.select("query_id", id_col, sim.alias("cos_sim"))

    # Map-side partial top-k (the q50 kernel's trick applied after the
    # bucket join): the broadcast-hash join emits candidates inside the
    # corpus scan's partitions, so reducing each partition to its k
    # best rows per query BEFORE the global rank bounds the shuffle to
    # k * n_queries * n_partitions rows instead of every candidate the
    # probe ball produced.  Ordering key = (rounded sim desc, id asc) —
    # sims are already on the portable grid, so the partition-local
    # head-k is provably a superset of the global top-k.
    def partial_topk(batches):
        for pdf in batches:
            yield (
                pdf.sort_values(
                    ["query_id", "cos_sim", id_col],
                    ascending=[True, False, True],
                )
                .groupby("query_id", sort=False)
                .head(k)
            )

    pruned = scored.mapInPandas(
        partial_topk, schema=f"query_id long, {id_col} long, cos_sim double"
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc(id_col))
    return (
        pruned.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def write_bucketed_ann_index(
    vecs: DataFrame,
    path: str,
    bits: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "v",
) -> None:
    """Persist the corpus as a DURABLE sign-bucket ANN index: parquet
    PARTITIONED BY the integer sign bucket.

    This is the storage layout SCALE.md's ANN law prescribes for
    100 TB ("the corpus is stored partitioned-by-bucket so a probe
    touches one partition per query"): bucket membership is computed
    ONCE at write time, and every probe afterwards is a
    partition-pruned scan — the cross-job analog of the in-session
    bucketing bucketed_ann_topk repeats per call, exactly like the
    written shingle table is the durable analog of the dedup corpus
    memo (tests/test_durable_shingles.py).

    The quantizer config is persisted WITH the index (a 1-row JSON
    dataset under ``<path>/_ann_meta`` — the leading underscore keeps
    it out of parquet partition discovery): probing with different
    ``bits`` than the index was partitioned with would silently prune
    away true candidates via the ``_bkt IN`` filter, so the probe side
    derives/validates bits from the sidecar instead of trusting the
    caller (ADVICE r11).
    """
    spark = vecs.sparkSession
    (
        vecs.select(F.col(id_col), F.col(vec_col))
        .withColumn("_bkt", sign_bucket_int(F.col(vec_col), bits))
        .write.mode("overwrite")
        .partitionBy("_bkt")
        .parquet(path)
    )
    (
        spark.createDataFrame([(int(bits),)], "bits int")
        .coalesce(1)
        .write.mode("overwrite")
        .json(path.rstrip("/") + "/_ann_meta")
    )


def bucketed_ann_topk_from_index(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 5,
    bits: int | None = None,
    multiprobe: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "v",
    round_to: int = 6,
) -> DataFrame:
    """Probe a written bucket-partitioned index (see
    write_bucketed_ann_index) with PARTITION PRUNING: the query
    batch's probe ball is a small driver-side set (<= n_query_buckets
    x ball size, independent of corpus size — the bounded-collect
    discipline of cosine_topk's query matrix), pushed as an
    ``_bkt IN (...)`` filter so the scan reads ONLY the probed
    partitions (plan-asserted in
    tests/test_plans.py::test_bucketed_ann_index_partition_pruning).
    Results are identical to the in-memory bucketed_ann_topk on the
    full corpus: candidates outside the probe ball never join anyway.

    ``bits`` is read from the index's ``_ann_meta`` sidecar (written
    by write_bucketed_ann_index); passing it explicitly is only a
    cross-check — a mismatch raises instead of silently pruning true
    candidates with a wrong-grid probe ball (ADVICE r11).
    """
    meta_bits = int(
        spark.read.json(path.rstrip("/") + "/_ann_meta").head()["bits"]
    )
    if bits is not None and bits != meta_bits:
        raise ValueError(
            f"bucketed ANN index at {path} was written with "
            f"bits={meta_bits}, probe requested bits={bits}; probing "
            "with a mismatched quantizer would silently drop true "
            "candidates via the partition filter"
        )
    bits = meta_bits
    qb = {
        r[0]
        for r in queries.select(
            sign_bucket_int(F.col(vec_col), bits).alias("_qbkt")
        )
        .distinct()
        .collect()
    }
    ball = sorted({b ^ m for b in qb for m in probe_masks(bits, multiprobe)})
    corpus = (
        spark.read.parquet(path)
        .filter(F.col("_bkt").isin(ball))
        .drop("_bkt")
    )
    return bucketed_ann_topk(
        corpus,
        queries,
        k=k,
        bits=bits,
        multiprobe=multiprobe,
        id_col=id_col,
        vec_col=vec_col,
        round_to=round_to,
    )


def near_dup_pairs(
    corpus: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "v",
    round_to: int = 6,
) -> DataFrame:
    """All pairs (a < b) with cosine >= threshold. EXACT BASELINE ONLY:
    the theta self-join is a nested-loop cross product — O(n^2) rows
    scored, unusable beyond ~10^4 vectors. The registered query path is
    :func:`near_dup_pairs_lsh`; this stays as the recall yardstick the
    tests measure against."""
    a = corpus.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"))
    b = corpus.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"))
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    sim = prnd(cosine(F.col("_va"), F.col("_vb")), round_to)
    return pairs.select("id_a", "id_b", sim.alias("cos_sim")).filter(
        F.col("cos_sim") >= threshold
    )


def near_dup_pairs_lsh(
    corpus: DataFrame,
    threshold: float,
    bands: int = 16,
    band_bits: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "v",
    round_to: int = 6,
    pin: bool = True,
) -> DataFrame:
    """Near-duplicate pairs via banded sign-LSH prefilter + exact verify
    (the q45 MinHash-band shape applied to embeddings).

    ``pin=True`` (default) eager-pins the banded signature frame, so
    CONSTRUCTION runs a Spark job; pass ``pin=False`` from callers
    that only build/explain the plan and pin at the consumption site.
    The registered q51 consumer session-memoizes the whole verified
    pair frame on top of this (plans/similarity_q.py), so repeated
    in-session calls pay the signature + band join once.

    Plan: one sign signature per vector (``bands * band_bits`` bits) ->
    explode into per-band buckets -> EQUI self-join on (band, bucket) ->
    distinct candidate pairs -> join vectors back -> exact cosine >=
    threshold. Every join is a hash join on a key; there is no theta
    join, no CartesianProduct, no BroadcastNestedLoopJoin anywhere in
    the plan (asserted in tests/test_plans.py), and AQE's skew-join
    splitting handles a hot bucket.

    Cost model at scale: candidate volume is sum over (band, bucket) of
    |bucket|^2 — controlled by ``band_bits``. Recall for a pair at angle
    theta is 1-(1-p^band_bits)^bands with p = 1 - theta/pi, so band_bits
    trades candidate volume against recall at the TARGET threshold:
    real near-dup corpora (cos >= 0.9, p ~ 0.86) support band_bits=16
    with tiny buckets; this repo's synthetic embeddings are near-random
    (max pairwise cos ~ 0.51), so the registered q51 uses 16 bands x 4
    bits — measured 96.6% recall of the exact pair set at threshold 0.4
    (tests/test_similarity.py quantifies it). Approximation is BY
    DESIGN; the DuckDB oracle replays the identical banding, so the
    gate checks the LSH result exactly.
    """
    n_bits = bands * band_bits
    sig = sign_bucket(F.col(vec_col), n_bits)
    banded = (
        corpus.select(F.col(id_col), sig.alias("_sig"))
        .select(
            id_col,
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(b).alias("band"),
                            F.substring("_sig", b * band_bits + 1, band_bits).alias(
                                "bkt"
                            ),
                        )
                        for b in range(bands)
                    ]
                )
            ).alias("_bb"),
        )
        .select(id_col, F.col("_bb.band").alias("band"), F.col("_bb.bkt").alias("bkt"))
    )
    if pin:
        # both self-join sides consume the banded frame: eager-pin it
        # (q141's law; r9 plan_dup_audit caught the signature compute +
        # band explode planned once per side) — the pinned frame is
        # three narrow columns, the "write the signature table once,
        # then join it" production shape
        banded = banded.transform(pin_frame)
    a = banded.select(F.col(id_col).alias("id_a"), "band", "bkt")
    b = banded.select(F.col(id_col).alias("id_b"), "band", "bkt")
    cand = (
        a.join(b, ["band", "bkt"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    va = corpus.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"))
    vb = corpus.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"))
    sim = prnd(cosine(F.col("_va"), F.col("_vb")), round_to)
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .select("id_a", "id_b", sim.alias("cos_sim"))
        .filter(F.col("cos_sim") >= threshold)
    )


def ivf_assign(
    corpus: DataFrame,
    seeds: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "v",
    round_to: int = 6,
) -> DataFrame:
    """Assign every vector to its nearest coarse centroid (IVF cell).

    cell = argmax_j cosine(v, seed_j); ties break to the smallest j.
    The seed matrix enters the plan as literals (k x d doubles — the
    coarse quantizer is small by construction), so assignment is a pure
    map over the corpus: per row, k codegen'd dot products and one
    array_max over (similarity, -j) structs. No shuffle, no UDF; seed
    norms constant-fold. Similarities are rounded on the portable grid
    so a SQL oracle's argmax agrees bit-for-bit.

    At scale this is the index build: the assigned frame is written
    once, partitioned/bucketed by cell, and probes become partition-
    pruned scans.
    """
    structs = []
    for j, vec in enumerate(seeds):
        s = F.array(*[F.lit(float(x)) for x in vec])
        structs.append(
            F.struct(
                prnd(cosine(F.col(vec_col), s), round_to).alias("c"),
                F.lit(-j).alias("nj"),
            )
        )
    best = F.array_max(F.array(*structs))
    return corpus.withColumn("cell", (-best.getField("nj")).cast("int"))


def ivf_probe_cells(
    queries: DataFrame,
    seeds: list[list[float]],
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "v",
    round_to: int = 6,
) -> DataFrame:
    """(query_id, qv, cell) — each query's ``nprobe`` nearest cells.

    Same literal-seed scoring as :func:`ivf_assign`; the nprobe best
    cells fall out of one array_sort (ascending on (sim, -j), take the
    last nprobe structs) — still a pure map over the (small) query set.
    """
    structs = []
    for j, vec in enumerate(seeds):
        s = F.array(*[F.lit(float(x)) for x in vec])
        structs.append(
            F.struct(
                prnd(cosine(F.col(vec_col), s), round_to).alias("c"),
                F.lit(-j).alias("nj"),
            )
        )
    ranked = F.array_sort(F.array(*structs))
    top = F.slice(ranked, len(seeds) - nprobe + 1, nprobe)
    return queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qv"),
        F.explode(
            F.transform(top, lambda s: (-s.getField("nj")).cast("int"))
        ).alias("cell"),
    )


def ivf_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    seeds: list[list[float]],
    k: int = 5,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "v",
    round_to: int = 6,
) -> DataFrame:
    """IVF approximate nearest neighbours: coarse-quantize the corpus
    into len(seeds) cells, probe each query's ``nprobe`` nearest cells,
    exact-cosine rank inside the probed cells only.

    The recall/cost dial is nprobe/len(seeds): candidates shrink to
    roughly that fraction of the corpus. Execution is one broadcast
    hash join on cell (query side exploded to its probe cells) — never
    a cross product; AQE skew-splits a hot cell. With centroids from
    k-means (operators.clustering.kmeans) instead of deterministic
    seeds, this is textbook IVF-Flat; the seed variant keeps a SQL
    oracle bit-exact.
    """
    assigned = ivf_assign(corpus, seeds, id_col, vec_col, round_to)
    probes = ivf_probe_cells(queries, seeds, nprobe, id_col, vec_col, round_to)
    joined = assigned.join(F.broadcast(probes), "cell").filter(
        F.col(id_col) != F.col("query_id")
    )
    sim = prnd(cosine(F.col("_qv"), F.col(vec_col)), round_to)
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc(id_col))
    return (
        joined.select("query_id", id_col, sim.alias("cos_sim"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def knn_dist_edges(
    vecs: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "v",
    round_to: int = 6,
) -> DataFrame:
    """Exact kNN edges (pid, nid, dist) by grid-rounded cosine distance.

    Replaces the theta-join all-pairs formulation (|V|^2 interpreted
    array-HOF cosines — the 75 s q348 bench regression at sf0.1) with
    the q50 BLAS shape: the full normalized matrix is broadcast, a
    ``mapInPandas`` kernel scores each corpus batch against it with one
    matmul, rounds distances on the portable grid, and emits each
    row's k smallest (dist, nid) — COMPLETE per row, so no downstream
    ranking window at all.  Ties break exactly like the oracle's
    ``row_number() OVER (ORDER BY dist, nid)`` via lexsort.

    The broadcast is |V| x dim doubles — fine for the corpus sizes the
    exact variant is for; at 100 TB swap in the bucketed-ANN candidate
    edges (q52/q56) and keep every consumer unchanged, as the LOF
    docstring prescribes.
    """
    import numpy as np
    import pandas as pd

    spark = vecs.sparkSession
    rows = vecs.select(id_col, vec_col).collect()
    ids = np.array([r[0] for r in rows], dtype="int64")
    m = np.stack([np.asarray(r[1], dtype="float64") for r in rows])
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    bc = spark.sparkContext.broadcast((ids, m))
    scale = float(10**round_to)

    def kernel(batches):
        all_ids, mat = bc.value
        for pdf in batches:
            pm = np.stack(
                [np.asarray(v, dtype="float64") for v in pdf[vec_col]]
            )
            pm = pm / np.linalg.norm(pm, axis=1, keepdims=True)
            pids = pdf[id_col].to_numpy()
            # chunk rows so the (rows x |V|) score block stays bounded
            for lo in range(0, len(pids), 1024):
                hi = min(lo + 1024, len(pids))
                d = 1.0 - pm[lo:hi] @ mat.T
                d = np.floor(d * scale + 0.5001) / scale
                out_pid, out_nid, out_d = [], [], []
                for i, pid in enumerate(pids[lo:hi]):
                    mask = all_ids != pid
                    nd, nn = d[i][mask], all_ids[mask]
                    order = np.lexsort((nn, nd))[:k]
                    out_pid.append(np.full(len(order), pid, dtype="int64"))
                    out_nid.append(nn[order])
                    out_d.append(nd[order])
                yield pd.DataFrame(
                    {
                        "pid": np.concatenate(out_pid),
                        "nid": np.concatenate(out_nid),
                        "dist": np.concatenate(out_d),
                    }
                )

    from ..sources.readers import spread_small_scan

    return spread_small_scan(vecs.select(id_col, vec_col)).mapInPandas(
        kernel, schema="pid long, nid long, dist double"
    )


def knn_candidate_edges_bucketed(
    vecs: DataFrame,
    k: int,
    bits: int = 6,
    multiprobe: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "v",
    round_to: int = 6,
    salt_target: int = 8192,
) -> DataFrame:
    """Approximate kNN edges (pid, nid, dist) from bucketed-ANN
    candidates — the 100 TB form of :func:`knn_dist_edges`.

    Same output contract as the exact variant (each row's up-to-k
    nearest by grid-rounded cosine distance, ties broken (dist, nid)),
    so every graph consumer (LOF, k-core, assortativity, mutual-kNN)
    swaps it in UNCHANGED.  Candidate generation: each vector is
    sign-bucketed ONCE (q52's quantizer) and the probe side explodes
    into its Hamming-<=multiprobe probe ball — never a cross product,
    never a driver collect (vs broadcasting the full |V| x dim matrix,
    a driver bottleneck past ~10^6 rows).

    Execution (r11 BLAS cogroup, r12 salted): a bucket is a cogroup
    key, and each cogroup cell is scored with ONE normalized float64
    matmul (the knn_dist_edges arithmetic verbatim: d = 1 - p @ c.T,
    portable floor grid, (dist, nid) lexsort) instead of per-pair
    array-HOF cosine through the expression interpreter (measured 15x
    at sf0.1).  Because cogrouped applyInPandas materializes BOTH
    sides of a cell as in-memory pandas frames on one executor, hot
    buckets (small ``bits``, skewed corpora) are bounded by
    DETERMINISTIC TWO-SIDED SALTING: per bucket, the probe side splits
    into Sp = ceil(n_probes / salt_target) salts (pid % Sp) and the
    candidate side into Sc = ceil(n_cands / salt_target) salts
    (nid % Sc); each side replicates across the OTHER side's salt
    dimension, so every (pid, nid) pair lands in exactly ONE
    (bucket, sp, sc) cell — still no dedup pass — and each cell holds
    at most ~salt_target rows per side (the per-task memory bound:
    2 x salt_target x dim float64 plus the k-row outputs).  Unskewed
    buckets get Sp = Sc = 1 (no replication).  The per-cell top-k is a
    superset-of-global-top-k per pid (standard top-k merge property),
    and the global window below finishes the cross-cell merge, so
    salting never changes results (pytest: hot-bucket equality at
    bits=1).  The salt-size frame is bucket-grain (<= 2^bits rows, ids
    and two small ints only), joined back on the bucket key.

    Recall is corpus-dependent (probe-ball coverage of the true
    neighbors' buckets): measured at sf0.01 on this repo's
    near-isotropic synthetic embeddings in
    tests/test_plans.py::test_bucketed_knn_edge_recall, and recorded
    in SCALE.md ("exact-kNN edges law").  Edges that ARE found carry
    bit-identical distances to the exact variant (same portable grid),
    so consumer arithmetic is unaffected on the found set.
    """

    import numpy as np
    import pandas as pd

    c = vecs.select(
        F.col(id_col).alias("nid"),
        F.col(vec_col).alias("_cv"),
        sign_bucket_int(F.col(vec_col), bits).alias("_bkt"),
    )
    masks = probe_masks(bits, multiprobe)
    p = vecs.select(
        F.col(id_col).alias("pid"),
        F.col(vec_col).alias("_pv"),
        sign_bucket_int(F.col(vec_col), bits).alias("_pbkt"),
    ).withColumn(
        "_bkt",
        F.explode(F.array(*[F.col("_pbkt").bitwiseXOR(F.lit(m)) for m in masks])),
    )
    scale = float(10**round_to)

    # per-bucket salt counts: id-only aggregates (cheap vs the vector
    # payload), inner join drops probe-only buckets — nothing to score
    # there anyway
    sz = (
        p.groupBy("_bkt")
        .agg(F.count("*").alias("_pn"))
        .join(c.groupBy("_bkt").agg(F.count("*").alias("_cn")), "_bkt")
        .select(
            "_bkt",
            F.ceil(F.col("_pn") / salt_target).cast("int").alias("_sp"),
            F.ceil(F.col("_cn") / salt_target).cast("int").alias("_sc"),
        )
    )
    p2 = (
        p.join(sz, "_bkt")
        .withColumn("_isp", (F.col("pid") % F.col("_sp")).cast("int"))
        .withColumn(
            "_isc", F.explode(F.sequence(F.lit(0), F.col("_sc") - 1))
        )
        .select("pid", "_pv", "_bkt", "_isp", "_isc")
    )
    c2 = (
        c.join(sz, "_bkt")
        .withColumn("_isc", (F.col("nid") % F.col("_sc")).cast("int"))
        .withColumn(
            "_isp", F.explode(F.sequence(F.lit(0), F.col("_sp") - 1))
        )
        .select("nid", "_cv", "_bkt", "_isp", "_isc")
    )

    def _score_bucket(probes: pd.DataFrame, cands: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"pid": pd.Series(dtype="int64"),
             "nid": pd.Series(dtype="int64"),
             "dist": pd.Series(dtype="float64")}
        )
        if probes.empty or cands.empty:
            return empty
        cm = np.stack([np.asarray(v, dtype="float64") for v in cands["_cv"]])
        cm = cm / np.linalg.norm(cm, axis=1, keepdims=True)
        nids = cands["nid"].to_numpy(dtype="int64")
        pids = probes["pid"].to_numpy(dtype="int64")
        pm = np.stack([np.asarray(v, dtype="float64") for v in probes["_pv"]])
        pm = pm / np.linalg.norm(pm, axis=1, keepdims=True)
        out = []
        # chunk probe rows so the (rows x cell) score block stays
        # bounded; accumulate per-chunk pid/nid/dist numpy arrays and
        # build ONE DataFrame per chunk (the knn_dist_edges kernel's
        # pattern — not one tiny frame per probe row, ADVICE r11)
        for lo in range(0, len(pids), 1024):
            hi = min(lo + 1024, len(pids))
            d = 1.0 - pm[lo:hi] @ cm.T
            d = np.floor(d * scale + 0.5001) / scale
            cp, cn, cd = [], [], []
            for i, pid in enumerate(pids[lo:hi]):
                mask = nids != pid
                nd, nn = d[i][mask], nids[mask]
                order = np.lexsort((nn, nd))[:k]
                cp.append(np.full(len(order), pid, dtype="int64"))
                cn.append(nn[order])
                cd.append(nd[order])
            if cp:
                out.append(
                    pd.DataFrame(
                        {"pid": np.concatenate(cp),
                         "nid": np.concatenate(cn),
                         "dist": np.concatenate(cd)}
                    )
                )
        return pd.concat(out, ignore_index=True) if out else empty

    pruned = (
        p2.groupBy("_bkt", "_isp", "_isc")
        .cogroup(c2.groupBy("_bkt", "_isp", "_isc"))
        .applyInPandas(_score_bucket, schema="pid long, nid long, dist double")
    )
    w = W.partitionBy("pid").orderBy(F.asc("dist"), F.asc("nid"))
    return (
        pruned.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )
