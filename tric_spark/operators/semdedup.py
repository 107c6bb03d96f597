"""SemDeDup — semantic deduplication over embedding space.

Abbas et al., "SemDeDup: Data-efficient learning at web-scale through
semantic deduplication" (arXiv:2303.09540): cluster the corpus embeddings
with k-means, call two documents semantic duplicates when their cosine
similarity within a cluster exceeds a threshold, and keep one document per
duplicate group. The within-cluster restriction is the entire scale story
— pairwise cosine over a 10^9-document corpus is O(n²), but k-means cells
bound the quadratic term to O(Σ|cell|²), and the paper's observation is
that true semantic duplicates land in the same cell at any reasonable k.

Spark shape:

    ivf_assignments (operators/similarity.py — deterministic md5 seed
        pick, broadcast nearest-centroid join, optional Lloyd refines)
    → per-cell self-join (a < b) with the library-wide oversized-cell
        guard + audit (same convention as dedup.banded_candidate_pairs:
        the guard defaults ON, ``None`` opts out, skipped cells are never
        silent)
    → cosine ≥ threshold on the 6dp-ROUNDED value (raw float boundary
        order is not engine-portable — the crawl_frontier lesson)
    → hash-min connected components over the sparse duplicate-pair graph
        (similarity is not transitive; CC is the standard closure, the
        same one neardup_groups uses)

At 100 TB: the quantizer is a broadcast join (centroids are tiny), the
cell self-join shuffles on cent_id with AQE handling cell skew under the
hard cap, and CC runs on the duplicate pairs only — a graph orders of
magnitude smaller than the corpus. No stage is ever all-pairs.

Reference analog: none (tric is a TC engine) — this is a builder-brief
training-data-pipeline operator alongside dedup.py/similarity.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tric_spark.operators.dedup import DEFAULT_MAX_BUCKET
from tric_spark.operators.similarity import cosine, ivf_assignments


def semantic_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    n_centroids: int = 16,
    refine: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_cell: int | None = DEFAULT_MAX_BUCKET,
    audit: dict | None = None,
) -> DataFrame:
    """(a, b, cos) — within-cluster pairs (a < b) whose 6dp-rounded cosine
    ≥ ``threshold``. ``max_cell`` caps the per-cell quadratic blowup
    (cells larger than it are skipped for pair emission and surfaced via
    ``audit["oversized_cells"]`` as (cent_id, n_ids) — never silently);
    ``None`` opts out, matching every other candidate-pair API here."""
    _, assign = ivf_assignments(embeddings, n_centroids, id_col, vec_col, refine)
    if max_cell is not None:
        sizes = assign.groupBy("cent_id").agg(F.count("*").alias("n_ids"))
        big = sizes.filter(F.col("n_ids") > max_cell)
        if audit is not None:
            audit["oversized_cells"] = big
        assign = assign.join(big.select("cent_id"), "cent_id", "left_anti")
    left = assign.select("cent_id", F.col("vec_id").alias("a"), F.col("v").alias("va"))
    right = assign.select("cent_id", F.col("vec_id").alias("b"), F.col("v").alias("vb"))
    return (
        left.join(right, "cent_id")
        .filter(F.col("a") < F.col("b"))
        .select(
            "a", "b", F.round(cosine(F.col("va"), F.col("vb")), 6).alias("cos")
        )
        .filter(F.col("cos") >= threshold)
    )


def semantic_dedup(
    embeddings: DataFrame,
    threshold: float = 0.95,
    n_centroids: int = 16,
    refine: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_cell: int | None = DEFAULT_MAX_BUCKET,
    audit: dict | None = None,
) -> DataFrame:
    """(vec_id, rep_id) — semantic-duplicate groups: connected components
    over the :func:`semantic_pairs` graph, rep_id = min vec_id of the
    group. Only members of a group of size > 1 appear (everything else is
    semantically unique at this threshold). Keep policy for a pipeline:
    retain rep_id (or sample within groups, per the paper's ablations)."""
    from tric_spark.operators.cc import components_of_pairs

    # r6: the pair frame feeds CC through sym (both orientations), its
    # vertex derivation, and the CC kernel's cached adjacency — those are
    # SEPARATE actions, so without a cut the whole IVF + per-cell cosine
    # pipeline re-executed per consumer (guide §2.4). cache() computes it
    # once at the first action; released once CC's state is materialized.
    pairs = semantic_pairs(
        embeddings, threshold, n_centroids, refine, id_col, vec_col,
        max_cell, audit,
    ).cache()
    # r6: size-gated closure — tiny duplicate-pair graphs finish driver-
    # side (bounded union-find, identical min-vid labels); big ones run
    # the distributed hash-min kernel (see cc.components_of_pairs)
    comp = components_of_pairs(pairs)
    pairs.unpersist()
    return comp.select(F.col("vid").alias("vec_id"), F.col("comp").alias("rep_id"))


def semantic_dedup_kept(
    embeddings: DataFrame,
    threshold: float = 0.95,
    n_centroids: int = 16,
    refine: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_cell: int | None = DEFAULT_MAX_BUCKET,
) -> DataFrame:
    """The kept corpus: ``embeddings`` minus non-representative members of
    every semantic-duplicate group (one anti-join against the group frame
    — the full rows stream through untouched)."""
    groups = semantic_dedup(
        embeddings, threshold, n_centroids, refine, id_col, vec_col, max_cell
    )
    drop = groups.filter(F.col("vec_id") != F.col("rep_id")).select(
        F.col("vec_id").alias(id_col)
    )
    return embeddings.join(drop, id_col, "left_anti")
