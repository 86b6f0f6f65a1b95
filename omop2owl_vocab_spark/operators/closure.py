"""Transitive ancestor closure with path-length statistics — the OMOP
``concept_ancestor`` analog: every (ancestor, descendant) pair reachable
through 1+ hierarchy edges, annotated with ``min_levels`` /
``max_levels`` of separation (shortest / longest path length).

The reference emits only the DIRECT 'Is a' edges as rdfs:subClassOf
(``omop2owl_vocab.py`` robot-template rows); the derived ancestor table —
the thing OMOP analytics actually join against — is left to downstream
tooling.  Here it is a first-class distributed operator.

Algorithm: path doubling.  ``P_0`` = direct edges at length 1; each
round joins the current pair set with itself on the shared midpoint and
re-aggregates:

    P_{k+1}(a, d) = P_k(a, d)  ∪  { (a, d, min1+min2, max1+max2)
                                    : P_k(a, m), P_k(m, d) }
    → groupBy(a, d).agg(min(min), max(max))

After k rounds every path of length ≤ 2^k is represented (any such path
splits at its midpoint into two halves each ≤ 2^(k-1)), so convergence
takes ⌈log2(longest path)⌉ + 1 rounds — 5 rounds covers depth 32, far
beyond any real ontology.  In a DAG the concatenation of two paths is
itself a path (a shared interior vertex would imply a cycle), so the
min/max compositions are exact, not bounds.

Fixpoint detection: the pair set only grows, ``min_levels`` only
decreases, ``max_levels`` only increases — so the triple
``(count, sum(min), sum(max))`` is strictly monotone until convergence
and one aggregate per round decides termination.  A CYCLE in the input
makes ``max_levels`` diverge; the round cap then raises (same contract
as ``connected_components``) — the closure doubles as cycle detection.

100 TB posture: each round is one self-equi-join on the midpoint plus a
hash-aggregate — both shuffle on pair keys, both AQE-skew-splittable.
Output size is the closure itself (O(V · depth) for bounded-fan-in
hierarchies — SNOMED's ~450k concepts close to ~7M pairs); per-round
``localCheckpoint``/``checkpoint`` truncates lineage exactly as in
`operators/link.py:connected_components`.

Reference analog: none (derived table the reference leaves to
downstream OMOP tooling); mandated kg-construction surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ancestor_closure(
    edges: DataFrame,
    child_col: str = "child",
    parent_col: str = "parent",
    max_iter: int = 12,
    include_self: bool = False,
    checkpoint_dir: str | None = None,
) -> tuple[DataFrame, dict]:
    """Return ``(closure, stats)``: closure = (ancestor, descendant,
    min_levels, max_levels) over the transitive closure of the edge set
    (edge direction: child → parent, one level of separation each).

    ``include_self`` adds the OMOP-style identity rows (every node as
    its own ancestor at 0/0 levels).  ``checkpoint_dir`` selects
    reliable checkpoints (cluster posture) over ``localCheckpoint``
    (single-box default) — same contract and caveats as
    `connected_components`.

    Raises ``RuntimeError`` when ``max_iter`` rounds don't reach the
    fixpoint — which, for any acyclic input, means ``max_iter`` <
    ⌈log2(depth)⌉ + 1; for cyclic input it is the cycle detector.
    """
    ckpt_subdir = None
    if checkpoint_dir is not None:
        import uuid

        ckpt_subdir = f"{checkpoint_dir.rstrip('/')}/tc-{uuid.uuid4().hex}"
        sc = edges.sparkSession.sparkContext
        sc.setCheckpointDir(ckpt_subdir)

        def _ckpt(df: DataFrame) -> DataFrame:
            return df.checkpoint(eager=True)
    else:

        def _ckpt(df: DataFrame) -> DataFrame:
            return df.localCheckpoint(eager=True)

    pairs = _ckpt(
        edges.select(
            F.col(parent_col).alias("ancestor"),
            F.col(child_col).alias("descendant"),
        )
        .filter(F.col("ancestor") != F.col("descendant"))
        .distinct()
        .select(
            "ancestor",
            "descendant",
            F.lit(1).cast("long").alias("min_levels"),
            F.lit(1).cast("long").alias("max_levels"),
        )
    )

    def _sig(df: DataFrame) -> tuple:
        row = df.agg(
            F.count("*").alias("n"),
            F.sum("min_levels").alias("s_min"),
            F.sum("max_levels").alias("s_max"),
        ).collect()[0]
        return (row["n"], row["s_min"], row["s_max"])

    stats: dict = {"rounds": 0, "pairs_per_round": [], "converged": False}
    if ckpt_subdir is not None:
        stats["checkpoint_subdir"] = ckpt_subdir
    sig = _sig(pairs)
    stats["pairs_per_round"].append(sig[0])
    for _ in range(max_iter):
        mid = (
            pairs.alias("l")
            .join(
                pairs.alias("r"),
                F.col("l.descendant") == F.col("r.ancestor"),
            )
            .select(
                F.col("l.ancestor").alias("ancestor"),
                F.col("r.descendant").alias("descendant"),
                (F.col("l.min_levels") + F.col("r.min_levels")).alias(
                    "min_levels"
                ),
                (F.col("l.max_levels") + F.col("r.max_levels")).alias(
                    "max_levels"
                ),
            )
            .filter(F.col("ancestor") != F.col("descendant"))
        )
        new_pairs = _ckpt(
            pairs.unionByName(mid)
            .groupBy("ancestor", "descendant")
            .agg(
                F.min("min_levels").alias("min_levels"),
                F.max("max_levels").alias("max_levels"),
            )
        )
        new_sig = _sig(new_pairs)
        pairs = new_pairs
        stats["rounds"] += 1
        stats["pairs_per_round"].append(new_sig[0])
        if new_sig == sig:
            stats["converged"] = True
            break
        sig = new_sig
    if not stats["converged"]:
        raise RuntimeError(
            f"ancestor_closure did not reach a fixpoint in {max_iter} "
            f"rounds (pairs_per_round={stats['pairs_per_round'][-3:]}); "
            "either the hierarchy is deeper than 2^(max_iter-1) levels "
            "or the input contains a CYCLE (max_levels diverges)"
        )
    if include_self:
        nodes = (
            pairs.select(F.col("ancestor").alias("node"))
            .unionByName(pairs.select(F.col("descendant").alias("node")))
            .distinct()
        )
        pairs = pairs.unionByName(
            nodes.select(
                F.col("node").alias("ancestor"),
                F.col("node").alias("descendant"),
                F.lit(0).cast("long").alias("min_levels"),
                F.lit(0).cast("long").alias("max_levels"),
            )
        )
    return pairs, stats
