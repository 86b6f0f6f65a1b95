"""S1 — grafted derivation: ``code_files`` → (concepts, raw_edges).

Maps the code-repo source table (BASELINE input_hint) onto the reference's
two-table shape (SURVEY §1.5) so every downstream stage is domain-agnostic.
All transforms are built-in JVM expressions (``xxhash64``, ``sha2``,
``split``, ``regexp_extract_all`` …) — strictly faster than even Arrow UDFs;
no per-row Python anywhere.

Concept mapping (SURVEY §1.5):
  concept_id        = abs(xxhash64(repo‖path‖commit)) as decimal string
  concept_name      = last path segment
  vocabulary_id     = lang            (the skew analog)
  domain_id         = repo
  concept_class_id  = file extension  ('dir' for directory concepts)
  concept_code      = path
  standard_concept  = 'S'
  src_sha256        = sha2(content, 256)   (the per-row invariant)

Directory concepts are synthesized for every path prefix (vocabulary_id=''
→ 'Metadata' partition, reference X8 semantics) so containment 'Is a'
edges resolve to real subjects.

Edge derivation (same schema as concept_relationship, so S2+ apply as-is):
  - containment: file →('Is a')→ parent dir →('Is a')→ grandparent …
  - same-content: rows sharing sha256(content) → star 'Maps to' edges to
    the group's min concept_id (CC input; avoids O(k²) pair blowup)
  - imports: ``import pkgN.modM`` lines matched per-repo against module
    stems (equi-join; unresolvable imports drop — dangling-object asymmetry
    R7 allows objects without concept rows, but we need a real id to emit)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_IMPORT_RE = r"import\s+(pkg\d+\.mod\d+)"


def _file_concept_id() -> F.Column:
    return F.abs(
        F.xxhash64(F.col("repo"), F.col("path"), F.col("commit"))
    ).cast("string")


def _dir_concept_id(repo: F.Column, dirpath: F.Column) -> F.Column:
    return F.abs(F.xxhash64(repo, dirpath, F.lit("dir"))).cast("string")


def derive_file_concepts(
    code_files: DataFrame, with_import_toks: bool = False
) -> DataFrame:
    """File-row concepts only — stateless (streaming-safe).

    ``with_import_toks=True`` adds an ``import_toks`` array column (the
    per-file import tokens) extracted in the SAME projection as the
    sha256 — so ``content``, the dominant column at 100 TB, is scanned
    exactly once for the whole pipeline (edges then derive from the
    concepts checkpoint with zero further content reads)."""
    cols = [
        _file_concept_id().alias("concept_id"),
        F.element_at(F.split(F.col("path"), "/"), -1).alias("concept_name"),
        F.col("repo").alias("domain_id"),
        F.col("lang").alias("vocabulary_id"),
        F.regexp_extract(F.col("path"), r"\.([^./]+)$", 1).alias("concept_class_id"),
        F.lit("S").alias("standard_concept"),
        F.col("path").alias("concept_code"),
        F.lit("").alias("valid_start_date"),
        F.lit("").alias("valid_end_date"),
        F.lit("").alias("invalid_reason"),
        F.sha2(F.coalesce(F.col("content"), F.lit("")), 256).alias("src_sha256"),
    ]
    if with_import_toks:
        cols.append(
            F.regexp_extract_all(
                F.coalesce(F.col("content"), F.lit("")), F.lit(_IMPORT_RE), 1
            ).alias("import_toks")
        )
    return code_files.select(*cols)


def derive_concepts(
    code_files: DataFrame, with_import_toks: bool = False
) -> DataFrame:
    """File concepts ∪ synthesized directory concepts (batch path).

    Directory concepts need a global ``distinct`` (stateful), so the
    streaming path uses :func:`derive_file_concepts` only."""
    files = derive_file_concepts(code_files, with_import_toks=with_import_toks)
    dirs = _dir_paths(code_files).select(
        _dir_concept_id(F.col("repo"), F.col("dirpath")).alias("concept_id"),
        F.element_at(F.split(F.col("dirpath"), "/"), -1).alias("concept_name"),
        F.col("repo").alias("domain_id"),
        F.lit("").alias("vocabulary_id"),
        F.lit("dir").alias("concept_class_id"),
        F.lit("S").alias("standard_concept"),
        F.col("dirpath").alias("concept_code"),
        F.lit("").alias("valid_start_date"),
        F.lit("").alias("valid_end_date"),
        F.lit("").alias("invalid_reason"),
        F.lit("").alias("src_sha256"),
    )
    if with_import_toks:
        dirs = dirs.withColumn(
            "import_toks", F.array().cast("array<string>")
        )
    return files.unionByName(dirs)


def _dir_paths(code_files: DataFrame) -> DataFrame:
    """Distinct (repo, dirpath) for every proper path prefix — built with
    ``transform(sequence(...))`` + ``explode``, no Python."""
    # NB: guard single-segment paths — sequence(1, 0) is DESCENDING [1, 0]
    # in Spark, which would fabricate a "directory" named after the file
    prefixes = F.expr(
        "CASE WHEN size(split(path, '/')) >= 2 THEN "
        "transform(sequence(1, size(split(path, '/')) - 1), "
        "k -> array_join(slice(split(path, '/'), 1, k), '/')) "
        "ELSE array() END"
    )
    return (
        code_files.select("repo", F.explode(prefixes).alias("dirpath"))
        .filter(F.col("dirpath") != "")
        .distinct()
    )


def _edge(c1: F.Column, c2: F.Column, rel: str) -> list[F.Column]:
    return [
        c1.alias("concept_id_1"),
        c2.alias("concept_id_2"),
        F.lit(rel).alias("relationship_id"),
        F.lit("").alias("valid_start_date"),
        F.lit("").alias("valid_end_date"),
        F.lit("").alias("invalid_reason"),
    ]


def derive_edges_from_concepts(concepts: DataFrame) -> DataFrame:
    """Containment ∪ same-sha 'Maps to' ∪ import edges, derived ENTIRELY
    from a concepts frame that carries ``import_toks`` — zero reads of the
    source ``content`` column.

    This is the scale path: with ``derive_concepts(code,
    with_import_toks=True)`` checkpointed as s1, the 100 TB ``content``
    column is scanned exactly once per pipeline run; every edge family
    below works off the (narrow) checkpoint.  File rows are the ones with
    a non-empty ``src_sha256``; directory rows (synthesized, sha='')
    re-derive their ids from (domain_id, concept_code) with the same
    ``_dir_concept_id`` hash.
    """
    files = concepts.filter(F.col("src_sha256") != "").select(
        F.col("concept_id").alias("cid"),
        F.col("domain_id").alias("repo"),
        F.col("concept_code").alias("path"),
        "src_sha256",
        "import_toks",
    )
    repo = F.col("repo")

    # file → immediate parent directory
    parent_dir = F.expr(
        "array_join(slice(split(path, '/'), 1, size(split(path, '/')) - 1), '/')"
    )
    file_contain = files.filter(F.size(F.split(F.col("path"), "/")) > 1).select(
        *_edge(F.col("cid"), _dir_concept_id(repo, parent_dir), "Is a")
    )

    # dir → parent dir (dir concept rows already exist — no re-distinct)
    dirs = concepts.filter(
        (F.col("src_sha256") == "") & (F.col("concept_class_id") == "dir")
    ).select(
        F.col("concept_id").alias("cid"),
        F.col("domain_id").alias("repo"),
        F.col("concept_code").alias("dirpath"),
    )
    dir_parent = F.expr(
        "array_join(slice(split(dirpath, '/'), 1, size(split(dirpath, '/')) - 1), '/')"
    )
    dir_contain = dirs.filter(
        F.size(F.split(F.col("dirpath"), "/")) > 1
    ).select(*_edge(F.col("cid"), _dir_concept_id(repo, dir_parent), "Is a"))

    # same-content equivalence: star to the group min (CC-friendly, no k²)
    hubs = files.groupBy("src_sha256").agg(
        F.min("cid").alias("hub"), F.count("*").alias("n")
    ).filter(F.col("n") > 1)
    maps_to = (
        files.join(hubs, "src_sha256")
        .filter(F.col("cid") != F.col("hub"))
        .select(*_edge(F.col("cid"), F.col("hub"), "Maps to"))
    )

    # imports: token → (repo, pkg.stem) equi-join against module stems
    imports = files.select(
        F.col("cid").alias("src_cid"),
        repo.alias("r"),
        F.explode("import_toks").alias("tok"),
    )
    parts_t = F.split(F.col("path"), "/")
    targets = files.filter(F.size(parts_t) >= 2).select(
        F.col("cid").alias("dst_cid"),
        repo.alias("r"),
        F.concat(
            F.element_at(parts_t, -2),
            F.lit("."),
            F.regexp_replace(F.element_at(parts_t, -1), r"\.[^.]+$", ""),
        ).alias("tok"),
    )
    import_edges = (
        imports.join(targets, ["r", "tok"])
        .filter(F.col("src_cid") != F.col("dst_cid"))
        .select(*_edge(F.col("src_cid"), F.col("dst_cid"), "imports"))
    )

    return file_contain.unionByName(dir_contain).unionByName(maps_to).unionByName(
        import_edges
    )


def derive_edges(
    code_files: DataFrame, concepts: DataFrame | None = None
) -> DataFrame:
    """Containment ∪ same-sha 'Maps to' ∪ import edges.

    When ``concepts`` carries ``import_toks`` (derive_concepts with
    ``with_import_toks=True``) the whole derivation runs off the concepts
    frame via :func:`derive_edges_from_concepts` — no content re-read at
    all.  Otherwise, pass ``concepts`` to at least reuse its ``src_sha256``
    for the Maps-to groups — skips one full re-read + re-hash of the
    ``content`` column.
    """
    if concepts is not None and "import_toks" in concepts.columns:
        return derive_edges_from_concepts(concepts)
    repo = F.col("repo")

    # file → immediate parent directory
    parent_dir = F.expr(
        "array_join(slice(split(path, '/'), 1, size(split(path, '/')) - 1), '/')"
    )
    file_contain = code_files.filter(F.size(F.split(F.col("path"), "/")) > 1).select(
        *_edge(_file_concept_id(), _dir_concept_id(repo, parent_dir), "Is a")
    )

    # dir → parent dir
    dirs = _dir_paths(code_files).filter(F.size(F.split(F.col("dirpath"), "/")) > 1)
    dir_parent = F.expr(
        "array_join(slice(split(dirpath, '/'), 1, size(split(dirpath, '/')) - 1), '/')"
    )
    dir_contain = dirs.select(
        *_edge(
            _dir_concept_id(repo, F.col("dirpath")),
            _dir_concept_id(repo, dir_parent),
            "Is a",
        )
    )

    # same-content equivalence: star to the group min (CC-friendly, no k²)
    if concepts is not None:
        by_sha = concepts.filter(F.col("src_sha256") != "").select(
            F.col("concept_id").alias("cid"), F.col("src_sha256").alias("sha")
        )
    else:
        # NB: coalesce matches derive_file_concepts — NULL content is
        # normalized to '' per the F1 null-normalize rule, so both the
        # legacy and the single-scan path group it with empty files
        by_sha = code_files.select(
            _file_concept_id().alias("cid"),
            F.sha2(F.coalesce(F.col("content"), F.lit("")), 256).alias("sha"),
        )
    hubs = by_sha.groupBy("sha").agg(
        F.min("cid").alias("hub"), F.count("*").alias("n")
    ).filter(F.col("n") > 1)
    maps_to = (
        by_sha.join(hubs, "sha")
        .filter(F.col("cid") != F.col("hub"))
        .select(*_edge(F.col("cid"), F.col("hub"), "Maps to"))
    )

    # imports: token → (repo, pkg.stem) equi-join against module stems
    imports = code_files.select(
        _file_concept_id().alias("src_cid"),
        repo.alias("r"),
        # NB: F.regexp_extract_all with a Column pattern, NOT F.expr with an
        # interpolated regex — SQL string literals eat the backslashes.
        F.explode(
            F.regexp_extract_all("content", F.lit(_IMPORT_RE), 1)
        ).alias("tok"),
    )
    # single-segment paths (root-level files) have no package dir —
    # guard the -2 access (element_at throws under ANSI) and drop them
    # from the import-target side rather than crash the stage
    parts_t = F.split(F.col("path"), "/")
    targets = code_files.filter(F.size(parts_t) >= 2).select(
        _file_concept_id().alias("dst_cid"),
        repo.alias("r"),
        F.concat(
            F.element_at(parts_t, -2),
            F.lit("."),
            F.regexp_replace(F.element_at(parts_t, -1), r"\.[^.]+$", ""),
        ).alias("tok"),
    )
    import_edges = (
        imports.join(targets, ["r", "tok"])
        .filter(F.col("src_cid") != F.col("dst_cid"))
        .select(*_edge(F.col("src_cid"), F.col("dst_cid"), "imports"))
    )

    return file_contain.unionByName(dir_contain).unionByName(maps_to).unionByName(
        import_edges
    )
