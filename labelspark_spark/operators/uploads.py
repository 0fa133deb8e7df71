"""Connector surface: uploads struct, divider codec, upsert semantics.

Rebuilds the reference's upload dataflow (SURVEY §2.7 U1-U7, §2.3 J2/J3)
as single native projections and joins:

- The reference builds its nested ``uploads`` column through a chain of
  4+ row-at-a-time Python UDFs (`labelspark/uploader.py:157-195`), each
  a JVM->Python round trip. Here the whole struct is ONE ``F.struct``
  projection — whole-stage codegen, zero Python.
- Column semantics come from the ``{kind}///{type}///{name}`` header
  convention (`uploader.py:179,190`, `datasets/*.csv`); the codec below
  parses it once on the driver (schema metadata, not data).
- Broadcast-dict lookups (`update_metadata.py:33-51`,
  `create_labelbox_dataset.py:221-239`: JSON literal re-parsed per row)
  become broadcast left joins + coalesce.
- Upsert key handling (`client.py:217-219`): skip = left-anti join;
  dedupe-suffix = window row_number.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DIVIDER = "///"

METADATA_TYPES = ("string", "number", "enum", "datetime")
ATTACHMENT_TYPES = ("image", "video", "text_url", "raw_text", "html")
ANNOTATION_TYPES = ("bbox", "polygon", "mask", "point", "line", "radio", "checklist", "text")


@dataclass(frozen=True)
class ConventionColumn:
    """One parsed `{kind}///{type}///{name}` header."""

    column: str
    kind: str
    value_type: str
    name: str


def parse_convention_columns(columns: list[str], divider: str = DIVIDER) -> list[ConventionColumn]:
    """Parse divider-convention headers (uploader.py:179,190)."""
    out = []
    for c in columns:
        parts = c.split(divider)
        if len(parts) == 3:
            out.append(ConventionColumn(column=c, kind=parts[0], value_type=parts[1], name=parts[2]))
    return out


def build_uploads(
    df: DataFrame,
    row_data_col: str,
    global_key_col: str | None = None,
    external_id_col: str | None = None,
    dataset_id: str | None = None,
    project_id: str | None = None,
    divider: str = DIVIDER,
    uploads_col: str = "uploads",
    typed_annotations: bool = False,
) -> DataFrame:
    """Build the nested uploads struct in ONE projection.

    ``typed_annotations=True`` replaces the raw ``{type,name,value}``
    annotation maps with per-kind parsed ndjson payloads
    (``{annotation_type: ndjson}``, uploader.py:242-261) — still a single
    projection, still zero Python.

    Schema mirrors `uploader.py:143-153`:
    struct<data_row: struct<row_data, global_key, external_id,
    metadata_fields: array<map<string,string>>,
    attachments: array<map<string,string>>>,
    dataset_id, project_id,
    annotations: array<map<string,string>>>.

    Convention columns are discovered from the header; null-valued cells
    are filtered out of the arrays (the UDF chain's per-row guards,
    `uploader.py:238`).
    """
    conv = parse_convention_columns(df.columns, divider)
    gk = F.col(global_key_col) if global_key_col else F.col(row_data_col)
    ext = F.col(external_id_col) if external_id_col else gk

    metadata_entries = [
        F.when(
            F.col(f"`{c.column}`").isNotNull(),
            F.create_map(
                F.lit("name"), F.lit(c.name),
                F.lit("value"), F.col(f"`{c.column}`").cast("string"),
                F.lit("type"), F.lit(c.value_type),
            ),
        )
        for c in conv
        if c.kind == "metadata"
    ]
    attachment_entries = [
        F.when(
            F.col(f"`{c.column}`").isNotNull(),
            F.create_map(
                F.lit("type"), F.lit(c.value_type),
                F.lit("value"), F.col(f"`{c.column}`").cast("string"),
            ),
        )
        for c in conv
        if c.kind == "attachment"
    ]
    annotation_entries = [
        F.when(
            F.col(f"`{c.column}`").isNotNull(),
            F.create_map(
                F.lit("type"), F.lit(c.value_type),
                F.lit("name"), F.lit(c.name),
                F.lit("value"), F.col(f"`{c.column}`").cast("string"),
            ),
        )
        for c in conv
        if c.kind == "annotation"
    ]

    def _compact(entries):
        arr = F.array(*entries) if entries else F.array().cast("array<map<string,string>>")
        return F.filter(arr, lambda x: x.isNotNull())

    annotations = (
        build_typed_annotations(df, divider)
        if typed_annotations
        else _compact(annotation_entries)
    )
    uploads = F.struct(
        F.struct(
            F.col(row_data_col).cast("string").alias("row_data"),
            gk.cast("string").alias("global_key"),
            ext.cast("string").alias("external_id"),
            _compact(metadata_entries).alias("metadata_fields"),
            _compact(attachment_entries).alias("attachments"),
        ).alias("data_row"),
        F.lit(dataset_id).cast("string").alias("dataset_id"),
        F.lit(project_id).cast("string").alias("project_id"),
        annotations.alias("annotations"),
    )
    return df.withColumn(uploads_col, uploads)


# --------------------------------------------------------------------------
# typed annotation ndjson building (reference uploader.py:242-261, which
# delegates per-kind payload construction to labelbase.create_ndjsons and
# serializes each as {annotation_type: json.dumps(ndjson)})
# --------------------------------------------------------------------------

_EMPTY_SUBCLS = "array<struct<name:string,answer:string>>"


def _bind(value, fn):
    """HOF let-binding: evaluate ``value`` ONCE and pass it to ``fn``.

    PySpark Column reuse duplicates the expression tree — ``g[0]`` ..
    ``g[3]`` over a shared ``from_json`` Column re-parses the JSON four
    times per element (interpreted HOF eval has no CSE). Wrapping the
    value in a single-element array and transforming binds it to a
    lambda variable the engine evaluates once.
    """
    return F.transform(F.array(value), fn)[0]


def _entry_parts(cell):
    """Split one annotation cell into per-entry part-string arrays.

    Cell payloads are stringified nested lists (datasets/annotations.csv,
    parsed by the reference with ast.literal_eval semantics at
    add_json_answers_to_dictionary.py:7). Spark's JSON parser accepts the
    single-quoted variant (allowSingleQuotes defaults true), and parsing
    into ``array<array<string>>`` splits BOTH outer levels in one pass:
    each entry becomes an array of part strings — scalar parts as their
    values, nested arrays as raw JSON text for the per-kind parsers.
    """
    return F.coalesce(
        F.from_json(cell, "array<array<string>>"),
        F.array().cast("array<array<string>>"),
    )


def _tool_subclassifications(subs_json, divider: str):
    """`['question///answer', ...]` -> array<struct<name,answer>>.

    One nesting level (the fixture corpus' depth). The reference resolves
    deeper trees plus ontology schema ids via labelbase; schema-id
    resolution lives in :mod:`labelspark_spark.operators.ontology`.
    """
    subs = F.coalesce(
        F.from_json(subs_json, "array<string>"), F.array().cast("array<string>")
    )
    return F.transform(
        subs,
        lambda s: _bind(
            F.split(s, divider),
            lambda ss: F.struct(
                ss[0].alias("name"), F.element_at(ss, 2).alias("answer")
            ),
        ),
    )


_ANN_EXPR_CACHE: dict[tuple[str, str, str, str], object] = {}
_ANN_EXPR_CTX: list[object] = [None]


def annotation_ndjsons(col_name: str, kind: str, feature: str, divider: str = DIVIDER):
    """Memoized wrapper over :func:`_annotation_ndjsons`.

    The per-kind parse tree is ~hundreds of Column constructions (py4j
    round trips) — ~1s of DRIVER time per build at 8 annotation columns,
    paid per query invocation, none of it executor work. Unresolved
    Columns are plan templates, safely reusable across queries; the memo
    is keyed per SparkContext because the underlying JVM objects die
    with the py4j gateway."""
    from pyspark import SparkContext

    ctx = SparkContext._active_spark_context
    if _ANN_EXPR_CTX[0] is not ctx:
        _ANN_EXPR_CACHE.clear()
        _ANN_EXPR_CTX[0] = ctx
    key = (col_name, kind, feature, divider)
    if key not in _ANN_EXPR_CACHE:
        _ANN_EXPR_CACHE[key] = _annotation_ndjsons(col_name, kind, feature, divider)
    return _ANN_EXPR_CACHE[key]


def _annotation_ndjsons(col_name: str, kind: str, feature: str, divider: str = DIVIDER):
    """One annotation convention column -> array<string> of ndjson payloads.

    Payload shapes follow the platform's public ndjson import format, one
    JSON object per annotation instance:

    - bbox      {"name", "bbox": {top,left,height,width}, "classifications"}
    - polygon   {"name", "polygon": [{x,y},...], "classifications"}
    - point     {"name", "point": {x,y}, "classifications"}
    - line      {"name", "line": [{x,y},...], "classifications"}
    - mask      {"name", "mask": {"png": b64}, "classifications"}
    - radio     {"name", "answer": {"name": a}, "classifications"}
    - checklist {"name", "answers": [{"name": a},...]}
    - text      {"name", "answer": raw-string}

    Radio answer paths `a///subq///suba` carry the one-level nested
    classification; tool entries carry theirs in the `[geom, [q///a,...]]`
    second slot. The whole column is native Spark expressions
    (from_json / transform / to_json) — the reference runs a Python UDF
    per annotation column per row (uploader.py:186-195).
    """
    if kind not in ANNOTATION_TYPES:
        raise ValueError(f"unknown annotation kind {kind!r}")
    cell = F.col(f"`{col_name}`")
    name = F.lit(feature).alias("name")
    # both outer levels split in ONE from_json; every remaining parse
    # below is let-bound via _bind so it runs once per element
    entries = _entry_parts(cell)

    if kind in ("bbox", "point"):
        def _geo(e):
            subs = _tool_subclassifications(F.element_at(e, 2), divider)
            return _bind(
                F.from_json(e[0], "array<double>"),
                lambda g: F.to_json(F.struct(
                    name,
                    (
                        F.struct(
                            g[0].alias("top"), g[1].alias("left"),
                            g[2].alias("height"), g[3].alias("width"),
                        ).alias("bbox")
                        if kind == "bbox"
                        else F.struct(g[0].alias("x"), g[1].alias("y")).alias("point")
                    ),
                    subs.alias("classifications"),
                )),
            )
        return F.transform(entries, _geo)

    if kind in ("polygon", "line"):
        def _poly(e):
            ring = F.transform(
                F.from_json(e[0], "array<array<double>>"),
                lambda p: F.struct(p[0].alias("x"), p[1].alias("y")),
            ).alias(kind)
            return F.to_json(F.struct(
                name, ring,
                _tool_subclassifications(F.element_at(e, 2), divider).alias("classifications"),
            ))
        return F.transform(entries, _poly)

    if kind == "mask":
        def _mask(e):
            png = F.from_json(e[0], "array<string>")[0]
            return F.to_json(F.struct(
                name,
                F.struct(png.alias("png")).alias("mask"),
                F.array().cast(_EMPTY_SUBCLS).alias("classifications"),
            ))
        return F.transform(entries, _mask)

    if kind == "radio":
        def _radio(e):
            return _bind(
                F.split(e[0], divider),
                lambda segs: F.to_json(F.struct(
                    name,
                    F.struct(segs[0].alias("name")).alias("answer"),
                    F.when(
                        F.size(segs) >= 3,
                        F.array(
                            F.struct(segs[1].alias("name"), segs[2].alias("answer"))
                        ),
                    ).otherwise(F.array().cast(_EMPTY_SUBCLS)).alias("classifications"),
                )),
            )
        return F.transform(entries, _radio)

    if kind == "checklist":
        def _check(e):
            answers = F.transform(
                e, lambda i: F.struct(F.split(i, divider)[0].alias("name"))
            )
            return F.to_json(F.struct(name, answers.alias("answers")))
        return F.transform(entries, _check)

    # kind == "text"
    def _text(e):
        return F.to_json(F.struct(name, e[0].alias("answer")))
    return F.transform(entries, _text)


def build_typed_annotations(
    df: DataFrame, divider: str = DIVIDER
):
    """All annotation convention columns -> one array<map<string,string>>
    column matching the uploads schema slot: each element
    ``{annotation_type: ndjson-string}`` (uploader.py:256-257)."""
    conv = [c for c in parse_convention_columns(df.columns, divider) if c.kind == "annotation"]

    def _tagger(kind):
        # single-arg closure: PySpark HOF lambdas dispatch on ARITY, so a
        # bound-default second param would receive the array index
        return lambda s: F.create_map(F.lit(kind), s)

    arrays = [
        F.transform(
            annotation_ndjsons(c.column, c.value_type, c.name, divider),
            _tagger(c.value_type),
        )
        for c in conv
    ]
    if not arrays:
        return F.array().cast("array<map<string,string>>")
    return F.flatten(F.array(*arrays))


def upsert_keys(
    df: DataFrame,
    existing: DataFrame,
    key_col: str = "global_key",
    mode: str = "skip",
    divider: str = DIVIDER,
    order_by: str | None = None,
) -> DataFrame:
    """J3 rebuilt: reconcile incoming keys against existing ones.

    mode='skip'   -> drop rows whose key already exists (left-anti join;
                     reference `skip_duplicates=True`, client.py:217).
    mode='suffix' -> keep them, renaming key to `key{div}{n}` with a
                     deterministic per-key counter (window row_number;
                     reference appends a divider suffix, client.py:218-219).
                     Pass ``order_by`` (a column name) for a reproducible
                     counter; default falls back to input order.

    Suffixing applies ONLY to genuinely colliding rows (r12 ADVICE —
    the reference suffixes only actual duplicates, client.py:218-219):
    a row whose literal key is absent from the existing set AND is the
    first occurrence of that literal key in batch order is kept
    VERBATIM, whether bare or already suffix-form — user-visible global
    keys are never silently rewritten. A row collides when its literal
    key exists remotely or repeats an earlier in-batch row (the
    reference collapses to one row per unique global key,
    uploader.py:80-99, so posting two identical new keys verbatim would
    still collide server-side).

    Colliding rows mint ``base{div}{n}`` past the family max, where the
    family is every key sharing the same stripped base and the max
    spans BOTH existing suffixes AND the suffixes of incoming rows kept
    verbatim — so a minted key can collide with neither side, and a
    third upsert of the same key yields ``key{div}2`` instead of
    regenerating the ``key{div}1`` the second upsert already spooled.
    """
    keys = existing.select(F.col(key_col).alias("_existing_key")).distinct()
    if mode == "skip":
        return df.join(
            F.broadcast(keys), df[key_col] == keys["_existing_key"], "left_anti"
        )
    if mode == "suffix":
        import re as _re

        sfx_re = _re.escape(divider) + r"(\d+)$"
        fam = (
            keys.select(
                F.regexp_replace("_existing_key", sfx_re, "").alias("_base"),
                F.coalesce(
                    F.nullif(F.regexp_extract("_existing_key", sfx_re, 1), F.lit("")),
                    F.lit("0"),
                ).cast("int").alias("_sfx"),
            )
            .groupBy("_base")
            .agg(F.max("_sfx").alias("_max_sfx"))
        )
        # Collision is decided on the LITERAL key (r12 ADVICE — the r11
        # base-family join renamed suffix-form keys that collided with
        # nothing); the mint counter is decided on the stripped base
        # family, spanning existing AND verbatim-kept incoming
        # suffixes so minted keys collide with neither.
        inc_base = F.regexp_replace(F.col(key_col), sfx_re, "")
        inc_sfx = F.coalesce(
            F.nullif(F.regexp_extract(F.col(key_col), sfx_re, 1), F.lit("")),
            F.lit("0"),
        ).cast("int")
        flagged = (
            df.withColumn("_inc_base", inc_base)
            .withColumn("_inc_sfx", inc_sfx)
            .join(F.broadcast(keys), F.col(key_col) == F.col("_existing_key"), "left")
            .join(F.broadcast(fam), F.col("_inc_base") == F.col("_base"), "left")
        )
        order_expr = F.col(order_by) if order_by else F.monotonically_increasing_id()
        # first in-batch occurrence of each LITERAL key, in batch order
        w_key = Window.partitionBy("_inc_base", key_col).orderBy(order_expr)
        flagged = flagged.withColumn("_key_rn", F.row_number().over(w_key))
        flagged = flagged.withColumn(
            "_keep", F.col("_existing_key").isNull() & (F.col("_key_rn") == 1)
        )
        # family max spans existing suffixes and kept incoming suffixes
        # (whole-family window, both partitioned by _inc_base so the
        # keyed shuffle is shared with the running collider rank below)
        kept_max = F.max(
            F.when(F.col("_keep"), F.col("_inc_sfx")).otherwise(0)
        ).over(Window.partitionBy("_inc_base"))
        w_run = (
            Window.partitionBy("_inc_base")
            .orderBy(order_expr)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        mint_rn = F.sum(F.when(F.col("_keep"), 0).otherwise(1)).over(w_run)
        fmax = F.greatest(F.coalesce(F.col("_max_sfx"), F.lit(0)), kept_max)
        return (
            flagged.withColumn(
                key_col,
                F.when(F.col("_keep"), F.col(key_col)).otherwise(
                    F.concat(
                        F.col("_inc_base"),
                        F.lit(divider),
                        (fmax + mint_rn).cast("string"),
                    )
                ),
            )
            .drop("_existing_key", "_base", "_max_sfx", "_inc_base", "_inc_sfx",
                  "_key_rn", "_keep")
        )
    raise ValueError(f"mode must be 'skip' or 'suffix', got {mode!r}")


def lookup_join(
    df: DataFrame,
    lookup: DataFrame,
    key_col: str,
    value_col: str,
    target_col: str,
    default_col: str | None = None,
) -> DataFrame:
    """J2/U7 rebuilt: broadcast left join + coalesce.

    Replaces the reference's driver-dict-as-JSON-literal probe
    (`update_metadata.py:42-51`): the lookup side is a real DataFrame,
    broadcast once, no per-row JSON parse. ``default_col`` supplies the
    fallback (sync_function's keep-current-value semantics).
    """
    # deterministic duplicate resolution: a remote export can carry two
    # rows for one key (re-labeled data row), and dropDuplicates keeps
    # whichever the shuffle delivers first — repeated runs over the
    # same inputs would sync different values (r11 review). max() is an
    # arbitrary-but-STABLE rule, and it prefers non-null.
    small = F.broadcast(
        lookup.select(
            F.col(key_col).alias("_lk_key"), F.col(value_col).alias("_lk_val")
        )
        .groupBy("_lk_key")
        .agg(F.max("_lk_val").alias("_lk_val"))
    )
    joined = df.join(small, df[key_col] == small["_lk_key"], "left")
    fallback = F.col(default_col) if default_col else F.lit(None)
    return joined.withColumn(target_col, F.coalesce(F.col("_lk_val"), fallback)).drop(
        "_lk_key", "_lk_val"
    )
