"""Canal change-message envelope construction (SURVEY.md §2.5, T1-T7).

The reference turns decoded binlog row images into Canal-compatible JSON
messages (``DmlMessage::from_dml``, /root/reference/src/executor.rs:238-322;
serialization ``format_json`` executor.rs:120-222). This module reproduces
that contract as a declarative DataFrame transform over a *change stream*
DataFrame with columns::

    id     long      -- monotone per-stream sequence (ref src/main.rs:107,122)
    type   string    -- INSERT | UPDATE | DELETE (ref executor.rs:558,581,591)
    es     long      -- event timestamp, epoch millis
    before struct    -- before-image (UPDATE/DELETE), nullable
    after  struct    -- after-image (INSERT/UPDATE), nullable

producing the envelope fields (FIXTURES.md B1)::

    id, database, table, pkNames, isDdl, type, es, ts, sql,
    sqlType map<string,int>, mysqlType map<string,string>,
    data array<map<string,string>>, old array<map<string,string>>

Design notes for scale: everything is per-row expression work (narrow, no
shuffle); the changed-column diff (T2) is *generated per table schema* as a
null-safe struct comparison — Catalyst codegens it, so a 300-column table
costs 300 comparisons inside one codegen stage, not a Python loop. Value
stringification follows the Canal quirk F10 (executor.rs:108-118): every
value is emitted as a string (numbers re-quoted), NULL stays null.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ru_cdc_spark.functions.typemap import jdbc_type_code

# fixed-width fraction so Spark and oracle engines stringify identically
_TS_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"


def stringify(col: Column, spark_type_name: str) -> Column:
    """Canal value formatting (F10): everything becomes a string.

    Timestamps use an explicit fixed 6-digit-fraction format; doubles that
    represent money should be cast to decimal upstream so the text form is
    scale-stable across engines.
    """
    if spark_type_name in ("timestamp", "timestamp_ntz"):
        return F.date_format(col, _TS_FMT)
    if spark_type_name == "boolean":
        return F.when(col, F.lit("1")).otherwise(F.lit("0"))
    if spark_type_name == "binary":
        return F.base64(col)
    return col.cast("string")


def _image_map(img: Column, fields: list[tuple[str, str]]) -> Column:
    """struct image -> map<string,string> with Canal stringification,
    preserving column order (T5 field-order contract)."""
    kvs: list[Column] = []
    for name, type_name in fields:
        kvs.append(F.lit(name))
        kvs.append(stringify(img.getField(name), type_name))
    # create_map, not map_from_arrays (r14): same map value, but
    # CreateMap is the node SimplifyExtractValueOps understands — a
    # consumer that extracts a literal key (the flat hash-gated
    # projections do) collapses to the single value expression and the
    # whole map construction is pruned; MapFromArrays defeats the rule
    # and forced every row to build the full stringified map first.
    return F.create_map(*kvs)


def changed_old_map(before: Column, after: Column,
                    fields: list[tuple[str, str]]) -> Column:
    """T2 changed-column diff (executor.rs:266-311).

    Emit only the *before* values of columns whose value changed, using
    null-safe comparison: null vs null => unchanged; null vs value =>
    changed (the reference treats a missing old value as "same" — a row
    with no before-image yields no diff, which the caller handles by
    passing a NULL ``before``).
    """
    entries = []
    for name, type_name in fields:
        b, a = before.getField(name), after.getField(name)
        entries.append(
            F.when(~b.eqNullSafe(a),
                   F.struct(F.lit(name).alias("k"),
                            stringify(b, type_name).alias("v")))
        )
    arr = F.filter(F.array(*entries), lambda x: x.isNotNull())
    return F.map_from_entries(arr)


def image_map_sparse(img: Column, fields: list[tuple[str, str]],
                     present: Column) -> Column:
    """``_image_map`` under partial row images (binlog_row_image=
    MINIMAL/NOBLOB): only columns PRESENT in the image enter the map —
    an absent column's value is unknown, and emitting it as NULL would
    forge a value the statement never produced. ``present`` is a struct
    of booleans field-named like the image."""
    entries = []
    for name, type_name in fields:
        entries.append(
            F.when(present.getField(name),
                   F.struct(F.lit(name).alias("k"),
                            stringify(img.getField(name), type_name)
                            .alias("v"))))
    arr = F.filter(F.array(*entries), lambda x: x.isNotNull())
    return F.map_from_entries(arr)


def changed_old_map_sparse(before: Column, after: Column,
                           fields: list[tuple[str, str]],
                           before_present: Column,
                           after_present: Column) -> Column:
    """T2 changed-column diff under partial row images. A column enters
    ``old`` iff it is PRESENT in the after image (the statement SET it)
    and either:

    * its before value is present and differs (known change — emit the
      real old value), or
    * its before value is ABSENT (MINIMAL before-images are PK-only) —
      the old value is UNKNOWN, so the column is emitted with a NULL
      old value rather than silently treated as unchanged. Suppressing
      it would make downstream consumers (cache invalidation, audit)
      miss real changes; the full-image path's null-safe compare
      (``changed_old_map``) can't express "unknown".
    """
    entries = []
    for name, type_name in fields:
        b, a = before.getField(name), after.getField(name)
        bp = before_present.getField(name)
        ap = after_present.getField(name)
        emit = ap & (~bp | ~b.eqNullSafe(a))
        entries.append(
            F.when(emit,
                   F.struct(F.lit(name).alias("k"),
                            F.when(bp, stringify(b, type_name)).alias("v"))))
    arr = F.filter(F.array(*entries), lambda x: x.isNotNull())
    return F.map_from_entries(arr)


def build_envelope(
    changes: DataFrame,
    database: str,
    table: str,
    pk_cols: list[str],
    mysql_types: dict[str, str],
    processing_ts: Column | None = None,
) -> DataFrame:
    """Assemble the Canal envelope (T1-T7) from a typed change stream.

    ``mysql_types`` maps column name -> MySQL type string (from the catalog,
    the analog of the reference's ``DESC``-driven ``FieldMeta`` registry,
    executor.rs:404-443); its iteration order defines field order (T5).
    """
    after_t = next(f for f in changes.schema.fields if f.name == "after")
    fields = [(f.name, f.dataType.typeName()) for f in after_t.dataType.fields]  # type: ignore[union-attr]

    sql_type = F.map_from_arrays(
        F.array(*[F.lit(c) for c in mysql_types]),
        F.array(*[F.lit(jdbc_type_code(t)) for t in mysql_types.values()]),
    )
    mysql_type = F.map_from_arrays(
        F.array(*[F.lit(c) for c in mysql_types]),
        F.array(*[F.lit(t) for t in mysql_types.values()]),
    )

    before, after = F.col("before"), F.col("after")
    # data: after-image for INSERT/UPDATE; before-image for DELETE.
    # r14: pick the IMAGE with one CASE, then build ONE map over it —
    # the previous when(map_before).otherwise(map_after) constructed
    # two full stringified maps per row and chose between them
    # (per-field: getField(CASE(del, b, a)) ≡ CASE(del, b.f, a.f), so
    # values are identical).
    img = F.when(F.col("type") == "DELETE", before).otherwise(after)
    data_img = _image_map(img, fields)
    old_cond = (F.col("type") == "UPDATE") & before.isNotNull()
    old_map = changed_old_map(before, after, fields)

    ts_col = processing_ts if processing_ts is not None else F.unix_millis(F.current_timestamp())

    return changes.select(
        F.col("id"),
        F.lit(database).alias("database"),
        F.lit(table).alias("table"),
        F.array(*[F.lit(c) for c in pk_cols]).alias("pkNames"),
        F.lit(False).alias("isDdl"),
        F.col("type"),
        F.col("es"),
        ts_col.alias("ts"),
        F.lit("").alias("sql"),
        sql_type.alias("sqlType"),
        mysql_type.alias("mysqlType"),
        F.array(data_img).alias("data"),
        # gate on the CONDITION, not isNotNull(old_map): map_from_
        # entries of a non-null array is never null, so the null test
        # was equivalent — but it made the optimizer evaluate the whole
        # changed-column diff TWICE per row (once inside the test, once
        # in the THEN branch). Same output, half the diff work (r14).
        F.when(old_cond, F.array(old_map)).alias("old"),
    )


def envelope_to_json(envelope: DataFrame) -> DataFrame:
    """T5: serialize the envelope to the Canal JSON payload string plus the
    routing metadata columns (database, table) kept OUTSIDE the payload so
    downstream routing filters never parse JSON (the reference's
    filter-before-decode, executor.rs:528-537; our P5 analog)."""
    return envelope.select(
        "database", "table", "id",
        F.to_json(F.struct(*envelope.columns)).alias("payload"),
    )
