"""The reference's config-driven field-mapping algebra as
DataFrame-level (Catalyst-native) operations.

The per-document kernel (`extract_core.modify_json`) applies the same
algebra inside the parse UDF; this module is the Spark-first
expression for inputs that are *already columnar* — pure projections,
so Catalyst prunes/pushes them for free and nothing touches Python.

| Reference op (file:line) | Here |
|---|---|
| lowerCaseKeys (xml-to-es.js:62-78) | lowercase_columns — schema rename, zero data work |
| promoteOne `parent.key → target` (xml-to-es.js:179-232) | promote — struct field extraction, clobber = last-writer-wins |
| deleteFieldsObjectHandler (xml-to-es.js:108-126) | delete_fields — drop / dropFields |
| flattenObjectHandler `{d:[{'#':v}]}` (xml-to-es.js:98-106) | flatten_wrappers — transform(arr, x -> x['#']) |
| renameObjectHandler (xml-to-es.js:128-137) | rename_fields — withColumnRenamed |
| id default missingID-n (xml-to-es.js:276) | ensure_id — deterministic hash, not a mutable counter |
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def lowercase_columns(df: DataFrame, recurse: bool = True) -> DataFrame:
    """Lowercase every column name; with ``recurse``, struct fields
    too (pure projection — a rename, never a shuffle)."""

    def lower_type(dt: T.DataType) -> T.DataType:
        if isinstance(dt, T.StructType):
            return T.StructType(
                [
                    T.StructField(f.name.lower(), lower_type(f.dataType), f.nullable)
                    for f in dt.fields
                ]
            )
        if isinstance(dt, T.ArrayType):
            return T.ArrayType(lower_type(dt.elementType), dt.containsNull)
        if isinstance(dt, T.MapType):
            return T.MapType(dt.keyType, lower_type(dt.valueType), dt.valueContainsNull)
        return dt

    out = df.toDF(*[c.lower() for c in df.columns])
    if recurse:
        for fld in out.schema.fields:
            lowered = lower_type(fld.dataType)
            if lowered != fld.dataType:
                out = out.withColumn(fld.name, F.col(fld.name).cast(lowered))
    return out


def promote(df: DataFrame, spec: dict[str, list]) -> DataFrame:
    """Hoist struct fields to top level. ``spec`` maps parent column →
    list of field names or ``{"key": k, "target": t}`` renames-on-
    promote. Collisions clobber (reference warns + clobbers,
    xml-to-es.js:218-222); parents emptied of all fields are dropped."""
    for parent, keys in spec.items():
        if parent not in df.columns:
            continue
        dt = df.schema[parent].dataType
        if not isinstance(dt, T.StructType):
            continue
        remaining = [f.name for f in dt.fields]
        for k in keys:
            if isinstance(k, dict):
                key, target = k["key"], k["target"]
            else:
                key = target = k
            if key not in remaining:
                continue
            df = df.withColumn(target, F.col(f"{parent}.{key}"))
            remaining.remove(key)
            if remaining:
                # dropFields cannot remove a struct's last field
                df = df.withColumn(parent, F.col(parent).dropFields(key))
            else:
                df = df.drop(parent)
    return df


def delete_fields(df: DataFrame, spec: dict[str, list[str]]) -> DataFrame:
    """``{'.': [top-level cols], parent: [struct fields]}``. Emptied
    struct parents are dropped (reference prunes them,
    xml-to-es.js:119-121)."""
    for col in spec.get(".", []):
        df = df.drop(col)
    for parent, fields in spec.items():
        if parent == "." or parent not in df.columns:
            continue
        dt = df.schema[parent].dataType
        if not isinstance(dt, T.StructType):
            continue
        keep = [f.name for f in dt.fields if f.name not in set(fields)]
        if not keep:
            df = df.drop(parent)
        else:
            df = df.withColumn(
                parent, F.struct(*[F.col(f"{parent}.{k}").alias(k) for k in keep])
            )
    return df


def rename_fields(df: DataFrame, renames: dict[str, str]) -> DataFrame:
    for old, new in renames.items():
        if old in df.columns:
            df = df.withColumnRenamed(old, new)
    return df


def flatten_wrappers(df: DataFrame, cols: list[str], wrapper_key: str = "#") -> DataFrame:
    """``places: array<struct<'#':string>>`` → ``array<string>`` —
    the vacuous-wrapper removal (flatten: ['d'] then auto-'#')."""
    for c in cols:
        if c not in df.columns:
            continue
        dt = df.schema[c].dataType
        if isinstance(dt, T.ArrayType) and isinstance(dt.elementType, T.StructType):
            if wrapper_key in [f.name for f in dt.elementType.fields]:
                df = df.withColumn(
                    c, F.transform(F.col(c), lambda x: x[wrapper_key])
                )
    return df


def ensure_id(df: DataFrame, id_col: str = "id", key_col: str | None = None) -> Column | DataFrame:
    """Reference fallback ``missingID-<counter>`` (xml-to-es.js:276) —
    but deterministic: the counter is a mutable global there (order-
    dependent); at cluster scale we pin id = missingID-<xxhash64(key)>
    so reruns and repartitioning cannot change ids."""
    key = F.col(key_col) if key_col else F.to_json(F.struct(*df.columns))
    fallback = F.concat(F.lit("missingID-"), F.abs(F.xxhash64(key)).cast("string"))
    if id_col in df.columns:
        return df.withColumn(
            id_col, F.coalesce(F.col(id_col).cast("string"), fallback)
        )
    return df.withColumn(id_col, fallback)


def apply_mapping(
    df: DataFrame,
    *,
    promote_spec: dict | None = None,
    delete_spec: dict | None = None,
    flatten_cols: list[str] | None = None,
    rename_spec: dict | None = None,
    pre_process=None,
    id_key: str | None = None,
) -> DataFrame:
    """The full algebra in the reference's fixed order (modifyJson,
    xml-to-es.js:234-286): lowercase → preProcess → promote → delete →
    flatten → rename → id default. ``pre_process`` is the user hook
    (DataFrame → DataFrame), the reference's preProcess
    (xml-to-es.js:240)."""
    df = lowercase_columns(df)
    if pre_process is not None:
        df = pre_process(df)
    if promote_spec:
        df = promote(df, promote_spec)
    if delete_spec:
        df = delete_fields(df, delete_spec)
    if flatten_cols:
        df = flatten_wrappers(df, flatten_cols)
    if rename_spec:
        df = rename_fields(df, rename_spec)
    return ensure_id(df, key_col=id_key)
