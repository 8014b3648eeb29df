"""P3/U1/F2: column-mapping normalizer + schema evolution (SURVEY.md §2.2).

Maps any historical WAL/table schema version to a target schema:
  - rename columns via an explicit mapping table (dict),
  - add missing columns as typed NULLs,
  - widen types along a fixed lattice (int->long, float->double, ...),
  - never silently narrow or drop (dropping must be explicit).

All of it is pure Catalyst expressions (select + cast + lit), so pushdown,
pruning and codegen survive; no Python executes per row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

# allowed widenings: src -> set of wider types (transitively closed)
_WIDEN: dict[str, tuple[str, ...]] = {
    "byte": ("short", "integer", "long", "double"),
    "short": ("integer", "long", "double"),
    "integer": ("long", "double"),
    "long": ("double",),
    "float": ("double",),
    "date": ("timestamp",),
}


def _tn(dt: T.DataType) -> str:
    return dt.typeName()


def can_widen(src: T.DataType, dst: T.DataType) -> bool:
    return src == dst or _tn(dst) in _WIDEN.get(_tn(src), ())


def widest(a: T.DataType, b: T.DataType) -> T.DataType:
    if can_widen(a, b):
        return b
    if can_widen(b, a):
        return a
    raise TypeError(f"incompatible types for schema merge: {a} vs {b}")


def apply_mapping(df: DataFrame, mapping: dict[str, str]) -> DataFrame:
    """Rename WAL columns to table names per the column-mapping table."""
    if not mapping:
        return df
    return df.select(
        *[F.col(c).alias(mapping.get(c, c)) for c in df.columns]
    )


def evolve_schema(current: T.StructType, incoming: T.StructType) -> T.StructType:
    """Merged schema: current columns (widened if the incoming side is
    wider) followed by brand-new incoming columns, appended in order —
    the Iceberg schema-merge rule (BASELINE.json:6 "added/widened columns
    mid-stream")."""
    cur = {f.name: f for f in current.fields}
    out: list[T.StructField] = []
    for f in current.fields:
        g = incoming[f.name] if f.name in incoming.fieldNames() else None
        dt = widest(f.dataType, g.dataType) if g is not None else f.dataType
        out.append(T.StructField(f.name, dt, f.nullable or (g.nullable if g else False)))
    for g in incoming.fields:
        if g.name not in cur:
            out.append(T.StructField(g.name, g.dataType, True))  # new cols nullable
    return T.StructType(out)


def conform(
    df: DataFrame, target: T.StructType, passthrough: tuple[str, ...] = ()
) -> DataFrame:
    """Project ``df`` onto ``target``: cast widenable columns, add missing
    columns as typed NULLs, keep target column order. Raises on a column
    that would need narrowing (schema corruption, never silent).
    ``passthrough`` columns (e.g. WAL metadata) are appended unchanged."""
    have = {f.name: f for f in df.schema.fields}
    cols = []
    for f in target.fields:
        if f.name in have:
            src = have[f.name]
            if src.dataType == f.dataType:
                cols.append(F.col(f.name))
            elif can_widen(src.dataType, f.dataType):
                cols.append(F.col(f.name).cast(f.dataType).alias(f.name))
            else:
                raise TypeError(
                    f"column {f.name}: cannot conform {src.dataType} -> {f.dataType}"
                )
        else:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
    cols += [F.col(c) for c in passthrough if c in have]
    return df.select(*cols)


def union_conformed(frames: list[DataFrame], target: T.StructType) -> DataFrame:
    """Union heterogeneous-schema frames under one target schema (U1)."""
    it = iter(frames)
    out = conform(next(it), target)
    for f in it:
        out = out.unionByName(conform(f, target))
    return out
