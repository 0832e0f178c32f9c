"""Reference-naming compatibility layer (SURVEY.md §1.3).

The reference flattens XML/JSON nesting into column *names* with ``__``
separators (`parent__child`, `_attribute__attr`, `_attribute__elem__attr`,
`_undef__col`) and resolves them back to path expressions at pushdown
time (reference: extension/xml_extension.ts:1660-1751 selection paths,
1831-2044 projection paths; support matrix src/preprocessing.ts:90-106).

Our engine keeps honest nested types (StructType/ArrayType), but a user
migrating from the reference has queries written against the flattened
names. ``flattened_view`` projects a nested DataFrame to exactly those
names, and ``undef_column`` reproduces the ``_undef__`` "column whose
location is unknown" semantics (xml_extension.ts:1711-1737: an OR over
element text / row attribute / child-element locations) as a `coalesce`
over every schema path with that local name.

All of this is pure projection — Catalyst still prunes and pushes down
through it, so the compat layer costs nothing at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StructType

ATTR_PREFIX = "_"  # the XML reader stores element attributes as `_name`

_INTERNAL = {"_feature_type"}  # reader-added metadata, not XML attributes


def _is_attr(name: str) -> bool:
    return name.startswith(ATTR_PREFIX) and not name.startswith("__") and name not in _INTERNAL


def _flat_entries(
    schema: StructType, flat_prefix: str = "", path_prefix: str = ""
) -> list[tuple[str, str]]:
    """(flattened_name, spark_path) pairs, recursing through nested
    structs to ANY depth. The reference supports these names only to
    depth 3 and marks `_attribute__coll__elem__attr`-style level-4 paths
    unsupported (preprocessing.ts:97-100); recursion costs nothing here
    because every entry is still a pure column path, so this engine
    flattens `a__b__c__d` and `_attribute__a__b__attr` too."""
    out: list[tuple[str, str]] = []
    for f in schema.fields:
        name = f.name
        flat = flat_prefix + name
        path = path_prefix + name
        if isinstance(f.dataType, StructType):
            has_value = any(sub.name == "_VALUE" for sub in f.dataType.fields)
            if has_value:
                # element text when the element also has attributes
                out.append((flat, f"{path}._VALUE"))
            for sub in f.dataType.fields:
                if _is_attr(sub.name):
                    # `_attribute__<elem path>__attr` ≡ col("<path>._attr")
                    out.append((f"_attribute__{flat}__{sub.name[1:]}", f"{path}.{sub.name}"))
                elif sub.name == "_VALUE":
                    pass  # handled above
                elif isinstance(sub.dataType, StructType):
                    out.extend(
                        _flat_entries(
                            StructType([sub]), flat_prefix=flat + "__", path_prefix=path + "."
                        )
                    )
                elif isinstance(sub.dataType, ArrayType):
                    # nested collection stays an array (lateral ≡ explode)
                    out.append((f"{flat}__{sub.name}", f"{path}.{sub.name}"))
                else:
                    # `parent__child` ≡ col("parent.child")
                    out.append((f"{flat}__{sub.name}", f"{path}.{sub.name}"))
        elif isinstance(f.dataType, ArrayType):
            # nested collection (`@_is_collection`): kept as the array —
            # the reference iterates these with a lateral join (J6),
            # which is `explode()` on this column
            out.append((flat, path))
        elif _is_attr(name):
            # `_attribute__attr` ≡ row-element attribute col("_attr")
            out.append((f"_attribute__{flat_prefix}{name[1:]}", path))
        else:
            out.append((flat, path))
    return out


def flattened_view(df: DataFrame) -> DataFrame:
    """Project a nested document DataFrame to the reference's flattened
    column names. Pure projection — pushdown/pruning still apply."""
    return df.select(
        *[F.col(path).alias(flat) for flat, path in _flat_entries(df.schema)]
    )


def undef_column(df: DataFrame, name: str) -> Column:
    """`_undef__<name>` semantics: the value of ``name`` wherever it
    lives — top-level element, row attribute, or inside any child struct
    (the reference emits an OR over all three locations,
    xml_extension.ts:1711-1737; we coalesce in the same precedence:
    element text, then attribute, then nested)."""
    candidates: list[Column] = []

    def walk(schema: StructType, prefix: str) -> None:
        # per level: element text first, then attribute (the reference's
        # OR precedence), then descend — the reference stopped at one
        # level of nesting; recursion keeps the same precedence deeper
        for f in schema.fields:
            if f.name == name and not isinstance(f.dataType, (StructType, ArrayType)):
                candidates.append(F.col(prefix + f.name).cast("string"))
            elif (
                f.name == name
                and isinstance(f.dataType, StructType)
                and any(s.name == "_VALUE" for s in f.dataType.fields)
            ):
                # element text when the element also carries attributes
                candidates.append(F.col(prefix + f.name + "._VALUE").cast("string"))
        for f in schema.fields:
            if f.name == ATTR_PREFIX + name:
                candidates.append(F.col(prefix + f.name).cast("string"))
        for f in schema.fields:
            if isinstance(f.dataType, StructType):
                walk(f.dataType, prefix + f.name + ".")

    walk(df.schema, "")
    if not candidates:
        return F.lit(None).cast("string")
    return F.coalesce(*candidates)
