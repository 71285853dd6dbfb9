"""Schema surface: dynamic fields + copyField, resolved over DataFrame columns.

Reference semantics (solr/core/src/java/org/apache/solr/schema/IndexSchema.java):
  * dynamicField — a field name pattern that is exactly `*`, `*suffix`, or
    `prefix*` (:1119 `isValidDynamicField`/DynamicField constructor rejects
    interior wildcards). Lookup order: an EXPLICIT field always wins; among
    dynamic patterns the LONGEST pattern wins (:1107 dynamic fields are kept
    sorted by pattern length descending — `*_txt_en` beats `*_en` beats `*`).
  * copyField (:1211 registerCopyField) — source may be an explicit field or
    a glob of the same shape; dest must resolve (explicit or dynamic).
    maxChars truncates each copied VALUE (:1269). Copies are applied at
    index time BEFORE analysis, and a dest receiving copies behaves as
    multivalued — each copied value is a separate value with a
    positionIncrementGap between them (CopyField.java).

Spark-native shape: a schema is metadata over DataFrame columns. `field_type`
answers "what type is this column name" (driving analyzer/type choices);
`apply_copies` materializes copyField dests as `array<string>` columns —
exactly the multivalued form the index build accepts (indexing/build.py
multivalued path encodes positionIncrementGap), so `copyField(*, _text_)` +
`build_index(..., text_field="_text_")` is the reference's catch-all search
pattern. Column values ride the existing plan (pure Column ops: casts,
substr, array concat) — no shuffle, no Python.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_VALID_DYNAMIC = re.compile(r"^(\*[^*]*|[^*]*\*)$")


def _pattern_matches(pattern: str, name: str) -> bool:
    if pattern == "*":
        return True
    if pattern.startswith("*"):
        return name.endswith(pattern[1:])
    return name.startswith(pattern[:-1])


@dataclass(frozen=True)
class CopyRule:
    source: str                 # explicit name or `*`-glob (same shape rules)
    dest: str                   # must resolve against the schema
    max_chars: int | None = None


@dataclass
class IndexSchema:
    """fields: explicit column name -> type name (free-form tags like
    'text_general', 'string', 'plong' — the engine only dispatches on them).
    dynamic_fields: pattern -> type name. copy_fields: CopyRule list (or
    (source, dest) / (source, dest, max_chars) tuples)."""

    fields: dict[str, str] = field(default_factory=dict)
    dynamic_fields: dict[str, str] = field(default_factory=dict)
    copy_fields: list = field(default_factory=list)

    def __post_init__(self):
        for p in self.dynamic_fields:
            if not _VALID_DYNAMIC.match(p):
                raise ValueError(
                    f"invalid dynamic field pattern {p!r}: must be '*', "
                    f"'*suffix', or 'prefix*' (IndexSchema.java dynamic "
                    f"field shape)")
        self.copy_fields = [
            r if isinstance(r, CopyRule) else CopyRule(*r)
            for r in self.copy_fields]
        for r in self.copy_fields:
            if "*" in r.dest:
                raise ValueError(
                    f"copyField dest {r.dest!r} must be a concrete field "
                    f"name (glob dests are out of scope; the reference "
                    f"requires a matching dynamic dest)")
            if self.field_type(r.dest, default=None) is None:
                raise ValueError(
                    f"copyField dest {r.dest!r} resolves to no explicit or "
                    f"dynamic field (IndexSchema.java:1230 "
                    f"registerCopyField rejects unresolvable dests)")
            if "*" not in r.source and not _VALID_DYNAMIC.match(r.source) \
                    and r.source not in self.fields \
                    and self._dynamic_type(r.source) is None:
                raise ValueError(
                    f"copyField source {r.source!r} resolves to no field")

    def _dynamic_type(self, name: str) -> str | None:
        best = None
        for p, t in self.dynamic_fields.items():
            if _pattern_matches(p, name):
                if best is None or len(p) > len(best[0]):
                    best = (p, t)
        return best[1] if best else None

    def field_type(self, name: str, default=...) -> str:
        """Resolve a field name: explicit beats dynamic, longest dynamic
        pattern beats shorter (`*_txt_en` > `*_en` > `*`)."""
        if name in self.fields:
            return self.fields[name]
        t = self._dynamic_type(name)
        if t is not None:
            return t
        if default is not ...:
            return default
        raise KeyError(f"field {name!r} matches no explicit or dynamic field")

    def copy_sources(self, df_columns: list[str], dest: str) -> list[tuple]:
        """(column, max_chars) pairs feeding `dest`, in rule order then
        column order — the value order the reference appends copies in."""
        out = []
        for r in self.copy_fields:
            if r.dest != dest:
                continue
            if "*" in r.source:
                for c in df_columns:
                    if c != dest and _pattern_matches(r.source, c):
                        out.append((c, r.max_chars))
            elif r.source in df_columns:
                out.append((r.source, r.max_chars))
        return out

    def apply_copies(self, df: DataFrame) -> DataFrame:
        """Materialize every copyField dest as an array<string> column (one
        element per copied value, maxChars-truncated) — the multivalued form
        `build_index` indexes with positionIncrementGap between values."""
        from pyspark.sql.types import ArrayType

        for dest in dict.fromkeys(r.dest for r in self.copy_fields):
            parts: list[Column] = []
            for cname, mc in self.copy_sources(df.columns, dest):
                col = df[cname]
                if isinstance(df.schema[cname].dataType, ArrayType):
                    vals = F.transform(col, lambda x: x.cast("string"))
                else:
                    vals = F.array(col.cast("string"))
                if mc is not None:
                    vals = F.transform(vals, lambda x: F.substring(x, 1, mc))
                parts.append(vals)
            if not parts:
                continue
            merged = parts[0] if len(parts) == 1 else F.concat(*parts)
            df = df.withColumn(dest, F.filter(merged, lambda x: x.isNotNull()))
        return df
