"""Dotted-path parameter mapping with the reference's exact semantics.

Reference contract (rabbithole sql.py:110-215, verified by the goldens in
tests/test_sql.py:53-134 — see FIXTURES.md §A1):

- a dotted path walks nested objects (``"nested.message"``),
- a missing key yields NULL, never an error (sql.py:159-163),
- traversing *through* a scalar (``"count.unknown"`` where count=42)
  also yields NULL,
- a dict/list value binds as its JSON-serialized string (sql.py:164-165),
- ``parameters`` may be a list (positional) or dict (named); anything
  else raises ValueError (sql.py:83-90),
- ``parameters=None`` passes the raw message through.

This engine evaluates the mapping as Spark columns (JVM-side
``get_json_object`` / struct access inside codegen — no Python in the
hot path), in two payload modes:

- **schemaless** (payload is a JSON string column): values come back as
  strings (numbers unquoted, objects/arrays as compact JSON) — the
  dynamic-typing analogue of the reference's ``dict`` messages;
- **typed** (payload is a StructType column, declared per flow): values
  keep their Spark types; nested structs/arrays serialize via
  ``to_json``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["ParametersMapper"]


def _json_path(payload: Column, path: str) -> Column:
    """Schemaless dotted-path extraction (missing / through-scalar -> NULL)."""
    return F.get_json_object(payload, "$." + path)


def _typed_path(payload: Column, path: str, dtype: T.DataType) -> Column:
    """Typed dotted-path walk over a StructType payload column."""
    current = payload
    current_type = dtype
    for segment in path.split("."):
        if not isinstance(current_type, T.StructType) or segment not in current_type.fieldNames():
            return F.lit(None).cast("string")
        current = current[segment]
        current_type = current_type[segment].dataType
    if isinstance(current_type, (T.StructType, T.ArrayType, T.MapType)):
        return F.to_json(current)
    return current


class ParametersMapper:
    """Compile a reference-style ``parameters`` declaration to a select list.

    list form  -> positional columns named ``param_0 .. param_{n-1}``
    dict form  -> named columns
    None       -> the raw payload as a single ``payload`` column
    """

    def __init__(self, parameters: list[str] | dict[str, str] | None):
        if parameters is None:
            self.items: list[tuple[str, str]] | None = None
            self._positional = False
        elif isinstance(parameters, list):
            self.items = [(f"param_{i}", p) for i, p in enumerate(parameters)]
            self._positional = True
        elif isinstance(parameters, dict):
            self.items = list(parameters.items())
            self._positional = False
        else:
            raise ValueError(
                f"Unexpected parameters type: {type(parameters).__name__!r}"
            )

    def columns(
        self, payload: Column, payload_type: T.DataType | None = None
    ) -> list[Column]:
        if self.items is None:
            return [payload.alias("payload")]
        if payload_type is not None and isinstance(payload_type, T.StructType):
            return [
                _typed_path(payload, path, payload_type).alias(name)
                for name, path in self.items
            ]
        return [_json_path(payload, path).alias(name) for name, path in self.items]

    def apply(
        self,
        df: DataFrame,
        payload_col: str = "payload",
        keep: list[str] | None = None,
    ) -> DataFrame:
        """Project ``df`` to the mapped parameter columns (plus ``keep``)."""
        payload_type = df.schema[payload_col].dataType
        typed = payload_type if isinstance(payload_type, T.StructType) else None
        cols = self.columns(F.col(payload_col), typed)
        prefix = [F.col(c) for c in (keep or [])]
        return df.select(*prefix, *cols)

    @property
    def names(self) -> list[str] | None:
        return None if self.items is None else [n for n, _ in self.items]

    @property
    def positional(self) -> bool:
        # recorded at construction from the declaration FORM (list vs
        # dict) — inferring it from a name prefix would misclassify a
        # dict whose keys all happen to start with "param_" (binding
        # tuples against its named placeholders, which the sql sink's
        # error policy would then silently swallow batch after batch)
        return self._positional
