"""Named built-in PostingSources (include/xapian/postingsource.h:428-709).

The reference ships four value-slot posting sources a user reaches for
before writing a custom one; each is a producer of a ``(doc_id, weight)``
DataFrame that plugs into the matcher's generic external-source leaf
(plans/query.py ``Q.PostingSource``) — AND_MAYBE it onto a text query for
boosting, or use it alone.

Value slots are docs-table columns in this engine (numeric columns used
directly; BINARY columns holding ``sortable_serialise`` bytes are
unserialised with the vectorized kernel) — the analog of
``get_value(slot)`` + ``sortable_unserialise`` in the reference
(postingsource.cc ValueWeightPostingSource::get_weight).

At scale each source is a narrow projection/filter over the docs table —
no shuffle, parquet column pruning applies, and the weight arithmetic is
JVM-side Columns.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType


def _slot_value(docs: DataFrame, column: str) -> Column:
    """Slot → double weight: numeric columns cast; binary columns are
    sortable_unserialise'd (vectorized, one Arrow pass)."""
    field = dict((f.name, f.dataType) for f in docs.schema.fields)[column]
    if isinstance(field, BinaryType):
        from pyspark.sql.functions import pandas_udf

        from ..functions.sortable import sortable_unserialise

        @pandas_udf("double")
        def _unser(vals: pd.Series) -> pd.Series:
            return pd.Series(
                [
                    sortable_unserialise(bytes(v)) if v is not None else None
                    for v in vals
                ],
                dtype="float64",
            )

        return _unser(F.col(column))
    return F.col(column).cast("double")


def value_weight_source(
    docs: DataFrame, column: str, id_col: str = "doc_id"
) -> DataFrame:
    """ValueWeightPostingSource (postingsource.h:428-497): iterates docs
    that HAVE a value in the slot, weight = the slot's (unserialised)
    value.  Docs with a NULL slot are skipped, mirroring the sparse value
    list."""
    return docs.filter(F.col(column).isNotNull()).select(
        F.col(id_col).cast("long").alias("doc_id"),
        _slot_value(docs, column).alias("weight"),
    )


def decreasing_value_weight_source(
    docs: DataFrame,
    column: str,
    range_start: int = 0,
    range_end: int = 0,
    id_col: str = "doc_id",
) -> DataFrame:
    """DecreasingValueWeightPostingSource (postingsource.h:509-575): same
    weights as ValueWeight, for slots whose value is non-increasing with
    docid inside [range_start, range_end].  The reference exploits the
    monotonicity to stop the postlist early once the weight falls below
    the matcher's threshold; under Spark the bounded top-k
    (TakeOrderedAndProject) plays that role, so the semantic surface here
    is the docid-range restriction + the same weights."""
    d = docs
    if range_start != 0:
        d = d.filter(F.col(id_col) >= F.lit(range_start))
    if range_end != 0:
        d = d.filter(F.col(id_col) <= F.lit(range_end))
    return value_weight_source(d, column, id_col=id_col)


def value_map_source(
    docs: DataFrame,
    column: str,
    mapping: dict,
    default_weight: float = 0.0,
    id_col: str = "doc_id",
) -> DataFrame:
    """ValueMapPostingSource (postingsource.h:587-655): weight looked up
    from an explicit value→weight map (``add_mapping``), unmapped values
    get ``default_weight`` (``set_default_weight``).  The map is a Column
    literal — broadcast with the plan, no join."""
    expr = F.lit(float(default_weight))
    # build as a CASE chain (deterministic order) — maps are small by API
    # design (driver-supplied literals, like the reference's std::map)
    for k in sorted(mapping, key=str):
        expr = F.when(
            F.col(column) == F.lit(k), F.lit(float(mapping[k]))
        ).otherwise(expr)
    return docs.filter(F.col(column).isNotNull()).select(
        F.col(id_col).cast("long").alias("doc_id"), expr.alias("weight")
    )


def fixed_weight_source(
    docs: DataFrame, weight: float, id_col: str = "doc_id"
) -> DataFrame:
    """FixedWeightPostingSource (postingsource.h:667-709): every document,
    constant weight — the 'boost everything by wt' building block."""
    return docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.lit(float(weight)).alias("weight"),
    )
