"""Flattening (P1): the reference's projection of an XML record into one flat
column namespace keyed by tag name (XMLToCSV.py:121-138, 170, 190-198).

Input: one DataFrame per record type from ``spark.read.format('xml')`` with
``inferSchema=false`` (everything string-typed). The native reader yields:

* record attributes as ``_attr`` columns,
* repeated text-only children as ``array<string>``,
* children carrying attributes as structs ``{_VALUE, _attr…}``,
* mixed content as ``_VALUE: array<string>`` (text segments).

Output: a frame whose columns are all ``string`` or ``array<string>``,
matching the reference's namespace:

* ``attr``        — record attribute (XMLToCSV.py:121-126, 170)
* ``tag``         — text of a descendant element (:133-134, :190-191);
                    mixed content keeps the FIRST text segment, replicating
                    the reference's text-before-first-child truncation
                    (SURVEY.md §1.2; whitespace trimming is a documented
                    deviation)
* ``tag-attr``    — attribute of a text-bearing descendant (:136-138,
                    :194-196); gated per-row on the element having text,
                    exactly like the reference
* nested elements — promoted to top level by their own tag name, merging with
                    same-named columns from other depths into arrays (:127-138
                    flattens any depth into one namespace)

Everything is a Column expression — zero Python in the row loop, the whole
projection runs inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DataType, StringType, StructType

from dblp_to_csv_spark.sources.dtd import InvalidElementName

ATTR_PREFIX = "_"
VALUE_TAG = "_VALUE"

# name -> list of (expr, is_array); same-named entries merge into one array
_Exprs = dict[str, list[tuple[Column, bool]]]


def _first_text(value_col: Column, dtype: DataType) -> Column:
    """The element's text value: mixed content yields an array of segments —
    keep the first (reference reads only .text, the part before the first
    child, XMLToCSV.py:190-191)."""
    if isinstance(dtype, ArrayType):
        return F.element_at(value_col, 1)
    return value_col


def _struct_exprs(tag: str, col: Column, dtype: StructType, out: _Exprs, record: str) -> None:
    field_types = {f.name: f.dataType for f in dtype.fields}
    text: Column | None = None
    if VALUE_TAG in field_types:
        text = _first_text(col[VALUE_TAG], field_types[VALUE_TAG])
        _add(out, tag, text, False, record)
    for name, ftype in field_types.items():
        if name == VALUE_TAG:
            continue
        if name.startswith(ATTR_PREFIX):
            # attribute of this element: recorded only when the element has
            # text (reference gate, XMLToCSV.py:190-198)
            if text is not None:
                gated = F.when(text.isNotNull(), col[name])
                _add(out, f"{tag}-{name[len(ATTR_PREFIX):]}", gated, False, record)
        else:
            # nested child element: promoted by its own tag name
            _collect(name, col[name], ftype, out, record)


def _array_struct_exprs(
    tag: str, col: Column, elem: StructType, out: _Exprs, record: str
) -> None:
    field_types = {f.name: f.dataType for f in elem.fields}
    has_text = VALUE_TAG in field_types

    def text_of(x: Column) -> Column:
        return _first_text(x[VALUE_TAG], field_types[VALUE_TAG])

    if has_text:
        texts = F.filter(F.transform(col, text_of), lambda v: v.isNotNull())
        _add(out, tag, texts, True, record)
    for name, ftype in field_types.items():
        if name == VALUE_TAG:
            continue
        if name.startswith(ATTR_PREFIX):
            if has_text:
                attrs = F.filter(
                    F.transform(col, lambda x: F.when(text_of(x).isNotNull(), x[name])),
                    lambda v: v.isNotNull(),
                )
                _add(out, f"{tag}-{name[len(ATTR_PREFIX):]}", attrs, True, record)
        elif isinstance(ftype, StringType):
            vals = F.filter(F.transform(col, lambda x: x[name]), lambda v: v.isNotNull())
            _add(out, name, vals, True, record)
        elif isinstance(ftype, ArrayType) and isinstance(ftype.elementType, StringType):
            vals = F.flatten(
                F.filter(F.transform(col, lambda x: x[name]), lambda v: v.isNotNull())
            )
            _add(out, name, vals, True, record)
        else:
            raise NotImplementedError(
                f"record {record!r}: nesting deeper than 2 levels inside repeated "
                f"element {tag!r} (field {name!r}: {ftype.simpleString()}) is not supported"
            )


def _add(out: _Exprs, name: str, expr: Column, is_array: bool, record: str) -> None:
    if name == "id":
        # reserved: the engine injects its own id column (XMLToCSV.py:131-132)
        raise InvalidElementName("id", name, record)
    out.setdefault(name, []).append((expr, is_array))


def _collect(tag: str, col: Column, dtype: DataType, out: _Exprs, record: str) -> None:
    if isinstance(dtype, StringType):
        _add(out, tag, col, False, record)
    elif isinstance(dtype, ArrayType) and isinstance(dtype.elementType, StringType):
        _add(out, tag, col, True, record)
    elif isinstance(dtype, StructType):
        _struct_exprs(tag, col, dtype, out, record)
    elif isinstance(dtype, ArrayType) and isinstance(dtype.elementType, StructType):
        _array_struct_exprs(tag, col, dtype.elementType, out, record)
    else:
        raise NotImplementedError(
            f"record {record!r}: unsupported XML shape for {tag!r}: {dtype.simpleString()}"
        )


def flatten_record_frame(df: DataFrame, record: str) -> tuple[DataFrame, set[str]]:
    """Flatten one record type's raw XML frame. Returns (flat frame, names of
    array columns). Raises InvalidElementName if the data supplies an ``id``
    column (F2)."""
    out: _Exprs = {}
    for field in df.schema.fields:
        name, dtype = field.name, field.dataType
        if name.startswith(ATTR_PREFIX):
            if name == VALUE_TAG:
                continue  # record-level text is never extracted (SURVEY.md §1.2)
            if name == "_xsi:nil":  # reader artifact, not data
                continue
            _add(out, name[len(ATTR_PREFIX):], df[name], False, record)
        else:
            _collect(name, df[name], dtype, out, record)

    cols: list[Column] = []
    array_cols: set[str] = set()
    for name in sorted(out):
        entries = out[name]
        if len(entries) == 1 and not entries[0][1]:
            cols.append(entries[0][0].alias(name))
        else:
            # merge same-named contributions (e.g. <i> inside <title> plus a
            # record-level <i>) into one multi-valued cell — the reference's
            # scalar→list promotion (A1, XMLToCSV.py:224-233)
            parts = [
                F.coalesce(e, F.array()) if is_arr else F.array_compact(F.array(e))
                for (e, is_arr) in entries
            ]
            merged = F.concat(*parts) if len(parts) > 1 else parts[0]
            # all-absent → null (not empty array), so empty-record filtering
            # and CSV '' rendering behave like a missing scalar
            merged = F.when(F.size(merged) > 0, merged)
            cols.append(merged.alias(name))
            array_cols.add(name)
    if not cols:
        return df.sparkSession.createDataFrame([], "dummy string").drop("dummy"), set()
    return df.select(*cols), array_cols
