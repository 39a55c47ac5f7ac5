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
                    mixed content keeps the FIRST non-whitespace text
                    segment — equal to the reference's
                    text-before-first-child whenever leading text exists;
                    the leading-markup case and whitespace trimming are
                    documented deviations (COVERAGE.md deviation #1)
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


def _nonempty(c: Column) -> Column:
    """'' → null: an empty XML element has NO text (reference: elem.text is
    None, and its truthiness gate also rejects ''). The DTD-schema read
    surfaces empty elements as '' where inference surfaced null — normalize
    so both paths share the reference's no-value semantics."""
    return F.when(c != "", c)


def _first_text(value_col: Column, dtype: DataType) -> Column:
    """The element's text value: mixed content yields an array of segments —
    keep the first (reference reads only .text, the part before the first
    child, XMLToCSV.py:190-191)."""
    if isinstance(dtype, ArrayType):
        return _nonempty(F.element_at(value_col, 1))
    return _nonempty(value_col)


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


def _compact(arr: Column) -> Column:
    return F.filter(arr, lambda v: v.isNotNull())


def _walk_array(tag: str, arr: Column, elem: DataType, out: _Exprs, record: str) -> None:
    """``arr``: array<elem> — the stream of occurrences of element ``tag``
    inside a repeated ancestor, in document order. Recurses to ANY depth,
    promoting every descendant element into the single tag-name namespace —
    the reference flattens arbitrarily deep trees the same way (its
    ``end``-event loop visits every descendant, XMLToCSV.py:127-138; depth is
    deliberately lost).

    All expressions are transform/filter/flatten lambdas over the array —
    still zero Python per row, still inside whole-stage codegen."""
    if isinstance(elem, StringType):
        # leaf text stream: drop nulls AND ''s (empty element = no text)
        _add(out, tag, F.filter(arr, lambda v: v.isNotNull() & (v != "")), True, record)
    elif isinstance(elem, ArrayType):
        # per-ancestor repeats: splice the occurrence streams together
        _walk_array(tag, F.flatten(_compact(arr)), elem.elementType, out, record)
    elif isinstance(elem, StructType):
        field_types = {f.name: f.dataType for f in elem.fields}
        has_text = VALUE_TAG in field_types

        def text_of(x: Column) -> Column:
            return _first_text(x[VALUE_TAG], field_types[VALUE_TAG])

        if has_text:
            _add(out, tag, _compact(F.transform(arr, text_of)), True, record)
        for name, ftype in field_types.items():
            if name == VALUE_TAG:
                continue
            if name.startswith(ATTR_PREFIX):
                # attribute recorded only when its element has text
                # (reference gate, XMLToCSV.py:190-198)
                if has_text:
                    attrs = _compact(
                        F.transform(
                            arr, lambda x: F.when(text_of(x).isNotNull(), x[name])
                        )
                    )
                    _add(out, f"{tag}-{name[len(ATTR_PREFIX):]}", attrs, True, record)
            else:
                _walk_array(
                    name, _compact(F.transform(arr, lambda x: x[name])), ftype, out, record
                )
    else:
        raise NotImplementedError(
            f"record {record!r}: unsupported XML shape inside repeated "
            f"element {tag!r}: {elem.simpleString()}"
        )


def _add(out: _Exprs, name: str, expr: Column, is_array: bool, record: str) -> None:
    if name == "id":
        # reserved: the engine injects its own id column (XMLToCSV.py:131-132)
        raise InvalidElementName("id", name, record)
    out.setdefault(name, []).append((expr, is_array))


def _collect(tag: str, col: Column, dtype: DataType, out: _Exprs, record: str) -> None:
    if isinstance(dtype, StringType):
        _add(out, tag, _nonempty(col), False, record)
    elif isinstance(dtype, ArrayType) and isinstance(dtype.elementType, StringType):
        _add(out, tag, F.filter(col, lambda v: v.isNotNull() & (v != "")), True, record)
    elif isinstance(dtype, StructType):
        _struct_exprs(tag, col, dtype, out, record)
    elif isinstance(dtype, ArrayType):
        _walk_array(tag, col, dtype.elementType, out, record)
    else:
        raise NotImplementedError(
            f"record {record!r}: unsupported XML shape for {tag!r}: {dtype.simpleString()}"
        )


def flatten_record_frame(df: DataFrame, record: str) -> tuple[DataFrame, set[str]]:
    """Flatten one record type's raw XML frame. Returns (flat frame, names of
    array columns). Raises InvalidElementName if the data supplies an ``id``
    column (F2)."""
    out: _Exprs = {}
    # '#'-prefixed columns are engine metadata (document-order keys from the
    # envelope scan — '#' cannot start an XML name, so no data collision);
    # they pass through untouched, outside the record's column namespace
    meta = [f.name for f in df.schema.fields if f.name.startswith("#")]
    for field in df.schema.fields:
        name, dtype = field.name, field.dataType
        if name.startswith("#"):
            continue
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
    return df.select(*cols, *[df[m] for m in meta]), array_cols
