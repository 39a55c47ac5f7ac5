"""DTD catalog scan (S1, XMLToCSV.py:79-86): parse the DTD's <!ELEMENT>
declarations into the table catalog, dropping the root element.

The reference uses lxml's DTD object; this environment has no lxml, and the
catalog needs only the element *names*, so a small stdlib parser handles the
DTD declaration syntax (comments stripped, internal parameter entities
expanded by ``_read_dtd_text``; external PEs left unresolved). When lxml IS
available we additionally use it for full DTD validation (S4) — see
``validate_xml_against_dtd``.
"""

from __future__ import annotations

import re

# XML 1.0 NameStartChar / NameChar (BMP subset — astral names are legal but
# vanishingly rare in DTDs): the previous ASCII-only [A-Za-z_:] first-char
# class silently dropped declarations for legal non-ASCII element names
# (review r8), flipping the no-lxml validator's verdict on valid corpora.
_NS = (
    "A-Za-z_:\u00C0-\u00D6\u00D8-\u00F6\u00F8-\u02FF\u0370-\u037D"
    "\u037F-\u1FFF\u200C\u200D\u2070-\u218F\u2C00-\u2FEF"
    "\u3001-\uD7FF\uF900-\uFDCF\uFDF0-\uFFFD"
)
_NC = _NS + "\\-.0-9\u00B7\u0300-\u036F\u203F-\u2040"
_NAME = f"[{_NS}][{_NC}]*"

_ELEMENT_DECL = re.compile(rf"<!ELEMENT\s+({_NAME})", re.MULTILINE)
# the body may contain '>' inside quoted default values — consume quoted
# strings atomically instead of stopping at the first '>'
_ATTLIST_DECL = re.compile(
    rf"<!ATTLIST\s+({_NAME})\s+((?:[^>\"']|\"[^\"]*\"|'[^']*')*)>",
    re.DOTALL,
)
_COMMENT = re.compile(r"<!--.*?-->", re.DOTALL)

# internal parameter-entity declaration: <!ENTITY % name "replacement">
_PE_DECL = re.compile(
    rf"<!ENTITY\s+%\s+({_NAME})\s+(?:\"([^\"]*)\"|'([^']*)')\s*>"
)
_PE_REF = re.compile(rf"%({_NAME});")

# unparsed (NDATA) general entity: <!ENTITY name SYSTEM "uri" NDATA notation>
# — the only kind an ENTITY/ENTITIES attribute may legally name (XML 1.0
# §3.3.1). PUBLIC form carries two literals before NDATA.
_UNPARSED_ENTITY_DECL = re.compile(
    rf"<!ENTITY\s+({_NAME})\s+"
    r"(?:SYSTEM\s+(?:\"[^\"]*\"|'[^']*')"
    r"|PUBLIC\s+(?:\"[^\"]*\"|'[^']*')\s+(?:\"[^\"]*\"|'[^']*'))"
    rf"\s+NDATA\s+({_NAME})\s*>"
)


def _read_dtd_text(dtd_path: str) -> str:
    """DTD text with comments stripped and INTERNAL parameter entities
    expanded (``<!ENTITY % field "author|editor|…">`` … ``(%field;)*``) —
    the construction real DBLP-family DTDs use for shared content-model
    fragments. libxml2 gives the reference this for free (XMLToCSV.py:79);
    the stdlib path gets it here, so content models and schemas derived from
    PE-based DTDs are concrete instead of falling back to reader inference.

    Expansion is textual and iterative (nested PEs resolve in ≤10 passes;
    the XML spec forbids recursive entities, so a fixed point exists).
    EXTERNAL parameter entities (SYSTEM/PUBLIC) cannot be fetched — their
    references survive as literal ``%name;``, which downstream parsers
    already classify as "undeterminable" and handle conservatively."""
    with open(dtd_path, encoding="utf-8") as f:
        text = _COMMENT.sub("", f.read())
    pes: dict[str, str] = {}
    for m in _PE_DECL.finditer(text):
        value = m.group(2) if m.group(2) is not None else m.group(3)
        pes.setdefault(m.group(1), value)  # first binding wins (XML 1.0 §4.2)
    if not pes:
        return text
    for _ in range(10):
        expanded = _PE_REF.sub(lambda m: pes.get(m.group(1), m.group(0)), text)
        if expanded == text:
            break
        text = expanded
    return text

# one attribute definition inside an ATTLIST body:
#   name  type  (#REQUIRED | #IMPLIED | [#FIXED] "default")
# where type is CDATA, a token type, or an enumeration "(a|b|c)"
_ATTDEF = re.compile(
    rf"({_NAME})\s+"  # attribute name
    r"(CDATA|IDREFS|IDREF|ID|ENTITY|ENTITIES|NMTOKENS|NMTOKEN"
    r"|NOTATION\s+\([^)]*\)|\([^)]*\))\s+"
    r"(#REQUIRED|#IMPLIED|(?:#FIXED\s+)?(?:\"[^\"]*\"|'[^']*'))",
    re.DOTALL,
)


class InvalidElementName(Exception):
    """Reserved column name collision (reference XMLToCSV.py:16-25): the
    engine injects its own ``id`` column, so data-supplied ``id`` is an
    error."""

    def __init__(self, invalid_element_name: str, tag_name: str, parent_name: str):
        self.invalid_element_name = invalid_element_name
        self.tag_name = tag_name
        self.parent_name = parent_name
        super().__init__(
            f"Invalid name {invalid_element_name!r} found in tag {tag_name!r} "
            f"within element {parent_name!r}"
        )


def get_elements(dtd_path: str, root: str = "dblp") -> set[str]:
    """All <!ELEMENT> names minus the root — each becomes a record type /
    table (XMLToCSV.py:79-86; the reference hard-codes the 'dblp' root)."""
    text = _read_dtd_text(dtd_path)
    elements = set(_ELEMENT_DECL.findall(text))
    if root not in elements:
        raise ValueError(f"root element {root!r} not declared in DTD {dtd_path}")
    elements.remove(root)
    return elements


def get_attribute_defaults(dtd_path: str) -> dict[str, dict[str, str]]:
    """ATTLIST attributes with literal default values, per element.

    Reference parity (SURVEY.md §1.1): pass 1 runs with
    ``attribute_defaults=True`` (XMLToCSV.py:109) so DTD-defaulted attributes
    are *observed* as columns, while pass 2 does not (:152) — the default
    values never materialize in rows, surfacing as '' cells (:101). The
    engine mirrors that: elements gain a column per defaulted attribute even
    when the XML never sets it; cells stay empty. (#REQUIRED/#IMPLIED
    declare no default, so they create no column unless present in data.)

    Deviation (documented): the reference drops these never-set columns from
    the *annotated* header because its header iterates pass-2 type
    observations (XMLToCSV.py:290), leaving the header one column short of
    the CSV — a bug we fix by including them, typed 'string'."""
    # derived from the single ATTLIST scan (_attdefs_from_text), so the
    # first-binding-wins rule and any future parsing fix apply to every
    # attribute view at once (review r8: the two independent scan loops
    # would have needed the same fix twice)
    defaults: dict[str, dict[str, str]] = {}
    for element, defs in _attdefs_from_text(_read_dtd_text(dtd_path)).items():
        for attr, (_type, default) in defs.items():
            if default in ("#REQUIRED", "#IMPLIED"):
                continue
            value = default.removeprefix("#FIXED").strip().strip("\"'")
            defaults.setdefault(element, {})[attr] = value
    return defaults


def get_record_types(dtd_path: str, root: str = "dblp") -> set[str]:
    """Record types = elements allowed as direct children of the root, per
    the root's content model (e.g. ``<!ELEMENT dblp (article|book|…)*>``).

    The reference treats EVERY declared element as a candidate record type
    and relies on its depth-1 state machine to only ever match direct
    children of the root (XMLToCSV.py:120-121); nested candidates end with
    zero observed columns and are dropped (:142-143). Spark's rowTag scan
    matches at any depth, so the engine restricts the catalog up front to the
    root's declared children — same net catalog for any DTD (like DBLP's)
    where record types don't nest inside other record types. Falls back to
    all declared elements when the root's content model is opaque (ANY/EMPTY
    or unresolvable external parameter entities)."""
    text = _read_dtd_text(dtd_path)
    all_elements = get_elements(dtd_path, root)
    m = re.search(rf"<!ELEMENT\s+{re.escape(root)}\s+\(([^>]*)\)", text)
    if not m:
        return all_elements
    names = set(re.findall(_NAME, m.group(1))) - {"#PCDATA"}
    children = names & all_elements
    return children or all_elements


def get_element_children(dtd_path: str) -> dict[str, set[str] | None]:
    """Per element: the set of child element names its content model allows.
    ``None`` = undeterminable (external parameter entities — internal ones
    are pre-expanded by ``_read_dtd_text``); ANY = all declared elements;
    EMPTY / (#PCDATA) = empty set."""
    text = _read_dtd_text(dtd_path)
    all_elements = set(_ELEMENT_DECL.findall(text))
    out: dict[str, set[str] | None] = {}
    for m in _ELEMENT_MODEL.finditer(text):
        name, model = m.group(1), re.sub(r"\s+", "", m.group(2))
        if "%" in model:
            out[name] = None
        elif model == "ANY":
            out[name] = set(all_elements)
        elif model == "EMPTY":
            out[name] = set()
        else:
            kids = set(re.findall(_NAME, model)) - {"#PCDATA"}
            out[name] = kids & all_elements
    return out


def build_record_schema(dtd_path: str, record: str):
    """Spark schema for one record type, derived from the DTD — the fix for
    the XML reader's structure-inference merge hazard: when the same tag is
    text-only in one record and has children in another, inference unifies
    to STRING and embeds the raw inner XML (losing the nested values).
    DBLP data hits this constantly (plain <title> vs <title>Foo <i>x</i>
    </title>), and the DTD already states the true structure, so the schema
    comes from it: every element is array<struct<_VALUE: array<string>
    (mixed-content text segments), _attr fields, child arrays>>, leaves with
    no declared attrs/children are plain array<string>.

    Recursive content models (a tag allowed inside itself, directly or via a
    cycle) are CUT when a tag repeats on the path: the inner occurrence
    degrades to array<string> (its own deeper children, if any, surface as
    raw XML text — detectable and rare; DBLP's DTD has no recursion).

    Returns (schema, cut_paths) — or (None, []) when the DTD cannot
    determine the structure (parameter entities), in which case the caller
    falls back to reader inference."""
    from pyspark.sql import types as T

    children_map = get_element_children(dtd_path)
    attrs_map = get_declared_attributes(dtd_path)
    cut_paths: list[str] = []
    unknown = False

    def elem_type(tag: str, path: tuple[str, ...]):
        nonlocal unknown
        kids = children_map.get(tag, set())
        if kids is None:
            unknown = True
            kids = set()
        attrs = attrs_map.get(tag, {})
        if not kids and not attrs:
            return T.StringType()
        fields = [T.StructField("_VALUE", T.ArrayType(T.StringType()))]
        for a in sorted(attrs):
            fields.append(T.StructField(f"_{a}", T.StringType()))
        for k in sorted(kids):
            if k in path:
                cut_paths.append(" > ".join(path + (k,)))
                fields.append(T.StructField(k, T.ArrayType(T.StringType())))
            else:
                fields.append(
                    T.StructField(k, T.ArrayType(elem_type(k, path + (k,))))
                )
        return T.StructType(fields)

    rec_kids = children_map.get(record, set())
    if rec_kids is None:
        return None, []
    fields = [
        T.StructField(f"_{a}", T.StringType())
        for a in sorted(attrs_map.get(record, {}))
    ]
    for k in sorted(rec_kids):
        fields.append(T.StructField(k, T.ArrayType(elem_type(k, (record, k)))))
    if unknown:
        return None, []
    return T.StructType(fields), cut_paths


def validate_xml_against_dtd(xml_path: str, dtd_path: str) -> bool | None:
    """S4 (XMLToCSV.py:109-110, 152): DTD validation. Spark's XML source has
    no DTD support; when lxml is importable we run a driver-side streaming
    validation pass, otherwise return None (validation unavailable —
    documented deviation, SURVEY.md §4.3.3; see
    ``validate_xml_structurally`` for the stdlib fallback subset).

    Authority order: when lxml is importable, its streaming pass validates
    INLINE against the document's DOCTYPE via iterparse with
    ``dtd_validation=True`` (exactly the reference's construction,
    XMLToCSV.py:109-110: same flags, same element-clearing discipline,
    same DOCTYPE-not-argument semantics) and its verdict is FINAL — the
    stdlib subset below must never overrule libxml2, because the subset has
    known blind spots (unresolved general entities hide declared children;
    exotic declarations can mis-parse) that would reject valid documents.
    A full etree.parse would materialize a DBLP-sized document on the
    driver, hence iterparse.

    Without lxml, ``dtd_path`` IS honored: the stdlib structural pass
    checks the document against the *supplied* DTD (declared
    elements/attributes, #REQUIRED presence, content-model
    order/cardinality, ID uniqueness, IDREF/IDREFS resolution,
    NMTOKEN/enumeration/#FIXED value types) and violations return False;
    None means "full validation unavailable, subset passed"."""
    try:
        from lxml import etree
    except ImportError:
        if validate_xml_structurally(xml_path, dtd_path, max_errors=1):
            return False  # violates the supplied DTD
        return None
    root = None
    try:
        context = etree.iterparse(
            xml_path,
            events=("end",),
            dtd_validation=True,
            load_dtd=True,
            attribute_defaults=True,
        )
        for _event, elem in context:
            if root is None:
                root = elem.getroottree().getroot()
            if elem.getparent() is root:
                elem.clear()
                while elem.getprevious() is not None:
                    del elem.getparent()[0]
    except etree.XMLSyntaxError:
        # libxml2 reports both malformed XML and validity violations here —
        # either way the corpus does not validate
        return False
    return root is not None


_ELEMENT_MODEL = re.compile(rf"<!ELEMENT\s+({_NAME})\s+([^>]+)>", re.DOTALL)
_NAME_OR_PUNCT = re.compile(rf"({_NAME})|([(),|?*+])")


def _content_model_regex(model: str) -> re.Pattern[str] | None:
    """Compile one DTD content model into a regex over the element's child
    sequence, encoded as a comma-terminated name string ("author,title,").

    XML 1.0 content models ARE regular expressions over child names (the spec
    restricts them to deterministic ones, which plain re handles fine):
    ``,`` = concatenation, ``|`` = alternation, ``?*+`` as usual. Mixed
    content ``(#PCDATA|a|b)*`` allows those children in any order/count;
    ``(#PCDATA)`` and EMPTY allow none. Returns None for ANY or models using
    parameter entities (unchecked)."""
    model = re.sub(r"\s+", "", model)
    if model == "ANY" or "%" in model:
        return None
    if model == "EMPTY":
        return re.compile(r"^$")
    if "#PCDATA" in model:
        names = re.findall(_NAME, model.replace("#PCDATA", ""))
        if not names:
            return re.compile(r"^$")
        return re.compile("^(?:(?:" + "|".join(map(re.escape, names)) + "),)*$")
    parts: list[str] = []
    for tok in _NAME_OR_PUNCT.finditer(model):
        name, punct = tok.group(1), tok.group(2)
        if name:
            parts.append(f"(?:{re.escape(name)},)")
        elif punct == "(":
            parts.append("(?:")
        elif punct == ",":
            pass  # concatenation is juxtaposition
        else:
            parts.append(punct)  # ) | ? * +
    return re.compile("^" + "".join(parts) + "$")


def get_content_models(dtd_path: str) -> dict[str, re.Pattern[str] | None]:
    """Per element: compiled child-sequence regex (None = unchecked: ANY or
    unresolvable external parameter entities)."""
    text = _read_dtd_text(dtd_path)
    return {
        m.group(1): _content_model_regex(m.group(2))
        for m in _ELEMENT_MODEL.finditer(text)
    }


def _attdefs_from_text(text: str) -> dict[str, dict[str, tuple[str, str]]]:
    """One ATTLIST scan: {element: {attr: (normalized type, raw default)}} —
    the single source both public attribute views derive from (so the
    required-ness map and the type map can never drift apart)."""
    out: dict[str, dict[str, tuple[str, str]]] = {}
    for m in _ATTLIST_DECL.finditer(text):
        element, body = m.group(1), m.group(2)
        for am in _ATTDEF.finditer(body):
            # FIRST binding wins (XML 1.0 §3.3: later declarations of the
            # same attribute are ignored) — last-wins overwrote the binding
            # and mis-validated the standard DTD-customization pattern
            # (review r8); same rule the PE table already applies (§4.2)
            out.setdefault(element, {}).setdefault(
                am.group(1),
                (re.sub(r"\s+", "", am.group(2)), am.group(3)),
            )
    return out


def get_declared_attributes(dtd_path: str) -> dict[str, dict[str, bool]]:
    """Per element: {attr: required?} from ATTLIST declarations."""
    return {
        el: {a: default == "#REQUIRED" for a, (_t, default) in defs.items()}
        for el, defs in _attdefs_from_text(_read_dtd_text(dtd_path)).items()
    }


def _attribute_types_from_text(
    text: str,
) -> dict[str, dict[str, tuple[str, str | None]]]:
    out: dict[str, dict[str, tuple[str, str | None]]] = {}
    for el, defs in _attdefs_from_text(text).items():
        for a, (typ, default) in defs.items():
            fixed = None
            if default.startswith("#FIXED"):
                fixed = default.removeprefix("#FIXED").strip().strip("\"'")
            out.setdefault(el, {})[a] = (typ, fixed)
    return out


def get_attribute_types(
    dtd_path: str,
) -> dict[str, dict[str, tuple[str, str | None]]]:
    """Per element: {attr: (declared type, #FIXED value or None)}.

    Type is one of the DTD tokenized types (``ID``, ``IDREF``, ``IDREFS``,
    ``NMTOKEN``, ``NMTOKENS``, ``ENTITY``, ``ENTITIES``,
    ``NOTATION(...)``), ``CDATA``, or an enumeration literal like
    ``(informal|survey)``. Feeds the value-type checks in
    ``validate_xml_structurally`` — the subset libxml2 enforces for the
    reference via ``dtd_validation=True`` (XMLToCSV.py:109-110)."""
    return _attribute_types_from_text(_read_dtd_text(dtd_path))


def validate_xml_structurally(
    xml_path: str, dtd_path: str, max_errors: int = 20
) -> list[str]:
    """Stdlib (expat) streaming DTD validation: every element must be
    declared, every attribute must be declared for its element, #REQUIRED
    attributes must be present, each element's child sequence must match
    its declared content model (XML content models are regular expressions
    over child names — compiled by ``_content_model_regex``, so ordering AND
    cardinality are enforced, matching lxml's verdict on element structure),
    and attribute VALUES must satisfy their declared types: ID syntax +
    document-wide uniqueness, IDREF/IDREFS resolution against the ID set,
    NMTOKEN(S) syntax, enumeration and NOTATION membership, ENTITY/ENTITIES
    resolution against declared unparsed (NDATA) entities, #FIXED equality —
    the same whole-document constraints libxml2 enforces for the reference
    (XMLToCSV.py:109-110). Returns violations (empty = valid). Not covered
    vs a full validator: external parameter entities (cannot be fetched).
    Streaming pass, O(depth) parse state plus O(#ID +
    #IDREF values) for the cross-reference sets — that is the floor any
    validator pays for ID semantics (libxml2 included): a pre-flight for
    corpora readable once on the driver; at 100 TB validation belongs in
    the ingest pipeline instead."""
    import xml.parsers.expat

    # ONE file read + PE expansion; every catalog view derives from it
    dtd_text = _read_dtd_text(dtd_path)
    declared = set(_ELEMENT_DECL.findall(dtd_text))
    attr_types = _attribute_types_from_text(dtd_text)
    attrs = {
        el: {a: default == "#REQUIRED" for a, (_t, default) in defs.items()}
        for el, defs in _attdefs_from_text(dtd_text).items()
    }
    models = {
        m.group(1): _content_model_regex(m.group(2))
        for m in _ELEMENT_MODEL.finditer(dtd_text)
    }
    # elements whose content model forbids character data: element-only
    # models and EMPTY. Text is allowed iff the model is the literal token
    # ANY (exact match — a child element NAMED e.g. "MANY" must not trigger
    # it), contains the #PCDATA token, or uses a parameter entity
    # (unchecked). '#' and '%' cannot appear in XML names, so substring
    # tests are already token-exact for those two.
    no_text = {
        m.group(1)
        for m in _ELEMENT_MODEL.finditer(dtd_text)
        if not (
            (model := re.sub(r"\s+", "", m.group(2))) == "ANY"
            or "#PCDATA" in model
            or "%" in model
        )
    }
    # ENTITY/ENTITIES attribute values must name declared NDATA entities
    unparsed_entities = {m.group(1) for m in _UNPARSED_ENTITY_DECL.finditer(dtd_text)}
    errors: list[str] = []
    # per open element: (name, accumulated child-sequence tokens)
    stack: list[tuple[str, list[str]]] = []
    ids: set[str] = set()  # every ID-typed attribute value seen
    idrefs: dict[str, str] = {}  # IDREF(S) value → first-use context

    class _ErrorLimit(Exception):
        """Raised out of the expat handlers once max_errors is reached, so
        the parse stops instead of scanning a multi-GB corpus to EOF for
        errors that will be sliced off anyway (max_errors=1 pre-flights
        abort at the first violation)."""

    def check_value(name: str, a: str, value: str) -> None:
        typ, fixed = attr_types.get(name, {}).get(a, ("CDATA", None))
        if fixed is not None and value != fixed:
            errors.append(
                f"#FIXED attribute {a!r} on <{name}> must be {fixed!r}, "
                f"got {value!r}"
            )
        if typ == "ID":
            if not _XML_NAME.match(value):
                errors.append(f"ID attribute {a!r} on <{name}>: {value!r} "
                              "is not a valid XML name")
            elif value in ids:
                errors.append(f"duplicate ID value {value!r} (attribute "
                              f"{a!r} on <{name}>)")
            else:
                ids.add(value)
        elif typ in ("IDREF", "IDREFS"):
            tokens = [value] if typ == "IDREF" else value.split()
            for tok in tokens:
                if not _XML_NAME.match(tok):
                    errors.append(f"{typ} attribute {a!r} on <{name}>: "
                                  f"{tok!r} is not a valid XML name")
                else:
                    idrefs.setdefault(tok, f"attribute {a!r} on <{name}>")
        elif typ in ("NMTOKEN", "NMTOKENS"):
            tokens = [value] if typ == "NMTOKEN" else value.split()
            for tok in tokens:
                if not _NMTOKEN.match(tok):
                    errors.append(f"{typ} attribute {a!r} on <{name}>: "
                                  f"{tok!r} is not a valid name token")
        elif typ in ("ENTITY", "ENTITIES"):
            tokens = [value] if typ == "ENTITY" else value.split()
            for tok in tokens:
                if tok not in unparsed_entities:
                    errors.append(
                        f"{typ} attribute {a!r} on <{name}>: {tok!r} does "
                        f"not name a declared unparsed (NDATA) entity"
                    )
        elif typ.startswith("NOTATION"):
            allowed = set(typ.removeprefix("NOTATION").strip("()").split("|"))
            if value not in allowed:
                errors.append(
                    f"NOTATION attribute {a!r} on <{name}>: {value!r} not "
                    f"in {typ.removeprefix('NOTATION')}"
                )
        elif typ.startswith("("):
            allowed = set(typ.strip("()").split("|"))
            if value not in allowed:
                errors.append(
                    f"attribute {a!r} on <{name}>: {value!r} not in "
                    f"enumeration {typ}"
                )

    def start(name: str, attributes: dict[str, str]) -> None:
        if stack:
            stack[-1][1].append(name + ",")
        stack.append((name, []))
        if len(errors) >= max_errors:
            return
        if name not in declared:
            errors.append(f"undeclared element <{name}>")
            if len(errors) >= max_errors:
                # raise here too: returning without the abort let a fully
                # undeclared document scan to EOF after the budget was
                # spent (review r8 — the max_errors=1 pre-flight abort)
                raise _ErrorLimit
            return
        declared_attrs = attrs.get(name, {})
        for a, value in attributes.items():
            if a not in declared_attrs:
                errors.append(f"undeclared attribute {a!r} on <{name}>")
            else:
                check_value(name, a, value)
        for a, required in declared_attrs.items():
            if required and a not in attributes:
                errors.append(f"missing #REQUIRED attribute {a!r} on <{name}>")
        if len(errors) >= max_errors:
            raise _ErrorLimit

    def end(name: str) -> None:
        _, tokens = stack.pop()
        seq = "".join(tokens)
        if len(errors) >= max_errors:
            return
        pattern = models.get(name)
        if pattern is not None and not pattern.match(seq):
            errors.append(
                f"content model violation in <{name}>: children "
                f"({seq.rstrip(',') or 'none'}) do not match its declaration"
            )
        if len(errors) >= max_errors:
            raise _ErrorLimit

    def chars(data: str) -> None:
        # character data where the model forbids it (element-only / EMPTY):
        # a real validator rejects this (whitespace is permitted — it is
        # ignorable in element content)
        if len(errors) >= max_errors or not data.strip():
            return
        if stack and stack[-1][0] in no_text:
            errors.append(
                f"character data not allowed in element-only <{stack[-1][0]}>"
            )
        if len(errors) >= max_errors:
            raise _ErrorLimit

    parser = xml.parsers.expat.ParserCreate()
    parser.StartElementHandler = start
    parser.EndElementHandler = end
    parser.CharacterDataHandler = chars
    try:
        with open(xml_path, "rb") as f:
            parser.ParseFile(f)
    except xml.parsers.expat.ExpatError as e:
        errors.append(f"malformed XML: {e}")
    except _ErrorLimit:
        pass  # error budget spent; stop reading
    # IDREF resolution is a whole-document constraint: checkable only after
    # the last ID declaration has been seen
    for ref, context in idrefs.items():
        if len(errors) >= max_errors:
            break
        if ref not in ids:
            errors.append(f"dangling IDREF {ref!r} ({context}): no element "
                          f"declares this ID")
    return errors[:max_errors]


_XML_NAME = re.compile(rf"{_NAME}$")
_NMTOKEN = re.compile(rf"[{_NC}]+$")
