"""CLI — argument-compatible with the reference (XMLToCSV.py:43-76):

    python -m dblp_to_csv_spark.cli <xml> <dtd> <out.csv>
        [--annotate] [--neo4j] [--relations attr:rel ...]

plus engine-specific flags (--root, --no-single-file, --master).
"""

from __future__ import annotations

import argparse
import os
import sys
import time


def existing_file(filename: str) -> str:
    if os.path.isfile(filename):
        return filename
    raise argparse.ArgumentTypeError(f"{filename} is not a valid input file!")


def valid_relation(relation: str) -> tuple[str, str]:
    parts = [part for part in relation.split(":") if part]
    if len(parts) == 2:
        return (parts[0], parts[1])
    raise argparse.ArgumentTypeError(f"{relation} must have the form attribute:relation")


def parse_args(argv: list[str] | None = None) -> argparse.Namespace:
    parser = argparse.ArgumentParser(
        description="Parse the DBLP XML file and convert it to CSV (PySpark engine)"
    )
    parser.add_argument("xml_filename", type=existing_file, help="The XML file to parse")
    parser.add_argument("dtd_filename", type=existing_file, help="The DTD for the XML file")
    parser.add_argument("outputfile", type=str, help="The output CSV file")
    parser.add_argument("--annotate", action="store_true", help="Write typed sidecar headers")
    parser.add_argument(
        "--neo4j", action="store_true", help="Neo4j headers + import script (implies --annotate)"
    )
    parser.add_argument(
        "--relations",
        type=valid_relation,
        nargs="+",
        help="attribute:relation pairs to normalize into node+edge tables",
    )
    parser.add_argument("--root", default="dblp", help="root element name (default: dblp)")
    parser.add_argument(
        "--no-single-file",
        action="store_true",
        help="write CSV directories (scale mode) instead of single files",
    )
    parser.add_argument(
        "--output-format",
        choices=["csv", "parquet", "orc"],
        default="csv",
        help=(
            "csv = reference parity; parquet = columnar scale sink (arrays "
            "kept native); orc = same columnar semantics on the ORC "
            "format for Hive/Trino-centered lakes"
        ),
    )
    parser.add_argument(
        "--validate",
        action="store_true",
        help="pre-flight DTD validation (via lxml when installed, else the "
        "stdlib validator: elements/attributes/#REQUIRED + content models); "
        "abort on violations",
    )
    parser.add_argument(
        "--single-pass",
        action="store_true",
        help="read the raw XML once for ALL record types (byte-range split "
        "pass -> type-partitioned envelope parquet -> per-type from_xml) "
        "instead of one native XML scan per type; the 1x-read mode for "
        "large corpora",
    )
    parser.add_argument(
        "--id-order",
        choices=["table", "document"],
        default="table",
        help="id assignment: 'table' (default; dense per sorted table) or "
        "'document' (reference-exact global counter in raw-XML document "
        "order, interleaved across record types — requires --single-pass, "
        "whose envelope records each record's byte position)",
    )
    parser.add_argument(
        "--parallel-tables",
        type=int,
        default=4,
        help="driver-side thread pool width for per-record-type preparation "
        "and writes (overlapping Spark jobs keeps executors busy between "
        "job boundaries; 1 = sequential). Output is identical either way.",
    )
    parser.add_argument("--master", default=None, help="Spark master (default: local[$CPUS])")
    args = parser.parse_args(argv)
    if args.id_order == "document" and not args.single_pass:
        print("error: --id-order document requires --single-pass.")
        sys.exit(1)
    if args.neo4j and not args.annotate:
        args.annotate = True
        print("--neo4j implies --annotate!")
    if args.relations:
        attr_rel = dict(args.relations)
        if not (len(attr_rel) == len({r for _, r in args.relations}) == len(args.relations)):
            print("error: argument --relations: attributes and relation names must be unique.")
            sys.exit(1)
        args.relations = attr_rel
        print("Will create relations for attribute(s): %s" % ", ".join(sorted(attr_rel)))
    else:
        args.relations = {}
    return args


def main(argv: list[str] | None = None) -> None:
    args = parse_args(argv)
    from dblp_to_csv_spark.plans.etl import convert
    from dblp_to_csv_spark.session import get_spark

    from dblp_to_csv_spark.sources.dtd import (
        InvalidElementName,
        validate_xml_against_dtd,
        validate_xml_structurally,
    )

    if args.validate:
        full = validate_xml_against_dtd(args.xml_filename, args.dtd_filename)
        if full is False:
            print("error: XML does not validate against the DTD")
            # structural violations against the supplied DTD, when any, give
            # the actionable detail (a False with none means an lxml-level
            # violation: entity resolution or well-formedness)
            for e in validate_xml_structurally(args.xml_filename, args.dtd_filename):
                print(" -", e)
            sys.exit(1)
        if full is None:  # no lxml: the stdlib structural pass already ran
            print(
                "Validated (stdlib: elements, attributes, #REQUIRED, content "
                "models, ID/IDREF, NMTOKEN/enumeration/NOTATION/ENTITY value "
                "types; not checked: external parameter entities)."
            )
        else:
            print("Validated against DTD.")

    start = time.time()
    spark = get_spark("xml-to-csv", master=args.master)
    try:
        result = convert(
            spark,
            args.xml_filename,
            args.dtd_filename,
            args.outputfile,
            annotate=args.annotate,
            neo4j=args.neo4j,
            relations=args.relations,
            root=args.root,
            single_file=not args.no_single_file,
            output_format=args.output_format,
            single_pass=args.single_pass,
            id_order=args.id_order,
            parallel_tables=args.parallel_tables,
        )
    except InvalidElementName as e:
        # reference behavior: report and exit 1 (XMLToCSV.py:375-380)
        print(e)
        sys.exit(1)
    print(
        f"Done after {time.time() - start:.3f} seconds: "
        f"{result.total_records} records in {len(result.tables)} tables"
    )


if __name__ == "__main__":
    main()
