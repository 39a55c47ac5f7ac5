"""dblp_to_csv_spark — a from-scratch PySpark-native analytics engine with the
query and data-processing capabilities of ThomHurks/dblp-to-csv.

The reference (/root/reference/XMLToCSV.py) is a single-process two-pass
streaming XML→CSV ETL tool. This package re-expresses its data model and every
operator (SURVEY.md §2.1) as idiomatic Spark DataFrame plans, and extends the
surface with the relational/query operators (SURVEY.md §2.3) and the
LLM-data-pipeline operators (SURVEY.md §2.4) the driver's correctness harness
exercises — all designed for a multi-executor cluster at 100 TB scale even
though tests run on local mode.
"""

__version__ = "0.1.0"

from dblp_to_csv_spark.session import get_spark  # noqa: F401
