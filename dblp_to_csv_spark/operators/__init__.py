"""Operator library. Importing this package registers every named query with
``dblp_to_csv_spark.registry`` (side-effect imports below)."""

import dblp_to_csv_spark.operators.relational  # noqa: F401
import dblp_to_csv_spark.operators.reference_ops  # noqa: F401
import dblp_to_csv_spark.operators.dedup  # noqa: F401
import dblp_to_csv_spark.operators.similarity  # noqa: F401
import dblp_to_csv_spark.operators.text_analysis  # noqa: F401
import dblp_to_csv_spark.operators.timeseries  # noqa: F401
import dblp_to_csv_spark.operators.multimodal  # noqa: F401
import dblp_to_csv_spark.operators.sql_surface  # noqa: F401
import dblp_to_csv_spark.operators.function_gallery  # noqa: F401
import dblp_to_csv_spark.operators.udf_surface  # noqa: F401
import dblp_to_csv_spark.operators.statistics  # noqa: F401
import dblp_to_csv_spark.operators.pipeline  # noqa: F401
import dblp_to_csv_spark.operators.curation  # noqa: F401
import dblp_to_csv_spark.operators.drift  # noqa: F401
import dblp_to_csv_spark.operators.graph  # noqa: F401
import dblp_to_csv_spark.operators.association  # noqa: F401
import dblp_to_csv_spark.operators.entity_resolution  # noqa: F401
