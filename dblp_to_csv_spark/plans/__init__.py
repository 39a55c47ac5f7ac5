from dblp_to_csv_spark.plans.etl import XmlToCsvPlan, convert  # noqa: F401
