from dblp_to_csv_spark.functions.type_inference import (  # noqa: F401
    TYPE_ANY,
    TYPE_BOOLEAN,
    TYPE_DATE,
    TYPE_DATETIME,
    TYPE_FLOAT,
    TYPE_INTEGER,
    TYPE_STRING,
    detect_type_column,
    detect_type_py,
    unify_types,
)
