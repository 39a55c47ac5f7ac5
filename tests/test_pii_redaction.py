"""text_redact_pii behavior on PII-laden documents (the sf corpus has no
PII, so oracle parity alone would pass vacuously): both engines must agree
on crafted inputs AND the redaction must actually scrub the values."""

from __future__ import annotations

import duckdb
import pandas as pd

from dblp_to_csv_spark.registry import all_queries


def test_redaction_scrubs_and_matches_oracle(spark, tmp_path):
    docs = [
        "contact alice.smith+work@example.co.uk or call +1 (555) 123-4567 now",
        "server at 192.168.10.1 and 10.0.0.255 logged bob@test.org twice",
        "no pii here just words",
        "phone 555 867 5309 appears after mail eve@x.io and host 8.8.8.8",
    ]
    pd.DataFrame({"doc_id": range(4), "text": docs}).to_parquet(
        tmp_path / "documents.parquet"
    )
    entry = all_queries()["text_redact_pii"]

    got = (
        entry.fn(spark, str(tmp_path))
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet')"
    )
    want = con.execute(entry.oracle).df().sort_values("doc_id").reset_index(drop=True)
    for c in ["n_emails", "n_ips", "n_phones", "redacted"]:
        assert got[c].astype(str).tolist() == want[c].astype(str).tolist(), c

    assert got["n_emails"].tolist() == [1, 1, 0, 1]
    assert got["n_ips"].tolist() == [0, 2, 0, 1]
    assert got["n_phones"].tolist() == [1, 0, 0, 1]
    joined = " ".join(got["redacted"])
    for leaked in ["example.co.uk", "192.168.10.1", "555", "@"]:
        assert leaked not in joined
    assert "<EMAIL>" in joined and "<IP>" in joined and "<PHONE>" in joined
