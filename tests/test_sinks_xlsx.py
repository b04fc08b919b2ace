"""XLSX sink (S10): writes when openpyxl exists, clear error otherwise."""

from __future__ import annotations

import pytest

from bio2bel_spark.io import sinks


def test_write_xlsx(spark, tmp_path):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id int, name string")
    path = str(tmp_path / "out.xlsx")
    try:
        import openpyxl  # noqa: F401
    except ImportError:
        with pytest.raises(ImportError, match="openpyxl"):
            sinks.write_xlsx(df, path)
        return
    sinks.write_xlsx(df, path)
    import pandas as pd

    assert len(pd.read_excel(path)) == 2
