"""Non-coding RNAs in Inflammation (ncRI).

Parity with ``/root/reference/src/bio2bel/sources/ncri.py:1-5``: the
reference holds only the XLSX dump URL. The download itself goes through
:func:`bio2bel_spark.ingest.cached_download` (env-gated, md5-skipped);
openpyxl-gated XLSX ingest follows the :mod:`bio2bel_spark.io.sinks` XLSX
pattern when a transform lands.
"""

MODULE_NAME = "ncri"

URL = "http://www.jianglab.cn/ncRI/files/Human.xlsx"
