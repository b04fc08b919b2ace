"""NoncoRNA: experimentally supported non-coding RNAs and drug targets in
cancer.

Parity with ``/root/reference/src/bio2bel/sources/noncorna.py:1-6``: the
reference holds only the TSV dump URL; the dump is a plain
tab-separated file, so ingest is a stock
:func:`bio2bel_spark.ingest.read_csv`-style scan once a transform lands.
"""

MODULE_NAME = "noncorna"

URL = "http://www.ncdtcdb.cn:8080/NoncoRNA/download/NoncoRNA_2020-02-10.txt"
