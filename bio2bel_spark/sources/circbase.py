"""CircBase — circular non-protein coding RNAs.

Parity with ``/root/reference/src/bio2bel/sources/circbase.py:1-6``: the
reference module is a placeholder holding only the database's download page
(no URL constant, no code). Kept as the same placeholder so a reference
user's import paths resolve; when CircBase ships a machine-readable dump,
wire it through :func:`bio2bel_spark.ingest.cached_download` + a
``prepare``-style projection like the sibling sources.

.. seealso:: http://www.circbase.org/cgi-bin/downloads.cgi
"""

MODULE_NAME = "circbase"
