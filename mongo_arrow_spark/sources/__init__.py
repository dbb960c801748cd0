"""Document source/sink: the reference's connector role, Spark-native.

The reference's execution core is a BSON-stream → Arrow-builder decoder
(reference lib.pyx, 870 lines of Cython). Here the same role is a Python
Data Source (``spark.dataSource.register``) reading JSON-lines document
dumps with partition splitting, filter pushdown, permissive/strict type
enforcement and first-non-null schema inference — yielding Arrow
RecordBatches so rows never materialize in Python objects on the hot path.
"""

from mongo_arrow_spark.sources.bucketed import (
    bucket_spec,
    colocated_join,
    read_bucketed,
    save_bucketed,
)
from mongo_arrow_spark.sources.documents import (
    DocumentsDataSource,
    infer_schema,
    register,
)
from mongo_arrow_spark.sources.warc import (
    WarcDataSource,
    read_warc_record,
    read_warc_stream,
    register_warc,
    write_warc,
    write_wet,
)

__all__ = [
    "DocumentsDataSource",
    "WarcDataSource",
    "infer_schema",
    "register",
    "read_warc_record",
    "read_warc_stream",
    "register_warc",
    "write_warc",
    "write_wet",
    "save_bucketed",
    "read_bucketed",
    "bucket_spec",
    "colocated_join",
]
