"""Event schema + Arrow-batched payload parsing.

``EVENT_SCHEMA`` mirrors Spark's built-in Kafka source schema (key, value,
headers, topic, partition, offset, timestamp) so the same code path serves
both a real ``spark.readStream.format("kafka")`` source and batch-mode test
DataFrames (reference event type: Event<Bytes, RdfPayload>,
FusekiProjector.java:140).

``parse_events_pdf`` is the lazy-materialization point (reference
``materialiseValue``, FusekiProjector.java:502-508): value bytes + the
Content-Type header -> ordered op structs, or an error string for the DLQ
router.  It runs inside ``mapInPandas`` so parsing is distributed and
Arrow-batched — no payload bytes ever reach the driver.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import types as T

from ..model import RdfParseError
from ..rdf import parse_payload

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("key", T.BinaryType(), True),
        T.StructField("value", T.BinaryType(), True),
        T.StructField(
            "headers",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("key", T.StringType(), False),
                        T.StructField("value", T.BinaryType(), True),
                    ]
                )
            ),
            True,
        ),
        T.StructField("topic", T.StringType(), True),
        T.StructField("partition", T.IntegerType(), True),
        T.StructField("offset", T.LongType(), True),
        T.StructField("timestamp", T.TimestampType(), True),
    ]
)

_OP_STRUCT = T.StructType(
    [
        T.StructField("op", T.StringType(), False),
        T.StructField("graph", T.StringType(), False),
        T.StructField("subject", T.StringType(), False),
        T.StructField("predicate", T.StringType(), False),
        T.StructField("object_kind", T.StringType(), False),
        T.StructField("object_value", T.StringType(), False),
        T.StructField("object_datatype", T.StringType(), True),
        T.StructField("object_lang", T.StringType(), True),
    ]
)

PARSED_SCHEMA = T.StructType(
    list(EVENT_SCHEMA.fields)
    + [
        T.StructField("ops", T.ArrayType(_OP_STRUCT), True),
        T.StructField("error", T.StringType(), True),
        T.StructField("error_class", T.StringType(), True),
    ]
)


def content_type_of(headers) -> str | None:
    if headers is None:
        return None
    for h in headers:
        k = h["key"] if isinstance(h, dict) else h[0]
        if k is not None and k.lower() == "content-type":
            v = h["value"] if isinstance(h, dict) else h[1]
            if v is None:
                return None
            return v.decode("utf-8", "replace") if isinstance(v, (bytes, bytearray)) else str(v)
    return None


def parse_events_pdf(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas body: EVENT_SCHEMA rows -> PARSED_SCHEMA rows."""
    for pdf in batches:
        ops_col, err_col, errc_col = [], [], []
        for value, headers in zip(pdf["value"], pdf["headers"]):
            try:
                ct = content_type_of(headers)
                ops = parse_payload(bytes(value) if value is not None else b"", ct)
                ops_col.append(
                    [
                        {
                            "op": o[0],
                            "graph": o[1],
                            "subject": o[2],
                            "predicate": o[3],
                            "object_kind": o[4],
                            "object_value": o[5],
                            "object_datatype": o[6],
                            "object_lang": o[7],
                        }
                        for o in ops
                    ]
                )
                err_col.append(None)
                errc_col.append(None)
            except RdfParseError as e:
                ops_col.append(None)
                err_col.append(str(e))
                errc_col.append(type(e).__module__ + "." + type(e).__name__)
        out = pdf.copy()
        out["ops"] = ops_col
        out["error"] = err_col
        out["error_class"] = errc_col
        yield out
